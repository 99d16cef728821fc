"""Encoder-decoder transformer stack with the reference component contract.

Capability parity with /root/reference/ai_comps/transformer.py:49-920: FFN,
EncoderLayer, DecoderLayer (causal self-attn -> cross-attn -> FFN, each
pre-LN with residuals), Encoder/Decoder stacks (decoder backward SUMS
dMemory across layers), Transformer (encode -> decode; backward feeds the
summed dMemory into the encoder), TokenEmbedding (scatter-add backward) and
OutputHead (fused softmax-CE returning (loss, dZ) with dZ=(P-onehot)/N).

Everything composes the nn components, whose backwards are the hand-derived
``custom_vjp`` closed forms; the residual wiring in each layer's ``backward``
mirrors the reference's explicit gradient bookkeeping. For the jit-compiled
TPU training path of the same architecture see ``models/seq2seq.py``.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.attention import MultiHeadAttention as MHA
from ..nn.functional import he_init, relu, softmax_last
from ..nn.normalization import LayerNorm

__all__ = [
    "softmax_rows",
    "sinusoidal_pos_encoding",
    "FFN",
    "EncoderLayer",
    "DecoderLayer",
    "Encoder",
    "Decoder",
    "Transformer",
    "TokenEmbedding",
    "OutputHead",
]


def softmax_rows(Z):
    """Row-wise stabilized softmax (2-D convenience alias)."""
    return softmax_last(jnp.asarray(Z))


def sinusoidal_pos_encoding(max_len: int, d_model: int):
    from ..nn.functional import sinusoidal_encoding

    return sinusoidal_encoding(max_len, d_model)


def _ffn_apply(params, X):
    U = X @ params["W1"] + params["b1"]
    return relu(U) @ params["W2"] + params["b2"]


class FFN:
    """Position-wise feed-forward: ReLU(X W1 + b1) W2 + b2."""

    def __init__(self, d_model: int = 512, d_ff: int = 2048,
                 activation: str = "relu", seed: int = 0) -> None:
        if activation != "relu":
            raise NotImplementedError("only relu, matching the reference")
        rng = np.random.default_rng(seed)
        self.W1 = he_init(d_model, d_ff, rng)
        self.b1 = jnp.zeros(d_ff, dtype=jnp.float32)
        self.W2 = he_init(d_ff, d_model, rng)
        self.b2 = jnp.zeros(d_model, dtype=jnp.float32)
        self.activation = activation
        self.grads: Dict[str, jnp.ndarray] = {
            "W1": jnp.zeros_like(self.W1), "b1": jnp.zeros_like(self.b1),
            "W2": jnp.zeros_like(self.W2), "b2": jnp.zeros_like(self.b2),
        }
        self._pull = None

    def _params(self):
        return {"W1": self.W1, "b1": self.b1, "W2": self.W2, "b2": self.b2}

    def forward(self, X):
        X = jnp.asarray(X)
        y, self._pull = jax.vjp(_ffn_apply, self._params(), X)
        return y

    def backward(self, dY):
        dparams, dX = self._pull(jnp.asarray(dY, jnp.float32))
        self.grads.update(dparams)
        return dX

    def step(self, lr: float = 1e-3, weight_decay: float = 0.0) -> None:
        for name in ("W1", "b1", "W2", "b2"):
            W = getattr(self, name)
            g = self.grads[name]
            if weight_decay != 0.0 and name in ("W1", "W2"):
                g = g + weight_decay * W
            setattr(self, name, W - lr * g)
            self.grads[name] = jnp.zeros_like(W)


class EncoderLayer:
    """Pre-LN self-attention + FFN block with residuals."""

    def __init__(self, d_model=512, n_heads=8, d_ff=2048, seed=0):
        self.ln1 = LayerNorm(d_model)
        self.mha = MHA(d_model, n_heads, seed=seed)
        self.ln2 = LayerNorm(d_model)
        self.ffn = FFN(d_model, d_ff, activation="relu", seed=seed + 1)

    def forward(self, X, src_mask=None):
        X = jnp.asarray(X)
        Xn = self.ln1.forward(X)
        A = self.mha.forward(Xn, mask=src_mask, KV=None)
        Y1 = X + A
        Y1n = self.ln2.forward(Y1)
        return Y1 + self.ffn.forward(Y1n)

    def backward(self, dY):
        dY = jnp.asarray(dY)
        dY1 = dY + self.ln2.backward(self.ffn.backward(dY))
        dXn, _ = self.mha.backward(dY1)
        return dY1 + self.ln1.backward(dXn)

    def step(self, lr=1e-3, weight_decay=0.0):
        self.mha.step(lr, weight_decay)
        self.ffn.step(lr, weight_decay)
        self.ln1.step(lr, 0.0)
        self.ln2.step(lr, 0.0)


class DecoderLayer:
    """Pre-LN causal self-attn -> cross-attn (K/V = memory) -> FFN block."""

    def __init__(self, d_model=512, n_heads=8, d_ff=2048, seed=0):
        self.ln1 = LayerNorm(d_model)
        self.self_attn = MHA(d_model, n_heads, seed=seed)
        self.ln2 = LayerNorm(d_model)
        self.cross_attn = MHA(d_model, n_heads, seed=seed + 1)
        self.ln3 = LayerNorm(d_model)
        self.ffn = FFN(d_model, d_ff, activation="relu", seed=seed + 2)

    def forward(self, X, memory, tgt_mask=None, mem_mask=None):
        X = jnp.asarray(X)
        memory = jnp.asarray(memory)
        Xn = self.ln1.forward(X)
        A = self.self_attn.forward(Xn, mask=tgt_mask, KV=None)
        Y1 = X + A
        Y1n = self.ln2.forward(Y1)
        C = self.cross_attn.forward(Y1n, mask=mem_mask, KV=memory)
        Y2 = Y1 + C
        Y2n = self.ln3.forward(Y2)
        return Y2 + self.ffn.forward(Y2n)

    def backward(self, dY) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (dX, dMemory) — the two-output gradient the encoder
        accumulation depends on (reference transformer.py:569-608)."""
        dY = jnp.asarray(dY)
        dY2 = dY + self.ln3.backward(self.ffn.backward(dY))
        dY1n, dMem = self.cross_attn.backward(dY2)
        dY1 = dY2 + self.ln2.backward(dY1n)
        dXn, _ = self.self_attn.backward(dY1)
        dX = dY1 + self.ln1.backward(dXn)
        return dX, dMem

    def step(self, lr=1e-3, weight_decay=0.0):
        self.self_attn.step(lr, weight_decay)
        self.cross_attn.step(lr, weight_decay)
        self.ffn.step(lr, weight_decay)
        self.ln1.step(lr, 0.0)
        self.ln2.step(lr, 0.0)
        self.ln3.step(lr, 0.0)


class Encoder:
    """Stack of encoder layers."""

    def __init__(self, num_layers=6, d_model=512, n_heads=8, d_ff=2048, seed=0):
        self.layers = [
            EncoderLayer(d_model, n_heads, d_ff, seed=seed + i * 3)
            for i in range(num_layers)
        ]

    def forward(self, X, src_mask=None):
        H = X
        for layer in self.layers:
            H = layer.forward(H, src_mask=src_mask)
        return H

    def backward(self, dH):
        dX = dH
        for layer in reversed(self.layers):
            dX = layer.backward(dX)
        return dX

    def step(self, lr=1e-3, weight_decay=0.0):
        for layer in self.layers:
            layer.step(lr, weight_decay)


class Decoder:
    """Stack of decoder layers; backward sums dMemory across layers."""

    def __init__(self, num_layers=6, d_model=512, n_heads=8, d_ff=2048, seed=1000):
        self.layers = [
            DecoderLayer(d_model, n_heads, d_ff, seed=seed + i * 4)
            for i in range(num_layers)
        ]

    def forward(self, X, memory, tgt_mask=None, mem_mask=None):
        H = X
        for layer in self.layers:
            H = layer.forward(H, memory, tgt_mask=tgt_mask, mem_mask=mem_mask)
        return H

    def backward(self, dH):
        dX = dH
        dMem_total = 0
        for layer in reversed(self.layers):
            dX, dMem = layer.backward(dX)
            dMem_total = dMem_total + dMem
        return dX, dMem_total

    def step(self, lr=1e-3, weight_decay=0.0):
        for layer in self.layers:
            layer.step(lr, weight_decay)


class Transformer:
    """Encoder-decoder transformer with pre-LN blocks."""

    def __init__(self, num_enc_layers=6, num_dec_layers=6, d_model=512,
                 n_heads=8, d_ff=2048, seed=0):
        self.encoder = Encoder(num_enc_layers, d_model, n_heads, d_ff, seed=seed)
        self.decoder = Decoder(num_dec_layers, d_model, n_heads, d_ff,
                               seed=seed + 999)

    def forward(self, src, tgt, src_mask=None, tgt_mask=None, mem_mask=None):
        memory = self.encoder.forward(src, src_mask=src_mask)
        out = self.decoder.forward(tgt, memory, tgt_mask=tgt_mask,
                                   mem_mask=mem_mask)
        return out, memory

    def backward(self, dout):
        ddec, dmem = self.decoder.backward(dout)
        dsrc = self.encoder.backward(dmem)
        return dsrc, ddec

    def step(self, lr=1e-3, weight_decay=0.0):
        self.encoder.step(lr, weight_decay)
        self.decoder.step(lr, weight_decay)


class TokenEmbedding:
    """W[idx] lookup; backward scatter-adds per-token gradients."""

    def __init__(self, vocab_size: int, d_model: int, seed: int = 0):
        rng = np.random.default_rng(seed)
        self.W = jnp.asarray(
            rng.normal(0.0, 0.02, size=(vocab_size, d_model)), jnp.float32
        )
        self.gradW = jnp.zeros_like(self.W)
        self._idx = None

    def forward(self, idx):
        self._idx = jnp.asarray(idx)
        return self.W[self._idx]

    def backward(self, dX) -> None:
        dX = jnp.asarray(dX, jnp.float32)
        flat_idx = self._idx.reshape(-1)
        flat_grad = dX.reshape(flat_idx.shape[0], -1)
        self.gradW = jnp.zeros_like(self.W).at[flat_idx].add(flat_grad)

    def step(self, lr=1e-2, weight_decay=0.0):
        g = self.gradW
        if weight_decay != 0.0:
            g = g + weight_decay * self.W
        self.W = self.W - lr * g
        self.gradW = jnp.zeros_like(self.W)


class OutputHead:
    """Linear head with fused softmax cross-entropy loss."""

    def __init__(self, d_model: int, vocab_size: int, seed: int = 1):
        rng = np.random.default_rng(seed)
        std = np.sqrt(2.0 / (d_model + vocab_size))  # Glorot
        self.W = jnp.asarray(
            rng.normal(0.0, std, size=(d_model, vocab_size)), jnp.float32
        )
        self.b = jnp.zeros(vocab_size, dtype=jnp.float32)
        self.gradW = jnp.zeros_like(self.W)
        self.gradb = jnp.zeros_like(self.b)
        self._Y = None

    def logits(self, Y):
        self._Y = jnp.asarray(Y)
        return self._Y @ self.W + self.b

    def loss_and_dlogits(self, Z, targets):
        """(scalar CE loss, dZ=(P-onehot)/N) — reference transformer.py:876-893."""
        Z = jnp.asarray(Z)
        B, T, V = Z.shape
        Zf = Z.reshape(B * T, V)
        y = jnp.asarray(targets).reshape(B * T)
        P = softmax_last(Zf)
        loss = -jnp.mean(jnp.log(P[jnp.arange(B * T), y] + 1e-12))
        dZ = (P.at[jnp.arange(B * T), y].add(-1.0)) / (B * T)
        return float(loss), dZ.reshape(B, T, V)

    def backward(self, dZ):
        dZ = jnp.asarray(dZ)
        B, T, V = dZ.shape
        D = self._Y.shape[-1]
        Yf = self._Y.reshape(B * T, D)
        dZf = dZ.reshape(B * T, V)
        self.gradW = Yf.T @ dZf
        self.gradb = dZf.sum(axis=0)
        return (dZf @ self.W.T).reshape(B, T, D)

    def step(self, lr=1e-2, weight_decay=0.0):
        g = self.gradW
        if weight_decay != 0.0:
            g = g + weight_decay * self.W
        self.W = self.W - lr * g
        self.b = self.b - lr * self.gradb
        self.gradW = jnp.zeros_like(self.W)
        self.gradb = jnp.zeros_like(self.b)
