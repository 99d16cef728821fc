"""Stateful GPT building blocks with the reference component contract.

Capability parity with the reference's ``gpt.py`` classes
(/root/reference/gpt.py:103-215): ``DecoderOnlyLayer`` (pre-LN masked
self-attention + ReLU FFN with residuals), ``GPT`` (a stack of them), and a
param-group ``AdamW`` — each with the forward/backward/step interface.

These are the pedagogy/parity layer; the jit-compiled training path is the
functional ``models/gpt.py`` + ``train/optim.py``. ``AdamW`` here accepts
the reference's param-group dicts (``{"p", "g", "weight_decay"}``) keyed by
group ORDER rather than ``id()`` (JAX arrays are immutable, so identity
keying cannot work; group order is stable across steps by construction in
the reference's collect_param_groups too).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp

from ..nn.attention import MultiHeadAttention as MHA
from ..nn.normalization import LayerNorm
from .transformer import FFN

__all__ = ["DecoderOnlyLayer", "GPT", "AdamW"]


class DecoderOnlyLayer:
    """Pre-LN masked self-attention + FFN block (reference gpt.py:154-188)."""

    def __init__(self, d_model: int, n_heads: int, d_ff: int, seed: int = 0):
        self.ln1 = LayerNorm(d_model)
        self.sa = MHA(d_model, n_heads, seed=seed)
        self.ln2 = LayerNorm(d_model)
        self.ffn = FFN(d_model, d_ff, activation="relu", seed=seed + 1)

    def forward(self, X, tgt_mask=None):
        X = jnp.asarray(X)
        Xn = self.ln1.forward(X)
        A = self.sa.forward(Xn, mask=tgt_mask, KV=None)
        Y1 = X + A
        Y1n = self.ln2.forward(Y1)
        return Y1 + self.ffn.forward(Y1n)

    def backward(self, dY):
        dY = jnp.asarray(dY)
        dY1 = dY + self.ln2.backward(self.ffn.backward(dY))
        dXn, _ = self.sa.backward(dY1)
        return dY1 + self.ln1.backward(dXn)

    def step(self, lr: float = 3e-3, weight_decay: float = 0.0) -> None:
        self.sa.step(lr, weight_decay)
        self.ffn.step(lr, weight_decay)
        self.ln1.step(lr, 0.0)
        self.ln2.step(lr, 0.0)


class GPT:
    """Decoder-only stack (reference gpt.py:192-215)."""

    def __init__(self, num_layers: int = 4, d_model: int = 256,
                 n_heads: int = 4, d_ff: Optional[int] = None, seed: int = 123):
        if d_ff is None:
            d_ff = 4 * d_model
        self.layers = [
            DecoderOnlyLayer(d_model, n_heads, d_ff, seed=seed + i * 7)
            for i in range(num_layers)
        ]

    def forward(self, X, tgt_mask=None):
        H = jnp.asarray(X)
        for lyr in self.layers:
            H = lyr.forward(H, tgt_mask)
        return H

    def backward(self, dH):
        g = jnp.asarray(dH)
        for lyr in reversed(self.layers):
            g = lyr.backward(g)
        return g

    def step(self, lr: float = 3e-3, weight_decay: float = 1e-4) -> None:
        for lyr in self.layers:
            lyr.step(lr, weight_decay)


class AdamW:
    """Decoupled-weight-decay Adam over param groups (gpt.py:103-151).

    ``step(param_groups)`` takes dicts ``{"p": array, "g": array,
    "weight_decay": float}`` and RETURNS the list of updated parameter
    arrays (JAX arrays are immutable, so in-place mutation is replaced by
    returning new values; per-group moment state is keyed by group index).
    """

    def __init__(self, lr: float = 3e-4, betas=(0.9, 0.95), eps: float = 1e-8,
                 weight_decay: float = 0.01):
        self.lr = lr
        self.b1, self.b2 = betas
        self.eps = eps
        self.wd = weight_decay
        self.t = 0
        self.state: Dict[int, Dict[str, jnp.ndarray]] = {}

    def _get_state(self, idx: int, p) -> Dict[str, jnp.ndarray]:
        if idx not in self.state:
            self.state[idx] = {
                "m": jnp.zeros_like(p), "v": jnp.zeros_like(p),
            }
        return self.state[idx]

    def step(self, param_groups: List[dict]) -> List[jnp.ndarray]:
        self.t += 1
        out = []
        for idx, pg in enumerate(param_groups):
            p = jnp.asarray(pg["p"])
            g = jnp.asarray(pg["g"])
            wd = pg.get("weight_decay", self.wd)
            st = self._get_state(idx, p)
            m = self.b1 * st["m"] + (1.0 - self.b1) * g
            v = self.b2 * st["v"] + (1.0 - self.b2) * (g * g)
            st["m"], st["v"] = m, v
            mhat = m / (1.0 - self.b1**self.t)
            vhat = v / (1.0 - self.b2**self.t)
            if wd != 0.0:
                p = p - self.lr * wd * p
            p = p - self.lr * (mhat / (jnp.sqrt(vhat) + self.eps))
            out.append(p)
        return out
