"""Scaled dot-product and multi-head attention.

Reference: /root/reference/ai_comps/attention.py:45-264. Contracts kept:
``ScaledDotProductAttention.forward(Q, K, V, mask) -> (O, cache)`` /
``backward(dO, cache) -> (dQ, dK, dV)`` on (BH, T, d) inputs, and
``MultiHeadAttention.forward(X, mask, KV)`` supporting self- OR
cross-attention with ``backward(dY) -> (dX, dKV)``, dKV None for self.

TPU-native: the functional path (``apply``/``nn.functional.sdpa``) is
einsum-based and shape-polymorphic over (B, h, T, d) — no BH reshape needed
— with the hand-derived softmax-Jacobian backward as its ``custom_vjp``.
A fused Pallas flash-attention kernel sits behind the same functional API
(``linalg_tpu.nn.flash``) for the training hot path.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .functional import causal_mask, he_init, sdpa, softmax_last

__all__ = [
    "softmax_last",
    "causal_mask",
    "he_init",
    "ScaledDotProductAttention",
    "MultiHeadAttention",
    "MHA",
    "Attention",
    "mha_init",
    "mha_apply",
]


class ScaledDotProductAttention:
    """O = softmax(QK^T / sqrt(d)) V with an explicit cache-based backward."""

    def forward(self, Q, K, V, mask=None) -> Tuple[jnp.ndarray, Tuple]:
        Q, K, V = jnp.asarray(Q), jnp.asarray(K), jnp.asarray(V)
        d = Q.shape[-1]
        scale = 1.0 / math.sqrt(d)
        S = scale * jnp.einsum("...td,...sd->...ts", Q, K)
        if mask is not None:
            S = S + mask
        P = softmax_last(S)
        O = jnp.einsum("...ts,...sd->...td", P, V)
        return O, (Q, K, V, P, d)

    def backward(self, dO, cache) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        Q, K, V, P, d = cache
        scale = 1.0 / math.sqrt(d)
        dO = jnp.asarray(dO)
        dV = jnp.einsum("...ts,...td->...sd", P, dO)
        dP = jnp.einsum("...td,...sd->...ts", dO, V)
        rowdot = jnp.sum(dP * P, axis=-1, keepdims=True)
        dS = (dP - rowdot) * P
        dQ = jnp.einsum("...ts,...sd->...td", dS, K) * scale
        dK = jnp.einsum("...ts,...td->...sd", dS, Q) * scale
        return dQ, dK, dV


def mha_init(d_model: int, n_heads: int, seed: int = 0) -> Dict[str, jnp.ndarray]:
    """He-initialized projection weights, same draw order as the reference."""
    rng = np.random.default_rng(seed)
    hd = n_heads * (d_model // n_heads)
    return {
        "Wq": he_init(d_model, hd, rng),
        "Wk": he_init(d_model, hd, rng),
        "Wv": he_init(d_model, hd, rng),
        "Wo": he_init(hd, d_model, rng),
    }


def _split_heads(X, h: int):
    B, T, HD = X.shape
    return X.reshape(B, T, h, HD // h).transpose(0, 2, 1, 3)


def _combine_heads(H):
    B, h, T, d = H.shape
    return H.transpose(0, 2, 1, 3).reshape(B, T, h * d)


def _broadcast_mask(mask, B: int, h: int, T: int, T_kv: int):
    if mask is None:
        return None
    mb = jnp.asarray(mask)
    while mb.ndim < 4:
        mb = mb[None, ...]
    return jnp.broadcast_to(mb, (B, h, T, T_kv))


def mha_apply(params, X, mask=None, KV=None, *, n_heads: int, attn_fn=sdpa):
    """Pure multi-head attention: (B, T, D) -> (B, T, D).

    ``attn_fn`` lets callers swap the inner kernel (naive sdpa vs the Pallas
    flash kernel) behind the same interface.
    """
    X_kv = X if KV is None else KV
    B, T, _D = X.shape
    T_kv = X_kv.shape[1]
    Q = _split_heads(X @ params["Wq"], n_heads)
    K = _split_heads(X_kv @ params["Wk"], n_heads)
    V = _split_heads(X_kv @ params["Wv"], n_heads)
    mb = _broadcast_mask(mask, B, n_heads, T, T_kv)
    O = attn_fn(Q, K, V, mb)
    return _combine_heads(O) @ params["Wo"]


class MultiHeadAttention:
    """Stateful MHA with the reference's forward/backward/step contract."""

    def __init__(self, d_model: int, n_heads: int, seed: int = 0) -> None:
        assert d_model % n_heads == 0, "d_model must be divisible by n_heads"
        self.D = d_model
        self.h = n_heads
        self.d = d_model // n_heads
        params = mha_init(d_model, n_heads, seed)
        self.Wq, self.Wk, self.Wv, self.Wo = (
            params["Wq"], params["Wk"], params["Wv"], params["Wo"],
        )
        self.grads: Dict[str, jnp.ndarray] = {
            k: jnp.zeros_like(v) for k, v in params.items()
        }
        self.attn = ScaledDotProductAttention()
        self._pull = None
        self._is_cross = False

    # staticmethod helpers kept for API parity (attention.py:131-141)
    split_heads = staticmethod(lambda X, h: _split_heads(jnp.asarray(X), h))
    combine_heads = staticmethod(lambda H: _combine_heads(jnp.asarray(H)))

    def _params(self):
        return {"Wq": self.Wq, "Wk": self.Wk, "Wv": self.Wv, "Wo": self.Wo}

    def forward(self, X, mask=None, KV=None):
        X = jnp.asarray(X)
        self._is_cross = KV is not None
        h = self.h
        if KV is None:
            y, self._pull = jax.vjp(
                lambda p, x: mha_apply(p, x, mask=mask, n_heads=h),
                self._params(), X,
            )
        else:
            KV = jnp.asarray(KV)
            y, self._pull = jax.vjp(
                lambda p, x, kv: mha_apply(p, x, mask=mask, KV=kv, n_heads=h),
                self._params(), X, KV,
            )
        return y

    def backward(self, dY) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        outs = self._pull(jnp.asarray(dY, dtype=jnp.float32))
        if self._is_cross:
            dparams, dX, dKV = outs
        else:
            dparams, dX = outs
            dKV = None
        self.grads.update(dparams)
        return dX, dKV

    def step(self, lr: float = 1e-3, weight_decay: float = 0.0) -> None:
        for name in ("Wq", "Wk", "Wv", "Wo"):
            W = getattr(self, name)
            g = self.grads[name]
            if weight_decay != 0.0:
                g = g + weight_decay * W
            setattr(self, name, W - lr * g)
            self.grads[name] = jnp.zeros_like(W)


MHA = MultiHeadAttention
Attention = ScaledDotProductAttention
