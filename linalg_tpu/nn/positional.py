"""Positional encodings: sinusoidal, learned (GPT-2 style), RoPE.

Reference: /root/reference/ai_comps/positional.py:11-186. RoPE keeps the
``offset`` parameter for KV-cache decode (positional.py:121-135) — and here
it is actually wired into a model: ``GPTConfig(pos="rope")`` rotates Q/K in
``gpt_apply``/``gpt_prefill`` and at the live cache position in
``gpt_decode_step`` (models/gpt.py), the integration the reference built
but never used.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .functional import rope_rotate, sinusoidal_encoding

__all__ = [
    "sinusoidal_encoding",
    "LearnedPositionalEmbedding",
    "RotaryPositionalEmbedding",
    "alibi_slopes",
    "get_positional_encoding",
]


def alibi_slopes(n_heads: int) -> jnp.ndarray:
    """Per-head ALiBi slopes (Press et al., "Train Short, Test Long").

    Head h biases its attention scores by ``slope_h * (j - i)`` (non-
    positive under causality), replacing additive/rotary position signals
    entirely. Slopes form the paper's geometric sequence starting at
    2^(-8/n) for power-of-two head counts, with the published
    interleaving rule otherwise. The reference lists ALiBi as an unbuilt
    roadmap item (README.md:57-65); ``GPTConfig(pos="alibi")`` wires it
    through training, prefill, and cached decode.
    """
    import math

    def pow2_slopes(n: int):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start ** (i + 1) for i in range(n)]

    if n_heads < 1:
        raise ValueError("n_heads must be >= 1")
    if math.log2(n_heads).is_integer():
        s = pow2_slopes(n_heads)
    else:
        p = 2 ** int(math.floor(math.log2(n_heads)))
        s = pow2_slopes(p) + pow2_slopes(2 * p)[0::2][: n_heads - p]
    return jnp.asarray(s, jnp.float32)


class LearnedPositionalEmbedding:
    """Trainable position table, N(0, 0.02) init, grad accumulation + SGD."""

    def __init__(self, max_len: int, d_model: int, seed: int = 0) -> None:
        rng = np.random.default_rng(seed)
        self.max_len = max_len
        self.d_model = d_model
        self.W = jnp.asarray(
            rng.normal(0.0, 0.02, size=(max_len, d_model)), dtype=jnp.float32
        )
        self.gradW = jnp.zeros_like(self.W)
        self._seq_len = 0

    def forward(self, seq_len: int):
        assert seq_len <= self.max_len, (
            f"seq_len {seq_len} > max_len {self.max_len}"
        )
        self._seq_len = seq_len
        return self.W[:seq_len]

    def backward(self, dPE) -> None:
        dPE = jnp.asarray(dPE, dtype=self.W.dtype)
        if dPE.ndim == 3:  # (B, T, D): positions shared across the batch
            dPE = dPE.sum(axis=0)
        self.gradW = self.gradW.at[: self._seq_len].add(dPE)

    def step(self, lr: float = 1e-3, weight_decay: float = 0.0) -> None:
        g = self.gradW
        if weight_decay != 0.0:
            g = g + weight_decay * self.W
        self.W = self.W - lr * g
        self.gradW = jnp.zeros_like(self.W)


class RotaryPositionalEmbedding:
    """RoPE: rotates Q/K feature pairs by position-dependent angles."""

    def __init__(self, d_head: int, max_len: int = 4096, base: float = 10000.0):
        assert d_head % 2 == 0, "d_head must be even for RoPE"
        self.d_head = d_head
        self.max_len = max_len
        self.base = base
        inv_freq = 1.0 / (
            base ** (jnp.arange(0, d_head, 2, dtype=jnp.float32) / d_head)
        )
        self.inv_freq = inv_freq  # (d_head/2,)
        pos = jnp.arange(max_len, dtype=jnp.float32)[:, None]
        angles = pos * inv_freq[None, :]  # (max_len, d_head/2)
        self._cos_cache = jnp.cos(angles)
        self._sin_cache = jnp.sin(angles)

    def tables(self, seq_len: int, offset: int = 0):
        """cos/sin slices for positions [offset, offset+seq_len)."""
        return (
            self._cos_cache[offset : offset + seq_len],
            self._sin_cache[offset : offset + seq_len],
        )

    def forward(self, q, k, offset: int = 0) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Apply the rotation to Q and K (..., T, d_head)."""
        T = q.shape[-2]
        assert offset + T <= self.max_len, (
            "Sequence too long for precomputed cache"
        )
        cos, sin = self.tables(T, offset)
        return rope_rotate(q, cos, sin), rope_rotate(k, cos, sin)


def get_positional_encoding(name: str, max_len: int, d_model: int, **kwargs):
    """Factory: 'sinusoidal' -> array, 'learned'/'rope' -> objects."""
    if name == "sinusoidal":
        return sinusoidal_encoding(max_len, d_model, **kwargs)
    if name == "learned":
        return LearnedPositionalEmbedding(max_len, d_model, **kwargs)
    if name == "rope":
        return RotaryPositionalEmbedding(d_model, max_len, **kwargs)
    raise KeyError(f"Unknown positional encoding: {name}")
