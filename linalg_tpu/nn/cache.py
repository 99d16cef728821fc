"""KV caching for autoregressive decode.

Reference: /root/reference/ai_comps/cache.py:11-123 — ``KVCache`` /
``LayerKVCache`` / ``apply_kv_cache`` with the same shapes ((B, h, T, d)),
overflow error and reset semantics. The reference built these but never
wired them into a model; here the GPT sampler actually decodes through them.

Two forms:

- The stateful classes below (host-level, reference API parity): buffers are
  jnp arrays updated via ``lax.dynamic_update_slice``, ``update`` returns
  views truncated to the live length.
- A functional pytree form (``FKVCache`` helpers) for fully-jitted decode:
  the cache is a dict of fixed-shape arrays plus a traced ``length``; the
  attention mask handles truncation instead of dynamic shapes, so one
  compiled decode step serves every position.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "KVCache",
    "LayerKVCache",
    "apply_kv_cache",
    "fkv_init",
    "fkv_write",
    "fkv_write_slots",
    "fkv_update",
    "fkv_advance",
]


class KVCache:
    """KV cache for one attention layer; buffers shaped (B, h, max_T, d)."""

    def __init__(self, batch_size: int, n_heads: int, max_seq_len: int,
                 d_head: int, dtype=jnp.float32) -> None:
        self.batch_size = batch_size
        self.n_heads = n_heads
        self.max_seq_len = max_seq_len
        self.d_head = d_head
        self.dtype = dtype
        shape = (batch_size, n_heads, max_seq_len, d_head)
        self.k_cache = jnp.zeros(shape, dtype=dtype)
        self.v_cache = jnp.zeros(shape, dtype=dtype)
        self.seq_len = 0

    def update(self, k_new, v_new) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Append new K/V along the time axis; return the live prefix."""
        k_new = jnp.asarray(k_new)
        v_new = jnp.asarray(v_new)
        new_tokens = k_new.shape[2]
        new_len = self.seq_len + new_tokens
        if new_len > self.max_seq_len:
            raise ValueError(
                f"Cache overflow: {new_len} > max_seq_len {self.max_seq_len}"
            )
        at = (0, 0, self.seq_len, 0)
        self.k_cache = lax.dynamic_update_slice(self.k_cache, k_new, at)
        self.v_cache = lax.dynamic_update_slice(self.v_cache, v_new, at)
        self.seq_len = new_len
        return self.get()

    def get(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return (
            self.k_cache[:, :, : self.seq_len, :],
            self.v_cache[:, :, : self.seq_len, :],
        )

    def reset(self) -> None:
        self.seq_len = 0
        self.k_cache = jnp.zeros_like(self.k_cache)
        self.v_cache = jnp.zeros_like(self.v_cache)

    @property
    def is_empty(self) -> bool:
        return self.seq_len == 0


class LayerKVCache:
    """Per-layer list of KVCaches with shared length."""

    def __init__(self, n_layers: int, batch_size: int, n_heads: int,
                 max_seq_len: int, d_head: int, dtype=jnp.float32) -> None:
        self.n_layers = n_layers
        self.caches: List[KVCache] = [
            KVCache(batch_size, n_heads, max_seq_len, d_head, dtype)
            for _ in range(n_layers)
        ]

    def __getitem__(self, layer_idx: int) -> KVCache:
        return self.caches[layer_idx]

    def reset(self) -> None:
        for c in self.caches:
            c.reset()

    @property
    def seq_len(self) -> int:
        return self.caches[0].seq_len if self.caches else 0


def apply_kv_cache(k, v, cache: Optional[KVCache]):
    """None-cache passthrough helper (reference cache.py:115-123)."""
    if cache is None:
        return k, v
    return cache.update(k, v)


# ---------------------------------------------------------------------------
# functional (jit-safe) cache
# ---------------------------------------------------------------------------


def fkv_init(n_layers: int, batch: int, n_heads: int, max_seq_len: int,
             d_head: int, dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """Fixed-shape cache pytree: k/v (L, B, h, max_T, d) plus traced length."""
    shape = (n_layers, batch, n_heads, max_seq_len, d_head)
    return {
        "k": jnp.zeros(shape, dtype=dtype),
        "v": jnp.zeros(shape, dtype=dtype),
        "length": jnp.zeros((), dtype=jnp.int32),
    }


def fkv_write(k_buf, v_buf, length, k_new, v_new):
    """The one cache-write primitive: insert k_new/v_new (B, h, t, d) into
    fixed-shape buffers (B, h, max_T, d) at time offset ``length`` (traced).

    Used both by ``fkv_update`` and by the GPT's scanned decode step
    (models/gpt.py) so there is exactly one cache implementation.
    """
    zero = jnp.zeros((), dtype=jnp.asarray(length).dtype)
    at = (zero, zero, length, zero)
    return (
        lax.dynamic_update_slice(k_buf, k_new, at),
        lax.dynamic_update_slice(v_buf, v_new, at),
    )


def fkv_write_slots(k_buf, v_buf, pos, k_new, v_new):
    """Per-slot cache write: insert k_new/v_new (B, h, t, d) into fixed-shape
    buffers (B, h, max_T, d) at a DIFFERENT time offset per batch row
    (``pos`` is a traced (B,) int vector).

    This is the continuous-batching primitive: slots in a serving batch sit
    at independent sequence positions (requests join and leave the in-flight
    batch at different times), so the shared-scalar ``fkv_write`` cannot
    serve them.

    Two lowerings, same semantics (positions clamped to ``max_T - t`` as a
    vmapped ``dynamic_update_slice`` would clamp them):

    - t == 1 (the decode hot loop, executed once per layer per token): the
      buffer is viewed as (B*h*max_T, d) and the write is a SINGLE-
      leading-index row scatter — the vmapped-DUS form lowers to a
      (batch, time) double-index scatter around a full head axis, which
      TPU handles far worse.
    - t > 1 (prefill block-extends): batch-vmapped ``dynamic_update_slice``
      — a contiguous (h, t, d) block copy per slot beats a t-row scatter.
    """
    pos = jnp.asarray(pos, jnp.int32)
    B, h, max_T, d = k_buf.shape
    t = k_new.shape[2]
    # NOTE: LINALG_TPU_KV_WRITE is read at TRACE time — flipping it
    # mid-process needs jax.clear_caches() to take effect (the A/B tool
    # tools/ab_kv_write.py does exactly that between variants).
    if t == 1 and os.environ.get("LINALG_TPU_KV_WRITE") != "dus":
        # normalize exactly as the vmapped DUS below does (a raw negative
        # pos would scatter into the previous (b,h) row block and break
        # the unique/sorted index promises): one Python-style wrap for
        # negatives, then clamp to [0, max_T - 1]
        p = jnp.clip(jnp.where(pos < 0, pos + max_T, pos), 0, max_T - 1)
        ridx = ((jnp.arange(B)[:, None] * h + jnp.arange(h)[None, :]) * max_T
                + p[:, None]).reshape(-1)  # (B*h,)

        def put(buf, new):
            # (b, h) pairs are distinct and b-major => rows unique + sorted
            flat = buf.reshape(B * h * max_T, d)
            return flat.at[ridx].set(
                new[:, :, 0, :].reshape(-1, d), unique_indices=True,
                indices_are_sorted=True).reshape(buf.shape)

        return put(k_buf, k_new), put(v_buf, v_new)

    def one(buf, new, p):
        zero = jnp.zeros((), jnp.int32)
        return lax.dynamic_update_slice(buf, new, (zero, p, zero))

    return (
        jax.vmap(one)(k_buf, k_new, pos),
        jax.vmap(one)(v_buf, v_new, pos),
    )


def fkv_update(cache: Dict[str, jnp.ndarray], layer: int, k_new, v_new):
    """Write k_new/v_new (B, h, t, d) for one layer at the current length.

    Returns (cache', k_full, v_full) where k_full/v_full are the FULL
    fixed-shape buffers (B, h, max_T, d); attention must mask positions
    >= length + t. The global ``length`` is advanced separately with
    ``fkv_advance`` once all layers have written.
    """
    k, v = fkv_write(cache["k"][layer], cache["v"][layer], cache["length"],
                     k_new, v_new)
    cache = dict(cache, k=cache["k"].at[layer].set(k), v=cache["v"].at[layer].set(v))
    return cache, k, v


def fkv_advance(cache: Dict[str, jnp.ndarray], n_tokens) -> Dict[str, jnp.ndarray]:
    return dict(cache, length=cache["length"] + jnp.asarray(n_tokens, jnp.int32))
