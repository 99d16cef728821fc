"""Paged KV cache for the serving engine (vLLM-style block tables).

The slot engine (``serve.engine``) reserves ``ctx_len`` KV rows per slot
— a request generating 40 tokens from a 20-token prompt holds the same
HBM as one filling the whole context. Paged mode replaces the per-slot
buffers with a POOL of fixed-size pages plus a per-slot page table:

- ``pool_k``/``pool_v``: (L, n_pages, kv_heads, page, d_head) — the only
  large allocation; its size is chosen by the operator, independent of
  ``n_slots * ctx_len``.
- ``table``: (n_slots, ctx_len/page) int32 — slot s's logical rows
  [i*page, (i+1)*page) live in pool page ``table[s, i]``.
- Page 0 is the TRASH page: idle slots keep decoding (fixed-shape scan,
  no recompiles) and their writes land there; retired slots' table rows
  reset to 0 so a freed page can be reused immediately without waiting
  for the slot to be re-admitted.

Admission reserves ceil((prompt + decode budget)/page) pages from a
host-side free list and queues the request when the pool is full —
admission control by actual memory, not by slot count. All device
computations keep ONE fixed shape (the gather view is always
ctx_len rows), so paged mode compiles exactly as often as slot mode.

The decode step plugs into ``models.gpt._decode_chunk_core`` through its
two seams: ``write_fn`` scatters each new token's K/V at (page, row) =
(table[s, pos/page], pos%page), and ``ops["attn"]`` gathers the slot's
pages into the (B, kv_heads, ctx, d) view the GQA decode attention
already consumes. XLA fuses the gather with the attention reads; the
values and masks are identical to slot mode, so outputs are pinned
EQUAL (tests/test_paged.py).

Reference: extends /root/reference/gpt.py:518-546's sampler semantics
(as engine.py does); the paging itself has no reference counterpart.
"""

from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp
from jax import lax

from ..models.gpt import GPTConfig, _decode_chunk_core, _gqa_decode_attn

__all__ = ["init_paged_cache", "decode_chunk_paged", "PageAllocator"]


def init_paged_cache(cfg: GPTConfig, n_slots: int, n_pages: int, page: int):
    """Zeroed paged cache pytree. ``ctx_len`` must divide by ``page``;
    page 0 is reserved as the trash page (see module docstring)."""
    if cfg.ctx_len % page:
        raise ValueError(f"page size {page} must divide ctx_len "
                         f"{cfg.ctx_len}")
    if n_pages < 2:
        raise ValueError("need at least 2 pages (page 0 is the trash page)")
    dt = cfg.compute_dtype
    shape = (cfg.n_layers, n_pages, cfg.kv_heads, page, cfg.d_head)
    return {
        "pool_k": jnp.zeros(shape, dt),
        "pool_v": jnp.zeros(shape, dt),
        "table": jnp.zeros((n_slots, cfg.ctx_len // page), jnp.int32),
        "pos": jnp.zeros((n_slots,), jnp.int32),
    }


class PageAllocator:
    """Host-side free list over pages 1..n_pages-1 (0 = trash)."""

    def __init__(self, n_pages: int):
        self.n_pages = n_pages
        self._free: List[int] = list(range(n_pages - 1, 0, -1))

    @property
    def n_free(self) -> int:
        return len(self._free)

    def alloc(self, n: int) -> List[int]:
        """Take ``n`` pages or raise MemoryError (caller checks n_free)."""
        if n > len(self._free):
            raise MemoryError(f"need {n} pages, {len(self._free)} free")
        taken, self._free = self._free[-n:], self._free[:-n]
        return list(reversed(taken))

    def release(self, pages: List[int]) -> None:
        for p in pages:
            assert 0 < p < self.n_pages
        self._free.extend(pages)


def _pages_of(x, page: int):
    """(L, 1, hk, ctx, d) prefill buffer -> (L, ctx/page, hk, page, d)."""
    L, _, hk, ctx, d = x.shape
    return jnp.swapaxes(x[:, 0].reshape(L, hk, ctx // page, page, d), 1, 2)


@jax.jit
def _scatter_pages(cache, slot_k, slot_v, page_ids):
    """Write a prefilled sequence's pages into the pool at ``page_ids``
    ((ctx/page,) int32). Entries pointing at page 0 dump their rows into
    the trash page — used both for unreserved tails and for SHARED prefix
    pages an admission must not rewrite (their pool contents are already
    the same values)."""
    page = cache["pool_k"].shape[3]
    return dict(
        cache,
        pool_k=cache["pool_k"].at[:, page_ids].set(_pages_of(slot_k, page)),
        pool_v=cache["pool_v"].at[:, page_ids].set(_pages_of(slot_v, page)),
    )


@jax.jit
def _point_slot(cache, logits, plen, slot_logits, b, table_ids):
    """Point slot ``b``'s table row at ``table_ids``, reset its position
    to ``plen`` and its logits row."""
    z = jnp.zeros((), jnp.int32)
    b = jnp.asarray(b, jnp.int32)
    table = lax.dynamic_update_slice(cache["table"], table_ids[None],
                                     (b, z))
    pos = lax.dynamic_update_slice(
        cache["pos"], jnp.asarray(plen, jnp.int32)[None], (b,))
    logits = lax.dynamic_update_slice(logits, slot_logits, (b, z))
    return dict(cache, table=table, pos=pos), logits


def _admit_slot_paged(cache, logits, slot_k, slot_v, plen, slot_logits, b,
                      scatter_ids, table_ids, cfg: GPTConfig):
    """Scatter one prefilled sequence (L, 1, hk, ctx, d) into the pool and
    point slot ``b`` at it. ``scatter_ids`` says where each page's DATA is
    written (trash for shared prefix pages and unreserved tails);
    ``table_ids`` says where the slot READS each logical page (the true
    shared ids). Without prefix sharing the two are identical."""
    del cfg
    cache = _scatter_pages(cache, slot_k, slot_v, scatter_ids)
    return _point_slot(cache, logits, plen, slot_logits, b, table_ids)


@jax.jit
def _reset_table_row(cache, b):
    """Retire slot ``b``: its logical rows all point at the trash page, so
    the freed pages can be reused while the slot idles."""
    row = jnp.zeros((1, cache["table"].shape[1]), jnp.int32)
    table = lax.dynamic_update_slice(
        cache["table"], row, (jnp.asarray(b, jnp.int32),
                              jnp.zeros((), jnp.int32)))
    return dict(cache, table=table)


@partial(jax.jit, static_argnames=("cfg", "n_tokens"))
def decode_chunk_paged(params, cache, logits, key, temp, top_p, top_k,
                       cfg: GPTConfig, n_tokens: int):
    """Paged twin of ``engine.decode_chunk_slots``: same scan, same
    sampling, but K/V live in the page pool and are addressed through the
    per-slot table (loop-invariant within a chunk — admission allocates
    every page the chunk can reach up front)."""
    from ..models.gpt import _dt_decode_ops

    ops = _dt_decode_ops(params, cfg)
    table = cache["table"]  # (B, Pmax)
    B = table.shape[0]
    page = cache["pool_k"].shape[3]
    ctx = cfg.ctx_len
    bidx = jnp.arange(B)
    temp = jnp.asarray(temp, jnp.float32)[:, None]
    top_p = jnp.asarray(top_p, jnp.float32)[:, None]
    top_k = jnp.asarray(top_k, jnp.int32)

    def gathered(pool):  # (n_pages, hk, page, d) -> (B, hk, ctx, d)
        x = pool[table]  # (B, Pmax, hk, page, d)
        x = jnp.swapaxes(x, 1, 2)
        return x.reshape(B, x.shape[1], ctx, x.shape[-1])

    def paged_attn(q, pk_l, pv_l, mask):
        return _gqa_decode_attn(q, gathered(pk_l), gathered(pv_l), mask)

    def write_paged(pk_l, pv_l, pos, k, v):
        # k/v: (B, hk, 1, d) new token; the clamp keeps idle slots (whose
        # table rows are all trash) writing in range, as in slot mode
        p = jnp.minimum(pos, ctx - 1)
        pidx = table[bidx, p // page]
        row = p % page
        return (pk_l.at[pidx, :, row, :].set(k[:, :, 0, :]),
                pv_l.at[pidx, :, row, :].set(v[:, :, 0, :]))

    ops = dict(ops, attn=paged_attn)
    toks, logits, pk, pv, pos = _decode_chunk_core(
        cfg, ops, logits, cache["pool_k"], cache["pool_v"], cache["pos"],
        jnp.zeros((), jnp.int32), key, n_tokens, temp, top_k, top_p,
        write_paged)
    return toks, logits, dict(cache, pool_k=pk, pool_v=pv, pos=pos)
