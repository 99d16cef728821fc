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

import math
import os
from functools import partial
from typing import List

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.gpt import GPTConfig, _decode_chunk_core, _gqa_decode_attn

__all__ = ["init_paged_cache", "decode_chunk_paged", "PageAllocator",
           "paged_attn_pallas", "paged_attn_pallas_dma"]


def init_paged_cache(cfg: GPTConfig, n_slots: int, n_pages: int, page: int,
                     kv8: bool = False):
    """Zeroed paged cache pytree. ``ctx_len`` must divide by ``page``;
    page 0 is reserved as the trash page (see module docstring).

    ``kv8=True`` stores the pools int8 with a PER-ROW f32 scale (each
    cached row quantized once, at write time, against its own max-abs —
    the ``models.quant`` int8-KV scheme): pool bytes roughly halve vs
    bf16 (quarter vs f32), so the same HBM holds ~2x the pages. Pools
    become {"q": int8 (..., page, d), "s": f32 (..., page, 1)} dicts."""
    if cfg.ctx_len % page:
        raise ValueError(f"page size {page} must divide ctx_len "
                         f"{cfg.ctx_len}")
    if n_pages < 2:
        raise ValueError("need at least 2 pages (page 0 is the trash page)")
    dt = cfg.compute_dtype
    shape = (cfg.n_layers, n_pages, cfg.kv_heads, page, cfg.d_head)
    if kv8:
        def pool():
            return {"q": jnp.zeros(shape, jnp.int8),
                    "s": jnp.zeros(shape[:-1] + (1,), jnp.float32)}
    else:
        def pool():
            return jnp.zeros(shape, dt)
    return {
        "pool_k": pool(),
        "pool_v": pool(),
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
    the same values). int8-KV pools quantize each row once here (the same
    per-row rule decode writes use, so layout equality vs a dense int8-KV
    cache is exact)."""
    if isinstance(cache["pool_k"], dict):
        from ..models.quant import _kv_row_quantize

        page = cache["pool_k"]["q"].shape[3]

        def put(pool, slot):
            q, s = _kv_row_quantize(slot)
            return {"q": pool["q"].at[:, page_ids].set(_pages_of(q, page)),
                    "s": pool["s"].at[:, page_ids].set(_pages_of(s, page))}

        return dict(cache, pool_k=put(cache["pool_k"], slot_k),
                    pool_v=put(cache["pool_v"], slot_v))
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


@jax.jit
def _gather_prefix_pages(cache, page_ids):
    """Inverse of ``_scatter_pages``: materialize the pool pages at
    ``page_ids`` ((ctx/page,) int32; tail entries 0 = trash) as dense
    (L, 1, hk, ctx, d) prefix KV buffers, ready for the block-extend
    forward. The engine's automatic page cache admits a request whose
    prompt starts with already-pooled pages by gathering them here and
    extending only the uncached tail — rows past the cached length come
    from the trash page (garbage) and are masked by the extend's
    causal/position discipline exactly as a dense prefix buffer's
    unwritten tail is. Full-precision pools only (a kv8 gather would
    dequantize, and the re-derived suffix would drift off the cold
    path's exact tokens — the engine rejects the combination)."""
    def get(pool):  # (L, n_pages, hk, page, d) -> (L, 1, hk, ctx, d)
        x = pool[:, page_ids]  # (L, P, hk, page, d)
        L, P, hk, pg, d = x.shape
        return jnp.swapaxes(x, 1, 2).reshape(L, hk, P * pg, d)[:, None]

    return get(cache["pool_k"]), get(cache["pool_v"])


# ---------------------------------------------------------------------------
# Pallas paged attention: read pages IN PLACE via scalar-prefetch block maps
# ---------------------------------------------------------------------------

_NEG = float(jnp.finfo(jnp.float32).min) / 2


def _interpret() -> bool:
    # PrefetchScalarGridSpec ignores force_tpu_interpret_mode; pick
    # interpret explicitly off-TPU (the CPU test backend), as the other
    # Pallas kernels in this repo do (nn/flash_stream.py).
    return jax.default_backend() != "tpu"


def _paged_attn_kernel(tbl_ref, pos_ref, q_ref, k_ref, v_ref, m_ref, o_ref,
                       m_s, l_s, acc_s, *, scale, page):
    """Online-softmax decode attention over one slot's logical pages.

    Grid (B, hk, ctx/page): program (b, h, i) sees logical page i of slot
    b through the k/v BlockSpec index maps, which read the PREFETCHED
    page table — the pool page streams HBM->VMEM directly, so paged
    decode does the same attention HBM traffic as the dense slot layout
    (the XLA table-gather path instead materializes the full gathered KV
    per step: read + write + re-read, measured 0.61x slot throughput).
    The additive mask carries validity (-1e9 beyond pos) and any ALiBi
    bias, so trash-page garbage never contributes.
    """
    b = pl.program_id(0)
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        m_s[:] = jnp.full_like(m_s, _NEG)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)

    @pl.when(i * page <= pos_ref[b])
    def _():
        # pages past the slot's position hold only masked rows — skip
        # their matmuls (the pipeline still prefetches the block; the
        # DMA variant below also skips the copy)
        q = q_ref[0, 0]  # (gp, d) query group (padded to >= 8 sublanes)
        k = k_ref[0, 0]  # (page, d) pool page, in place
        v = v_ref[0, 0]
        s = scale * lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (gp, page)
        s = s + m_ref[0, 0, 0].astype(jnp.float32)
        m_prev = m_s[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_s[:] = l_s[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_s[:] = acc_s[:] * alpha + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        m_s[:] = m_new

    @pl.when(i == pl.num_programs(2) - 1)
    def _():
        denom = jnp.where(l_s[:] == 0, 1.0, l_s[:])
        o_ref[0, 0] = (acc_s[:] / denom).astype(o_ref.dtype)


def paged_attn_pallas(q, pool_k, pool_v, mask, table, pos):
    """Decode attention against the page pool, pages read in place.

    ``q``: (B, H, 1, d); ``pool_k``/``pool_v``: (n_pages, hk, page, d)
    with hk | H (GQA); ``mask``: (B, 1|H, 1, ctx) additive; ``table``:
    (B, ctx/page) int32; ``pos``: (B,) int32 slot positions (pages past
    a slot's position skip their compute). Returns (B, H, 1, d). The
    query group of each KV head rides as the block's sublane dim (padded
    to 8); grouped K/V stream at their hk size — the GQA traffic win is
    preserved.
    """
    B, H, _, d = q.shape
    n_pages, hk, page, _ = pool_k.shape
    g = H // hk
    Pmax = table.shape[1]
    ctx = Pmax * page
    gp = max(8, g)  # sublane-pad the query group
    qg = q.reshape(B, hk, g, d)
    if gp != g:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, gp - g), (0, 0)))
    m = jnp.broadcast_to(mask, (B, H, 1, ctx)).reshape(B, hk, g, ctx)
    if gp != g:  # padded rows reuse row 0's mask; their outputs are cut
        m = jnp.pad(m, ((0, 0), (0, 0), (0, gp - g), (0, 0)), mode="edge")
    # page-major mask layout: Mosaic requires a block's last two dims to
    # tile (8, 128)-divisibly OR cover the array, so the page axis must
    # not sit last when page < 128 — (B, hk, Pmax, gp, page) blocks cover
    # the trailing (gp, page) exactly for any page size
    m = m.reshape(B, hk, gp, Pmax, page).transpose(0, 1, 3, 2, 4)

    kspec = pl.BlockSpec((1, 1, page, d),
                         lambda b, h, i, tbl, ps: (tbl[b, i], h, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, hk, Pmax),
        in_specs=[
            pl.BlockSpec((1, 1, gp, d),
                         lambda b, h, i, tbl, ps: (b, h, 0, 0)),
            kspec,
            kspec,
            pl.BlockSpec((1, 1, 1, gp, page),
                         lambda b, h, i, tbl, ps: (b, h, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, gp, d),
                               lambda b, h, i, tbl, ps: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((gp, 1), jnp.float32),
            pltpu.VMEM((gp, 1), jnp.float32),
            pltpu.VMEM((gp, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        partial(_paged_attn_kernel, scale=1.0 / math.sqrt(d), page=page),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, hk, gp, d), q.dtype),
        interpret=_interpret(),
    )(table, jnp.asarray(pos, jnp.int32), qg, pool_k, pool_v, m)
    return out[:, :, :g].reshape(B, H, 1, d)


def _paged_attn_dma_kernel(tbl_ref, pos_ref, q_ref, k_hbm, v_hbm, m_ref,
                           o_ref, kscr, vscr, sems, *, scale,
                           n_pages_logical, hk, page, depth, fold):
    """Manual-DMA variant: one program per slot, deep-pipelined page DMAs.

    Two lessons from the chip drove this shape (BASELINE.md round 4):
    the auto-pipelined (B, hk, ctx/page) grid runs ~3.5x the HBM floor —
    its 2-deep lookahead cannot hide the ~1 us DMA latency of 64 KB page
    blocks whose bandwidth time is ~100 ns — and per-(head) DMAs are
    needlessly small, since a pool page's hk heads are CONTIGUOUS in the
    flattened (n_pages, hk*page, d) layout. So: grid (B,), ONE DMA per
    logical page covering all heads, ``depth`` copies in flight (issue
    i+depth-1 before computing on i), per-head online softmax inside the
    page loop (the head loop is static).

    The page walk stops at the slot's POSITION: pages past
    ceil((pos+1)/page) hold only masked rows, so they are neither copied
    nor computed. This is the structural advantage over both the XLA
    table-gather AND the dense slot layout, whose fixed-shape attention
    always touches all ctx rows — a half-full slot costs half the
    traffic here, and serving slots are partially full almost always.
    """
    b = pl.program_id(0)
    gp = q_ref.shape[2]
    d = q_ref.shape[3]
    f = fold  # rows folded per DMA lane row (f*d == lane width >= 128)
    rows = page // f  # folded rows per head per page
    # pages that can hold live rows for this slot (mask handles the
    # partial tail); idle slots' pos grows unbounded — clamp to the table
    n_live = jnp.minimum(pos_ref[b] // page + 1, n_pages_logical)

    def dma(slot, i, which):
        src, dst = ((k_hbm, kscr) if which == 0 else (v_hbm, vscr))
        return pltpu.make_async_copy(
            src.at[tbl_ref[b, i]], dst.at[slot], sems.at[slot, which])

    # prime the pipeline: depth-1 pages in flight before the loop
    for j in range(depth - 1):
        @pl.when(j < n_live)
        def _():
            dma(j % depth, j, 0).start()
            dma(j % depth, j, 1).start()

    def body(i, carry):
        @pl.when(i + depth - 1 < n_live)
        def _():
            dma((i + depth - 1) % depth, i + depth - 1, 0).start()
            dma((i + depth - 1) % depth, i + depth - 1, 1).start()

        slot = i % depth
        dma(slot, i, 0).wait()
        dma(slot, i, 1).wait()
        kall = kscr[slot]  # (hk*page/f, f*d): f keys folded per lane row
        vall = vscr[slot]
        out = []
        for h in range(hk):  # static head loop: static scratch slices
            m_prev, l_prev, accs = carry[h]
            k = kall[h * rows:(h + 1) * rows]  # (rows, f*d)
            v = vall[h * rows:(h + 1) * rows]
            q = q_ref[0, h]  # (gp, d)
            # per fold residue j: keys t = r*f + j live in lane segment
            # [j*d, (j+1)*d) of folded row r — a zero-padded query picks
            # the segment out of the full-width contraction (no lane
            # slicing; f=1 degenerates to the plain kernel)
            mh = m_ref[0, h, i].astype(jnp.float32)  # (gp, f, rows)
            ss = []
            for j in range(f):
                qj = (q if f == 1 else
                      jnp.pad(q, ((0, 0), (j * d, (f - 1 - j) * d))))
                s_j = scale * lax.dot_general(
                    qj, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (gp, rows)
                ss.append(s_j + mh[:, j])
            m_new = m_prev
            for s_j in ss:
                m_new = jnp.maximum(m_new,
                                    jnp.max(s_j, axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            l_new = l_prev * alpha
            new_accs = []
            for s_j, acc in zip(ss, accs):
                p = jnp.exp(s_j - m_new)
                l_new = l_new + jnp.sum(p, axis=-1, keepdims=True)
                new_accs.append(acc * alpha + jnp.dot(
                    p.astype(v.dtype), v,
                    preferred_element_type=jnp.float32))  # (gp, f*d)
            out.append((m_new, l_new, tuple(new_accs)))
        return tuple(out)

    init = tuple((jnp.full((gp, 1), _NEG, jnp.float32),
                  jnp.zeros((gp, 1), jnp.float32),
                  tuple(jnp.zeros((gp, f * d), jnp.float32)
                        for _ in range(f)))
                 for _ in range(hk))
    final = lax.fori_loop(0, n_live, body, init)
    for h in range(hk):
        _, l_f, accs = final[h]
        denom = jnp.where(l_f == 0, 1.0, l_f)
        # residue j's real output lives in its own lane segment (the
        # other segments paired p_j with the WRONG keys' values): one
        # static lane slice per residue, once per kernel
        acc = accs[0][:, :d]
        for j in range(1, f):
            acc = acc + accs[j][:, j * d:(j + 1) * d]
        o_ref[0, h] = (acc / denom).astype(o_ref.dtype)


def paged_attn_pallas_dma(q, pool_k, pool_v, mask, table, pos,
                          depth: int = 8):
    """Manual-DMA twin of ``paged_attn_pallas`` (same contract, plus the
    per-slot positions ``pos`` (B,) that bound each slot's page walk).

    Mosaic lane-pads trailing dims narrower than 128 in HBM memrefs and
    then rejects the sliced DMA, so narrow heads FOLD ``f = 128 / d``
    consecutive KV rows into one 128-lane row — a zero-copy reshape of
    the flattened (n_pages, hk*page, d) pool. In-kernel, residue j's
    scores come from a zero-padded query contracted over the full folded
    width (segment j picks its keys; no lane slicing until the final
    per-head extract). Requires 128 % d_head == 0 and f | page; other
    shapes fall to the grid kernel.
    """
    B, H, _, d = q.shape
    n_pages, hk, page, _ = pool_k.shape
    f = max(1, 128 // d) if d < 128 else 1
    if (d * f) % 128 or page % f:
        raise ValueError(
            f"paged_attn_pallas_dma needs d_head dividing 128 with the "
            f"fold factor dividing the page (d_head={d}, page={page})")
    g = H // hk
    Pmax = table.shape[1]
    ctx = Pmax * page
    gp = max(8, g)
    depth = max(2, min(depth, Pmax))
    rows = page // f
    qg = q.reshape(B, hk, g, d)
    if gp != g:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, gp - g), (0, 0)))
    m = jnp.broadcast_to(mask, (B, H, 1, ctx)).reshape(B, hk, g, ctx)
    if gp != g:
        m = jnp.pad(m, ((0, 0), (0, 0), (0, gp - g), (0, 0)), mode="edge")
    # page-major, fold-residue-major mask: key t = r*f + j of page i sits
    # at m[..., i, :, j, r] (the kernel reads (gp, f, rows) per page)
    m = m.reshape(B, hk, gp, Pmax, rows, f).transpose(0, 1, 3, 2, 5, 4)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, hk, gp, d), lambda b, tbl, ps: (b, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, hk, Pmax, gp, f, rows),
                         lambda b, tbl, ps: (b, 0, 0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hk, gp, d),
                               lambda b, tbl, ps: (b, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((depth, hk * rows, f * d), pool_k.dtype),
            pltpu.VMEM((depth, hk * rows, f * d), pool_v.dtype),
            pltpu.SemaphoreType.DMA((depth, 2)),
        ],
    )
    out = pl.pallas_call(
        partial(_paged_attn_dma_kernel, scale=1.0 / math.sqrt(d),
                n_pages_logical=Pmax, hk=hk, page=page, depth=depth,
                fold=f),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, hk, gp, d), q.dtype),
        interpret=_interpret(),
    )(table, jnp.asarray(pos, jnp.int32), qg,
      pool_k.reshape(n_pages, hk * rows, f * d),
      pool_v.reshape(n_pages, hk * rows, f * d), m)
    return out[:, :, :g].reshape(B, H, 1, d)


@partial(jax.jit, static_argnames=("cfg", "n_tokens", "use_kernel"))
def decode_chunk_paged(params, cache, logits, key, temp, top_p, top_k,
                       cfg: GPTConfig, n_tokens: int,
                       use_kernel: bool = False):
    """Paged twin of ``engine.decode_chunk_slots``: same scan, same
    sampling, but K/V live in the page pool and are addressed through the
    per-slot table (loop-invariant within a chunk — admission allocates
    every page the chunk can reach up front).

    ``use_kernel`` switches the attention read from the XLA table-gather
    (materializes the gathered KV per step — exact twin of the slot
    path's values, but ~3x its attention HBM traffic) to the Pallas
    kernel reading pages in place (``paged_attn_pallas``, slot-level
    traffic; numerics differ from the einsum at float rounding only).

    Composes with the other weight representations through the shared
    ``select_decode_ops`` seam: MoE is excluded (routing groups are fine,
    but the engine keeps MoE on the slot cache), int8 weight-only and the
    per-slot LoRA side-path just work (neither touches the KV layout).
    int8-KV pools (``init_paged_cache(kv8=True)``) dequantize inside the
    gather read; the Pallas kernels read plain pools only."""
    from .engine import select_decode_ops

    ops = select_decode_ops(params, cfg, cache)
    table = cache["table"]  # (B, Pmax)
    B = table.shape[0]
    kv8 = isinstance(cache["pool_k"], dict)
    page = (cache["pool_k"]["q"] if kv8 else cache["pool_k"]).shape[3]
    ctx = cfg.ctx_len
    bidx = jnp.arange(B)
    dt = cfg.compute_dtype
    temp = jnp.asarray(temp, jnp.float32)[:, None]
    top_p = jnp.asarray(top_p, jnp.float32)[:, None]
    top_k = jnp.asarray(top_k, jnp.int32)

    def gathered(pool):  # (n_pages, hk, page, d) -> (B, hk, ctx, d)
        if isinstance(pool, dict):  # int8 rows * per-row scale, fused
            q, s = pool["q"][table], pool["s"][table]
            x = (q.astype(jnp.float32) * s).astype(dt)
        else:
            x = pool[table]  # (B, Pmax, hk, page, d)
        x = jnp.swapaxes(x, 1, 2)
        return x.reshape(B, x.shape[1], ctx, x.shape[-1])

    if use_kernel and kv8:
        raise ValueError("the Pallas paged kernels read plain pools; "
                         "kv8 uses the gather path")
    if use_kernel:
        # the deep-pipelined manual-DMA kernel saturates HBM; narrow
        # heads (d_head dividing 128) ride it via row folding, the
        # auto-pipelined grid kernel covers every other shape
        d = cfg.d_head
        dma_ok = (d % 128 == 0
                  or (d < 128 and 128 % d == 0 and page % (128 // d) == 0))
        kern = paged_attn_pallas_dma if dma_ok else paged_attn_pallas

        def paged_attn(q, pk_l, pv_l, mask, pos):
            return kern(q, pk_l, pv_l, mask, table, pos)

        paged_attn.wants_pos = True  # page walk stops at the position
    else:
        def paged_attn(q, pk_l, pv_l, mask):
            return _gqa_decode_attn(q, gathered(pk_l), gathered(pv_l), mask)

    def write_paged(pk_l, pv_l, pos, k, v):
        # k/v: (B, hk, 1, d) new token; the clamp keeps idle slots (whose
        # table rows are all trash) writing in range, as in slot mode.
        # The pool is flattened to (n_pages*hk*page, d) so the write is a
        # SINGLE-leading-index row scatter — the natural (page, row)
        # double-index scatter (index dims 0 and 2 around a full hk axis)
        # lowers far worse on TPU. Duplicate targets only occur between
        # idle slots colliding on the trash page, where either garbage
        # value is fine (same as the double-index form).
        p = jnp.minimum(pos, ctx - 1)
        pidx = table[bidx, p // page]
        row = p % page
        # trace-time gate: flipping LINALG_TPU_KV_WRITE mid-process needs
        # jax.clear_caches() (see tools/ab_kv_write.py); equivalence of the
        # two lowerings is pinned by tests/test_paged.py.
        if os.environ.get("LINALG_TPU_KV_WRITE") == "dus":
            return (pk_l.at[pidx, :, row, :].set(k[:, :, 0, :]),
                    pv_l.at[pidx, :, row, :].set(v[:, :, 0, :]))
        n_pg, hk, pg, d = pk_l.shape
        ridx = ((pidx[:, None] * hk + jnp.arange(hk)[None, :]) * pg
                + row[:, None]).reshape(-1)  # (B*hk,)

        def put(buf, new):
            flat = buf.reshape(n_pg * hk * pg, d)
            return flat.at[ridx].set(
                new[:, :, 0, :].reshape(-1, d)).reshape(buf.shape)

        return put(pk_l, k), put(pv_l, v)

    if kv8:
        from ..models.quant import _kv_row_quantize

        plain_write = write_paged

        def write_paged(pk_l, pv_l, pos, k, v):  # noqa: F811
            kq, ks = _kv_row_quantize(k)
            vq, vs = _kv_row_quantize(v)
            q_k, q_v = plain_write(pk_l["q"], pv_l["q"], pos, kq, vq)
            s_k, s_v = plain_write(pk_l["s"], pv_l["s"], pos, ks, vs)
            return ({"q": q_k, "s": s_k}, {"q": q_v, "s": s_v})

    ops = dict(ops, attn=paged_attn)
    toks, logits, pk, pv, pos = _decode_chunk_core(
        cfg, ops, logits, cache["pool_k"], cache["pool_v"], cache["pos"],
        jnp.zeros((), jnp.int32), key, n_tokens, temp, top_k, top_p,
        write_paged)
    return toks, logits, dict(cache, pool_k=pk, pool_v=pv, pos=pos)
