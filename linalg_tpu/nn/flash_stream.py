"""Streaming flash attention: online softmax over a key-block grid.

The canonical TPU flash kernel: the grid walks (query-block, key-block)
pairs while VMEM scratch carries the running row-max ``m``, normalizer
``l`` and output accumulator — so VMEM holds only (BQ, d) + (BK, d) blocks
and the (BQ, BK) score tile, independent of sequence length. Pallas streams
the K/V blocks HBM->VMEM via the BlockSpec pipeline (double-buffered by the
Mosaic scheduler); O and the logsumexp L are written on each row's final
key step.

Causal runs on a COMPRESSED grid: the (i, j) block pairs are enumerated
host-side (only j*BK <= i*BQ+BQ-1 survive) and fed through scalar-prefetch
index maps, so fully-masked blocks are never fetched or computed — ~2x
fewer programs than the rectangular grid with @pl.when skips.

This removes the T <= 8192 VMEM ceiling of ``nn.flash_long``. The backward
is a pair of streaming Pallas kernels on the same compressed grids (dk/dv
accumulate over query blocks in key-major order; dq accumulates over key
blocks), recomputing P strips from (q, k, L) — O(block) VMEM, no stored
probabilities. ``_vjp_bwd_xla`` keeps the chunked XLA recomputation as a
differential-test oracle.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention_stream"]

_NEG = -1e30


def _block(T: int) -> int:
    """Largest block size dividing T, capped at 512.

    Bigger blocks amortize per-program launch/prefetch overhead: at
    T=8192 fwd+bwd runs ~2x faster with 512-blocks than 256-blocks
    (repeated runs through the tunnel put 256 at ~7-10 ms and 512 at
    ~4-5.5 ms, f32 and bf16 alike). 1024 measures on par with 512 but
    occasionally hits a several-x Mosaic slow path for bf16 inputs, so
    512 is the cap. 256 remains the floor so any T % 256 == 0 works.
    """
    for b in (512, 256):
        if T % b == 0:
            return b
    raise ValueError(f"T={T} must be a multiple of 256")


def _interpret() -> bool:
    # PrefetchScalarGridSpec does not honor force_tpu_interpret_mode; pick
    # interpret explicitly off-TPU (tests run on the CPU backend).
    return jax.default_backend() != "tpu"


def _pairs(nq: int, nk: int, causal: bool, kmajor: bool,
           bq: int, bk: int, window=None):
    """(i, j, first, last) arrays for the compressed block-pair grid.

    first/last flag the initial/final visit of the ACCUMULATED index (the
    q block for q-major orders, the k block for k-major), so kernels reset
    and flush scratch on them.

    ``window`` (sliding-window attention) additionally drops block pairs
    entirely BEHIND the band: key block j is dead for query block i when
    its last key j*bk+bk-1 < (i*bq) - (window-1), the oldest key the
    block's first query may see. At T=4096/window=512 this cuts the
    causal grid's ~T^2/2 block area to ~T*window — the whole point of
    windowed long-context training.
    """

    def live(i, j):
        if causal and j * bk > i * bq + bq - 1:
            return False  # entirely in the future
        if window is not None and j * bk + bk - 1 < i * bq - (window - 1):
            return False  # entirely behind the band
        return True

    if kmajor:
        ps = [(i, j) for j in range(nk) for i in range(nq) if live(i, j)]
        first = [p == 0 or ps[p][1] != ps[p - 1][1] for p in range(len(ps))]
        last = [p == len(ps) - 1 or ps[p][1] != ps[p + 1][1]
                for p in range(len(ps))]
    else:
        ps = [(i, j) for i in range(nq) for j in range(nk) if live(i, j)]
        first = [p == 0 or ps[p][0] != ps[p - 1][0] for p in range(len(ps))]
        last = [p == len(ps) - 1 or ps[p][0] != ps[p + 1][0]
                for p in range(len(ps))]
    to = lambda xs: jnp.asarray(xs, jnp.int32)
    return (to([p[0] for p in ps]), to([p[1] for p in ps]),
            to(first), to(last))


def _band_mask(s, qi, ki, BQ, BK, causal, window):
    """Apply causal and/or sliding-window bans to a (BQ, BK) score tile
    at block coordinates (qi, ki)."""
    if not causal and window is None:
        return s
    rows = lax.broadcasted_iota(jnp.int32, (BQ, BK), 0) + qi * BQ
    cols = lax.broadcasted_iota(jnp.int32, (BQ, BK), 1) + ki * BK
    if causal:
        s = jnp.where(cols <= rows, s, _NEG)
    if window is not None:
        s = jnp.where(cols > rows - window, s, _NEG)
    return s


def _fwd_kernel(i_ref, j_ref, f_ref, l_ref_flags, q_ref, k_ref, v_ref,
                o_ref, l_ref, m_s, l_s, acc_s, *, scale, causal, window):
    p = pl.program_id(1)
    qi = i_ref[p]
    ki = j_ref[p]

    @pl.when(f_ref[p] == 1)
    def _():
        m_s[:] = jnp.full_like(m_s, _NEG)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)

    q = q_ref[0]  # (BQ, d)
    k = k_ref[0]  # (BK, d)
    v = v_ref[0]
    BQ, BK = q.shape[0], k.shape[0]

    s = scale * lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, BK)
    s = _band_mask(s, qi, ki, BQ, BK, causal, window)
    m_prev = m_s[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    pmat = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_s[:] = l_s[:] * alpha + jnp.sum(pmat, axis=-1, keepdims=True)
    acc_s[:] = acc_s[:] * alpha + jnp.dot(
        pmat.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    m_s[:] = m_new

    @pl.when(l_ref_flags[p] == 1)
    def _():
        denom = jnp.where(l_s[:] == 0, 1.0, l_s[:])
        o_ref[0] = (acc_s[:] / denom).astype(o_ref.dtype)
        L = (m_s[:] + jnp.log(denom))[:, 0]
        l_ref[0] = jnp.broadcast_to(L[None, :], (8, L.shape[0]))


def _fwd_call(q, k, v, scale, causal, window=None, g=1):
    """``g`` (GQA): q is (B*H, T, d) while k/v are (B*hk, T, d) with
    H = g*hk; the k/v index maps divide the grid's head-batch index by g,
    so each grouped KV head block is STREAMED to its g query heads
    without ever materializing the expanded (B*H)-head K/V in HBM."""
    BH, T, d = q.shape
    bq = bk = _block(T)
    nq, nk = T // bq, T // bk
    i_a, j_a, f_a, l_a = _pairs(nq, nk, causal, kmajor=False, bq=bq, bk=bk,
                                window=window)
    kern = functools.partial(_fwd_kernel, scale=scale, causal=causal,
                             window=window)
    qspec = pl.BlockSpec((1, bq, d), lambda b, p, i, j, f, l: (b, i[p], 0))
    kspec = pl.BlockSpec((1, bk, d),
                         lambda b, p, i, j, f, l: (b // g, j[p], 0))
    ospec = pl.BlockSpec((1, bq, d), lambda b, p, i, j, f, l: (b, i[p], 0))
    lspec = pl.BlockSpec((1, 8, bq), lambda b, p, i, j, f, l: (b, 0, i[p]))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(BH, i_a.shape[0]),
        in_specs=[qspec, kspec, kspec],
        out_specs=(ospec, lspec),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((BH, T, d), q.dtype),
            jax.ShapeDtypeStruct((BH, 8, T), jnp.float32),
        ),
        interpret=_interpret(),
    )(i_a, j_a, f_a, l_a, q, k, v)


def _bwd_dkdv_kernel(i_ref, j_ref, f_ref, l_ref_flags, q_ref, k_ref, v_ref,
                     do_ref, l_ref, d_ref, dk_ref, dv_ref, dk_s, dv_s,
                     *, scale, causal, window):
    p = pl.program_id(1)
    qi = i_ref[p]
    ki = j_ref[p]

    @pl.when(f_ref[p] == 1)
    def _():
        dk_s[:] = jnp.zeros_like(dk_s)
        dv_s[:] = jnp.zeros_like(dv_s)

    q = q_ref[0]  # (BQ, d)
    k = k_ref[0]  # (BK, d)
    v = v_ref[0]
    do = do_ref[0]
    L = l_ref[0][0][:, None]      # (BQ, 1) logsumexp
    delta = d_ref[0][0][:, None]  # (BQ, 1) rowsum(do * o)
    s = scale * lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, BK)
    s = _band_mask(s, qi, ki, q.shape[0], k.shape[0], causal, window)
    pmat = jnp.exp(s - L)  # recomputed probabilities
    dv_s[:] += lax.dot_general(
        pmat.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = (dp - delta) * pmat
    dk_s[:] += scale * lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(l_ref_flags[p] == 1)
    def _():
        dk_ref[0] = dk_s[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_s[:].astype(dv_ref.dtype)


def _bwd_dq_kernel(i_ref, j_ref, f_ref, l_ref_flags, q_ref, k_ref, v_ref,
                   do_ref, l_ref, d_ref, dq_ref, dq_s, *, scale, causal,
                   window):
    p = pl.program_id(1)
    qi = i_ref[p]
    ki = j_ref[p]

    @pl.when(f_ref[p] == 1)
    def _():
        dq_s[:] = jnp.zeros_like(dq_s)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    L = l_ref[0][0][:, None]
    delta = d_ref[0][0][:, None]
    s = scale * lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = _band_mask(s, qi, ki, q.shape[0], k.shape[0], causal, window)
    pmat = jnp.exp(s - L)
    dp = lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = (dp - delta) * pmat
    dq_s[:] += scale * jnp.dot(ds.astype(k.dtype), k,
                               preferred_element_type=jnp.float32)

    @pl.when(l_ref_flags[p] == 1)
    def _():
        dq_ref[0] = dq_s[:].astype(dq_ref.dtype)


def _bwd_call(q, k, v, do, L8, D8, scale, causal, window=None, g=1):
    """Streaming Pallas backward: (BH, T, d) blocks, O(block) VMEM.

    ``g`` (GQA): k/v are grouped (B*hk, T, d) and read through //g index
    maps; dk/dv come back EXPANDED per query head (B*H, T, d) — the
    caller reduces each g-group (the repeat's transpose)."""
    BH, T, d = q.shape
    bq = bk = _block(T)
    nq, nk = T // bq, T // bk
    qspec = pl.BlockSpec((1, bq, d), lambda b, p, i, j, f, l: (b, i[p], 0))
    kspec_g = pl.BlockSpec((1, bk, d),
                           lambda b, p, i, j, f, l: (b // g, j[p], 0))
    kspec_e = pl.BlockSpec((1, bk, d), lambda b, p, i, j, f, l: (b, j[p], 0))
    vec = pl.BlockSpec((1, 8, bq), lambda b, p, i, j, f, l: (b, 0, i[p]))
    interp = _interpret()

    # dk/dv: key-major pair order, q/do/L/delta follow the inner (q) index.
    i_a, j_a, f_a, l_a = _pairs(nq, nk, causal, kmajor=True, bq=bq, bk=bk,
                                window=window)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkdv_kernel, scale=scale, causal=causal,
                          window=window),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(BH, i_a.shape[0]),
            in_specs=[qspec, kspec_g, kspec_g, qspec, vec, vec],
            out_specs=(kspec_e, kspec_e),
            scratch_shapes=[
                pltpu.VMEM((bk, d), jnp.float32),
                pltpu.VMEM((bk, d), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BH, T, d), q.dtype),
            jax.ShapeDtypeStruct((BH, T, d), q.dtype),
        ),
        interpret=interp,
    )(i_a, j_a, f_a, l_a, q, k, v, do, L8, D8)

    # dq: query-major pair order.
    i_a, j_a, f_a, l_a = _pairs(nq, nk, causal, kmajor=False, bq=bq, bk=bk,
                                window=window)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, causal=causal,
                          window=window),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(BH, i_a.shape[0]),
            in_specs=[qspec, kspec_g, kspec_g, qspec, vec, vec],
            out_specs=qspec,
            scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((BH, T, d), q.dtype),
        interpret=interp,
    )(i_a, j_a, f_a, l_a, q, k, v, do, L8, D8)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention_stream(q, k, v, causal: bool = True, window=None):
    """Streaming fused attention for arbitrary T (multiple of 256).

    ``window`` (sliding-window attention, ``GPTConfig.window``): bans
    keys more than window-1 behind each query AND skips block pairs
    entirely behind the band at grid-construction time — windowed
    long-context attention costs O(T*window), not O(T^2).

    GQA-native: k/v may carry FEWER heads than q (hk dividing H); each
    grouped KV head streams to its H/hk query heads through the block
    index maps — the expanded (B, H, T, d) K/V is never materialized in
    HBM, and dk/dv reduce each group in the backward (exactly the
    ``jnp.repeat`` transpose)."""
    return _fwd(q, k, v, causal, window)[0]


def _fwd(q, k, v, causal, window=None):
    B, h, T, d = q.shape
    hk = k.shape[1]
    if h % hk:
        raise ValueError(f"KV heads ({hk}) must divide query heads ({h})")
    scale = 1.0 / math.sqrt(d)
    o, L = _fwd_call(q.reshape(B * h, T, d), k.reshape(B * hk, T, d),
                     v.reshape(B * hk, T, d), scale, causal, window,
                     g=h // hk)
    o = o.reshape(B, h, T, d)
    return o, (q, k, v, o, L.reshape(B, h, 8, T)[:, :, 0])


def _vjp_fwd(q, k, v, causal, window):
    return _fwd(q, k, v, causal, window)


def _vjp_bwd(causal, window, res, do):
    """Streaming Pallas backward (see _bwd_call)."""
    q, k, v, o, L = res  # L: (B, h, T)
    B, h, T, d = q.shape
    hk = k.shape[1]
    g = h // hk
    scale = 1.0 / math.sqrt(d)
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1)  # (B, h, T)
    rs = lambda x: x.reshape(B * h, T, d)
    bcast = lambda x: jnp.broadcast_to(
        x.reshape(B * h, 1, T), (B * h, 8, T)
    ).astype(jnp.float32)
    dq, dk, dv = _bwd_call(
        rs(q), k.reshape(B * hk, T, d), v.reshape(B * hk, T, d), rs(do),
        bcast(L), bcast(delta), scale, causal, window, g=g
    )
    dq = dq.reshape(B, h, T, d)
    # dk/dv come back per QUERY head; sum each g-group (repeat transpose)
    dk = dk.reshape(B, hk, g, T, d).sum(axis=2).astype(k.dtype)
    dv = dv.reshape(B, hk, g, T, d).sum(axis=2).astype(v.dtype)
    return dq, dk, dv


def _vjp_bwd_xla(causal, window, res, do):
    """Chunked XLA-level backward: recompute P strips from (q, k, L).

    Kept as the differential-test oracle for the Pallas backward."""
    q, k, v, o, L = res  # L: (B, h, T)
    B, h, T, d = q.shape
    scale = 1.0 / math.sqrt(d)
    delta = jnp.sum(do * o, axis=-1)  # (B, h, T)
    BQ = _block(T)
    nq = T // BQ

    def strip(qc, Lc, deltac, doc, q0):
        """dq for one q chunk + its (dk, dv) contribution."""

        s = scale * jnp.einsum("bhtd,bhsd->bhts", qc, k)
        rows = q0 + jnp.arange(BQ)[:, None]
        cols = jnp.arange(T)[None, :]
        if causal:
            s = jnp.where(cols <= rows, s, _NEG)
        if window is not None:
            s = jnp.where(cols > rows - window, s, _NEG)
        p = jnp.exp(s - Lc[..., None])
        dp = jnp.einsum("bhtd,bhsd->bhts", doc, v)
        ds = (dp - deltac[..., None]) * p
        dq = scale * jnp.einsum("bhts,bhsd->bhtd", ds, k)
        dk_c = scale * jnp.einsum("bhts,bhtd->bhsd", ds, qc)
        dv_c = jnp.einsum("bhts,bhtd->bhsd", p, doc)
        return dq, dk_c, dv_c

    def body(carry, i):
        dk, dv = carry
        q0 = i * BQ
        sl = lambda x: lax.dynamic_slice_in_dim(x, q0, BQ, axis=2)
        dq_c, dk_c, dv_c = strip(sl(q), sl(L), sl(delta), sl(do), q0)
        return (dk + dk_c, dv + dv_c), dq_c

    (dk, dv), dq_chunks = lax.scan(
        body, (jnp.zeros_like(k), jnp.zeros_like(v)), jnp.arange(nq)
    )
    dq = jnp.moveaxis(dq_chunks, 0, 2).reshape(B, h, T, d)
    return dq, dk, dv


flash_attention_stream.defvjp(_vjp_fwd, _vjp_bwd)
