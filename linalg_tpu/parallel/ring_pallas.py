"""Pallas ring attention: K/V rotation as in-kernel remote DMAs.

The XLA-level ring (``parallel.ring``) alternates compute and ``ppermute``
steps at the XLA schedule's mercy. This kernel issues the K/V transfer for
step s+1 with ``pltpu.make_async_remote_copy`` BEFORE computing step s's
partial attention, so the ICI transfer overlaps the block's matmuls —
the scaling-book's compute/comm-overlap recipe, expressed as one Pallas
kernel per device inside ``shard_map``.

Protocol (per grid program, ring of n devices over mesh axis ``sp``):

- K/V live in a double-buffered VMEM scratch ``kv (2 slots, 2 {k,v}, Tl,
  d)``. Step s computes on slot s%2 while the DMA fills slot (s+1)%2 on
  the downstream neighbor.
- Backpressure credits: a send may only target a neighbor slot that its
  owner has finished computing on. Credits flow UPSTREAM as tiny remote
  copies (only their semaphore counts matter — remote ``semaphore_signal``
  has no interpret-mode path, remote copies do, and the interpret tests
  are the only multi-device validation available on this machine). Each
  program opens with one credit ("my slots are fresh" — this also fences
  programs against grid skew between neighbors), then credits after each
  compute through step n-3; every send waits one credit first.
- Online softmax (running max m, normalizer l, accumulator acc — f32
  scratch) absorbs one chunk per step; causal masking uses global
  positions, so chunks entirely in the future contribute nothing.

Forward AND backward are Pallas kernels on this schedule: the backward
laps a (k, v, dk, dv) bundle around the ring, recomputing P strips from
the forward's logsumexp. A chunk-liveness gate (``_chunk_live``) skips
the matmuls of chunks that cannot intersect the mask band — entirely-
future chunks under causal masking, and far-past chunks under a sliding
``window`` — while the K/V rotation still completes, so per-device
compute is O(Tl * min(T, Tl + window)).

Reference has no parallelism (SURVEY §2.5).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

__all__ = ["make_ring_attention_pallas", "ring_attention_pallas_local"]

_NEG = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _slope_for_program(slopes, n_heads: int):
    """This grid program's ALiBi slope as a scalar select chain.

    The grid is B*h row-major, so ``program_id % n_heads`` is the head.
    Pallas kernels may not capture constant ARRAYS, so the (static float)
    slopes are folded in as a chain of scalar ``where`` selects instead of
    an indexed lookup table.
    """
    hid = lax.rem(pl.program_id(0), jnp.int32(n_heads))
    sl = jnp.float32(slopes[0])
    for i, s in enumerate(slopes[1:], start=1):
        sl = jnp.where(hid == jnp.int32(i), jnp.float32(s), sl)
    return sl


def _chunk_live(src, my_sp, Tl: int, causal: bool, window):
    """Whether the K/V chunk from device ``src`` intersects my band.

    Causal: chunks in the future contribute nothing. Sliding window
    (cols in (row-window, row]): a past chunk is also dead once its
    newest column is more than window-1 behind my oldest row —
    min(row-col) over the chunk pair is (my_sp-src-1)*Tl + 1, so the
    chunk is live iff (my_sp-src-1)*Tl < window - 1 (int compare).
    """
    if not causal:
        return jnp.bool_(True)
    live = src <= my_sp
    if window is not None:
        live &= (my_sp - src - jnp.int32(1)) * jnp.int32(Tl) \
            < jnp.int32(window - 1)
    return live


def _ring_kernel(q_ref, k_ref, v_ref, o_ref, l_out_ref, kv, m_s, l_s,
                 acc_s, csrc, cdst, kv_send, kv_recv, c_send, c_recv,
                 *, axis_names, sp_axis: str, n: int, causal: bool,
                 scale: float, slopes=None, n_heads: int = 1,
                 window=None):
    Tl, d = q_ref.shape[1], q_ref.shape[2]

    # Logical device ids of the up/downstream ring neighbors: same mesh
    # coordinates with the sp component shifted by -1/+1 (row-major mesh
    # linearization, as jax orders mesh devices).
    def logical(sp_shift):
        lid = jnp.int32(0)
        for name, size in axis_names:
            idx = lax.axis_index(name).astype(jnp.int32)
            if name == sp_axis:
                idx = lax.rem(idx + jnp.int32(sp_shift + size),
                              jnp.int32(size))
            lid = lid * jnp.int32(size) + idx
        return lid

    down = logical(+1)
    up = logical(-1)
    my_sp = lax.axis_index(sp_axis)

    # slot 0 <- my own chunk; accumulators reset (scratch persists across
    # grid programs)
    kv[0, 0] = k_ref[0]
    kv[0, 1] = v_ref[0]
    m_s[:] = jnp.full_like(m_s, _NEG)
    l_s[:] = jnp.zeros_like(l_s)
    acc_s[:] = jnp.zeros_like(acc_s)

    def credit_copy():
        return pltpu.make_async_remote_copy(
            src_ref=csrc, dst_ref=cdst, send_sem=c_send, recv_sem=c_recv,
            device_id=up, device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    if n > 1:
        # opening credit: my slots are fresh (also fences program entry)
        c0 = credit_copy()
        c0.start()
        c0.wait_send()

    q = q_ref[0].astype(jnp.float32)
    rows = my_sp * Tl + lax.broadcasted_iota(jnp.int32, (Tl, Tl), 0)
    if slopes is not None:
        sl = _slope_for_program(slopes, n_heads)

    def body(s, _):
        cur = lax.rem(s, 2)
        nxt = 1 - cur
        kv_copy = pltpu.make_async_remote_copy(
            src_ref=kv.at[cur], dst_ref=kv.at[nxt],
            send_sem=kv_send, recv_sem=kv_recv,
            device_id=down, device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        credit = credit_copy()

        @pl.when(s < n - 1)
        def _():
            credit.wait_recv()  # downstream finished with the target slot
            kv_copy.start()

        # ---- compute on the current slot while the DMA flies.  Chunks
        # entirely in the causal future (src > my_sp) contribute nothing:
        # skip their matmuls (the K/V rotation must still complete, so
        # only the compute is gated — on average this halves the MXU work)
        src = lax.rem(my_sp.astype(jnp.int32) - s + jnp.int32(n),
                      jnp.int32(n))  # origin chunk of this K/V block

        live = _chunk_live(src, my_sp, Tl, causal, window)

        @pl.when(live)
        def _():
            k = kv[cur, 0].astype(jnp.float32)
            v = kv[cur, 1].astype(jnp.float32)
            sc = scale * lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            cols = src * Tl + lax.broadcasted_iota(jnp.int32, (Tl, Tl), 1)
            if slopes is not None:
                sc = sc + sl * (cols - rows).astype(jnp.float32)
            if causal:
                sc = jnp.where(cols <= rows, sc, _NEG)
            if window is not None:
                sc = jnp.where(cols > rows - window, sc, _NEG)
            m_new = jnp.maximum(m_s[:], jnp.max(sc, axis=-1, keepdims=True))
            p = jnp.exp(sc - m_new)
            alpha = jnp.exp(m_s[:] - m_new)
            l_s[:] = l_s[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc_s[:] = acc_s[:] * alpha + jnp.dot(
                p, v, preferred_element_type=jnp.float32)
            m_s[:] = m_new

        @pl.when(s < n - 1)
        def _():
            kv_copy.wait()  # my send done AND next block arrived

        # Credit ONLY after kv_copy.wait(): the credit authorizes upstream
        # to overwrite this slot, and my own outgoing DMA was still
        # reading it until the wait.
        @pl.when(s < n - 2)
        def _():
            credit.start()  # this step's slot is free for upstream
            credit.wait_send()

        return 0

    lax.fori_loop(0, n, body, 0)
    denom = jnp.where(l_s[:] == 0, 1.0, l_s[:])
    o_ref[0] = (acc_s[:] / denom).astype(o_ref.dtype)
    L = (m_s[:] + jnp.log(denom))[:, 0]  # logsumexp rows, for the backward
    l_out_ref[0] = jnp.broadcast_to(L[None, :], (8, L.shape[0]))


def ring_attention_pallas_local(q, k, v, *, mesh, axis: str,
                                causal: bool = True, with_lse: bool = False,
                                slopes=None, window=None):
    """Per-device body (inside shard_map): q/k/v are local (B, h, Tl, d).

    ``with_lse=True`` also returns the per-row logsumexp (B, h, Tl) for
    the backward kernel. ``slopes`` (len h, static) adds the ALiBi
    per-head distance bias inside the kernel. ``window`` (static int)
    bakes the sliding-window band cols in (row-window, row] into the
    mask AND the chunk-liveness gate (far-past chunks skip their
    matmuls; the K/V rotation still completes).
    """
    if window is not None and not causal:
        raise ValueError("window requires causal=True")
    if _interpret() and len(mesh.axis_names) > 1:
        # interpret-mode DMA discharge only supports single-named-axis
        # LOGICAL addressing; multi-axis meshes fall back to the XLA ring
        # off-TPU (same results, ppermute rotation)
        from .ring import ring_attention_local

        out = ring_attention_local(q, k, v, axis=axis, causal=causal,
                                   slopes=slopes, window=window)
        if not with_lse:
            return out
        # lse via one extra local pass of the same online softmax shape
        lse = _xla_local_lse(q, k, v, axis=axis, causal=causal,
                             slopes=slopes, window=window)
        return out, lse
    B, h, Tl, d = q.shape
    n = mesh.shape[axis]
    axis_names = tuple((name, mesh.shape[name]) for name in mesh.axis_names)
    scale = 1.0 / math.sqrt(d)
    rs = lambda x: x.reshape(B * h, Tl, d)
    kern = functools.partial(
        _ring_kernel, axis_names=axis_names, sp_axis=axis, n=n,
        causal=causal, scale=scale, slopes=slopes, n_heads=h,
        window=window,
    )
    spec = pl.BlockSpec((1, Tl, d), lambda g: (g, 0, 0))
    lspec = pl.BlockSpec((1, 8, Tl), lambda g: (g, 0, 0))
    out, L8 = pl.pallas_call(
        kern,
        grid=(B * h,),
        in_specs=[spec, spec, spec],
        out_specs=(spec, lspec),
        out_shape=(
            jax.ShapeDtypeStruct((B * h, Tl, d), q.dtype),
            jax.ShapeDtypeStruct((B * h, 8, Tl), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2, Tl, d), q.dtype),   # double-buffered K/V
            pltpu.VMEM((Tl, 1), jnp.float32),     # running max
            pltpu.VMEM((Tl, 1), jnp.float32),     # normalizer
            pltpu.VMEM((Tl, d), jnp.float32),     # output accumulator
            pltpu.VMEM((8, 128), jnp.float32),    # credit source (dummy)
            pltpu.VMEM((8, 128), jnp.float32),    # credit sink (dummy)
            pltpu.SemaphoreType.DMA,              # kv send
            pltpu.SemaphoreType.DMA,              # kv recv
            pltpu.SemaphoreType.DMA,              # credit send
            pltpu.SemaphoreType.DMA,              # credit recv
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(rs(q), rs(k), rs(v))
    out = out.reshape(B, h, Tl, d)
    if not with_lse:
        return out
    return out, L8.reshape(B, h, 8, Tl)[:, :, 0]


def _xla_local_lse(q, k, v, *, axis: str, causal: bool, slopes=None,
                   window=None):
    """Per-row logsumexp of the ring attention scores (ppermute pass) —
    the interpret-mode fallback companion to the Pallas forward."""
    sp = lax.axis_size(axis)
    idx = lax.axis_index(axis)
    B, h, Tl, d = q.shape
    scale = 1.0 / math.sqrt(d)
    rows = (idx * Tl + jnp.arange(Tl))[:, None]
    if slopes is not None:
        sl = jnp.asarray(slopes, jnp.float32)[None, :, None, None]
    m = jnp.full((B, h, Tl, 1), _NEG, jnp.float32)
    l = jnp.zeros((B, h, Tl, 1), jnp.float32)
    perm = [(j, (j + 1) % sp) for j in range(sp)]
    k_cur = k
    for s in range(sp):
        src = (idx - s) % sp
        cols = (src * Tl + jnp.arange(Tl))[None, :]
        sc = scale * jnp.einsum("bhtd,bhsd->bhts", q, k_cur)
        if slopes is not None:
            sc = sc + sl * (cols - rows).astype(jnp.float32)[None, None]
        if causal:
            sc = jnp.where(cols <= rows, sc, _NEG)
        if window is not None:
            sc = jnp.where(cols > rows - window, sc, _NEG)
        m_new = jnp.maximum(m, jnp.max(sc, axis=-1, keepdims=True))
        l = l * jnp.exp(m - m_new) + jnp.sum(jnp.exp(sc - m_new), axis=-1,
                                             keepdims=True)
        m = m_new
        if s != sp - 1:
            k_cur = lax.ppermute(k_cur, axis, perm)
    return (m + jnp.log(jnp.where(l == 0, 1.0, l)))[..., 0]


def _ring_bwd_kernel(q_ref, k_ref, v_ref, do_ref, l_ref, d_ref,
                     dq_ref, dk_ref, dv_ref,
                     bundle, dq_s, csrc, cdst, b_send, b_recv,
                     c_send, c_recv,
                     *, axis_names, sp_axis: str, n: int, causal: bool,
                     scale: float, slopes=None, n_heads: int = 1,
                     window=None):
    """Backward ring: a (k, v, dk, dv) bundle makes one full lap.

    Each device holds its q/do/L/delta; as the bundle for chunk c visits,
    the device recomputes its P strip from (q, k, L) and ADDS its dk/dv
    contribution into the traveling bundle while accumulating dq locally.
    After n rotations the bundle is home with the complete dk/dv.  The
    bundle is mutated before each send, so (unlike the forward) the send
    cannot overlap this step's compute — the DMA of step s overlaps the
    host-side bookkeeping and the next step's credit round trip only.
    """
    Tl, d = q_ref.shape[1], q_ref.shape[2]

    def logical(sp_shift):
        lid = jnp.int32(0)
        for name, size in axis_names:
            idx = lax.axis_index(name).astype(jnp.int32)
            if name == sp_axis:
                idx = lax.rem(idx + jnp.int32(sp_shift + size),
                              jnp.int32(size))
            lid = lid * jnp.int32(size) + idx
        return lid

    down = logical(+1)
    up = logical(-1)
    my_sp = lax.axis_index(sp_axis)

    bundle[0, 0] = k_ref[0].astype(jnp.float32)
    bundle[0, 1] = v_ref[0].astype(jnp.float32)
    bundle[0, 2] = jnp.zeros_like(bundle[0, 2])
    bundle[0, 3] = jnp.zeros_like(bundle[0, 3])
    dq_s[:] = jnp.zeros_like(dq_s)

    def credit_copy():
        return pltpu.make_async_remote_copy(
            src_ref=csrc, dst_ref=cdst, send_sem=c_send, recv_sem=c_recv,
            device_id=up, device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    if n > 1:
        c0 = credit_copy()
        c0.start()
        c0.wait_send()

    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    L = l_ref[0][0][:, None]      # (Tl, 1) logsumexp
    delta = d_ref[0][0][:, None]  # (Tl, 1) rowsum(do * o)
    rows = my_sp * Tl + lax.broadcasted_iota(jnp.int32, (Tl, Tl), 0)
    if slopes is not None:
        sl = _slope_for_program(slopes, n_heads)

    def body(s, _):
        cur = lax.rem(s, 2)
        nxt = 1 - cur

        src = lax.rem(my_sp.astype(jnp.int32) - s + jnp.int32(n),
                      jnp.int32(n))
        live = _chunk_live(src, my_sp, Tl, causal, window)

        @pl.when(live)
        def _():
            k = bundle[cur, 0]
            v = bundle[cur, 1]
            sc = scale * lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            cols = src * Tl + lax.broadcasted_iota(jnp.int32, (Tl, Tl), 1)
            if slopes is not None:
                sc = sc + sl * (cols - rows).astype(jnp.float32)
            if causal:
                sc = jnp.where(cols <= rows, sc, _NEG)
            if window is not None:
                sc = jnp.where(cols > rows - window, sc, _NEG)
            p = jnp.exp(sc - L)  # recomputed probabilities
            dp = lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = (dp - delta) * p
            dq_s[:] += scale * jnp.dot(ds, k,
                                       preferred_element_type=jnp.float32)
            bundle[cur, 2] += scale * lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            bundle[cur, 3] += lax.dot_general(
                p, do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        # rotate EVERY step so the bundle finishes its lap back home;
        # the bundle was just mutated, so wait out the send before
        # crediting the slot to upstream
        if n > 1:
            bcopy = pltpu.make_async_remote_copy(
                src_ref=bundle.at[cur], dst_ref=bundle.at[nxt],
                send_sem=b_send, recv_sem=b_recv,
                device_id=down, device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            credit = credit_copy()
            credit.wait_recv()
            bcopy.start()
            bcopy.wait()

            @pl.when(s < n - 1)
            def _():
                credit.start()
                credit.wait_send()

        return 0

    lax.fori_loop(0, n, body, 0)
    home = jnp.int32(n % 2 if n > 1 else 0)  # slot after n rotations
    dq_ref[0] = dq_s[:].astype(dq_ref.dtype)
    dk_ref[0] = bundle[home, 2].astype(dk_ref.dtype)
    dv_ref[0] = bundle[home, 3].astype(dv_ref.dtype)


def ring_attention_pallas_bwd_local(q, k, v, do, lse, delta, *, mesh,
                                    axis: str, causal: bool = True,
                                    slopes=None, window=None):
    """Per-device backward body: returns local (dq, dk, dv)."""
    if window is not None and not causal:
        raise ValueError("window requires causal=True")
    B, h, Tl, d = q.shape
    n = mesh.shape[axis]
    axis_names = tuple((name, mesh.shape[name]) for name in mesh.axis_names)
    scale = 1.0 / math.sqrt(d)
    rs = lambda x: x.reshape(B * h, Tl, d)
    bcast = lambda x: jnp.broadcast_to(
        x.reshape(B * h, 1, Tl), (B * h, 8, Tl)).astype(jnp.float32)
    kern = functools.partial(
        _ring_bwd_kernel, axis_names=axis_names, sp_axis=axis, n=n,
        causal=causal, scale=scale, slopes=slopes, n_heads=h,
        window=window,
    )
    spec = pl.BlockSpec((1, Tl, d), lambda g: (g, 0, 0))
    lspec = pl.BlockSpec((1, 8, Tl), lambda g: (g, 0, 0))
    dq, dk, dv = pl.pallas_call(
        kern,
        grid=(B * h,),
        in_specs=[spec, spec, spec, spec, lspec, lspec],
        out_specs=(spec, spec, spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((B * h, Tl, d), q.dtype) for _ in range(3)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 4, Tl, d), jnp.float32),  # (k, v, dk, dv) x2
            pltpu.VMEM((Tl, d), jnp.float32),        # local dq accumulator
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(rs(q), rs(k), rs(v), rs(do), bcast(lse), bcast(delta))
    back = lambda x: x.reshape(B, h, Tl, d)
    return back(dq), back(dk), back(dv)


def make_ring_attention_pallas(mesh, *, axis: str = "sp",
                               causal: bool = True,
                               batch_axis: str | None = None, slopes=None,
                               window=None):
    """shard_map-wrapped Pallas ring attention over ``mesh``.

    Same contract as ``make_ring_attention``: attn(q, k, v) on GLOBAL
    (B, h, T, d) arrays with T sharded on ``axis``. Forward AND backward
    run the in-kernel DMA ring (the backward laps a (k, v, dk, dv)
    bundle around the ring, recomputing P strips from the forward's
    logsumexp).  Off-TPU multi-axis meshes fall back to the XLA ring.
    ``slopes`` (len h) bakes the ALiBi per-head distance bias into both
    kernels as compile-time constants; ``window`` (static int, causal
    only) bakes in the sliding-window band — far-past chunks skip their
    matmuls entirely, so compute per device drops to
    O(Tl * min(T, Tl + window)).
    """
    from .ring import make_ring_attention

    if window is not None:
        if not causal:
            raise ValueError("window requires causal=True")
        window = int(window)
        if window < 1:
            raise ValueError(f"window must be >= 1, got {window}")

    spec = P(batch_axis, None, axis, None)
    lse_spec = P(batch_axis, None, axis)
    fallback = _interpret() and len(mesh.axis_names) > 1
    if slopes is not None:
        slopes = tuple(float(s) for s in slopes)

    local_fwd = functools.partial(ring_attention_pallas_local, mesh=mesh,
                                  axis=axis, causal=causal, slopes=slopes,
                                  window=window)
    fwd_plain = jax.shard_map(
        lambda q, k, v: local_fwd(q, k, v), mesh=mesh,
        in_specs=(spec, spec, spec), out_specs=spec, check_vma=False,
    )
    xla_ring = make_ring_attention(mesh, axis=axis, causal=causal,
                                   batch_axis=batch_axis, slopes=slopes,
                                   window=window)

    if fallback:
        bwd_impl = None
    else:
        fwd_lse = jax.shard_map(
            lambda q, k, v: local_fwd(q, k, v, with_lse=True), mesh=mesh,
            in_specs=(spec, spec, spec), out_specs=(spec, lse_spec),
            check_vma=False,
        )
        local_bwd = functools.partial(ring_attention_pallas_bwd_local,
                                      mesh=mesh, axis=axis, causal=causal,
                                      slopes=slopes, window=window)
        bwd_impl = jax.shard_map(
            lambda q, k, v, do, lse, delta: local_bwd(q, k, v, do, lse,
                                                      delta),
            mesh=mesh,
            in_specs=(spec, spec, spec, spec, lse_spec, lse_spec),
            out_specs=(spec, spec, spec), check_vma=False,
        )

    @jax.custom_vjp
    def attn(q, k, v):
        return fwd_plain(q, k, v)

    def fwd(q, k, v):
        if bwd_impl is None:
            return fwd_plain(q, k, v), (q, k, v, None, None)
        o, lse = fwd_lse(q, k, v)
        return o, (q, k, v, o, lse)

    def bwd(res, do):
        q, k, v, o, lse = res
        if bwd_impl is None:
            _, vjp = jax.vjp(xla_ring, q, k, v)
            return vjp(do)
        delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                        axis=-1)
        return bwd_impl(q, k, v, do, lse, delta)

    attn.defvjp(fwd, bwd)
    return attn
