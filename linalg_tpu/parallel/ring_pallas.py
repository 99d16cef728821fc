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

Forward-only Pallas: the backward routes to ``jax.vjp`` of the XLA-level
ring (same math, autodiff-transposed ppermute schedule) via custom_vjp.

Reference has no parallelism (SURVEY §2.5); further headroom beyond this
kernel: skip fully-masked future chunks' compute (comm must still rotate),
and a Pallas backward on the same schedule.
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


def _ring_kernel(q_ref, k_ref, v_ref, o_ref, kv, m_s, l_s, acc_s,
                 csrc, cdst, kv_send, kv_recv, c_send, c_recv,
                 *, axis_names, sp_axis: str, n: int, causal: bool,
                 scale: float):
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

        live = (src <= my_sp) if causal else jnp.bool_(True)

        @pl.when(live)
        def _():
            k = kv[cur, 0].astype(jnp.float32)
            v = kv[cur, 1].astype(jnp.float32)
            sc = scale * lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if causal:
                cols = src * Tl + lax.broadcasted_iota(
                    jnp.int32, (Tl, Tl), 1)
                sc = jnp.where(cols <= rows, sc, _NEG)
            m_new = jnp.maximum(m_s[:], jnp.max(sc, axis=-1, keepdims=True))
            p = jnp.exp(sc - m_new)
            alpha = jnp.exp(m_s[:] - m_new)
            l_s[:] = l_s[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc_s[:] = acc_s[:] * alpha + jnp.dot(
                p, v, preferred_element_type=jnp.float32)
            m_s[:] = m_new

        @pl.when(s < n - 2)
        def _():
            credit.start()  # this step's slot is free for upstream
            credit.wait_send()

        @pl.when(s < n - 1)
        def _():
            kv_copy.wait()  # my send done AND next block arrived

        return 0

    lax.fori_loop(0, n, body, 0)
    denom = jnp.where(l_s[:] == 0, 1.0, l_s[:])
    o_ref[0] = (acc_s[:] / denom).astype(o_ref.dtype)


def ring_attention_pallas_local(q, k, v, *, mesh, axis: str,
                                causal: bool = True):
    """Per-device body (inside shard_map): q/k/v are local (B, h, Tl, d)."""
    if _interpret() and len(mesh.axis_names) > 1:
        # interpret-mode DMA discharge only supports single-named-axis
        # LOGICAL addressing; multi-axis meshes fall back to the XLA ring
        # off-TPU (same results, ppermute rotation)
        from .ring import ring_attention_local

        return ring_attention_local(q, k, v, axis=axis, causal=causal)
    B, h, Tl, d = q.shape
    n = mesh.shape[axis]
    axis_names = tuple((name, mesh.shape[name]) for name in mesh.axis_names)
    scale = 1.0 / math.sqrt(d)
    rs = lambda x: x.reshape(B * h, Tl, d)
    kern = functools.partial(
        _ring_kernel, axis_names=axis_names, sp_axis=axis, n=n,
        causal=causal, scale=scale,
    )
    spec = pl.BlockSpec((1, Tl, d), lambda g: (g, 0, 0))
    out = pl.pallas_call(
        kern,
        grid=(B * h,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B * h, Tl, d), q.dtype),
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
    return out.reshape(B, h, Tl, d)


def make_ring_attention_pallas(mesh, *, axis: str = "sp",
                               causal: bool = True,
                               batch_axis: str | None = None):
    """shard_map-wrapped Pallas ring attention over ``mesh``.

    Same contract as ``make_ring_attention``: attn(q, k, v) on GLOBAL
    (B, h, T, d) arrays with T sharded on ``axis``. Forward runs the
    in-kernel DMA ring; the backward (custom_vjp) recomputes through the
    XLA-level ring, whose autodiff transpose is the reverse rotation.
    """
    from .ring import make_ring_attention

    spec = P(batch_axis, None, axis, None)
    local = functools.partial(ring_attention_pallas_local, mesh=mesh,
                              axis=axis, causal=causal)
    fwd_sharded = jax.shard_map(
        lambda q, k, v: local(q, k, v), mesh=mesh,
        in_specs=(spec, spec, spec), out_specs=spec, check_vma=False,
    )
    xla_ring = make_ring_attention(mesh, axis=axis, causal=causal,
                                   batch_axis=batch_axis)

    @jax.custom_vjp
    def attn(q, k, v):
        return fwd_sharded(q, k, v)

    def fwd(q, k, v):
        return fwd_sharded(q, k, v), (q, k, v)

    def bwd(res, do):
        q, k, v = res
        _, vjp = jax.vjp(xla_ring, q, k, v)
        return vjp(do)

    attn.defvjp(fwd, bwd)
    return attn
