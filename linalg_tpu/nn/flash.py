"""Fused attention Pallas kernel (flash-style: P never touches HBM).

The naive sdpa materializes the (T, T) probability matrix in HBM three
times (forward S, P, and backward dP/dS). This kernel computes attention
for one (batch, head) slice entirely in VMEM: S = qk^T/sqrt(d) (+ causal
mask), stabilized softmax, O = PV — writing only O and the per-row
logsumexp L (the backward recomputes P from q, k, L instead of loading it).

Regime: T x T scores must fit VMEM, so T <= 1024 (4 MB f32 at T=1024);
the public wrapper falls back to the einsum sdpa beyond that or on
non-TPU backends. Blockwise-streaming flash for long context is the
natural extension behind the same API.

Precision: in-kernel dots run on the MXU with f32 accumulation
(preferred_element_type); operand truncation to bf16 is standard for
attention training. The gradient-check tests compare against the exact
sdpa with tolerances matched to that.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention", "FLASH_MAX_T"]

FLASH_MAX_T = 1024


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, l_ref, *, scale, causal, group):
    # ``group`` (b, h) slices are processed per grid program: one slice per
    # program is launch-overhead-bound (~2 us x B*h programs).
    T = q_ref.shape[1]
    for g in range(group):
        q = q_ref[g]  # (T, d)
        k = k_ref[g]
        v = v_ref[g]
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (T, T)
        if causal:
            rows = lax.broadcasted_iota(jnp.int32, (T, T), 0)
            cols = lax.broadcasted_iota(jnp.int32, (T, T), 1)
            s = jnp.where(cols <= rows, s, -1e9)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        p = e / denom
        # P truncated to the io dtype for the MXU (bf16 operands under
        # mixed precision; the MXU truncates f32 operands anyway), f32 accum
        o_ref[g] = jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)
        # L stored as (8, T) broadcast rows: TPU tiles need sublane >= 8
        L = (m + jnp.log(denom))[:, 0]
        l_ref[g] = jnp.broadcast_to(L[None, :], (8, L.shape[0]))


def _bwd_kernel(q_ref, k_ref, v_ref, o_ref, l_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale, causal, group):
    T = q_ref.shape[1]
    for g in range(group):
        q = q_ref[g]
        k = k_ref[g]
        v = v_ref[g]
        o = o_ref[g]
        L = l_ref[g][0][:, None]  # (T, 1) logsumexp (row 0 of broadcast)
        do = do_ref[g]
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if causal:
            rows = lax.broadcasted_iota(jnp.int32, (T, T), 0)
            cols = lax.broadcasted_iota(jnp.int32, (T, T), 1)
            s = jnp.where(cols <= rows, s, -1e9)
        p = jnp.exp(s - L)  # recomputed probabilities (f32)
        # dV = P^T dO
        dv_ref[g] = jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)
        # dP = dO V^T ; dS = (dP - rowsum(dO*O)) * P
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        delta = jnp.sum(
            do.astype(jnp.float32) * o.astype(jnp.float32),
            axis=-1, keepdims=True,
        )
        ds = (dp - delta) * p
        dq_ref[g] = (
            scale * jnp.dot(ds.astype(k.dtype), k,
                            preferred_element_type=jnp.float32)
        ).astype(dq_ref.dtype)
        dk_ref[g] = (
            scale * jax.lax.dot_general(
                ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        ).astype(dk_ref.dtype)


def _pick_group(BH: int, T: int, d: int) -> int:
    """Largest group fitting a ~10 MB VMEM budget.

    Per-slice cost counts the io buffers (6 arrays of (T, d)) AND the
    (T, T) score temporaries, which stay live across the unrolled slice
    loop — omitting them OOM'd scoped vmem at small d_head (e.g. T=256,
    d=32 picked group=32 -> 16.26M > 16M limit)."""
    per_slice = (6 * T * d + 2 * T * T) * 4
    g = max(1, min(BH, (10 * 1024 * 1024) // max(1, per_slice)))
    while BH % g:
        g -= 1
    return g


def _specs(T, d, group):
    blk = pl.BlockSpec((group, T, d), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((group, 8, T), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    return blk, vec


def _flash_fwd_call(q, k, v, scale, causal):
    BH, T, d = q.shape
    group = _pick_group(BH, T, d)
    blk, vec = _specs(T, d, group)
    kern = functools.partial(_fwd_kernel, scale=scale, causal=causal,
                             group=group)
    return pl.pallas_call(
        kern,
        grid=(BH // group,),
        out_shape=(
            jax.ShapeDtypeStruct((BH, T, d), q.dtype),
            jax.ShapeDtypeStruct((BH, 8, T), jnp.float32),
        ),
        in_specs=[blk, blk, blk],
        out_specs=(blk, vec),
    )(q, k, v)


def _flash_bwd_call(q, k, v, o, L, do, scale, causal):
    BH, T, d = q.shape
    group = _pick_group(BH, T, d)
    blk, vec = _specs(T, d, group)
    kern = functools.partial(_bwd_kernel, scale=scale, causal=causal,
                             group=group)
    return pl.pallas_call(
        kern,
        grid=(BH // group,),
        out_shape=(
            jax.ShapeDtypeStruct((BH, T, d), q.dtype),
            jax.ShapeDtypeStruct((BH, T, d), q.dtype),
            jax.ShapeDtypeStruct((BH, T, d), q.dtype),
        ),
        in_specs=[blk, blk, blk, blk, vec, blk],
        out_specs=(blk, blk, blk),
    )(q, k, v, o, L, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, causal: bool = True):
    """Fused causal self-attention: (B, h, T, d) -> (B, h, T, d).

    Drop-in for ``sdpa(q, k, v, causal_mask(T))`` on the training hot path.
    """
    return _flash_fwd(q, k, v, causal)[0]


def _flash_fwd(q, k, v, causal):
    B, h, T, d = q.shape
    scale = 1.0 / math.sqrt(d)
    qf = q.reshape(B * h, T, d)
    kf = k.reshape(B * h, T, d)
    vf = v.reshape(B * h, T, d)
    o, L = _flash_fwd_call(qf, kf, vf, scale, causal)
    return o.reshape(B, h, T, d), (q, k, v, o.reshape(B, h, T, d), L)


def _flash_vjp_fwd(q, k, v, causal):
    o, res = _flash_fwd(q, k, v, causal)
    return o, res


def _flash_vjp_bwd(causal, res, do):
    q, k, v, o, L = res
    B, h, T, d = q.shape
    scale = 1.0 / math.sqrt(d)
    rs = lambda x: x.reshape(B * h, T, d)
    dq, dk, dv = _flash_bwd_call(
        rs(q), rs(k), rs(v), rs(o), L, rs(do), scale, causal
    )
    back = lambda x: x.reshape(B, h, T, d)
    return back(dq), back(dk), back(dv)


flash_attention.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)
