"""Fused attention in the model's native (B, T, H*d) layout.

The short-context training path (reference hot loop gpt.py:360-391; here
``models/gpt.py::_layer``) pays two HBM taxes with einsum sdpa:

1. the (B, H, T, T) score/probability tensor crosses HBM several times
   per layer (forward S and P, backward recompute + dP/dS) — ~67 MB f32
   per materialization at the published config;
2. the head split/merge relayouts: ``_heads`` / ``_unheads`` transpose
   (B, T, H, d) <-> (B, H, T, d), a full copy of Q, K, V, O forward and
   backward. The round-2 in-model flash A/B lost to sdpa at T=256 for
   exactly this reason (models/gpt.py::_pick_attn notes).

This kernel removes both: Q, K, V arrive as the raw projection outputs
(B, T, H*d); the grid walks batch groups and each program loops heads by
*column-slicing* the lane dimension (static offsets, head dim d is a
multiple of the 128 lane width at the flagship config — no relayout is
ever materialized). Scores live only in VMEM; the backward recomputes P
from (q, k, L) like the flash kernels. Output is (B, T, H*d), feeding
``@ Wo`` directly.

Regime: T*T f32 scores + one batch row of Q/K/V/O must fit VMEM —
T <= 1024, same ceiling as ``nn.flash``. Use for short contexts where
``_pick_attn`` would otherwise choose (rematted) sdpa.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["attention_btd", "BTD_MAX_T"]

BTD_MAX_T = 1024


def _causal_mask_fill(s):
    T = s.shape[0]
    rows = lax.broadcasted_iota(jnp.int32, (T, T), 0)
    cols = lax.broadcasted_iota(jnp.int32, (T, T), 1)
    return jnp.where(cols <= rows, s, -1e9)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, l_ref, *,
                scale, causal, n_heads, group):
    d = q_ref.shape[2] // n_heads
    for g in range(group):
        for h in range(n_heads):
            c = slice(h * d, (h + 1) * d)
            q = q_ref[g, :, c]  # (T, d) column slice — no relayout
            k = k_ref[g, :, c]
            v = v_ref[g, :, c]
            s = scale * lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if causal:
                s = _causal_mask_fill(s)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            denom = jnp.sum(e, axis=-1, keepdims=True)
            p = e / denom
            o_ref[g, :, c] = jnp.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            ).astype(o_ref.dtype)
            # logsumexp rows, (8, T) broadcast per head (sublane tile >= 8)
            L = (m + jnp.log(denom))[:, 0]
            l_ref[g, 8 * h:8 * (h + 1)] = jnp.broadcast_to(
                L[None, :], (8, L.shape[0])
            )


def _bwd_kernel(q_ref, k_ref, v_ref, o_ref, l_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale, causal, n_heads, group):
    d = q_ref.shape[2] // n_heads
    for g in range(group):
        for h in range(n_heads):
            c = slice(h * d, (h + 1) * d)
            q = q_ref[g, :, c]
            k = k_ref[g, :, c]
            v = v_ref[g, :, c]
            o = o_ref[g, :, c]
            do = do_ref[g, :, c]
            L = l_ref[g, 8 * h][:, None]  # (T, 1)
            s = scale * lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if causal:
                s = _causal_mask_fill(s)
            p = jnp.exp(s - L)  # recomputed probabilities, f32
            dv_ref[g, :, c] = lax.dot_general(
                p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dv_ref.dtype)
            dp = lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            delta = jnp.sum(
                do.astype(jnp.float32) * o.astype(jnp.float32),
                axis=-1, keepdims=True,
            )
            ds = (dp - delta) * p
            dq_ref[g, :, c] = (
                scale * jnp.dot(ds.astype(k.dtype), k,
                                preferred_element_type=jnp.float32)
            ).astype(dq_ref.dtype)
            dk_ref[g, :, c] = (
                scale * lax.dot_general(
                    ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            ).astype(dk_ref.dtype)


def _pick_group(B: int, T: int, D: int, n_bufs: int,
                itemsize: int = 4) -> int:
    """Largest batch group under a ~10 MB VMEM budget (io rows + scores;
    scores/probabilities are always f32 temporaries)."""
    per_b = n_bufs * T * D * itemsize + 3 * T * T * 4
    g = max(1, min(B, (10 * 1024 * 1024) // max(1, per_b)))
    while B % g:
        g -= 1
    return g


def _btd_fwd_call(q, k, v, scale, causal, n_heads):
    B, T, D = q.shape
    group = _pick_group(B, T, D, n_bufs=4, itemsize=q.dtype.itemsize)
    blk = pl.BlockSpec((group, T, D), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((group, 8 * n_heads, T), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    kern = functools.partial(_fwd_kernel, scale=scale, causal=causal,
                             n_heads=n_heads, group=group)
    return pl.pallas_call(
        kern,
        grid=(B // group,),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, D), q.dtype),
            jax.ShapeDtypeStruct((B, 8 * n_heads, T), jnp.float32),
        ),
        in_specs=[blk, blk, blk],
        out_specs=(blk, vec),
    )(q, k, v)


def _btd_bwd_call(q, k, v, o, L, do, scale, causal, n_heads):
    B, T, D = q.shape
    group = _pick_group(B, T, D, n_bufs=9, itemsize=q.dtype.itemsize)
    blk = pl.BlockSpec((group, T, D), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((group, 8 * n_heads, T), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    kern = functools.partial(_bwd_kernel, scale=scale, causal=causal,
                             n_heads=n_heads, group=group)
    return pl.pallas_call(
        kern,
        grid=(B // group,),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, D), q.dtype),
            jax.ShapeDtypeStruct((B, T, D), q.dtype),
            jax.ShapeDtypeStruct((B, T, D), q.dtype),
        ),
        in_specs=[blk, blk, blk, blk, vec, blk],
        out_specs=(blk, blk, blk),
    )(q, k, v, o, L, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def attention_btd(q, k, v, n_heads: int, causal: bool = True):
    """Fused multi-head causal attention in (B, T, H*d) layout.

    Drop-in for ``_unheads(sdpa(_heads(q), _heads(k), _heads(v), mask))``
    with zero head relayouts and no HBM score traffic. Same closed-form
    backward as the reference SDPA (attention.py:68-89), recomputing P
    from the saved per-row logsumexp.
    """
    return _btd_fwd(q, k, v, n_heads, causal)[0]


def _btd_fwd(q, k, v, n_heads, causal):
    d = q.shape[-1] // n_heads
    scale = 1.0 / math.sqrt(d)
    o, L = _btd_fwd_call(q, k, v, scale, causal, n_heads)
    return o, (q, k, v, o, L)


def _btd_vjp_fwd(q, k, v, n_heads, causal):
    o, res = _btd_fwd(q, k, v, n_heads, causal)
    return o, res


def _btd_vjp_bwd(n_heads, causal, res, do):
    q, k, v, o, L = res
    d = q.shape[-1] // n_heads
    scale = 1.0 / math.sqrt(d)
    return _btd_bwd_call(q, k, v, o, L, do, scale, causal, n_heads)


attention_btd.defvjp(_btd_vjp_fwd, _btd_vjp_bwd)


def btd_supported(B: int, T: int, D: int, n_heads: int) -> bool:
    """Shape gate: lane-aligned head columns, VMEM-fitting scores."""
    if T > BTD_MAX_T or T % 8 != 0:
        return False
    d = D // n_heads
    if d * n_heads != D or d % 128 != 0:
        return False  # column slices must sit on lane-tile boundaries
    return _pick_group(B, T, D, n_bufs=9) >= 1
