"""Row/column-blocked attention kernels for long context (T up to 8192).

The full-tile kernel in ``nn.flash`` needs the (T, T) score matrix in VMEM
(T <= 1024). These kernels block over the SEQUENCE instead: the forward and
dQ passes tile Q rows (each program owns a (BQ, T) score strip — softmax
rows are complete, so no online rescaling is needed), while the dK/dV pass
tiles K columns. P still never touches HBM; only O and the per-row
logsumexp L are written.

K/V (and Q in the dKV pass) stay whole in VMEM, which caps T at ~8192 for
f32 d=128. Streaming K/V from HBM with double-buffered DMA is the natural
next extension for longer sequences.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention_long", "LONG_MAX_T"]

LONG_MAX_T = 8192
_BQ = 256  # query rows per program
_BK = 256  # key columns per program (dKV pass)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, l_ref, *, scale, causal):
    qi = pl.program_id(1)
    q = q_ref[0]        # (BQ, d)
    k = k_ref[0]        # (T, d)
    v = v_ref[0]
    BQ = q.shape[0]
    T = k.shape[0]
    s = scale * lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, T)
    if causal:
        rows = lax.broadcasted_iota(jnp.int32, (BQ, T), 0) + qi * BQ
        cols = lax.broadcasted_iota(jnp.int32, (BQ, T), 1)
        s = jnp.where(cols <= rows, s, -1e9)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(
        (e / denom).astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)
    L = (m + jnp.log(denom))[:, 0]
    l_ref[0] = jnp.broadcast_to(L[None, :], (8, BQ))


def _dq_kernel(q_ref, k_ref, v_ref, l_ref, do_ref, d_ref, dq_ref, *,
               scale, causal):
    qi = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    L = l_ref[0][0][:, None]     # (BQ, 1)
    do = do_ref[0]
    delta = d_ref[0][0][:, None]  # rowsum(dO * O), precomputed
    BQ = q.shape[0]
    T = k.shape[0]
    s = scale * lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if causal:
        rows = lax.broadcasted_iota(jnp.int32, (BQ, T), 0) + qi * BQ
        cols = lax.broadcasted_iota(jnp.int32, (BQ, T), 1)
        s = jnp.where(cols <= rows, s, -1e9)
    p = jnp.exp(s - L)
    dp = lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = (dp - delta) * p
    dq_ref[0] = (
        scale * jnp.dot(ds.astype(k.dtype), k,
                        preferred_element_type=jnp.float32)
    ).astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, l_ref, do_ref, d_ref,
                dk_ref, dv_ref, *, scale, causal):
    ki = pl.program_id(1)
    q = q_ref[0]        # (T, d) — whole Q
    k = k_ref[0]        # (BK, d) — this program's key block
    v = v_ref[0]
    L = l_ref[0][0][:, None]      # (T, 1)
    do = do_ref[0]                # (T, d)
    delta = d_ref[0][0][:, None]  # (T, 1)
    T = q.shape[0]
    BK = k.shape[0]
    # S column strip: (T, BK)
    s = scale * lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if causal:
        rows = lax.broadcasted_iota(jnp.int32, (T, BK), 0)
        cols = lax.broadcasted_iota(jnp.int32, (T, BK), 1) + ki * BK
        s = jnp.where(cols <= rows, s, -1e9)
    p = jnp.exp(s - L)            # (T, BK)
    dv_ref[0] = lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    dp = lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (T, BK)
    ds = (dp - delta) * p
    dk_ref[0] = (
        scale * lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    ).astype(dk_ref.dtype)


def _full(T, d):
    return pl.BlockSpec((1, T, d), lambda b, i: (b, 0, 0),
                        memory_space=pltpu.VMEM)


def _rows(BQ, d):
    return pl.BlockSpec((1, BQ, d), lambda b, i: (b, i, 0),
                        memory_space=pltpu.VMEM)


def _vec_rows(BQ):
    return pl.BlockSpec((1, 8, BQ), lambda b, i: (b, 0, i),
                        memory_space=pltpu.VMEM)


def _vec_full(T):
    return pl.BlockSpec((1, 8, T), lambda b, i: (b, 0, 0),
                        memory_space=pltpu.VMEM)


def _fwd_call(q, k, v, scale, causal):
    BH, T, d = q.shape
    nq = T // _BQ
    kern = functools.partial(_fwd_kernel, scale=scale, causal=causal)
    return pl.pallas_call(
        kern,
        grid=(BH, nq),
        out_shape=(
            jax.ShapeDtypeStruct((BH, T, d), q.dtype),
            jax.ShapeDtypeStruct((BH, 8, T), jnp.float32),
        ),
        in_specs=[_rows(_BQ, d), _full(T, d), _full(T, d)],
        out_specs=(_rows(_BQ, d), _vec_rows(_BQ)),
    )(q, k, v)


def _dq_call(q, k, v, L, do, delta, scale, causal):
    BH, T, d = q.shape
    nq = T // _BQ
    kern = functools.partial(_dq_kernel, scale=scale, causal=causal)
    return pl.pallas_call(
        kern,
        grid=(BH, nq),
        out_shape=jax.ShapeDtypeStruct((BH, T, d), q.dtype),
        in_specs=[_rows(_BQ, d), _full(T, d), _full(T, d),
                  _vec_rows(_BQ), _rows(_BQ, d), _vec_rows(_BQ)],
        out_specs=_rows(_BQ, d),
    )(q, k, v, L, do, delta)


def _dkv_call(q, k, v, L, do, delta, scale, causal):
    BH, T, d = q.shape
    nk = T // _BK
    kern = functools.partial(_dkv_kernel, scale=scale, causal=causal)
    return pl.pallas_call(
        kern,
        grid=(BH, nk),
        out_shape=(
            jax.ShapeDtypeStruct((BH, T, d), q.dtype),
            jax.ShapeDtypeStruct((BH, T, d), q.dtype),
        ),
        in_specs=[_full(T, d), _rows(_BK, d), _rows(_BK, d),
                  _vec_full(T), _full(T, d), _vec_full(T)],
        out_specs=(_rows(_BK, d), _rows(_BK, d)),
    )(q, k, v, L, do, delta)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention_long(q, k, v, causal: bool = True):
    """Row-blocked fused attention for T in (1024, 8192]; same semantics as
    ``nn.flash.flash_attention``."""
    return _fwd(q, k, v, causal)[0]


def _fwd(q, k, v, causal):
    B, h, T, d = q.shape
    scale = 1.0 / math.sqrt(d)
    rs = lambda x: x.reshape(B * h, T, d)
    o, L = _fwd_call(rs(q), rs(k), rs(v), scale, causal)
    return o.reshape(B, h, T, d), (q, k, v, o.reshape(B, h, T, d), L)


def _vjp_fwd(q, k, v, causal):
    return _fwd(q, k, v, causal)


def _vjp_bwd(causal, res, do):
    q, k, v, o, L = res
    B, h, T, d = q.shape
    scale = 1.0 / math.sqrt(d)
    rs = lambda x: x.reshape(B * h, T, d)
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1)  # (B, h, T)
    delta = jnp.broadcast_to(
        delta.reshape(B * h, 1, T), (B * h, 8, T)
    ).astype(jnp.float32)
    dq = _dq_call(rs(q), rs(k), rs(v), L, rs(do), delta, scale, causal)
    dk, dv = _dkv_call(rs(q), rs(k), rs(v), L, rs(do), delta, scale, causal)
    back = lambda x: x.reshape(B, h, T, d)
    return back(dq), back(dk), back(dv)


flash_attention_long.defvjp(_vjp_fwd, _vjp_bwd)
