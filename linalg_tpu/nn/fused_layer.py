"""Fused LayerNorm+matmul Pallas kernels for the GPT hot path.

The published-config train step is HBM-bandwidth-bound (~6 GB touched for
~1.3 TFLOP); XLA does not fuse a LayerNorm's reductions into the matmul
that consumes it, so the normalized activations (B*T, D) round-trip HBM
between every LN and its projections, and autodiff additionally SAVES the
LN output / pre-relu FFN intermediate as residuals for the backward.

Two fused kernels remove those round trips (reference semantics:
LayerNorm /root/reference/ai_comps/normalization.py:11-88, FFN
transformer.py:102-206, DecoderOnlyLayer gpt.py:154-188):

- ``ln_qkv(x, g, b, Wq, Wk, Wv) -> (q, k, v)``: LN then the three
  attention projections, LN stats computed in f32 on the VPU, matmuls on
  the MXU, normalized activations never leave VMEM.
- ``ln_ffn(h, g, b, W1, b1, W2, b2) -> f``: LN then the full 2-layer ReLU
  MLP; the (B*T, 4D) hidden activation never leaves VMEM.

Both are ``custom_vjp`` whose backward kernels RECOMPUTE the normalized
activations from the raw input (one extra LN+matmul per block, all in
VMEM) instead of saving them — the residuals are just the kernel inputs,
cutting the step's activation traffic roughly in half. Hand-derived
backward formulas (same closed forms as nn.functional): for y = LN(x)
with ghat = dy*g,  dx = (ghat - mean(ghat) - xhat*mean(ghat*xhat))/sigma.

Weight gradients accumulate across the sequential TPU grid into
constant-index output blocks (init at program 0, add afterwards).

NOTE (Mosaic): in-kernel MXU dots truncate f32 operands to bfloat16 with
f32 accumulation — same arithmetic as XLA's default f32 matmul precision
on TPU, and exactly the bf16-compute path's arithmetic, so training
numerics match the unfused path at working precision (pinned by the
loss-curve equivalence test).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ln_qkv", "ln_ffn", "fused_supported"]

EPS = 1e-5
BLK = 256  # token rows per grid step


def fused_supported(n_tokens: int, d_model: int, d_ff: int) -> bool:
    """Shapes the kernels handle: lane-aligned dims, whole token blocks."""
    return (n_tokens % BLK == 0 and d_model % 128 == 0 and d_ff % 128 == 0
            and d_model >= 128 and d_ff >= 128)


def _ln(x32, g32, b32):
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + EPS)
    xhat = xc * rstd
    return xhat * g32 + b32, xhat, rstd


def _ln_bwd_block(dxn32, xhat, rstd, g32):
    """dx for one (rows, D) block given d(LN out); plus dg/db row-sums."""
    ghat = dxn32 * g32
    m1 = jnp.mean(ghat, axis=-1, keepdims=True)
    m2 = jnp.mean(ghat * xhat, axis=-1, keepdims=True)
    dx = (ghat - m1 - xhat * m2) * rstd
    dg = jnp.sum(dxn32 * xhat, axis=0, keepdims=True)
    db = jnp.sum(dxn32, axis=0, keepdims=True)
    return dx, dg, db


# ---------------------------------------------------------------------------
# ln_qkv
# ---------------------------------------------------------------------------


def _ln_qkv_fwd_kernel(x_ref, g_ref, b_ref, wq_ref, wk_ref, wv_ref,
                       q_ref, k_ref, v_ref):
    x32 = x_ref[:].astype(jnp.float32)
    xn32, _, _ = _ln(x32, g_ref[:].astype(jnp.float32),
                     b_ref[:].astype(jnp.float32))
    xn = xn32.astype(x_ref.dtype)
    q_ref[:] = jnp.dot(xn, wq_ref[:],
                       preferred_element_type=jnp.float32).astype(q_ref.dtype)
    k_ref[:] = jnp.dot(xn, wk_ref[:],
                       preferred_element_type=jnp.float32).astype(k_ref.dtype)
    v_ref[:] = jnp.dot(xn, wv_ref[:],
                       preferred_element_type=jnp.float32).astype(v_ref.dtype)


def _ln_qkv_bwd_kernel(x_ref, g_ref, b_ref, wq_ref, wk_ref, wv_ref,
                       dq_ref, dk_ref, dv_ref,
                       dx_ref, dg_ref, db_ref, dwq_ref, dwk_ref, dwv_ref):
    i = pl.program_id(0)
    x32 = x_ref[:].astype(jnp.float32)
    g32 = g_ref[:].astype(jnp.float32)
    xn32, xhat, rstd = _ln(x32, g32, b_ref[:].astype(jnp.float32))
    xn = xn32.astype(x_ref.dtype)

    row_contract = (((0,), (0,)), ((), ()))   # xn^T @ dy
    col_contract = (((1,), (1,)), ((), ()))   # dy @ W^T
    dxn32 = jnp.zeros_like(x32)
    for dy_ref, w_ref, dw_ref in ((dq_ref, wq_ref, dwq_ref),
                                  (dk_ref, wk_ref, dwk_ref),
                                  (dv_ref, wv_ref, dwv_ref)):
        dy = dy_ref[:]
        dw = jax.lax.dot_general(xn, dy, row_contract,
                                 preferred_element_type=jnp.float32)
        @pl.when(i == 0)
        def _(dw_ref=dw_ref, dw=dw):
            dw_ref[:] = dw.astype(dw_ref.dtype)

        @pl.when(i > 0)
        def _(dw_ref=dw_ref, dw=dw):
            dw_ref[:] = dw_ref[:] + dw.astype(dw_ref.dtype)

        dxn32 = dxn32 + jax.lax.dot_general(
            dy, w_ref[:], col_contract, preferred_element_type=jnp.float32)

    dx32, dg, db = _ln_bwd_block(dxn32, xhat, rstd, g32)
    dx_ref[:] = dx32.astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _():
        dg_ref[:] = dg.astype(dg_ref.dtype)
        db_ref[:] = db.astype(db_ref.dtype)

    @pl.when(i > 0)
    def _():
        dg_ref[:] = dg_ref[:] + dg.astype(dg_ref.dtype)
        db_ref[:] = db_ref[:] + db.astype(db_ref.dtype)


def _row_spec(D):
    return pl.BlockSpec((BLK, D), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def ln_qkv(x, g, b, wq, wk, wv) -> Tuple[jnp.ndarray, ...]:
    """LayerNorm(x) @ {Wq, Wk, Wv} fused; x (..., T, D) -> three like x."""
    return _ln_qkv_impl(x, g, b, wq, wk, wv)


def _ln_qkv_impl(x, g, b, wq, wk, wv):
    shape = x.shape
    D = shape[-1]
    x2d = x.reshape(-1, D)
    N = x2d.shape[0]
    g2, b2 = g.reshape(1, D), b.reshape(1, D)
    outs = pl.pallas_call(
        _ln_qkv_fwd_kernel,
        grid=(N // BLK,),
        in_specs=[_row_spec(D), _const_spec((1, D)), _const_spec((1, D)),
                  _const_spec((D, D)), _const_spec((D, D)),
                  _const_spec((D, D))],
        out_specs=[_row_spec(D)] * 3,
        out_shape=[jax.ShapeDtypeStruct((N, D), x.dtype)] * 3,
    )(x2d, g2, b2, wq, wk, wv)
    return tuple(o.reshape(shape) for o in outs)


def _ln_qkv_fwd(x, g, b, wq, wk, wv):
    return _ln_qkv_impl(x, g, b, wq, wk, wv), (x, g, b, wq, wk, wv)


def _ln_qkv_bwd(res, dys):
    x, g, b, wq, wk, wv = res
    dq, dk, dv = dys
    shape = x.shape
    D = shape[-1]
    x2d = x.reshape(-1, D)
    N = x2d.shape[0]
    g2, b2 = g.reshape(1, D), b.reshape(1, D)
    dx, dg, db, dwq, dwk, dwv = pl.pallas_call(
        _ln_qkv_bwd_kernel,
        grid=(N // BLK,),
        in_specs=[_row_spec(D), _const_spec((1, D)), _const_spec((1, D)),
                  _const_spec((D, D)), _const_spec((D, D)),
                  _const_spec((D, D)),
                  _row_spec(D), _row_spec(D), _row_spec(D)],
        out_specs=[_row_spec(D), _const_spec((1, D)), _const_spec((1, D)),
                   _const_spec((D, D)), _const_spec((D, D)),
                   _const_spec((D, D))],
        out_shape=[jax.ShapeDtypeStruct((N, D), x.dtype),
                   jax.ShapeDtypeStruct((1, D), g.dtype),
                   jax.ShapeDtypeStruct((1, D), b.dtype),
                   jax.ShapeDtypeStruct((D, D), wq.dtype),
                   jax.ShapeDtypeStruct((D, D), wk.dtype),
                   jax.ShapeDtypeStruct((D, D), wv.dtype)],
    )(x2d, g2, b2, wq, wk, wv,
      dq.reshape(-1, D), dk.reshape(-1, D), dv.reshape(-1, D))
    return (dx.reshape(shape), dg.reshape(g.shape), db.reshape(b.shape),
            dwq, dwk, dwv)


ln_qkv.defvjp(_ln_qkv_fwd, _ln_qkv_bwd)


# ---------------------------------------------------------------------------
# ln_ffn
# ---------------------------------------------------------------------------


def _ln_ffn_fwd_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                       f_ref):
    x32 = x_ref[:].astype(jnp.float32)
    xn32, _, _ = _ln(x32, g_ref[:].astype(jnp.float32),
                     b_ref[:].astype(jnp.float32))
    xn = xn32.astype(x_ref.dtype)
    z = (jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32)
         + b1_ref[:].astype(jnp.float32))
    a = jnp.maximum(z, 0.0).astype(x_ref.dtype)
    f = (jnp.dot(a, w2_ref[:], preferred_element_type=jnp.float32)
         + b2_ref[:].astype(jnp.float32))
    f_ref[:] = f.astype(f_ref.dtype)


def _ln_ffn_bwd_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                       df_ref,
                       dx_ref, dg_ref, db_ref, dw1_ref, db1_ref, dw2_ref,
                       db2_ref):
    i = pl.program_id(0)
    x32 = x_ref[:].astype(jnp.float32)
    g32 = g_ref[:].astype(jnp.float32)
    xn32, xhat, rstd = _ln(x32, g32, b_ref[:].astype(jnp.float32))
    xn = xn32.astype(x_ref.dtype)
    z = (jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32)
         + b1_ref[:].astype(jnp.float32))
    a = jnp.maximum(z, 0.0).astype(x_ref.dtype)

    df = df_ref[:]
    row_contract = (((0,), (0,)), ((), ()))
    col_contract = (((1,), (1,)), ((), ()))
    dw2 = jax.lax.dot_general(a, df, row_contract,
                              preferred_element_type=jnp.float32)
    db2 = jnp.sum(df.astype(jnp.float32), axis=0, keepdims=True)
    da = jax.lax.dot_general(df, w2_ref[:], col_contract,
                             preferred_element_type=jnp.float32)
    dz32 = jnp.where(z > 0.0, da, 0.0)
    dz = dz32.astype(x_ref.dtype)
    dw1 = jax.lax.dot_general(xn, dz, row_contract,
                              preferred_element_type=jnp.float32)
    db1 = jnp.sum(dz32, axis=0, keepdims=True)
    dxn32 = jax.lax.dot_general(dz, w1_ref[:], col_contract,
                                preferred_element_type=jnp.float32)
    dx32, dg, db = _ln_bwd_block(dxn32, xhat, rstd, g32)
    dx_ref[:] = dx32.astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _():
        dg_ref[:] = dg.astype(dg_ref.dtype)
        db_ref[:] = db.astype(db_ref.dtype)
        dw1_ref[:] = dw1.astype(dw1_ref.dtype)
        db1_ref[:] = db1.astype(db1_ref.dtype)
        dw2_ref[:] = dw2.astype(dw2_ref.dtype)
        db2_ref[:] = db2.astype(db2_ref.dtype)

    @pl.when(i > 0)
    def _():
        dg_ref[:] = dg_ref[:] + dg.astype(dg_ref.dtype)
        db_ref[:] = db_ref[:] + db.astype(db_ref.dtype)
        dw1_ref[:] = dw1_ref[:] + dw1.astype(dw1_ref.dtype)
        db1_ref[:] = db1_ref[:] + db1.astype(db1_ref.dtype)
        dw2_ref[:] = dw2_ref[:] + dw2.astype(dw2_ref.dtype)
        db2_ref[:] = db2_ref[:] + db2.astype(db2_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def ln_ffn(x, g, b, w1, b1, w2, b2) -> jnp.ndarray:
    """relu(LayerNorm(x) @ W1 + b1) @ W2 + b2 fused; x (..., T, D)."""
    return _ln_ffn_impl(x, g, b, w1, b1, w2, b2)


def _ln_ffn_impl(x, g, b, w1, b1, w2, b2):
    shape = x.shape
    D = shape[-1]
    F = w1.shape[-1]
    x2d = x.reshape(-1, D)
    N = x2d.shape[0]
    f = pl.pallas_call(
        _ln_ffn_fwd_kernel,
        grid=(N // BLK,),
        in_specs=[_row_spec(D), _const_spec((1, D)), _const_spec((1, D)),
                  _const_spec((D, F)), _const_spec((1, F)),
                  _const_spec((F, D)), _const_spec((1, D))],
        out_specs=_row_spec(D),
        out_shape=jax.ShapeDtypeStruct((N, D), x.dtype),
    )(x2d, g.reshape(1, D), b.reshape(1, D), w1, b1.reshape(1, F), w2,
      b2.reshape(1, D))
    return f.reshape(shape)


def _ln_ffn_fwd(x, g, b, w1, b1, w2, b2):
    return _ln_ffn_impl(x, g, b, w1, b1, w2, b2), (x, g, b, w1, b1, w2, b2)


def _ln_ffn_bwd(res, df):
    x, g, b, w1, b1, w2, b2 = res
    shape = x.shape
    D = shape[-1]
    F = w1.shape[-1]
    x2d = x.reshape(-1, D)
    N = x2d.shape[0]
    dx, dg, db, dw1, db1, dw2, db2 = pl.pallas_call(
        _ln_ffn_bwd_kernel,
        grid=(N // BLK,),
        in_specs=[_row_spec(D), _const_spec((1, D)), _const_spec((1, D)),
                  _const_spec((D, F)), _const_spec((1, F)),
                  _const_spec((F, D)), _const_spec((1, D)),
                  _row_spec(D)],
        out_specs=[_row_spec(D), _const_spec((1, D)), _const_spec((1, D)),
                   _const_spec((D, F)), _const_spec((1, F)),
                   _const_spec((F, D)), _const_spec((1, D))],
        out_shape=[jax.ShapeDtypeStruct((N, D), x.dtype),
                   jax.ShapeDtypeStruct((1, D), g.dtype),
                   jax.ShapeDtypeStruct((1, D), b.dtype),
                   jax.ShapeDtypeStruct((D, F), w1.dtype),
                   jax.ShapeDtypeStruct((1, F), b1.dtype),
                   jax.ShapeDtypeStruct((F, D), w2.dtype),
                   jax.ShapeDtypeStruct((1, D), b2.dtype)],
    )(x2d, g.reshape(1, D), b.reshape(1, D), w1, b1.reshape(1, F), w2,
      b2.reshape(1, D), df.reshape(-1, D))
    return (dx.reshape(shape), dg.reshape(g.shape), db.reshape(b.shape),
            dw1, db1.reshape(b1.shape), dw2, db2.reshape(b2.shape))


ln_ffn.defvjp(_ln_ffn_fwd, _ln_ffn_bwd)
