"""Fused LayerNorm+matmul Pallas kernels for the GPT hot path.

The published-config train step is HBM-bandwidth-bound (~6 GB touched for
~1.3 TFLOP); XLA does not fuse a LayerNorm's reductions into the matmul
that consumes it, so the normalized activations (B*T, D) round-trip HBM
between every LN and its projections, and autodiff additionally SAVES the
LN output / pre-relu FFN intermediate as residuals for the backward.

Two fused ops remove those round trips (reference semantics: LayerNorm
/root/reference/ai_comps/normalization.py:11-88, FFN transformer.py:
102-206, DecoderOnlyLayer gpt.py:154-188):

- ``ln_qkv(x, g, b, Wq, Wk, Wv) -> (q, k, v)``: LN then the three
  attention projections, LN stats computed in f32 on the VPU, matmuls on
  the MXU, normalized activations never leave VMEM.
- ``ln_ffn(x, g, b, W1, b1, W2, b2) -> f``: LN then the full 2-layer ReLU
  MLP; the (B*T, 4D) hidden activation never leaves VMEM.

Both are ``custom_vjp`` whose backward kernels RECOMPUTE the normalized
activations from the raw input (one extra LN+matmul per block, all in
VMEM) instead of saving them — the residuals are just the kernel inputs.
Weight gradients accumulate across the sequential TPU grid into
constant-index FLOAT32 output blocks (init at program 0, add afterwards;
one final cast to the weight dtype — not 64 bf16 roundings).

VMEM discipline (the hard constraint — ~16 MB/core): block sizes are
chosen by an explicit footprint estimate, and the FFN backward is
CHUNKED OVER THE HIDDEN DIMENSION — at the published f32 config
W1+W2+dW1+dW2 alone is 16 MB, so one monolithic backward kernel cannot
fit (measured: Mosaic "out of memory in vmem ... 21.01M > 16.00M").
Each F-chunk's backward is independent given df (the ReLU mask is
elementwise in the hidden), producing partial dxn summed in XLA; the
closed-form LayerNorm vjp (nn.functional.layer_norm) finishes dx/dg/db.

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
_VMEM_BUDGET = 10 * 2**20  # leave headroom under the ~16 MB scoped limit


def fused_supported(n_tokens: int, d_model: int, d_ff: int) -> bool:
    """Shapes the kernels handle: lane-aligned dims, whole token blocks."""
    return (n_tokens % 256 == 0 and d_model % 128 == 0 and d_ff % 128 == 0
            and d_model >= 128 and d_ff >= 128)


def _pick_blk(n_tokens: int, fixed_bytes: int, per_row_bytes: int) -> int:
    """Largest token-block size whose footprint fits the VMEM budget."""
    for blk in (256, 128, 64):
        if n_tokens % blk:
            continue
        if fixed_bytes + blk * per_row_bytes <= _VMEM_BUDGET:
            return blk
    return 64


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


def _row_spec(blk, D):
    return pl.BlockSpec((blk, D), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)


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
            dw_ref[:] = dw

        @pl.when(i > 0)
        def _(dw_ref=dw_ref, dw=dw):
            dw_ref[:] = dw_ref[:] + dw

        dxn32 = dxn32 + jax.lax.dot_general(
            dy, w_ref[:], col_contract, preferred_element_type=jnp.float32)

    dx32, dg, db = _ln_bwd_block(dxn32, xhat, rstd, g32)
    dx_ref[:] = dx32.astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _():
        dg_ref[:] = dg
        db_ref[:] = db

    @pl.when(i > 0)
    def _():
        dg_ref[:] = dg_ref[:] + dg
        db_ref[:] = db_ref[:] + db


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def ln_qkv(x, g, b, wq, wk, wv) -> Tuple[jnp.ndarray, ...]:
    """LayerNorm(x) @ {Wq, Wk, Wv} fused; x (..., T, D) -> three like x."""
    return _ln_qkv_impl(x, g, b, wq, wk, wv)


def _ln_qkv_impl(x, g, b, wq, wk, wv):
    shape = x.shape
    D = shape[-1]
    x2d = x.reshape(-1, D)
    N = x2d.shape[0]
    ws = x.dtype.itemsize
    blk = _pick_blk(N, fixed_bytes=3 * D * D * ws,
                    per_row_bytes=D * (4 + 4 * ws) * 2)
    g2, b2 = g.reshape(1, D), b.reshape(1, D)
    outs = pl.pallas_call(
        _ln_qkv_fwd_kernel,
        grid=(N // blk,),
        in_specs=[_row_spec(blk, D), _const_spec((1, D)), _const_spec((1, D)),
                  _const_spec((D, D)), _const_spec((D, D)),
                  _const_spec((D, D))],
        out_specs=[_row_spec(blk, D)] * 3,
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
    ws = x.dtype.itemsize
    blk = _pick_blk(N, fixed_bytes=3 * D * D * (ws + 4),
                    per_row_bytes=D * (5 * 4 + 8 * ws))
    g2, b2 = g.reshape(1, D), b.reshape(1, D)
    f32 = jnp.float32
    dx, dg, db, dwq, dwk, dwv = pl.pallas_call(
        _ln_qkv_bwd_kernel,
        grid=(N // blk,),
        in_specs=[_row_spec(blk, D), _const_spec((1, D)), _const_spec((1, D)),
                  _const_spec((D, D)), _const_spec((D, D)),
                  _const_spec((D, D)),
                  _row_spec(blk, D), _row_spec(blk, D), _row_spec(blk, D)],
        out_specs=[_row_spec(blk, D), _const_spec((1, D)), _const_spec((1, D)),
                   _const_spec((D, D)), _const_spec((D, D)),
                   _const_spec((D, D))],
        out_shape=[jax.ShapeDtypeStruct((N, D), x.dtype),
                   jax.ShapeDtypeStruct((1, D), f32),
                   jax.ShapeDtypeStruct((1, D), f32),
                   jax.ShapeDtypeStruct((D, D), f32),
                   jax.ShapeDtypeStruct((D, D), f32),
                   jax.ShapeDtypeStruct((D, D), f32)],
    )(x2d, g2, b2, wq, wk, wv,
      dq.reshape(-1, D), dk.reshape(-1, D), dv.reshape(-1, D))
    return (dx.reshape(shape), dg.reshape(g.shape).astype(g.dtype),
            db.reshape(b.shape).astype(b.dtype), dwq.astype(wq.dtype),
            dwk.astype(wk.dtype), dwv.astype(wv.dtype))


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


def _ln_ffn_chunk_bwd_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref,
                             df_ref,
                             dxn_ref, dw1_ref, db1_ref, dw2_ref):
    """Backward of ONE hidden-dim chunk: given df, produce this chunk's
    dxn contribution and its dW1/db1/dW2 slices. The ReLU is elementwise
    in the hidden, so chunks are independent; the caller sums dxn and
    finishes with the LayerNorm vjp."""
    i = pl.program_id(0)
    x32 = x_ref[:].astype(jnp.float32)
    xn32, _, _ = _ln(x32, g_ref[:].astype(jnp.float32),
                     b_ref[:].astype(jnp.float32))
    xn = xn32.astype(x_ref.dtype)
    z = (jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32)
         + b1_ref[:].astype(jnp.float32))
    a = jnp.maximum(z, 0.0).astype(x_ref.dtype)

    df = df_ref[:]
    row_contract = (((0,), (0,)), ((), ()))
    col_contract = (((1,), (1,)), ((), ()))
    dw2 = jax.lax.dot_general(a, df, row_contract,
                              preferred_element_type=jnp.float32)
    da = jax.lax.dot_general(df, w2_ref[:], col_contract,
                             preferred_element_type=jnp.float32)
    dz32 = jnp.where(z > 0.0, da, 0.0)
    dz = dz32.astype(x_ref.dtype)
    dw1 = jax.lax.dot_general(xn, dz, row_contract,
                              preferred_element_type=jnp.float32)
    db1 = jnp.sum(dz32, axis=0, keepdims=True)
    dxn32 = jax.lax.dot_general(dz, w1_ref[:], col_contract,
                                preferred_element_type=jnp.float32)
    dxn_ref[:] = dxn32.astype(dxn_ref.dtype)

    @pl.when(i == 0)
    def _():
        dw1_ref[:] = dw1
        db1_ref[:] = db1
        dw2_ref[:] = dw2

    @pl.when(i > 0)
    def _():
        dw1_ref[:] = dw1_ref[:] + dw1
        db1_ref[:] = db1_ref[:] + db1
        dw2_ref[:] = dw2_ref[:] + dw2


def _pick_fc(D: int, F: int, ws: int) -> int:
    """Largest hidden-chunk width whose backward kernel fits the budget
    at a 64-row token block (the block picker can then enlarge rows)."""
    fc = F
    while fc > 128:
        fixed = 2 * D * fc * ws + (D * fc + fc + fc * D) * 4
        per_row = fc * (3 * 4 + 2 * ws) + D * (4 + 3 * ws) * 2
        if fixed + 64 * per_row <= _VMEM_BUDGET:
            return fc
        fc //= 2
    return max(128, fc)


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
    ws = x.dtype.itemsize
    blk = _pick_blk(N, fixed_bytes=2 * D * F * ws,
                    per_row_bytes=F * (4 + ws) + D * 4 * ws)
    f = pl.pallas_call(
        _ln_ffn_fwd_kernel,
        grid=(N // blk,),
        in_specs=[_row_spec(blk, D), _const_spec((1, D)), _const_spec((1, D)),
                  _const_spec((D, F)), _const_spec((1, F)),
                  _const_spec((F, D)), _const_spec((1, D))],
        out_specs=_row_spec(blk, D),
        out_shape=jax.ShapeDtypeStruct((N, D), x.dtype),
    )(x2d, g.reshape(1, D), b.reshape(1, D), w1, b1.reshape(1, F), w2,
      b2.reshape(1, D))
    return f.reshape(shape)


def _ln_ffn_fwd(x, g, b, w1, b1, w2, b2):
    return _ln_ffn_impl(x, g, b, w1, b1, w2, b2), (x, g, b, w1, b1, w2, b2)


def _ln_ffn_bwd(res, df):
    from .functional import layer_norm

    x, g, b, w1, b1, w2, b2 = res
    shape = x.shape
    D = shape[-1]
    F = w1.shape[-1]
    x2d = x.reshape(-1, D)
    df2 = df.reshape(-1, D)
    N = x2d.shape[0]
    ws = x.dtype.itemsize
    fc = _pick_fc(D, F, ws)
    fixed = 2 * D * fc * ws + (D * fc + fc + fc * D) * 4
    per_row = fc * (3 * 4 + 2 * ws) + D * (4 + 3 * ws) * 2
    blk = _pick_blk(N, fixed_bytes=fixed, per_row_bytes=per_row)
    g2, b2d = g.reshape(1, D), b.reshape(1, D)
    f32 = jnp.float32

    dxn = jnp.zeros((N, D), f32)
    dw1_parts, db1_parts, dw2_parts = [], [], []
    for c0 in range(0, F, fc):
        dxn_c, dw1_c, db1_c, dw2_c = pl.pallas_call(
            _ln_ffn_chunk_bwd_kernel,
            grid=(N // blk,),
            in_specs=[_row_spec(blk, D), _const_spec((1, D)),
                      _const_spec((1, D)), _const_spec((D, fc)),
                      _const_spec((1, fc)), _const_spec((fc, D)),
                      _row_spec(blk, D)],
            out_specs=[_row_spec(blk, D), _const_spec((D, fc)),
                       _const_spec((1, fc)), _const_spec((fc, D))],
            out_shape=[jax.ShapeDtypeStruct((N, D), f32),
                       jax.ShapeDtypeStruct((D, fc), f32),
                       jax.ShapeDtypeStruct((1, fc), f32),
                       jax.ShapeDtypeStruct((fc, D), f32)],
        )(x2d, g2, b2d, w1[:, c0:c0 + fc],
          b1.reshape(1, F)[:, c0:c0 + fc], w2[c0:c0 + fc, :], df2)
        dxn = dxn + dxn_c
        dw1_parts.append(dw1_c)
        db1_parts.append(db1_c)
        dw2_parts.append(dw2_c)

    dw1 = (dw1_parts[0] if len(dw1_parts) == 1
           else jnp.concatenate(dw1_parts, axis=1)).astype(w1.dtype)
    db1 = (db1_parts[0] if len(db1_parts) == 1
           else jnp.concatenate(db1_parts, axis=1))
    dw2 = (dw2_parts[0] if len(dw2_parts) == 1
           else jnp.concatenate(dw2_parts, axis=0)).astype(w2.dtype)

    # LayerNorm vjp (the closed-form custom rule in nn.functional) turns
    # the summed dxn into dx/dg/db; db2 is a plain column sum of df.
    _, ln_vjp = jax.vjp(layer_norm, x2d, g, b)
    dx2, dg, db = ln_vjp(dxn.astype(x.dtype))
    db2 = jnp.sum(df2.astype(f32), axis=0).astype(b2.dtype)
    return (dx2.reshape(shape), dg, db, dw1,
            db1.reshape(b1.shape).astype(b1.dtype), dw2, db2)


ln_ffn.defvjp(_ln_ffn_fwd, _ln_ffn_bwd)
