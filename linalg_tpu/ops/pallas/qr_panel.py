"""Pallas TPU kernel: Householder panel factorization in VMEM.

The bottleneck of blocked Householder QR is the sequential per-column
reflector sweep over each (m, b) panel: expressed in XLA it round-trips the
panel through HBM every column (~10 MB of traffic per reflector). This
kernel keeps the whole panel resident in VMEM for all b steps, so each
reflector is pure VPU/MXU work on on-chip data.

Layout: everything is TRANSPOSED. The panel is stored as ``St (b, m)`` —
"column" j of the panel is row j of St — because TPU handles dynamic
indexing on the second-to-last (sublane) axis well, while dynamic lane
indexing is slow. Outputs follow the same convention:

- ``St_out (b, m)``: transformed panel (rows hold R rows of this panel)
- ``Vt (b, m)``: unit-norm reflectors, row j zero left of its pivot column
- ``Tt (b, b)``: the TRANSPOSE of the compact-WY triangular factor, i.e.
  H_0 H_1 ... H_{b-1} = I - V T V^T with T = Tt^T and tau = 2 (unit-norm
  reflectors, reference convention /root/reference/linalg/qr.py:77-91).

The caller (ops/qr.py) does the trailing-matrix updates and economy-Q
back-accumulation as large MXU matmuls in plain XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.numerics import eps_for


def _panel_kernel(k_ref, s_in_ref, s_ref, vt_ref, tt_ref, *, block: int, eps: float):
    # s_in_ref may alias s_ref (input_output_aliases); the copy is then a
    # no-op, but guarantees s_ref holds the input either way.
    s_ref[:] = s_in_ref[:]
    b, m = s_ref.shape
    vt_ref[:] = jnp.zeros_like(vt_ref)
    tt_ref[:] = jnp.zeros_like(tt_ref)

    lane = lax.broadcasted_iota(jnp.int32, (1, m), 1)
    brow = lax.broadcasted_iota(jnp.int32, (1, b), 1)
    rows = lax.broadcasted_iota(jnp.int32, (b, 1), 0)
    k = k_ref[0]

    # No dynamic sublane indexing anywhere: Mosaic lowers pl.ds row
    # reads/writes very slowly, so row selection is a masked reduce and row
    # writes are masked full-array selects — all plain VPU passes. The
    # skinny matvecs are VPU multiply+reduce in full f32 (an MXU dot would
    # truncate operands to bf16, ~1e-3 relative error per reflector).
    def body(jl, _):
        jg = k + jl
        S = s_ref[:]
        row_sel = rows == jl  # (b, 1)
        x_row = jnp.sum(jnp.where(row_sel, S, 0.0), axis=0, keepdims=True)  # (1, m)
        live = lane >= jg
        x = jnp.where(live, x_row, 0.0)
        nrm2 = jnp.sum(x * x)
        nrm = jnp.sqrt(nrm2)
        has = nrm >= eps
        x0 = jnp.sum(jnp.where(lane == jg, x, 0.0))
        alpha = jnp.where(x0 >= 0, nrm, -nrm)
        w_un = x + jnp.where(lane == jg, alpha, 0.0)
        # ||x + alpha e||^2 = ||x||^2 + 2 alpha x0 + alpha^2, analytically.
        wn2 = nrm2 + 2.0 * alpha * x0 + alpha * alpha
        inv = lax.rsqrt(jnp.where(wn2 == 0, 1.0, wn2))
        w = jnp.where(has, w_un * inv, 0.0)  # (1, m)

        # Apply H = I - 2 w w^T to every panel column: S -= 2 (S w^T) w.
        y = jnp.sum(S * w, axis=1, keepdims=True)  # (b, 1)
        s_ref[:] = S - 2.0 * y * w
        V = jnp.where(row_sel, w, vt_ref[:])
        vt_ref[:] = V

        # Compact-WY update (transposed): Tt[jl, :jl] = -2 (z^T Tt)[:jl],
        # Tt[jl, jl] = 2, with z = V^T w (entry jl excluded).
        z = jnp.sum(V * w, axis=1, keepdims=True)  # (b, 1)
        z_col = jnp.where(row_sel, 0.0, z)
        t_row = -2.0 * jnp.sum(z_col * tt_ref[:], axis=0, keepdims=True)  # (1, b)
        t_row = jnp.where(brow == jl, jnp.where(has, 2.0, 0.0), t_row)
        tt_ref[:] = jnp.where(row_sel, t_row, tt_ref[:])
        return 0

    lax.fori_loop(0, block, body, 0)


def _strip_kernel(k_ref, s_in_ref, s_ref, vt_ref, tt_ref, *, block: int,
                  eps: float):
    """Fully-UNROLLED reflector sweep for a narrow strip (block <= 32).

    Unrolling makes every row index STATIC, so the row read (``s_ref[j]``),
    the reflector write (``vt_ref[j] = w``) and the T-recurrence slice
    (``vt_ref[:j]``) are cheap static-sublane accesses instead of
    masked full-array passes — ~4x less VMEM traffic per reflector than
    ``_panel_kernel``. Same math, same outputs.
    """
    s_ref[:] = s_in_ref[:]
    b, m = s_ref.shape
    vt_ref[:] = jnp.zeros_like(vt_ref)
    tt_ref[:] = jnp.zeros_like(tt_ref)

    lane = lax.broadcasted_iota(jnp.int32, (1, m), 1)
    brow = lax.broadcasted_iota(jnp.int32, (1, b), 1)
    k = k_ref[0]

    for jl in range(block):  # static unroll
        jg = k + jl
        x_row = s_ref[jl : jl + 1, :]  # (1, m) static row read
        live = lane >= jg
        x = jnp.where(live, x_row, 0.0)
        nrm2 = jnp.sum(x * x)
        nrm = jnp.sqrt(nrm2)
        has = nrm >= eps
        x0 = jnp.sum(jnp.where(lane == jg, x, 0.0))
        alpha = jnp.where(x0 >= 0, nrm, -nrm)
        w_un = x + jnp.where(lane == jg, alpha, 0.0)
        wn2 = nrm2 + 2.0 * alpha * x0 + alpha * alpha
        inv = lax.rsqrt(jnp.where(wn2 == 0, 1.0, wn2))
        w = jnp.where(has, w_un * inv, 0.0)  # (1, m)

        S = s_ref[:]
        y = jnp.sum(S * w, axis=1, keepdims=True)  # (b, 1) VPU f32
        s_ref[:] = S - 2.0 * y * w
        vt_ref[jl : jl + 1, :] = w

        # Compact-WY (transposed): Tt[jl, :jl] = -2 (z^T Tt[:jl]),
        # Tt[jl, jl] = 2, z = V[:jl] w^T — static slices only.
        if jl:
            zj = jnp.sum(vt_ref[0:jl, :] * w, axis=1, keepdims=True)
            t_row = -2.0 * jnp.sum(zj * tt_ref[0:jl, :], axis=0,
                                   keepdims=True)
        else:
            t_row = jnp.zeros((1, b), s_ref.dtype)
        t_row = jnp.where(brow == jl, jnp.where(has, 2.0, 0.0), t_row)
        tt_ref[jl : jl + 1, :] = t_row


@functools.partial(jax.jit, static_argnames=("block",))
def factor_strip(St, k, block: int = 32):
    """Factor a transposed strip St (b, m), b <= 32, pivots starting at k.

    Same contract as ``factor_panel`` (St_out, Vt, Tt), using the unrolled
    static-index kernel.
    """
    b, m = St.shape
    assert b == block and block <= 64
    eps = eps_for(St.dtype)
    kernel = functools.partial(_strip_kernel, block=block, eps=float(eps))
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, m), St.dtype),
            jax.ShapeDtypeStruct((b, m), St.dtype),
            jax.ShapeDtypeStruct((b, b), St.dtype),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
    )(jnp.asarray([k], dtype=jnp.int32), St)


@functools.partial(jax.jit, static_argnames=("block",))
def factor_panel(St, k, block: int):
    """Factor a transposed panel St (b, m) with pivot columns starting at k.

    Returns (St_out, Vt, Tt) as described in the module docstring.
    """
    b, m = St.shape
    assert b == block
    eps = eps_for(St.dtype)
    kernel = functools.partial(_panel_kernel, block=block, eps=float(eps))
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, m), St.dtype),
            jax.ShapeDtypeStruct((b, m), St.dtype),
            jax.ShapeDtypeStruct((b, b), St.dtype),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
    )(jnp.asarray([k], dtype=jnp.int32), St)


@functools.partial(jax.jit,
                   static_argnames=("block", "precision", "inner", "pair",
                                    "agg"))
def householder_qr_pallas(A, block: int = 128,
                          precision=lax.Precision.HIGHEST,
                          inner: int = 32, pair: bool = True,
                          agg: int = 0):
    """Blocked economy Householder QR with the Pallas panel kernel.

    A must be (m, n) float32 with n % block == 0 and m >= n (the public
    wrapper in ops/qr.py pads/validates). Works entirely in the transposed
    layout; the only materialized transposes are on input and output.

    ``agg`` aggregates runs of adjacent panels into one rank-``agg*block``
    compact-WY operator for the FAR-FIELD updates (trailing columns beyond
    the run, and the Q rows below it): the same matmul FLOPs, but the
    far-field block streams through HBM once per RUN instead of once per
    panel — dividing the passes of the two phases that dominate the
    4096^2 wall time by ``agg`` (round-2 phase probe: trailing ~3.7 ms +
    Q ~3.9 ms of 9.6). Inside a run, panel j's rows take one near-field
    update with the running rank-``j*block`` prefix operator before being
    factored. ``agg=0`` derives 2/1 from the legacy ``pair`` flag.

    Measured on-chip at 4096^2 (interleaved A/B): agg=1 13.66 ms,
    agg=2 6.81-7.94, agg=4 9.67, agg=8 11.71 (XLA 11.65-11.80) — TWO is
    the optimum. Aggregation conserves FLOPs but converts far-field
    big-matmul passes into per-panel near-field updates on only
    ``block`` rows, which underutilize the MXU; past g=2 that loss
    outweighs the halved far-field HBM traffic.
    """
    if agg <= 0:
        agg = 2 if pair else 1
    m, n = A.shape
    dtype = A.dtype
    # Reflectors of panel k are ZERO in lanes < k, so every block update
    # only reads/writes lanes >= k — slicing the live lanes cuts ~1/3 of
    # all trailing/Q matmul flops for square inputs. k is quantized to
    # multiples of LQ to bound the number of distinct compiled shapes.
    LQ = 256

    def kq_of(k: int) -> int:
        return min((k // LQ) * LQ, max(m - LQ, 0))

    def apply_live(Xl, Vl, Tt, transpose_t: bool):
        """Xl := Xl Q_panel^(T) on the LIVE lanes only (lanes >= kq).

        transpose_t False applies (I - V T^T V^T) (trailing update); True
        applies (I - V T V^T) (Q accumulation).
        """
        G = jax.lax.dot_general(
            Xl, Vl, (((1,), (1,)), ((), ())),
            precision=precision, preferred_element_type=dtype,
        )  # (rows, b)
        if transpose_t:
            H = jnp.dot(G, Tt, precision=precision,
                        preferred_element_type=dtype)
        else:
            # H = G @ T = G @ Tt^T (contract both dim-1s).
            H = jax.lax.dot_general(
                G, Tt, (((1,), (1,)), ((), ())),
                precision=precision, preferred_element_type=dtype,
            )
        return Xl - jnp.dot(H, Vl, precision=precision,
                            preferred_element_type=dtype)

    def block_apply(Xt, Vl, Tt, kq: int, transpose_t: bool):
        """Full-width variant: lanes < kq pass through via concat (used in
        the in-panel strip updates where rows shrink every step)."""
        new_live = apply_live(Xt[:, kq:], Vl, Tt, transpose_t)
        if kq == 0:
            return new_live
        return jnp.concatenate([Xt[:, :kq], new_live], axis=1)

    def wy_merge(Vt1, Tt1, Vt2, Tt2, kq: int):
        """Merge two transposed WY factors into one rank-(r1+r2) factor.

        (I - V1 T1 V1^T)(I - V2 T2 V2^T) = I - Vc Tc Vc^T with
        Vc = [V1; V2] and Tc = [[T1, -T1 (V1^T V2) T2], [0, T2]];
        transposed: Ttc lower-left = -Tt2 (Vt2 Vt1^T) Tt1. The SAME Ttc
        serves the trailing (transpose_t=False) and Q (True) sides, just
        like a single panel's Tt.
        """
        r1, r2 = Vt1.shape[0], Vt2.shape[0]
        gram = jax.lax.dot_general(
            Vt2[:, kq:], Vt1[:, kq:], (((1,), (1,)), ((), ())),
            precision=precision, preferred_element_type=dtype,
        )  # (r2, r1) = V2^T V1 over live lanes
        cross = -jnp.dot(
            jnp.dot(Tt2, gram, precision=precision,
                    preferred_element_type=dtype),
            Tt1, precision=precision, preferred_element_type=dtype,
        )
        Ttc = jnp.concatenate(
            [
                jnp.concatenate([Tt1, jnp.zeros((r1, r2), dtype)], axis=1),
                jnp.concatenate([cross, Tt2], axis=1),
            ],
            axis=0,
        )
        return jnp.concatenate([Vt1, Vt2], axis=0), Ttc

    # Factorization: carry only the SHRINKING trailing block (no functional
    # updates of the full matrix — those cost a 64 MB copy per panel at
    # n = 4096). Processed R rows accumulate in a list, concatenated once.
    #
    # TWO-LEVEL panels: each width-`block` panel is factored as
    # `block/b_in` narrow strips through the unrolled VMEM kernel (the
    # reflector sweep's VMEM traffic scales as b^2*m, so narrow strips are
    # ~4x cheaper), with rank-b_in MXU updates INSIDE the panel and the
    # strip WY factors merged into one (block, block) T — the expensive
    # trailing/Q updates stay at full rank-`block`.
    b_in = inner if block % inner == 0 and block > inner else block

    def factor_block(Pt, k: int):
        """Factor a (block, m) transposed panel via b_in-wide strips.

        Returns (St, Vt, Tt) with the same contract as ``factor_panel``.
        """
        done_rows = []
        sub = []
        for i in range(0, block, b_in):
            St_i, Vt_i, Tt_i = factor_strip(Pt[:b_in, :], k + i, b_in)
            done_rows.append(St_i)
            rest = Pt[b_in:, :]
            if rest.shape[0]:
                kqi = kq_of(k + i)
                rest = block_apply(rest, Vt_i[:, kqi:], Tt_i, kqi,
                                   transpose_t=False)
            sub.append((Vt_i, Tt_i))
            Pt = rest
        St = (done_rows[0] if len(done_rows) == 1
              else jnp.concatenate(done_rows, axis=0))
        # Merge the strip WY factors into one (block, block) factor; the
        # strip Gram/merge dots are tiny vs the sweep.
        Vt, Tt = sub[0]
        kq = kq_of(k)
        for Vt_i, Tt_i in sub[1:]:
            Vt, Tt = wy_merge(Vt, Tt, Vt_i, Tt_i, kq)
        return St, Vt, Tt

    # Factorization over ONE fixed (n, m) buffer: each panel reads its rows
    # with a static-offset slice, and the trailing update touches only rows
    # [k+block, n) x lanes [kq, m) via dynamic_update_slice — XLA keeps the
    # buffer in place, where the previous shrinking-concat formulation
    # re-materialized (and copied the cold lanes of) the whole trailing
    # block every panel (~0.5-1 GB of pure copy traffic at 4096^2).
    #
    # With ``pair``: panel 2i updates only its NEAR field (the next panel's
    # rows), then the merged rank-2b operator of panels (2i, 2i+1) sweeps
    # the far field once.
    M = A.T  # (n, m): row j is column j
    # groups: (members [(k, Vt, Tt)], prefix_Ts [Ttc of panels [0..j+1)],
    # kq). prefix V factors are concats of the members' Vt, rebuilt on use.
    groups = []
    ks = list(range(0, n, block))
    i = 0
    while i < len(ks):
        g = min(agg, len(ks) - i)
        kq = kq_of(ks[i])
        members = []
        prefix_Ts = []
        Vc = None  # running prefix factor (concat of member Vts)
        Ttc = None
        for j in range(g):
            kj = ks[i + j]
            if j > 0:
                # near field: one update of panel j's rows with the
                # rank-(j*block) prefix operator
                near = lax.dynamic_slice(M, (kj, kq), (block, m - kq))
                near = apply_live(near, Vc[:, kq:], Ttc, transpose_t=False)
                M = lax.dynamic_update_slice(M, near, (kj, kq))
            Pt = lax.dynamic_slice(M, (kj, 0), (block, m))
            St, Vt, Tt = factor_block(Pt, kj)
            M = lax.dynamic_update_slice(M, St, (kj, 0))
            members.append((kj, Vt, Tt))
            if j == 0:
                Vc, Ttc = Vt, Tt
            else:
                Vc, Ttc = wy_merge(Vc, Ttc, Vt, Tt, kq)
            prefix_Ts.append(Ttc)
        k_end = ks[i + g - 1] + block
        if k_end < n:
            live = lax.dynamic_slice(M, (k_end, kq), (n - k_end, m - kq))
            live = apply_live(live, Vc[:, kq:], Ttc, transpose_t=False)
            M = lax.dynamic_update_slice(M, live, (k_end, kq))
        groups.append((members, prefix_Ts, kq))
        i += g

    # Economy Q (transposed), reverse accumulation with a GROWING block in
    # one zero-initialized (n, m) buffer: before panel p touches them, rows
    # [k_p, k_p + b) of Qt are still identity rows. Structure exploited:
    # for X = [E_b; X_prev], the identity block's contribution to
    # G = X V^T is just a slice of Vt (no matmul), so the big dot only
    # reads the previously-accumulated rows; lanes < kq stay zero in the
    # buffer so only live lanes are ever written.
    def e_top(k: int, Vt, Tt, kq: int):
        """(I - V T V^T) applied to this panel's identity rows, live lanes.

        E_b V^T is just a slice of Vt — (b, b), no matmul. Rows of E at
        global index >= m are zero (column-padded inputs), so the slice
        is zero-padded to the panel width. E-block rows have their 1s at
        lanes k..k+b >= kq: the untouched lanes < kq are exactly zero.
        """
        Vl = Vt[:, kq:]
        hi = min(k + block, m)
        G_top = Vl[:, k - kq : hi - kq].T
        if hi - k < block:
            G_top = jnp.concatenate(
                [G_top, jnp.zeros((block - (hi - k), block), dtype)], axis=0
            )
        H_top = jnp.dot(G_top, Tt, precision=precision,
                        preferred_element_type=dtype)
        e_rows = jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0) + k
        e_live = (e_rows == jnp.arange(kq, m)[None, :]).astype(dtype)
        return e_live - jnp.dot(H_top, Vl, precision=precision,
                                preferred_element_type=dtype)

    Qt = jnp.zeros((n, m), dtype)
    for members, prefix_Ts, kq in reversed(groups):
        g = len(members)
        k_end = members[-1][0] + block
        # far field (rows below the run) once, with the full merged factor
        if k_end < n:
            Vfull = jnp.concatenate([Vt for _, Vt, _ in members], axis=0)
            prev = lax.dynamic_slice(Qt, (k_end, kq), (n - k_end, m - kq))
            prev = apply_live(prev, Vfull[:, kq:], prefix_Ts[-1],
                              transpose_t=True)
            Qt = lax.dynamic_update_slice(Qt, prev, (k_end, kq))
        # panel j's identity rows, then the rank-(j*block) prefix operator
        # of the panels before it applied on top
        for j in range(g - 1, -1, -1):
            kj, Vt, Tt = members[j]
            top = e_top(kj, Vt, Tt, kq)
            if j > 0:
                Vpre = jnp.concatenate(
                    [V for _, V, _ in members[:j]], axis=0)
                top = apply_live(top, Vpre[:, kq:], prefix_Ts[j - 1],
                                 transpose_t=True)
            Qt = lax.dynamic_update_slice(Qt, top, (kj, kq))

    R = jnp.triu(M[:, :n].T)
    return Qt.T, R
