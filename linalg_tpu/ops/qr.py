"""QR decompositions, TPU-native.

Capability parity with the reference's ``linalg/qr.py``
(/root/reference/linalg/qr.py:14-134): ``qr`` (Modified Gram-Schmidt with
optional re-orthogonalization), ``householder_qr`` (economy, m >= n),
``least_squares_qr`` and ``least_squares_householder_qr``.

TPU-first design (not a port):

- **MGS** is the right-looking (row-wise) variant: when column j is
  finalized, its coefficients against all trailing columns are computed in
  one matvec and subtracted in one rank-1 update — a single
  ``lax.fori_loop`` of n fully-vectorized steps instead of the reference's
  O(n^2) scalar inner loop. Mathematically identical to MGS.
- **Householder** is blocked with compact-WY reflectors: panels of
  ``block`` columns are factorized by an in-VMEM ``fori_loop`` of rank-1
  reflector applications while the trailing matrix update and the economy-Q
  back-accumulation are large MXU matmuls ``C -= V (T^T (V^T C))``. Dots use
  ``Precision.HIGHEST`` so float32 residuals stay at ~1e-7 relative.
- Rank deficiency is carried as a status flag in the jitted core; the host
  wrapper raises the reference's ``ValueError``.

Deviation from the reference (deliberate): the reference's
``qr(A, reorth=True)`` overwrites R with the second pass's coefficients, so
its returned pair no longer satisfies A = QR. Here ``reorth=True`` returns
``R = R2 @ R1`` so A = QR holds *and* orthogonality is machine-precision.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.numerics import eps_for

__all__ = [
    "qr",
    "householder_qr",
    "least_squares_qr",
    "least_squares_householder_qr",
]

_HIGH = lax.Precision.HIGHEST


def _dot(a, b):
    return jnp.dot(a, b, precision=_HIGH, preferred_element_type=a.dtype)


# ---------------------------------------------------------------------------
# Modified Gram-Schmidt
# ---------------------------------------------------------------------------


@jax.jit
def _mgs_core(A):
    """Right-looking MGS. Returns (Q, R, ok) — ok False on rank deficiency."""
    m, n = A.shape
    eps = eps_for(A.dtype)
    col_ids = jnp.arange(n)

    def body(j, carry):
        W, R, ok = carry  # W: columns < j are final q's, >= j are working
        v = W[:, j]
        nrm = jnp.sqrt(_dot(v, v))
        ok = ok & (nrm >= eps)
        q = v / jnp.where(nrm == 0, 1.0, nrm).astype(A.dtype)
        coeffs = _dot(q, W)  # (n,) projections onto every column
        trailing = col_ids > j
        W = W - jnp.outer(q, jnp.where(trailing, coeffs, 0.0))
        W = W.at[:, j].set(q)
        rrow = jnp.where(trailing, coeffs, 0.0).at[j].set(nrm)
        R = R.at[j].set(rrow)
        return W, R, ok

    Q, R, ok = lax.fori_loop(
        0, n, body, (A, jnp.zeros((n, n), A.dtype), jnp.bool_(True))
    )
    return Q, R, ok


def qr(A, reorth: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Modified Gram-Schmidt QR of a full-column-rank matrix.

    Returns (Q (m, n) orthonormal columns, R (n, n) upper-triangular) with
    A = QR. ``reorth=True`` runs a second Gram-Schmidt pass ("twice is
    enough") for machine-precision orthogonality. Raises ``ValueError`` on
    linearly dependent input columns (reference semantics, qr.py:40-41).
    """
    A = _as_float(A)
    Q, R, ok = _mgs_core(A)
    if not bool(ok):
        raise ValueError("Input vectors are linearly dependent")
    if reorth:
        Q, R2, ok2 = _mgs_core(Q)
        if not bool(ok2):
            raise ValueError("Input vectors are linearly dependent")
        R = jnp.triu(_dot(R2, R))
    return Q, R


# ---------------------------------------------------------------------------
# Blocked Householder (compact WY)
# ---------------------------------------------------------------------------


def _panel_factor(P, k: int, rows):
    """Factor one panel (m, b) whose pivot rows start at global row k.

    Returns (P_out, V, T): P_out is the transformed panel (R entries in the
    top, annihilated below), V the unit-norm reflectors (zeros above their
    pivot row), T the (b, b) upper-triangular compact-WY factor such that
    H_0 H_1 ... H_{b-1} = I - V T V^T with tau = 2 (unit-norm reflectors,
    reference convention qr.py:77-91).
    """
    m, b = P.shape
    dtype = P.dtype
    eps = eps_for(dtype)

    def body(jl, carry):
        P, V, T = carry
        jg = k + jl
        x = jnp.where(rows >= jg, P[:, jl], 0.0)
        nrm = jnp.sqrt(_dot(x, x))
        has = nrm >= eps
        x0 = P[jg, jl]
        # copysign(nrm, x0) — spelled with where() because jnp.copysign's
        # bitcast lowering is unsupported by the TPU x64-rewrite pass.
        alpha = jnp.where(x0 >= 0, nrm, -nrm)
        w_un = x.at[jg].add(alpha)
        wn = jnp.sqrt(_dot(w_un, w_un))
        w = jnp.where(has, w_un / jnp.where(wn == 0, 1.0, wn), 0.0).astype(dtype)
        # Apply H = I - 2 w w^T to the whole panel (finalized columns have
        # ~zero below their pivot, so the extra columns are a no-op).
        P = P - 2.0 * jnp.outer(w, _dot(w, P))
        V = V.at[:, jl].set(w)
        # T column: T[:jl, jl] = -2 T[:jl,:jl] (V^T w); T[jl, jl] = 2.
        z = _dot(w, V)  # (b,) — only entries < jl are nonzero (w ⊥ itself? no: z[jl] = 1)
        z = z.at[jl].set(0.0)
        tcol = -2.0 * _dot(T, z)
        tcol = tcol.at[jl].set(jnp.where(has, 2.0, 0.0))
        T = T.at[:, jl].set(tcol)
        return P, V, T

    init = (P, jnp.zeros((m, b), dtype), jnp.zeros((b, b), dtype))
    return lax.fori_loop(0, b, body, init)


@partial(jax.jit, static_argnames=("block",))
def _householder_core(A, block: int):
    """Blocked Householder QR. A is (m, n) with n % block == 0, m >= n.

    Returns (Q (m, n), R (n, n)).
    """
    m, n = A.shape
    dtype = A.dtype
    rows = jnp.arange(m)
    R = A
    panels = []  # (k, V, T) per panel — Python loop, static shapes

    for k in range(0, n, block):
        P = lax.dynamic_slice(R, (0, k), (m, block))
        P, V, T = _panel_factor(P, k, rows)
        R = lax.dynamic_update_slice(R, P, (0, k))
        # Trailing update: C -= V (T^T (V^T C)) applies Q_panel^T.
        if k + block < n:
            C = R[:, k + block :]
            W = _dot(T.T, _dot(V.T, C))
            R = R.at[:, k + block :].set(C - _dot(V, W))
        panels.append((k, V, T))

    # Economy Q: apply panels in reverse to the (m, n) identity block.
    Q = jnp.eye(m, n, dtype=dtype)
    for k, V, T in reversed(panels):
        X = Q[:, k:]
        W = _dot(T, _dot(V.T, X))
        Q = Q.at[:, k:].set(X - _dot(V, W))

    R = jnp.triu(R[:n, :n])
    return Q, R


def householder_qr(A, block: int = 128) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Economy Householder QR of an (m, n) matrix with m >= n.

    Returns (Q (m, n) orthonormal columns, R (n, n) upper-triangular) with
    A = QR. Numerically-zero columns are skipped, leaving a zero on R's
    diagonal (reference semantics, qr.py:75-77). Blocked compact-WY
    implementation; ``block`` tunes the panel width (MXU-aligned default).
    """
    A = _as_float(A)
    m, n = A.shape
    if m < n:
        raise ValueError(f"householder_qr requires m >= n, got {A.shape}")
    b = max(1, min(block, _next_pow2(n)))
    # TPU float32 path: Pallas panel kernel (VMEM-resident reflector sweep).
    # The panel buffers are (b, m) so m is capped by VMEM; everything else
    # (f64 correctness tests on CPU, huge m) uses the lax core.
    use_pallas = (
        A.dtype == jnp.float32
        and jax.default_backend() == "tpu"
        and n >= 2 * b
        and m <= 16384
    )
    n_pad = -(-n // b) * b
    if n_pad != n:
        # Zero-padding columns is safe: their reflectors are skipped
        # (norm 0), even when the padded pivot row would exceed m.
        A_p = jnp.concatenate([A, jnp.zeros((m, n_pad - n), A.dtype)], axis=1)
    else:
        A_p = A
    if use_pallas:
        from .pallas.qr_panel import householder_qr_pallas

        Q, R = householder_qr_pallas(A_p, block=b)
    else:
        Q, R = _householder_core(A_p, b)
    return Q[:, :n], R[:n, :n]


def _next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


def _as_float(A, allow_batched: bool = False) -> jnp.ndarray:
    A = jnp.asarray(A)
    if not jnp.issubdtype(A.dtype, jnp.floating):
        A = A.astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    want = 3 if allow_batched else 2
    if A.ndim != want:
        raise ValueError(f"A must be {want}-D")
    return A


# ---------------------------------------------------------------------------
# Least squares
# ---------------------------------------------------------------------------


def _solve_upper(R, y):
    return jax.scipy.linalg.solve_triangular(R, y, lower=False)


def least_squares_qr(A, b) -> jnp.ndarray:
    """min ||Ax - b||_2 via thin MGS QR (reference qr.py:103-119)."""
    A = _as_float(A)
    b = jnp.asarray(b, dtype=A.dtype)
    _m, n = A.shape
    Q, R = qr(A)
    y = _dot(Q.T, b)
    return _solve_upper(R[:n, :n], y[:n]).ravel()


def least_squares_householder_qr(A, b) -> jnp.ndarray:
    """min ||Ax - b||_2 via economy Householder QR (reference qr.py:122-134)."""
    A = _as_float(A)
    b = jnp.asarray(b, dtype=A.dtype)
    Q, R = householder_qr(A)
    y = _dot(Q.T, b)
    return _solve_upper(R, y).ravel()
