"""Gaussian elimination with partial pivoting, TPU-native.

Capability parity with the reference's ``linalg/elimination.py``
(/root/reference/linalg/elimination.py:17-246): ``forward_eliminate``,
``back_substitute``, ``gaussian_solve``, ``rref``, ``rank_elimination``,
``nullspace_basis_elimination`` — same signatures, return conventions and
raising semantics.

TPU-first design (not a port):

- The column sweep is a single ``lax.fori_loop`` compiled once by XLA — fixed
  shapes, no host sync per column. Pivot argmax, row swaps and the rank-1
  trailing update all stay on device.
- Data-dependent control flow (rank deficiency, inconsistency) is carried as
  status flags/masks in the jitted core; thin host wrappers convert masks to
  the reference's Python-list outputs and raise the reference's errors.
- Dtype follows the input (float64 for reference-tolerance tests on CPU,
  float32 on TPU), with dtype-aware tolerances from ``utils.numerics``.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..utils.numerics import scale_tol

logger = logging.getLogger(__name__)

__all__ = [
    "forward_eliminate",
    "back_substitute",
    "gaussian_solve",
    "rref",
    "rank_elimination",
    "nullspace_basis_elimination",
]


# ---------------------------------------------------------------------------
# jitted cores (fixed shapes, mask-encoded dynamic rank)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("pivot",))
def _forward_eliminate_core(A, b, pivot: bool):
    """Row-echelon reduction. Returns (U, c, perm, sign, pivot_row, rank).

    ``pivot_row[col]`` is the row index where column ``col``'s pivot landed,
    or -1 if the column is free. ``sign`` is the permutation parity (+/-1).
    ``b`` must be (m, k); pass zeros if there is no RHS.
    """
    m, n = A.shape
    tol = scale_tol(A)
    row_ids = jnp.arange(m)

    def body(col, carry):
        U, c, perm, sign, pivot_row, r = carry
        colabs = jnp.abs(U[:, col])
        masked = jnp.where(row_ids >= r, colabs, -jnp.inf)
        piv = jnp.argmax(masked)
        has_pivot = masked[piv] > tol

        # r can equal m once all rows hold pivots; clamp (has_pivot is False
        # there, so every update below is a no-op).
        r_c = jnp.minimum(r, m - 1)
        if pivot:
            piv_eff = jnp.where(has_pivot, piv, r_c)
        else:
            piv_eff = r_c
        # Swap rows r_c and piv_eff (identity swap when equal).
        idx = row_ids.at[r_c].set(piv_eff).at[piv_eff].set(r_c)
        U = U[idx]
        c = c[idx]
        perm = perm[idx]
        sign = sign * jnp.where(piv_eff != r_c, -1, 1)

        pivval = U[r_c, col]
        safe = jnp.where(pivval == 0, 1.0, pivval).astype(U.dtype)
        factors = jnp.where((row_ids > r_c) & has_pivot, U[:, col] / safe, 0.0)
        U = U - factors[:, None] * U[r_c][None, :]
        # Exact zeros below the pivot in this column.
        U = U.at[:, col].set(
            jnp.where((row_ids > r_c) & has_pivot, 0.0, U[:, col])
        )
        c = c - factors[:, None] * c[r_c][None, :]

        pivot_row = pivot_row.at[col].set(jnp.where(has_pivot, r_c, -1))
        r = r + has_pivot.astype(r.dtype)
        return U, c, perm, sign, pivot_row, r

    init = (
        A,
        b,
        jnp.arange(m),
        jnp.int32(1),
        jnp.full((n,), -1, dtype=jnp.int32),
        jnp.int32(0),
    )
    return lax.fori_loop(0, n, body, init)


@jax.jit
def _back_substitute_core(U, c, tol):
    """Solve Ux = c for square upper-triangular U with status flags.

    Returns (x, any_zero_pivot, worst_i, inconsistent_at_worst) where
    ``worst_i`` is the largest row index with a ~zero diagonal (the first one
    the reference's bottom-up loop would hit, elimination.py:131-142).
    """
    n, k = c.shape
    diag = jnp.abs(jnp.diagonal(U))
    zero_piv = diag <= tol
    any_zero = jnp.any(zero_piv)
    # Largest i with zero_piv[i]; 0 if none (unused then).
    rev_idx = jnp.argmax(zero_piv[::-1])
    worst_i = jnp.where(any_zero, n - 1 - rev_idx, 0)
    inconsistent = jnp.any(jnp.abs(c[worst_i]) > tol)

    col_ids = jnp.arange(n)

    def body(t, x):
        i = n - 1 - t
        urow = jnp.where(col_ids > i, U[i], 0.0)
        s = c[i] - urow @ x
        piv = U[i, i]
        safe = jnp.where(piv == 0, 1.0, piv).astype(U.dtype)
        return x.at[i].set(s / safe)

    x = lax.fori_loop(0, n, body, jnp.zeros((n, k), dtype=U.dtype))
    return x, any_zero, worst_i, inconsistent


@jax.jit
def _rref_core(U, pivot_row, tol):
    """Backward sweep of RREF given the forward-eliminated U.

    ``pivot_row[col]`` maps pivot columns to their row (or -1).
    """
    m, n = U.shape
    row_ids = jnp.arange(m)
    # Invert pivot_row: for each row, the pivot column it owns (or n).
    pivcol_of_row = jnp.full((m,), n, dtype=jnp.int32)
    valid = pivot_row >= 0
    rows = jnp.where(valid, pivot_row, m)  # out-of-bounds dropped
    pivcol_of_row = pivcol_of_row.at[rows].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop"
    )

    def body(t, R):
        rr = m - 1 - t
        col = pivcol_of_row[rr]
        has = col < n
        col_c = jnp.minimum(col, n - 1)
        piv_val = R[rr, col_c]
        do_scale = has & (jnp.abs(piv_val) > tol)
        safe = jnp.where(piv_val == 0, 1.0, piv_val).astype(R.dtype)
        new_row = jnp.where(do_scale, R[rr] / safe, R[rr])
        R = R.at[rr].set(new_row)
        # Zero entries above the pivot.
        factors = jnp.where((row_ids < rr) & has, R[:, col_c], 0.0)
        R = R - factors[:, None] * R[rr][None, :]
        return R

    R = lax.fori_loop(0, m, body, U)
    R = jnp.where(jnp.abs(R) < tol, 0.0, R)
    return R


@jax.jit
def _nullspace_core(U, pivot_row, rank):
    """Candidate nullspace vector for every column j of A.

    Returns Z of shape (n, n): column j is the basis vector that would arise
    if column j were free (garbage for pivot columns; the host wrapper keeps
    only free columns). Implements the reference's per-free-column
    back-substitution through the pivot submatrix (elimination.py:221-246),
    vectorized across all columns with fixed shapes.
    """
    m, n = U.shape
    # pivcols[i] = column of the i-th pivot (row i), or n (padding).
    pivcols = jnp.full((n,), n, dtype=jnp.int32)
    valid = pivot_row >= 0
    slot = jnp.where(valid, pivot_row, n)
    pivcols = pivcols.at[slot].set(jnp.arange(n, dtype=jnp.int32), mode="drop")

    pivcols_c = jnp.minimum(pivcols, n - 1)
    # Rsub[i, t] = U[i, pivcols[t]] — the (rank x rank) pivot submatrix,
    # padded to (n, n). Rows beyond m-1 read as zero via clamping+mask.
    r_rows = jnp.minimum(jnp.arange(n), m - 1)
    Rsub = U[r_rows[:, None], pivcols_c[None, :]]
    Rsub = jnp.where(
        (jnp.arange(n)[:, None] < rank) & (jnp.arange(n)[None, :] < rank),
        Rsub,
        0.0,
    )
    # RHS[i, j] = -U[i, j] for pivot rows i < rank, all candidate columns j.
    RHS = -U[r_rows][:, :]
    RHS = jnp.where(jnp.arange(n)[:, None] < rank, RHS, 0.0)

    t_ids = jnp.arange(n)

    def body(s, X):
        i = n - 1 - s
        active = i < rank
        rrow = jnp.where(t_ids > i, Rsub[i], 0.0)
        num = RHS[i] - rrow @ X
        piv = Rsub[i, i]
        safe = jnp.where(piv == 0, 1.0, piv).astype(U.dtype)
        xi = jnp.where(active, num / safe, 0.0)
        return X.at[i].set(xi)

    X = lax.fori_loop(0, n, body, jnp.zeros((n, n), dtype=U.dtype))

    # Z = eye (z[j] = 1) with pivot-row entries scattered in:
    # Z[pivcols[i], :] = X[i, :] for i < rank.
    Z = jnp.eye(n, dtype=U.dtype)
    scatter_rows = jnp.where(t_ids < rank, pivcols_c, n)
    Z = Z.at[scatter_rows].set(X, mode="drop")
    return Z


# ---------------------------------------------------------------------------
# host wrappers (reference API: lists, None, raising)
# ---------------------------------------------------------------------------


def _as_float_matrix(A) -> jnp.ndarray:
    A = jnp.asarray(A)
    if not jnp.issubdtype(A.dtype, jnp.floating):
        A = A.astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    return A


def forward_eliminate(
    A,
    b=None,
    pivot: bool = True,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], List[int], List[int], List[int]]:
    """Row-echelon reduction with partial pivoting.

    Returns (U, c, pivots, free, perm) with the reference's conventions
    (elimination.py:17-106): ``pivots``/``free`` are pivot/free column index
    lists, ``perm`` lists the original row of each final row (length
    max(m, n)), and ``c`` is ``b`` after identical row ops ((m, k), or None).
    """
    A = _as_float_matrix(A)
    if A.ndim != 2:
        raise ValueError("A must be 2-D")
    m, n = A.shape

    if b is None:
        b2 = jnp.zeros((m, 1), dtype=A.dtype)
    else:
        b2 = jnp.asarray(b, dtype=A.dtype)
        b2 = b2[:, None] if b2.ndim == 1 else b2

    U, c, perm, _sign, pivot_row, _r = _forward_eliminate_core(A, b2, bool(pivot))

    pr = np.asarray(pivot_row)
    pivots = [int(col) for col in range(n) if pr[col] >= 0]
    free = [int(col) for col in range(n) if pr[col] < 0]
    perm_list = [int(p) for p in np.asarray(perm)]
    if n > m:
        perm_list += list(range(m, n))
    return U, (c if b is not None else None), pivots, free, perm_list


def back_substitute(U, c) -> jnp.ndarray:
    """Solve Ux = c for upper-triangular U, raising the reference's errors.

    Raises ``ValueError("inconsistent system (no solution)")`` or
    ``ValueError("rank deficient (infinitely many solutions)")`` exactly per
    the reference's bottom-up scan semantics (elimination.py:109-151).
    """
    U = _as_float_matrix(U)
    c = jnp.asarray(c, dtype=U.dtype)
    squeeze = c.ndim == 1
    c2 = c[:, None] if squeeze else c
    tol = scale_tol(U)
    x, any_zero, _worst_i, inconsistent = _back_substitute_core(U, c2, tol)
    if bool(any_zero):
        if bool(inconsistent):
            raise ValueError("inconsistent system (no solution)")
        raise ValueError("rank deficient (infinitely many solutions)")
    return x.ravel() if (squeeze or x.shape[1] == 1) else x


def gaussian_solve(A, b, pivot: bool = True) -> jnp.ndarray:
    """Direct solve via elimination + back substitution.

    On a rank-deficient-but-consistent system, falls back to least squares
    (reference semantics, elimination.py:154-166). Inconsistent systems
    raise.
    """
    try:
        U, c, _pivots, _free, _perm = forward_eliminate(A, b, pivot=pivot)
        return back_substitute(U, c)
    except ValueError as e:
        if "inconsistent" in str(e):
            raise
        logger.debug(
            "%s; rank deficient but consistent, falling back to least squares",
            e,
        )
        A = _as_float_matrix(A)
        b = jnp.asarray(b, dtype=A.dtype)
        return jnp.linalg.lstsq(A, b, rcond=None)[0]


def rref(A) -> Tuple[jnp.ndarray, List[int]]:
    """Reduced row-echelon form and pivot column list (elimination.py:169-203)."""
    A = _as_float_matrix(A)
    m, n = A.shape
    b2 = jnp.zeros((m, 1), dtype=A.dtype)
    U, _c, _perm, _sign, pivot_row, _r = _forward_eliminate_core(A, b2, True)
    tol = scale_tol(U)
    R = _rref_core(U, pivot_row, tol)
    pr = np.asarray(pivot_row)
    pivots = [int(col) for col in range(n) if pr[col] >= 0]
    return R, pivots


def rank_elimination(A) -> int:
    """Matrix rank = number of pivot columns."""
    A = _as_float_matrix(A)
    m, _n = A.shape
    b2 = jnp.zeros((m, 1), dtype=A.dtype)
    _U, _c, _perm, _sign, _pivot_row, r = _forward_eliminate_core(A, b2, True)
    return int(r)


def nullspace_basis_elimination(A) -> jnp.ndarray:
    """Basis of the nullspace of A as an (n, n-r) matrix.

    Full-rank inputs return shape (n, 0). Construction matches the
    reference's one-vector-per-free-column back-substitution
    (elimination.py:206-246).
    """
    A = _as_float_matrix(A)
    m, n = A.shape
    b2 = jnp.zeros((m, 1), dtype=A.dtype)
    U, _c, _perm, _sign, pivot_row, r = _forward_eliminate_core(A, b2, True)
    pr = np.asarray(pivot_row)
    free = [int(col) for col in range(n) if pr[col] < 0]
    if not free:
        return jnp.zeros((n, 0), dtype=A.dtype)
    Z = _nullspace_core(U, pivot_row, r)
    return Z[:, jnp.asarray(free, dtype=jnp.int32)]
