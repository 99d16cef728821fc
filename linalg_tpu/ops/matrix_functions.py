"""Determinant and adjugate via elimination and QR.

Capability parity with the reference's ``linalg/matrix_functions.py``
(/root/reference/linalg/matrix_functions.py:18-63): ``det`` from the pivoted
echelon form (diagonal product times permutation sign), ``adj`` via
``det(A) * A^{-1}`` on the QR route for nonsingular inputs with a cofactor
fallback for singular ones, plus the ``rank_numpy`` convenience.

TPU-first design:

- ``det`` is one jitted call: the elimination core already carries the swap
  parity in-graph, so sign and diagonal product never leave the device.
- The singular-``adj`` cofactor fallback is *batched*: all n^2 minors are
  materialized by a vmapped gather and their determinants computed by a
  vmapped elimination core — one device computation instead of the
  reference's O(n^2) Python loop of O(n^3) dets.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp

from .elimination import _forward_eliminate_core
from .qr import _as_float, qr

logger = logging.getLogger(__name__)

__all__ = ["det", "adj", "rank_numpy"]


@jax.jit
def _det_core(A):
    m, n = A.shape
    b = jnp.zeros((m, 1), dtype=A.dtype)
    U, _c, _perm, sign, _pivot_row, _r = _forward_eliminate_core(A, b, True)
    return sign.astype(A.dtype) * jnp.prod(jnp.diagonal(U))


def det(A) -> float:
    """Determinant of a square matrix via pivoted elimination."""
    A = _as_float(A)
    m, n = A.shape
    if m != n:
        raise ValueError("The determinant is undefined for non-square matrices.")
    return float(_det_core(A))


def rank_numpy(A) -> int:
    """Rank via SVD thresholding (reference delegates to NumPy's)."""
    return int(jnp.linalg.matrix_rank(jnp.asarray(A)))


@jax.jit
def _cofactor_core(A):
    """All-minors determinant matrix C with C[i, j] = (-1)^(i+j) det(minor_ij)."""
    n = A.shape[0]
    r = jnp.arange(n - 1)

    def minor_det(i, j):
        rows = r + (r >= i)
        cols = r + (r >= j)
        M = A[rows[:, None], cols[None, :]]
        return _det_core(M)

    ii = jnp.arange(n)
    C = jax.vmap(lambda i: jax.vmap(lambda j: minor_det(i, j))(ii))(ii)
    signs = (-1.0) ** (ii[:, None] + ii[None, :])
    return signs.astype(A.dtype) * C


def adj(A) -> jnp.ndarray:
    """Adjugate (classical adjoint) of a square matrix.

    Nonsingular: ``det(A) * A^{-1}`` via MGS QR (solve ``R Z = Q^T``).
    Singular: batched cofactor expansion (reference warns and loops,
    matrix_functions.py:50-58; here it is one vmapped device computation).
    """
    A = _as_float(A)
    m, n = A.shape
    if m != n:
        raise ValueError("A must be a square matrix")

    d = det(A)
    if d == 0:
        logger.warning("adj(): falling back to cofactor expansion")
        return _cofactor_core(A).T

    Q, R = qr(A)
    ain = jax.scipy.linalg.solve_triangular(R, Q.T, lower=False)
    return d * ain
