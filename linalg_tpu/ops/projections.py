"""Projection onto a column space.

Capability parity with the reference's ``linalg/projections.py``
(/root/reference/linalg/projections.py:15-48): normal-equations projection
``p = A (A^T A)^{-1} A^T b`` with a pseudo-inverse fallback (and printed
warning) when A's columns are dependent.

The full-rank path is one jitted computation (two MXU matmuls and a solve).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .qr import _as_float, _dot

__all__ = ["project_onto_colspace"]


@jax.jit
def _project_core(A, b):
    ata = _dot(A.T, A)
    x = jnp.linalg.solve(ata, _dot(A.T, b))
    return _dot(A, x)


def project_onto_colspace(A, b) -> jnp.ndarray:
    """Orthogonal projection of b onto col(A).

    Returns shape (m, k) for b of shape (m,) or (m, k) — the reference
    always returns the 2-D column form (projections.py:28-31).
    """
    A = _as_float(A)
    b = jnp.asarray(b, dtype=A.dtype)
    if b.ndim == 1:
        b = b[:, None]

    r = int(jnp.linalg.matrix_rank(A))
    if r < A.shape[1]:
        print("The columns of A are not independent, falling back to pseudo-inverse")
        return _dot(A, _dot(jnp.linalg.pinv(A), b))
    return _project_core(A, b)
