"""Batched (vmap) variants of the dense linear-algebra kernels.

The TPU-native win the reference cannot have: every jitted core vmaps over a
leading batch axis, turning stacks of small decompositions into one MXU-
friendly computation. These wrappers expose that with plain batch-array
APIs. Error semantics differ from the scalar API by necessity (no
data-dependent raising under vmap): validity is returned as a mask.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .elimination import _back_substitute_core, _forward_eliminate_core
from .matrix_functions import _det_core
from .qr import _as_float, _householder_core, _mgs_core
from .svd import _svd_core
from ..utils.numerics import scale_tol

__all__ = [
    "batched_qr",
    "batched_householder_qr",
    "batched_svd",
    "batched_solve",
    "batched_det",
]


def batched_qr(A) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """MGS QR of a stack: (B, m, n) -> (Q (B, m, n), R (B, n, n), ok (B,)).

    ``ok[i]`` False marks a rank-deficient input (the scalar API raises).
    """
    A = _as_float(jnp.asarray(A), allow_batched=True)
    return jax.vmap(_mgs_core)(A)


@partial(jax.jit, static_argnames=("block",))
def _batched_hh(A, block: int):
    return jax.vmap(lambda a: _householder_core(a, block))(A)


def batched_householder_qr(A, block: int = 128):
    """Blocked Householder QR of a stack (B, m, n) with m >= n, n % block
    handled by padding. Returns (Q (B, m, n), R (B, n, n))."""
    A = _as_float(jnp.asarray(A), allow_batched=True)
    Bb, m, n = A.shape
    if m < n:
        raise ValueError("requires m >= n")
    b = max(1, min(block, n))
    n_pad = -(-n // b) * b
    if n_pad != n:
        A = jnp.concatenate([A, jnp.zeros((Bb, m, n_pad - n), A.dtype)], axis=2)
    Q, R = _batched_hh(A, b)
    return Q[:, :, :n], R[:, :n, :n]


def batched_svd(A):
    """Economy SVD of a stack (B, m, n), m >= n, full-rank inputs.

    Returns (U (B, m, n), s (B, n), Vt (B, n, n)). Rank-deficient inputs get
    garbage U columns for zero sigmas (the scalar API completes them).
    """
    A = _as_float(jnp.asarray(A), allow_batched=True)
    if A.shape[1] < A.shape[2]:
        raise ValueError("requires m >= n (transpose the stack)")
    return jax.vmap(_svd_core)(A)


def batched_solve(A, b) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Solve a stack of square systems: (B, n, n), (B, n[, k]).

    Returns (x, ok) where ok[i] is False for singular systems (their x is
    garbage; the scalar API raises/falls back instead).
    """
    A = _as_float(jnp.asarray(A), allow_batched=True)
    b = jnp.asarray(b, dtype=A.dtype)
    squeeze = b.ndim == 2
    b2 = b[..., None] if squeeze else b

    def one(a, bb):
        U, c, _perm, _sign, _pr, r = _forward_eliminate_core(a, bb, True)
        x, any_zero, _wi, _inc = _back_substitute_core(U, c, scale_tol(U))
        return x, ~any_zero

    x, ok = jax.vmap(one)(A, b2)
    return (x[..., 0] if squeeze else x), ok


def batched_det(A) -> jnp.ndarray:
    """Determinants of a stack of square matrices (B, n, n) -> (B,)."""
    A = _as_float(jnp.asarray(A), allow_batched=True)
    return jax.vmap(_det_core)(A)
