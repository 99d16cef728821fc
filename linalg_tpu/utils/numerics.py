"""Numeric utilities: tolerances, permutation parity, random test matrices.

Capability parity with the reference toolkit's ``linalg/utils.py``
(/root/reference/linalg/utils.py:9-48), re-expressed for JAX:

- ``scale_tol`` is dtype-aware (the reference is float64-only with
  ``EPS = 1e-12``; on TPU the hot paths run float32/bfloat16, where 1e-12 is
  below machine epsilon and would break pivot detection).
- ``scale_tol`` is traceable: it returns a JAX scalar and can be called on
  traced values inside ``jit``.
- Random matrix generators are host-side (NumPy RNG) test fixtures, matching
  the reference's seeding behavior.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

# Reference-parity constant (float64 tolerance base, utils.py:9).
EPS: float = 1e-12

# Per-dtype tolerance bases. float64 matches the reference; the rest are
# scaled to ~25-50x machine epsilon so pivot/rank detection stays meaningful
# in reduced precision.
_EPS_BY_DTYPE = {
    jnp.dtype(jnp.float64): 1e-12,
    jnp.dtype(jnp.float32): 3e-6,
    jnp.dtype(jnp.bfloat16): 4e-2,
    jnp.dtype(jnp.float16): 2e-3,
}


def eps_for(dtype) -> float:
    """Tolerance base for a floating dtype (EPS for float64)."""
    return _EPS_BY_DTYPE.get(jnp.dtype(dtype), EPS)


def scale_tol(A) -> jnp.ndarray:
    """Absolute tolerance scaled to the matrix magnitude.

    ``eps_for(A.dtype) * max(1, ||A||_inf)`` — the reference formula
    (utils.py:12-14) with a dtype-aware epsilon. Traceable under jit.
    """
    A = jnp.asarray(A)
    base = eps_for(A.dtype)
    if A.ndim == 1:
        norm_inf = jnp.max(jnp.abs(A))
    else:
        norm_inf = jnp.max(jnp.sum(jnp.abs(A), axis=-1))
    return base * jnp.maximum(1.0, norm_inf).astype(A.dtype)


def permutation_sign(perm: Sequence[int]) -> float:
    """+1.0 or -1.0 depending on permutation parity (cycle counting).

    Host-side, matching the reference signature (utils.py:17-29).
    """
    perm = [int(p) for p in np.asarray(perm)]
    n = len(perm)
    visited = [False] * n
    cycles = 0
    for i in range(n):
        if not visited[i]:
            cycles += 1
            j = i
            while not visited[j]:
                visited[j] = True
                j = perm[j]
    return -1.0 if (n - cycles) & 1 else 1.0


def random_nonsingular_upper(n: int, low=-100, high=100, seed=None) -> np.ndarray:
    """Random upper-triangular matrix with nonzero diagonal (test fixture).

    Same construction as the reference (utils.py:32-48): uniform entries,
    triu, then diagonal resampled away from zero.
    """
    rng = np.random.default_rng(seed)
    U = np.triu(rng.uniform(low, high, size=(n, n)))
    diag = rng.uniform(low if low != 0 else 1, high, size=n)
    U[np.diag_indices(n)] = diag
    return np.asarray(U)


def random_nonsingular_qr(n: int, seed=None) -> np.ndarray:
    """Random well-conditioned nonsingular matrix via Q times log-spaced scales.

    Test fixture with the same shape of construction as the reference
    (qr.py:137-154): an orthonormal basis with controlled singular values.
    """
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    scales = rng.uniform(0.5, 10.0, size=n)
    return np.asarray(Q * scales[None, :])
