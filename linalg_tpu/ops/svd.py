"""Economy SVD via the A^T A eigen-route, and PCA.

Capability parity with the reference's ``linalg/svd.py``
(/root/reference/linalg/svd.py:10-123): same algorithm outline (normal
matrix, symmetric eigensolve, u = Av/sigma, random orthonormal completion
for rank-deficient inputs, transpose recursion for wide matrices) and the
same 6-tuple PCA bookkeeping.

TPU-first design: the full-rank path is one jitted computation — ``A^T A``
on the MXU, ``jnp.linalg.eigh`` (XLA's symmetric eigensolver runs on TPU),
descending sort, and a single batched ``A @ V / s`` for all left vectors.
The rank-deficient completion (dynamically-shaped complement) runs on the
host path with device matmuls, mirroring the reference's double-QR cleanup
but with the projection done as one matmul instead of a per-column loop.
Randomness is a seeded ``jax.random`` key (deterministic), unlike the
reference's global ``np.random``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["svd", "pca"]


@jax.jit
def _svd_core(A):
    """Full-shape part of the eigen-route SVD: returns (U_raw, s, Vt, rank_mask).

    U_raw columns for sigma <= tol are garbage (filled by the wrapper).
    """
    ATA = jnp.dot(A.T, A, precision=jax.lax.Precision.HIGHEST,
                  preferred_element_type=A.dtype)
    eigenvalues, V = jnp.linalg.eigh(ATA)
    idx = jnp.argsort(eigenvalues)[::-1]
    eigenvalues = eigenvalues[idx]
    V = V[:, idx]
    s = jnp.sqrt(jnp.clip(eigenvalues, 0.0, None))
    AV = jnp.dot(A, V, precision=jax.lax.Precision.HIGHEST,
                 preferred_element_type=A.dtype)
    safe = jnp.where(s > 0, s, 1.0)
    U = AV / safe[None, :]
    return U, s, V.T


def svd(A, tol: float = 1e-12, seed: int = 0,
        reorthogonalize: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Economy SVD: A (m, n) -> (U (m, n), s (n,), Vt (n, n)) for m >= n.

    Wide matrices recurse on A^T with U/V roles swapped (reference
    svd.py:37-39). Columns of U beyond the numerical rank are completed with
    a deterministic random orthonormal complement (svd.py:66-76; here seeded
    by ``seed`` rather than global RNG state).

    ``reorthogonalize=True`` polishes U with a sign-preserving QR — useful
    in float32, where the squared (A^T A) route leaves U orthogonality at
    ~sqrt(eps)*kappa (e.g. ~1e-2 on rank-deficient inputs); the polish
    restores it to working precision at the cost of slightly rotating
    U's columns within near-degenerate singular clusters.
    """
    A = jnp.asarray(A)
    if not jnp.issubdtype(A.dtype, jnp.floating):
        A = A.astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    m, n = A.shape
    if m < n:
        Vt, s, Ut = svd(A.T, tol, seed, reorthogonalize)
        return Ut.T, s, Vt.T

    U, s, Vt = _svd_core(A)
    s_host = np.asarray(s)
    # Numerical-rank threshold for the squared (A^T A) route: eigenvalue
    # noise of eigh is ~eps*sigma_max^2, so spurious sigmas surface at
    # ~sqrt(eps)*sigma_max. Anything below that is noise; clip it to an
    # exact zero so the orthonormal completion owns those columns.
    eps = float(jnp.finfo(A.dtype).eps)
    s_max = float(s_host[0]) if s_host.size else 0.0
    eff_tol = max(float(tol), s_max * np.sqrt(n * eps))
    rank = int(np.sum(s_host > eff_tol))
    if rank < n:
        s = jnp.where(jnp.arange(n) < rank, s, 0.0)

    if rank < n:
        key = jax.random.PRNGKey(seed)
        G = jax.random.normal(key, (m, n - rank), dtype=A.dtype)
        Q, _ = jnp.linalg.qr(G)
        U_r = U[:, :rank]
        # Project out span(U_r) in one matmul, then re-orthogonalize.
        Q = Q - U_r @ (U_r.T @ Q)
        Q, _ = jnp.linalg.qr(Q)
        U = jnp.concatenate([U_r, Q], axis=1)

    if reorthogonalize:
        Qu, Ru = jnp.linalg.qr(U)
        # sign-fix so each polished column keeps its original direction
        signs = jnp.sign(jnp.diagonal(Ru))
        U = Qu * jnp.where(signs == 0, 1.0, signs)[None, :]

    return U, s, Vt


from functools import partial


@partial(jax.jit, static_argnums=1)
def _pca_core(A, k: int):
    mean_ = A.mean(axis=0, keepdims=True)
    X = A - mean_
    _, S, Vt = jnp.linalg.svd(X, full_matrices=False)
    pcs = Vt[:k].T
    scores = X @ pcs
    n_samples = A.shape[0]
    explained_variance = (S[:k] ** 2) / (n_samples - 1)
    total_variance = (jnp.linalg.norm(X) ** 2) / (n_samples - 1)
    explained_variance_ratio = explained_variance / total_variance
    return pcs, scores, explained_variance, explained_variance_ratio, total_variance, mean_.ravel()


def pca(A, k: int):
    """PCA with samples in rows, features in columns (reference svd.py:85-123).

    Returns ``(pcs, scores, explained_variance, explained_variance_ratio,
    total_variance, mean_)``.
    """
    A = jnp.asarray(A)
    if not jnp.issubdtype(A.dtype, jnp.floating):
        A = A.astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    pcs, scores, ev, evr, tv, mean_ = _pca_core(A, int(k))
    return pcs, scores, ev, evr, float(tv), mean_
