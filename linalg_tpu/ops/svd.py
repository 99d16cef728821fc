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


def _jacobi_schedule(n: int) -> np.ndarray:
    """Round-robin tournament pairings: (n-1, 2, n/2) index arrays covering
    every column pair once per sweep, each round's pairs disjoint (so all
    n/2 rotations in a round apply in parallel)."""
    players = list(range(n))
    rounds = []
    for _ in range(n - 1):
        ia = [players[i] for i in range(n // 2)]
        ib = [players[n - 1 - i] for i in range(n // 2)]
        rounds.append((ia, ib))
        # rotate all but the first player
        players = [players[0]] + [players[-1]] + players[1:-1]
    return np.asarray(rounds, dtype=np.int32)  # (n-1, 2, n/2)


@jax.jit
def _svd_jacobi_core(A):
    """One-sided (Hestenes) Jacobi SVD core: returns (W, V, sweeps) with
    W = U * s (columns mutually orthogonal) and A = W @ V.T.

    Works column-wise on A directly — never forms A^T A — so singular
    values keep high RELATIVE accuracy and U comes out orthogonal to
    working precision even in float32 (the eigh route loses
    ~sqrt(eps)*kappa of both).  Each sweep runs the round-robin schedule;
    a round rotates n/2 disjoint column pairs at once (vectorized: the
    pair dot products a, b, c are column reductions, the 2x2 rotations a
    fused elementwise update), which is the TPU-shaped formulation — no
    scalar pair loop.
    """
    m, n = A.shape
    dtype = A.dtype
    eps = jnp.finfo(dtype).eps
    n_pad = n + (n % 2)
    W0 = jnp.pad(A, ((0, 0), (0, n_pad - n)))
    V0 = jnp.pad(jnp.eye(n, dtype=dtype), ((0, n_pad - n), (0, n_pad - n)))
    sched = jnp.asarray(_jacobi_schedule(n_pad))  # (R, 2, p)
    max_sweeps = 30

    def round_step(carry, pairs):
        W, V, off = carry
        ia, ib = pairs[0], pairs[1]
        X, Y = W[:, ia], W[:, ib]
        a = jnp.sum(X * X, axis=0)
        b = jnp.sum(Y * Y, axis=0)
        c = jnp.sum(X * Y, axis=0)
        # relative off-diagonal weight of each pair; rotate only pairs
        # meaningfully coupled (guards 0/0 on zero columns)
        denom = jnp.sqrt(jnp.maximum(a * b, jnp.finfo(dtype).tiny))
        rel = jnp.abs(c) / denom
        do = rel > eps
        c_safe = jnp.where(do, c, 1.0)
        tau = (b - a) / (2.0 * c_safe)
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        cs = 1.0 / jnp.sqrt(1.0 + t * t)
        sn = t * cs
        cs = jnp.where(do, cs, 1.0)
        sn = jnp.where(do, sn, 0.0)
        Xn = cs[None, :] * X - sn[None, :] * Y
        Yn = sn[None, :] * X + cs[None, :] * Y
        W = W.at[:, ia].set(Xn).at[:, ib].set(Yn)
        Vx, Vy = V[:, ia], V[:, ib]
        V = V.at[:, ia].set(cs[None, :] * Vx - sn[None, :] * Vy)
        V = V.at[:, ib].set(sn[None, :] * Vx + cs[None, :] * Vy)
        return (W, V, jnp.maximum(off, jnp.max(rel))), None

    def sweep(state):
        W, V, _, k = state
        (W, V, off), _ = jax.lax.scan(
            round_step, (W, V, jnp.zeros((), dtype)), sched)
        return W, V, off, k + 1

    def not_done(state):
        _, _, off, k = state
        return jnp.logical_and(off > 4 * eps, k < max_sweeps)

    # always run one sweep to initialize `off`, then iterate to converge
    state = sweep((W0, V0, jnp.zeros((), dtype), jnp.zeros((), jnp.int32)))
    W, V, _, k = jax.lax.while_loop(not_done, sweep, state)
    return W[:, :n], V[:n, :n], k


def svd(A, tol: float = 1e-12, seed: int = 0,
        reorthogonalize: bool = False,
        method: str = "eigh") -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Economy SVD: A (m, n) -> (U (m, n), s (n,), Vt (n, n)) for m >= n.

    Wide matrices recurse on A^T with U/V roles swapped (reference
    svd.py:37-39). Columns of U beyond the numerical rank are completed with
    a deterministic random orthonormal complement (svd.py:66-76; here seeded
    by ``seed`` rather than global RNG state).

    ``method`` selects the factorization route:

    - ``"eigh"`` (default, the reference's algorithm): A^T A + symmetric
      eigensolve. Fast (one MXU matmul + eigh), but squaring costs
      accuracy: in float32 U orthogonality and small singular values
      degrade as ~sqrt(eps)*kappa.
    - ``"jacobi"``: one-sided Hestenes Jacobi on A's columns. Never forms
      A^T A, so U is orthogonal to working precision and singular values
      keep high relative accuracy — the intrinsic fix for float32
      rank-deficient inputs (``reorthogonalize`` then isn't needed).

    ``reorthogonalize=True`` polishes U with a sign-preserving QR — a
    cheaper patch for the eigh route's float32 drift; it restores
    orthogonality at the cost of slightly rotating U's columns within
    near-degenerate singular clusters.
    """
    A = jnp.asarray(A)
    if not jnp.issubdtype(A.dtype, jnp.floating):
        A = A.astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    if method not in ("eigh", "jacobi"):
        raise ValueError(f"Unknown SVD method: {method!r}")
    m, n = A.shape
    if m < n:
        Vt, s, Ut = svd(A.T, tol, seed, reorthogonalize, method)
        return Ut.T, s, Vt.T

    if method == "jacobi":
        W, V, _ = _svd_jacobi_core(A)
        s = jnp.linalg.norm(W, axis=0)
        order = jnp.argsort(s)[::-1]
        s = s[order]
        safe = jnp.where(s > 0, s, 1.0)
        U = W[:, order] / safe[None, :]
        Vt = V[:, order].T
    else:
        U, s, Vt = _svd_core(A)
    s_host = np.asarray(s)
    eps = float(jnp.finfo(A.dtype).eps)
    s_max = float(s_host[0]) if s_host.size else 0.0
    if method == "jacobi":
        # singular values come from un-squared column norms: noise floor is
        # ~eps*sigma_max, not sqrt(eps)*sigma_max
        eff_tol = max(float(tol), s_max * n * eps)
    else:
        # Numerical-rank threshold for the squared (A^T A) route:
        # eigenvalue noise of eigh is ~eps*sigma_max^2, so spurious sigmas
        # surface at ~sqrt(eps)*sigma_max. Anything below that is noise;
        # clip it to an exact zero so the orthonormal completion owns
        # those columns.
        eff_tol = max(float(tol), s_max * np.sqrt(n * eps))
    rank = int(np.sum(s_host > eff_tol))
    if rank < n:
        s = jnp.where(jnp.arange(n) < rank, s, 0.0)

    if rank < n:
        key = jax.random.PRNGKey(seed)
        G = jax.random.normal(key, (m, n - rank), dtype=A.dtype)
        Q, _ = jnp.linalg.qr(G)
        U_r = U[:, :rank]
        # Project out span(U_r), then re-orthogonalize.  Full f32 matmul
        # precision (TPU default truncates f32 operands to bf16 — that
        # left ~1e-3 cross-block overlap in U), and project twice:
        # "twice is enough" cleans the first pass's rounding residual.
        hp = jax.lax.Precision.HIGHEST
        for _ in range(2):
            Q = Q - jnp.dot(U_r, jnp.dot(U_r.T, Q, precision=hp),
                            precision=hp)
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
