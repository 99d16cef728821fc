"""Cross-shape differential fuzzing of the L1 kernels vs NumPy."""

import numpy as np
import pytest

import linalg_tpu as la

SHAPES_QR = [(7, 3), (16, 16), (33, 9), (50, 50), (65, 64)]
SHAPES_SQ = [3, 7, 16, 33]


@pytest.mark.parametrize("shape", SHAPES_QR)
@pytest.mark.parametrize("seed", [0, 1])
def test_householder_qr_fuzz(shape, seed):
    A = np.random.default_rng(seed).standard_normal(shape)
    Q, R = la.householder_qr(A, block=16)
    Q, R = np.asarray(Q), np.asarray(R)
    assert np.linalg.norm(Q @ R - A) < 1e-9 * max(1, np.linalg.norm(A))
    assert np.linalg.norm(Q.T @ Q - np.eye(shape[1])) < 1e-9


@pytest.mark.parametrize("n", SHAPES_SQ)
@pytest.mark.parametrize("seed", [2, 3])
def test_solve_and_det_fuzz(n, seed):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n)) + n * np.eye(n)
    x0 = rng.standard_normal(n)
    x = np.asarray(la.gaussian_solve(A, A @ x0))
    assert np.allclose(x, x0, atol=1e-8)
    assert np.isclose(la.det(A), np.linalg.det(A), rtol=1e-8)


@pytest.mark.parametrize("shape", [(9, 4), (12, 12), (20, 5)])
@pytest.mark.parametrize("seed", [4, 5])
def test_svd_fuzz(shape, seed):
    A = np.random.default_rng(seed).standard_normal(shape)
    U, s, Vt = (np.asarray(x) for x in la.svd(A))
    assert np.linalg.norm(U @ np.diag(s) @ Vt - A) < 1e-9 * max(1, np.linalg.norm(A))
    s_np = np.linalg.svd(A, compute_uv=False)
    assert np.allclose(s, s_np, atol=1e-9)


@pytest.mark.parametrize("shape", [(9, 4), (12, 12), (5, 11), (20, 5)])
@pytest.mark.parametrize("seed", [6, 7])
def test_svd_jacobi_fuzz(shape, seed):
    # the one-sided Jacobi route must satisfy the same contract as eigh
    A = np.random.default_rng(seed).standard_normal(shape)
    U, s, Vt = (np.asarray(x) for x in la.svd(A, method="jacobi"))
    assert np.linalg.norm(U @ np.diag(s) @ Vt - A) < 1e-9 * max(1, np.linalg.norm(A))
    k = min(shape)
    assert np.linalg.norm(U.T @ U - np.eye(U.shape[1])) < 1e-9
    assert np.linalg.norm(Vt @ Vt.T - np.eye(Vt.shape[0])) < 1e-9
    s_np = np.linalg.svd(A, compute_uv=False)
    assert np.allclose(s[:k], s_np, atol=1e-9)


@pytest.mark.parametrize("seed", range(4))
def test_rank_nullspace_fuzz(seed):
    rng = np.random.default_rng(seed + 100)
    m, n = int(rng.integers(3, 12)), int(rng.integers(3, 12))
    r = int(rng.integers(1, min(m, n) + 1))
    A = rng.standard_normal((m, r)) @ rng.standard_normal((r, n))
    assert la.rank_elimination(A) == np.linalg.matrix_rank(A)
    N = np.asarray(la.nullspace_basis_elimination(A))
    assert N.shape[1] == n - np.linalg.matrix_rank(A)
    if N.shape[1]:
        assert np.linalg.norm(A @ N) < 1e-8
