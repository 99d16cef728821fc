"""SVD + PCA tests — reference assertions (tests/test_svd.py) rebuilt."""

import numpy as np
import pytest

import linalg_tpu as la


def _align_signs(X, Y):
    """Flip columns of Y so each has positive dot with the matching X column."""
    Y = np.array(Y, copy=True)
    for j in range(X.shape[1]):
        if X[:, j] @ Y[:, j] < 0:
            Y[:, j] = -Y[:, j]
    return Y


def make_lowrank_data(m, n, r, seed=0, noise=0.0):
    rng = np.random.default_rng(seed)
    B = rng.standard_normal((m, r))
    C = rng.standard_normal((r, n))
    X = B @ C
    if noise:
        X = X + noise * rng.standard_normal((m, n))
    return X


class TestSVD:
    @pytest.mark.parametrize("shape", [(8, 5), (20, 20), (5, 8), (40, 7)])
    def test_reconstruction_and_orthonormality(self, shape):
        A = np.random.default_rng(shape[0]).standard_normal(shape)
        U, s, Vt = la.svd(A)
        U, s, Vt = np.asarray(U), np.asarray(s), np.asarray(Vt)
        k = min(shape)
        assert np.linalg.norm(U @ np.diag(s) @ Vt - A, 2) < 1e-10
        assert np.linalg.norm(U.T @ U - np.eye(U.shape[1])) < 1e-8
        assert np.linalg.norm(Vt @ Vt.T - np.eye(Vt.shape[0])) < 1e-8
        assert np.all(s[:-1] >= s[1:] - 1e-12)  # descending

    def test_singular_values_match_numpy(self):
        A = np.random.default_rng(1).standard_normal((15, 9))
        _, s, _ = la.svd(A)
        s_np = np.linalg.svd(A, compute_uv=False)
        assert np.allclose(np.asarray(s), s_np, atol=1e-9)

    def test_subspaces_match_numpy_up_to_sign(self):
        A = np.random.default_rng(2).standard_normal((12, 6))
        U, s, Vt = la.svd(A)
        U_np, s_np, Vt_np = np.linalg.svd(A, full_matrices=False)
        U_a = _align_signs(U_np, np.asarray(U))
        V_a = _align_signs(Vt_np.T, np.asarray(Vt).T)
        assert np.allclose(U_a, U_np, atol=1e-7)
        assert np.allclose(V_a, Vt_np.T, atol=1e-7)

    def test_rank_deficient_trailing_sigmas_zero(self):
        A = make_lowrank_data(10, 6, 3, seed=3)
        U, s, Vt = la.svd(A)
        s = np.asarray(s)
        # The A^T A eigen-route squares the condition number, so "zero"
        # singular values surface as ~sqrt(eps)*sigma_max noise — the
        # honest bound for this algorithm (the reference route shares it).
        assert np.all(s[3:] < s[0] * 1e-6)
        # U still has orthonormal columns thanks to the completion
        U = np.asarray(U)
        assert np.linalg.norm(U.T @ U - np.eye(6)) < 1e-8
        assert np.linalg.norm(U @ np.diag(s) @ np.asarray(Vt) - A) < 1e-8


class TestJacobiSVD:
    """One-sided Jacobi route: same contract as eigh, better f32 accuracy."""

    @pytest.mark.parametrize("shape", [(8, 5), (20, 20), (5, 8), (40, 7)])
    def test_reconstruction_and_orthonormality(self, shape):
        A = np.random.default_rng(shape[0]).standard_normal(shape)
        U, s, Vt = la.svd(A, method="jacobi")
        U, s, Vt = np.asarray(U), np.asarray(s), np.asarray(Vt)
        assert np.linalg.norm(U @ np.diag(s) @ Vt - A, 2) < 1e-10
        assert np.linalg.norm(U.T @ U - np.eye(U.shape[1])) < 1e-9
        assert np.linalg.norm(Vt @ Vt.T - np.eye(Vt.shape[0])) < 1e-9
        assert np.all(s[:-1] >= s[1:] - 1e-12)

    def test_singular_values_match_numpy(self):
        A = np.random.default_rng(7).standard_normal((15, 9))
        _, s, _ = la.svd(A, method="jacobi")
        s_np = np.linalg.svd(A, compute_uv=False)
        assert np.allclose(np.asarray(s), s_np, atol=1e-10)

    def test_f32_rank_deficient_orthogonal_without_polish(self):
        # THE motivating case: in float32 the eigh route loses U
        # orthogonality as ~sqrt(eps)*kappa on rank-deficient inputs and
        # needs the QR polish; one-sided Jacobi never squares A so it is
        # orthogonal at working precision intrinsically.
        X = make_lowrank_data(40, 12, 4, seed=11).astype(np.float32)
        U, s, Vt = la.svd(X, method="jacobi")
        U, s, Vt = np.asarray(U), np.asarray(s), np.asarray(Vt)
        assert np.linalg.norm(U.T @ U - np.eye(12)) < 5e-6
        assert np.linalg.norm(Vt @ Vt.T - np.eye(12)) < 5e-6
        assert np.linalg.norm(U @ np.diag(s) @ Vt - X) < 5e-5 * s[0]
        assert np.all(s[4:] < s[0] * 1e-5)  # true rank resolved

    def test_f32_small_singular_values_high_relative_accuracy(self):
        # graded spectrum spanning 4 decades in float32: the squared
        # (eigh) route can't resolve sigmas below ~sqrt(eps)*sigma_max
        # (measured: 100% error on the smallest), while one-sided Jacobi
        # tracks every sigma of the stored matrix to ~1e-4 relative
        rng = np.random.default_rng(13)
        n = 8
        sig = np.logspace(0, -4, n).astype(np.float32)
        Q1, _ = np.linalg.qr(rng.standard_normal((20, n)))
        Q2, _ = np.linalg.qr(rng.standard_normal((n, n)))
        A = ((Q1 * sig) @ Q2).astype(np.float32)
        s_true = np.linalg.svd(A.astype(np.float64), compute_uv=False)
        _, s_j, _ = la.svd(A, method="jacobi")
        rel_j = np.abs(np.asarray(s_j) - s_true) / s_true
        assert np.max(rel_j) < 1e-3
        _, s_e, _ = la.svd(A, method="eigh")
        rel_e = np.abs(np.asarray(s_e) - s_true) / s_true
        assert np.max(rel_e) > 1e-2  # the gap jacobi exists to close

    def test_invalid_method_raises(self):
        with pytest.raises(ValueError, match="Unknown SVD method"):
            la.svd(np.eye(3), method="qr")


class TestPCA:
    @pytest.fixture
    def data(self):
        return make_lowrank_data(50, 8, 4, seed=5, noise=0.05)

    def test_shapes(self, data):
        pcs, scores, ev, evr, tv, mean_ = la.pca(data, 3)
        assert np.asarray(pcs).shape == (8, 3)
        assert np.asarray(scores).shape == (50, 3)
        assert np.asarray(ev).shape == (3,)
        assert np.asarray(evr).shape == (3,)
        assert np.isscalar(tv)
        assert np.asarray(mean_).shape == (8,)

    def test_mean_centering(self, data):
        _, _, _, _, _, mean_ = la.pca(data, 2)
        assert np.allclose(np.asarray(mean_), data.mean(axis=0), atol=1e-10)

    def test_pcs_orthonormal(self, data):
        pcs, *_ = la.pca(data, 4)
        P = np.asarray(pcs)
        assert np.allclose(P.T @ P, np.eye(4), atol=1e-10)

    def test_scores_are_projections(self, data):
        pcs, scores, *_ = la.pca(data, 3)
        X = data - data.mean(axis=0)
        assert np.allclose(np.asarray(scores), X @ np.asarray(pcs), atol=1e-10)

    def test_full_k_reconstruction(self, data):
        pcs, scores, *_ = la.pca(data, 8)
        X = data - data.mean(axis=0)
        assert np.allclose(np.asarray(scores) @ np.asarray(pcs).T, X, atol=1e-8)

    def test_variance_accounting(self, data):
        _, _, ev, evr, tv, _ = la.pca(data, 8)
        assert np.isclose(np.sum(np.asarray(ev)), tv, rtol=1e-8)
        assert np.isclose(np.sum(np.asarray(evr)), 1.0, rtol=1e-8)

    def test_evr_monotone_nonincreasing(self, data):
        _, _, _, evr, _, _ = la.pca(data, 6)
        evr = np.asarray(evr)
        assert np.all(evr[:-1] >= evr[1:] - 1e-12)

    def test_matches_numpy_svd_variances(self, data):
        _, _, ev, *_ = la.pca(data, 5)
        X = data - data.mean(axis=0)
        s = np.linalg.svd(X, compute_uv=False)
        assert np.allclose(np.asarray(ev), s[:5] ** 2 / (50 - 1), atol=1e-8)


class TestReorthogonalize:
    def test_f32_rank_deficient_orthogonality_restored(self):
        # the squared route leaves U orthogonality ~1e-2 in f32 on
        # rank-deficient input; the polish restores working precision
        rng = np.random.default_rng(0)
        A = (rng.standard_normal((40, 5)) @ rng.standard_normal((5, 24))
             ).astype(np.float32)
        U0, s0, Vt0 = la.svd(A)
        U1, s1, Vt1 = la.svd(A, reorthogonalize=True)
        U0, U1 = np.asarray(U0), np.asarray(U1)
        orth0 = np.linalg.norm(U0.T @ U0 - np.eye(24))
        orth1 = np.linalg.norm(U1.T @ U1 - np.eye(24))
        assert orth1 < orth0 or orth0 < 1e-5
        assert orth1 < 1e-4
        # reconstruction preserved
        rec = U1 @ np.diag(np.asarray(s1)) @ np.asarray(Vt1)
        assert np.linalg.norm(rec - A) / np.linalg.norm(A) < 1e-4

    def test_f64_unchanged_semantics(self):
        A = np.random.default_rng(1).standard_normal((12, 6))
        U0, s0, _ = la.svd(A)
        U1, s1, _ = la.svd(A, reorthogonalize=True)
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=0)
        # full-rank f64: polish is a near-no-op
        np.testing.assert_allclose(np.asarray(U0), np.asarray(U1), atol=1e-10)
