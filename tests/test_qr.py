"""QR tests — reference assertions (tests/test_qr.py) rebuilt, plus blocked-
Householder specific checks (panel-boundary shapes, zero columns, f32)."""

import numpy as np
import pytest

import linalg_tpu as la


class TestLeastSquares:
    @pytest.mark.parametrize("seed", range(25))
    def test_residual_parity_mgs(self, seed):
        rng = np.random.default_rng(seed)
        A = rng.standard_normal((40, 7))
        b = rng.standard_normal(40)
        x = np.asarray(la.least_squares_qr(A, b))
        r_np = np.linalg.norm(A @ np.linalg.lstsq(A, b, rcond=None)[0] - b)
        assert np.linalg.norm(A @ x - b) <= r_np * (1 + 1e-8)

    @pytest.mark.parametrize("seed", range(25))
    def test_residual_parity_householder(self, seed):
        rng = np.random.default_rng(seed + 500)
        A = rng.standard_normal((40, 7))
        b = rng.standard_normal(40)
        x = np.asarray(la.least_squares_householder_qr(A, b))
        r_np = np.linalg.norm(A @ np.linalg.lstsq(A, b, rcond=None)[0] - b)
        assert np.linalg.norm(A @ x - b) <= r_np * (1 + 1e-8)

    def test_square_system(self):
        A = la.random_nonsingular_qr(12, seed=3)
        x0 = np.random.default_rng(3).standard_normal(12)
        b = np.asarray(A) @ x0
        x = np.asarray(la.least_squares_householder_qr(A, b))
        assert np.allclose(x, x0, atol=1e-8)


class TestOrthogonality:
    def test_mgs_reorth_orthonormal(self):
        A = np.random.default_rng(0).standard_normal((100, 10))
        Q, _ = la.qr(A, reorth=True)
        Q = np.asarray(Q)
        assert np.linalg.norm(Q.T @ Q - np.eye(10)) < 1e-10

    def test_householder_orthonormal(self):
        A = np.random.default_rng(1).standard_normal((100, 10))
        Q, _ = la.householder_qr(A)
        Q = np.asarray(Q)
        assert np.linalg.norm(Q.T @ Q - np.eye(10)) < 1e-10


class TestReconstruction:
    @pytest.mark.parametrize(
        "shape", [(5, 3), (64, 64), (100, 10), (37, 37), (130, 70), (128, 128)]
    )
    def test_mgs_reconstructs(self, shape):
        A = np.random.default_rng(shape[0]).standard_normal(shape)
        Q, R = la.qr(A)
        assert np.linalg.norm(np.asarray(Q) @ np.asarray(R) - A) < 1e-10
        assert np.allclose(np.tril(np.asarray(R), -1), 0.0)

    @pytest.mark.parametrize(
        "shape", [(5, 3), (64, 64), (100, 10), (37, 37), (130, 70), (128, 128)]
    )
    def test_householder_reconstructs(self, shape):
        A = np.random.default_rng(shape[1]).standard_normal(shape)
        Q, R = la.householder_qr(A)
        m, n = shape
        assert np.asarray(Q).shape == (m, n)
        assert np.asarray(R).shape == (n, n)
        assert np.linalg.norm(np.asarray(Q) @ np.asarray(R) - A) < 1e-10
        assert np.allclose(np.tril(np.asarray(R), -1), 0.0)

    def test_mgs_reorth_still_reconstructs(self):
        # Deviation from reference (documented in ops/qr.py): reorth=True
        # must STILL satisfy A = QR.
        A = np.random.default_rng(5).standard_normal((50, 20))
        Q, R = la.qr(A, reorth=True)
        assert np.linalg.norm(np.asarray(Q) @ np.asarray(R) - A) < 1e-10

    @pytest.mark.parametrize("block", [2, 7, 16, 64])
    def test_householder_block_sizes(self, block):
        A = np.random.default_rng(9).standard_normal((50, 23))
        Q, R = la.householder_qr(A, block=block)
        assert np.linalg.norm(np.asarray(Q) @ np.asarray(R) - A) < 1e-10
        Q = np.asarray(Q)
        assert np.linalg.norm(Q.T @ Q - np.eye(23)) < 1e-10


class TestEdgeCases:
    def test_mgs_rank_deficient_raises(self):
        A = np.ones((4, 3))
        with pytest.raises(ValueError, match="linearly dependent"):
            la.qr(A)

    def test_householder_zero_column_skipped(self):
        rng = np.random.default_rng(11)
        A = rng.standard_normal((8, 5))
        A[:, 2] = 0.0
        Q, R = la.householder_qr(A, block=2)
        assert np.linalg.norm(np.asarray(Q) @ np.asarray(R) - A) < 1e-12
        assert abs(np.asarray(R)[2, 2]) < 1e-12

    def test_householder_wide_raises(self):
        with pytest.raises(ValueError, match="m >= n"):
            la.householder_qr(np.ones((3, 5)))

    def test_float32_tolerances(self):
        A = np.random.default_rng(2).standard_normal((256, 128)).astype(np.float32)
        Q, R = la.householder_qr(A)
        assert np.asarray(Q).dtype == np.float32
        rel = np.linalg.norm(np.asarray(Q) @ np.asarray(R) - A) / np.linalg.norm(A)
        assert rel < 1e-5
        Qn = np.asarray(Q)
        assert np.linalg.norm(Qn.T @ Qn - np.eye(128)) < 1e-4

    def test_single_column(self):
        A = np.random.default_rng(4).standard_normal((10, 1))
        Q, R = la.householder_qr(A)
        assert np.linalg.norm(np.asarray(Q) @ np.asarray(R) - A) < 1e-12
