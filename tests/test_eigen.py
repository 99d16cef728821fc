"""Eigen tests — reference assertions (tests/test_eigen.py) rebuilt."""

import numpy as np
import pytest

import linalg_tpu as la


class TestMatrixPower:
    @pytest.mark.parametrize("k", [0, 1, 2, 5, -1, -3])
    def test_matches_numpy(self, k):
        A = np.random.default_rng(0).standard_normal((6, 6))
        A = A + 6 * np.eye(6)  # keep well-conditioned / invertible
        got = np.asarray(la.matrix_power_eig(A, k))
        want = np.linalg.matrix_power(A, k)
        assert np.allclose(got, want, rtol=1e-7, atol=1e-8)

    def test_defective_matrix_falls_back(self):
        # Jordan block: eigenvector matrix is singular/ill-conditioned.
        J = np.array([[2.0, 1.0], [0.0, 2.0]])
        got = np.asarray(la.matrix_power_eig(J, 5))
        assert np.allclose(got, np.linalg.matrix_power(J, 5), atol=1e-8)

    def test_rotation_complex_eigs(self):
        th = 0.7
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        got = np.asarray(la.matrix_power_eig(R, 4))
        assert got.dtype.kind == "f"  # imaginary parts dropped
        assert np.allclose(got, np.linalg.matrix_power(R, 4), atol=1e-9)

    def test_binary_power_on_device(self):
        A = np.random.default_rng(1).standard_normal((5, 5))
        assert np.allclose(
            np.asarray(la.matrix_power_binary(A, 7)),
            np.linalg.matrix_power(A, 7),
            rtol=1e-7,
            atol=1e-6,
        )


class TestPowerIteration:
    def test_rayleigh_consistency_psd(self):
        rng = np.random.default_rng(2)
        B = rng.standard_normal((8, 8))
        A = B @ B.T  # PSD: dominant eigenvalue well-defined
        lam, v = la.power_iteration(A, v0=np.ones(8))
        v = np.asarray(v)
        assert np.linalg.norm(A @ v - lam * v) < 1e-8
        assert np.isclose(lam, v @ A @ v, rtol=1e-10)

    def test_non_square_raises(self):
        with pytest.raises(ValueError, match="square"):
            la.power_iteration(np.ones((3, 4)))

    def test_bad_v0_raises(self):
        with pytest.raises(ValueError, match="v0"):
            la.power_iteration(np.eye(3), v0=np.ones(4))

    def test_scale_equivariance(self):
        rng = np.random.default_rng(3)
        B = rng.standard_normal((6, 6))
        A = B @ B.T
        v0 = rng.standard_normal(6)
        lam1, _ = la.power_iteration(A, v0=v0)
        lam2, _ = la.power_iteration(2.5 * A, v0=v0)
        assert np.isclose(lam2, 2.5 * lam1, rtol=1e-6)

    def test_matches_numpy_dominant_pair(self):
        rng = np.random.default_rng(4)
        B = rng.standard_normal((10, 10))
        A = B @ B.T
        lam, v = la.power_iteration(A, v0=np.ones(10), tol=1e-12)
        w, V = np.linalg.eigh(A)
        i = np.argmax(np.abs(w))
        assert np.isclose(lam, w[i], rtol=1e-8)
        v = np.asarray(v)
        vn = V[:, i]
        if v @ vn < 0:
            vn = -vn
        assert np.allclose(v, vn, atol=1e-5)

    def test_diagonal_sanity(self):
        A = np.diag([1.0, 3.0, -2.0])
        lam, v = la.power_iteration(A, v0=np.array([1.0, 1.0, 1.0]))
        assert np.isclose(lam, 3.0, atol=1e-8)
        assert np.isclose(abs(np.asarray(v)[1]), 1.0, atol=1e-6)

    def test_history(self):
        rng = np.random.default_rng(5)
        B = rng.standard_normal((7, 7))
        A = B @ B.T
        lam, v, iters, hist = la.power_iteration(
            A, v0=np.ones(7), return_history=True
        )
        assert iters >= 0
        assert len(hist) >= 1
        assert hist[-1] < 1e-10  # converged
        # residuals eventually decrease
        assert hist[-1] <= hist[0]

    def test_zero_matrix(self):
        lam, v = la.power_iteration(np.zeros((4, 4)), v0=np.ones(4))
        assert lam == 0.0


def test_power_iteration_default_v0_is_deterministic():
    # v0=None seeds from a fixed rng, not global np.random state
    rng = np.random.default_rng(11)
    A = rng.normal(size=(6, 6))
    A = A @ A.T
    np.random.seed(1)
    lam1, v1 = la.power_iteration(A)
    np.random.seed(2)  # perturb global state: result must not change
    lam2, v2 = la.power_iteration(A)
    assert lam1 == lam2
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
