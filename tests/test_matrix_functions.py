"""det/adj tests — reference assertions (tests/test_matrix_functions.py) rebuilt."""

import numpy as np
import pytest

import linalg_tpu as la


class TestDet:
    def test_large_matches_numpy(self):
        A = np.random.default_rng(0).standard_normal((100, 100))
        assert np.isclose(la.det(A), np.linalg.det(A), rtol=1e-8, atol=1e-8)

    @pytest.mark.parametrize("seed", range(10))
    def test_random_matches_numpy(self, seed):
        A = np.random.default_rng(seed).standard_normal((7, 7))
        assert np.isclose(la.det(A), np.linalg.det(A), rtol=1e-9, atol=1e-10)

    def test_singular_is_zero(self):
        A = np.ones((4, 4))
        assert abs(la.det(A)) < 1e-12

    def test_identity(self):
        assert np.isclose(la.det(np.eye(5)), 1.0)

    def test_swap_changes_sign(self):
        A = np.asarray(la.random_nonsingular_qr(5, seed=1))
        B = A[[1, 0, 2, 3, 4]]
        assert np.isclose(la.det(B), -la.det(A), rtol=1e-9)

    def test_non_square_raises(self):
        with pytest.raises(ValueError, match="non-square"):
            la.det(np.ones((3, 4)))


class TestAdj:
    def test_nonsingular_matches_det_times_inv(self):
        A = np.asarray(la.random_nonsingular_qr(8, seed=2))
        got = np.asarray(la.adj(A))
        want = np.linalg.det(A) * np.linalg.inv(A)
        assert np.allclose(got, want, rtol=1e-7, atol=1e-8)

    def test_adj_identity_property(self):
        # A @ adj(A) = det(A) I
        A = np.asarray(la.random_nonsingular_qr(6, seed=3))
        got = A @ np.asarray(la.adj(A))
        assert np.allclose(got, la.det(A) * np.eye(6), rtol=1e-7, atol=1e-7)

    def test_singular_cofactor_path(self):
        # rank-2 3x3: adj(A) satisfies A @ adj(A) = det(A) I = 0.
        A = np.array([[1.0, 2.0, 3.0], [2.0, 4.0, 6.0], [1.0, 0.0, 1.0]])
        got = np.asarray(la.adj(A))
        assert np.allclose(A @ got, np.zeros((3, 3)), atol=1e-10)
        # compare against cofactor definition computed with numpy dets
        C = np.empty((3, 3))
        for i in range(3):
            for j in range(3):
                minor = np.delete(np.delete(A, i, axis=0), j, axis=1)
                C[i, j] = (-1) ** (i + j) * np.linalg.det(minor)
        assert np.allclose(got, C.T, atol=1e-10)


class TestRankNumpy:
    def test_matches(self):
        A = np.random.default_rng(1).standard_normal((6, 3)) @ np.random.default_rng(
            2
        ).standard_normal((3, 5))
        assert la.rank_numpy(A) == np.linalg.matrix_rank(A)
