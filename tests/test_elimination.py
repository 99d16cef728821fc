"""Elimination tests — reference assertions (tests/test_elimination.py) rebuilt.

Differential testing vs NumPy ground truth, residual-norm comparisons (judge
numerical correctness independent of conditioning), rank-nullity checks, RREF
structure/idempotence, plus JAX-specific additions.
"""

import numpy as np
import pytest

import linalg_tpu as la
from linalg_tpu.utils import random_nonsingular_qr, random_nonsingular_upper


def _residual(A, x, b):
    return np.linalg.norm(A @ np.asarray(x) - b)


class TestGaussianSolve:
    def test_recovers_known_solution(self):
        rng = np.random.default_rng(0)
        A = random_nonsingular_qr(12, seed=1)
        x0 = rng.standard_normal(12)
        b = A @ x0
        x = la.gaussian_solve(A, b)
        assert np.allclose(np.asarray(x), x0, atol=1e-8)

    @pytest.mark.parametrize("seed", range(25))
    def test_residual_parity_qr_fixtures(self, seed):
        rng = np.random.default_rng(seed)
        A = random_nonsingular_qr(10, seed=seed)
        b = rng.standard_normal(10)
        x = la.gaussian_solve(A, b)
        x_np = np.linalg.solve(A, b)
        assert _residual(A, x, b) <= _residual(A, x_np, b) * (1 + 1e-6) + 1e-9

    @pytest.mark.parametrize("seed", range(25))
    def test_residual_parity_upper_fixtures(self, seed):
        rng = np.random.default_rng(seed + 1000)
        A = random_nonsingular_upper(10, seed=seed)
        b = rng.standard_normal(10)
        x = la.gaussian_solve(A, b)
        x_np = np.linalg.solve(A, b)
        assert _residual(A, x, b) <= _residual(A, x_np, b) * (1 + 1e-6) + 1e-9

    def test_rank_deficient_consistent_falls_back_to_lstsq(self):
        # A maps everything through a rank-2 subspace; b in range(A).
        rng = np.random.default_rng(3)
        B = rng.standard_normal((4, 2))
        C = rng.standard_normal((2, 4))
        A = B @ C
        b = A @ rng.standard_normal(4)
        x = la.gaussian_solve(A, b)
        assert _residual(A, x, b) < 1e-8

    def test_inconsistent_raises(self):
        A = np.array([[1.0, 2.0], [2.0, 4.0]])
        b = np.array([1.0, 3.0])  # not in range(A)
        with pytest.raises(ValueError, match="inconsistent"):
            la.gaussian_solve(A, b)

    def test_matrix_rhs(self):
        A = random_nonsingular_qr(6, seed=7)
        B = np.random.default_rng(7).standard_normal((6, 3))
        X = la.gaussian_solve(A, B)
        assert np.allclose(A @ np.asarray(X), B, atol=1e-8)


class TestForwardEliminate:
    def test_full_rank_square(self):
        A = random_nonsingular_qr(8, seed=2)
        U, c, pivots, free, perm = la.forward_eliminate(A)
        assert c is None
        assert pivots == list(range(8))
        assert free == []
        assert sorted(perm) == list(range(8))
        U = np.asarray(U)
        assert np.allclose(np.tril(U, -1), 0.0, atol=1e-10)

    def test_row_ops_match_permutation(self):
        # U must be the echelon form of the permuted A: P A ~ U (same row
        # space); verify rank and that the recorded perm reorders rows of A.
        A = np.random.default_rng(5).standard_normal((5, 5))
        U, _, pivots, _, perm = la.forward_eliminate(A)
        assert len(pivots) == 5
        assert sorted(perm) == list(range(5))

    def test_wide_matrix_free_columns(self):
        rng = np.random.default_rng(9)
        A = rng.standard_normal((3, 5))
        U, _, pivots, free, perm = la.forward_eliminate(A)
        assert len(pivots) == 3
        assert len(free) == 2
        assert sorted(pivots + free) == list(range(5))
        assert len(perm) == 5  # max(m, n)

    def test_rhs_tracks_row_ops(self):
        rng = np.random.default_rng(11)
        A = random_nonsingular_qr(6, seed=11)
        x0 = rng.standard_normal(6)
        b = A @ x0
        U, c, *_ = la.forward_eliminate(A, b)
        # back substitution through (U, c) must recover x0
        x = la.back_substitute(U, np.asarray(c))
        assert np.allclose(np.asarray(x), x0, atol=1e-8)


class TestBackSubstitute:
    def test_simple_upper(self):
        U = np.array([[2.0, 1.0], [0.0, 3.0]])
        c = np.array([5.0, 6.0])
        x = la.back_substitute(U, c)
        assert np.allclose(np.asarray(x), [1.5, 2.0])

    def test_rank_deficient_raises(self):
        U = np.array([[1.0, 2.0], [0.0, 0.0]])
        c = np.array([1.0, 0.0])
        with pytest.raises(ValueError, match="rank deficient"):
            la.back_substitute(U, c)

    def test_inconsistent_raises(self):
        U = np.array([[1.0, 2.0], [0.0, 0.0]])
        c = np.array([1.0, 5.0])
        with pytest.raises(ValueError, match="inconsistent"):
            la.back_substitute(U, c)


class TestNullspace:
    @pytest.mark.parametrize("seed", range(10))
    def test_AN_is_zero_and_rank_nullity(self, seed):
        rng = np.random.default_rng(seed)
        r = rng.integers(1, 4)
        B = rng.standard_normal((6, r))
        C = rng.standard_normal((r, 8))
        A = B @ C
        N = np.asarray(la.nullspace_basis_elimination(A))
        rank = la.rank_elimination(A)
        assert rank == r
        assert N.shape == (8, 8 - rank)
        assert np.linalg.norm(A @ N) < 1e-8
        # columns independent
        assert np.linalg.matrix_rank(N) == 8 - rank

    def test_full_rank_empty_nullspace(self):
        A = random_nonsingular_qr(5, seed=4)
        N = np.asarray(la.nullspace_basis_elimination(A))
        assert N.shape == (5, 0)


class TestRREF:
    def test_idempotent(self):
        A = np.random.default_rng(13).standard_normal((4, 6))
        R1, p1 = la.rref(A)
        R2, p2 = la.rref(np.asarray(R1))
        assert p1 == p2
        assert np.allclose(np.asarray(R1), np.asarray(R2), atol=1e-10)

    def test_pivot_columns_are_unit_vectors(self):
        rng = np.random.default_rng(17)
        B = rng.standard_normal((5, 3))
        C = rng.standard_normal((3, 7))
        A = B @ C
        R, pivots = la.rref(A)
        R = np.asarray(R)
        for i, col in enumerate(pivots):
            e = np.zeros(5)
            e[i] = 1.0
            assert np.allclose(R[:, col], e, atol=1e-8)


class TestRank:
    @pytest.mark.parametrize("trial", range(50))
    def test_rank_matches_numpy(self, trial):
        rng = np.random.default_rng(trial)
        r = int(rng.integers(0, 7))
        if r == 0:
            A = np.zeros((8, 6))
        else:
            A = rng.standard_normal((8, r)) @ rng.standard_normal((r, 6))
        assert la.rank_elimination(A) == np.linalg.matrix_rank(A)
