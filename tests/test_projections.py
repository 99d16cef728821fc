"""Projection tests — reference assertions (tests/test_projections.py) rebuilt."""

import numpy as np

import linalg_tpu as la


class TestProjection:
    def test_known_answer(self):
        A = np.array([[1.0, 0.0], [0.0, 1.0], [0.0, 0.0]])
        b = np.array([3.0, 4.0, 5.0])
        p = np.asarray(la.project_onto_colspace(A, b)).ravel()
        assert np.allclose(p, [3.0, 4.0, 0.0], atol=1e-12)

    def test_residual_orthogonal_to_colspace(self):
        rng = np.random.default_rng(0)
        A = rng.standard_normal((10, 4))
        b = rng.standard_normal(10)
        p = np.asarray(la.project_onto_colspace(A, b)).ravel()
        assert np.allclose(A.T @ (b - p), 0.0, atol=1e-9)

    def test_residual_parity_with_lstsq(self):
        rng = np.random.default_rng(1)
        A = rng.standard_normal((20, 5))
        b = rng.standard_normal(20)
        p = np.asarray(la.project_onto_colspace(A, b)).ravel()
        x = np.linalg.lstsq(A, b, rcond=None)[0]
        assert np.linalg.norm(b - p) <= np.linalg.norm(b - A @ x) * (1 + 1e-10)

    def test_idempotent(self):
        rng = np.random.default_rng(2)
        A = rng.standard_normal((8, 3))
        b = rng.standard_normal(8)
        p1 = np.asarray(la.project_onto_colspace(A, b)).ravel()
        p2 = np.asarray(la.project_onto_colspace(A, p1)).ravel()
        assert np.allclose(p1, p2, atol=1e-9)

    def test_rank_deficient_falls_back_to_pinv(self, capsys):
        rng = np.random.default_rng(3)
        base = rng.standard_normal((10, 2))
        A = np.hstack([base, base[:, :1]])  # dependent third column
        b = rng.standard_normal(10)
        p = np.asarray(la.project_onto_colspace(A, b)).ravel()
        out = capsys.readouterr().out
        assert "pseudo-inverse" in out
        x = np.linalg.lstsq(A, b, rcond=None)[0]
        assert np.allclose(p, A @ x, atol=1e-9)

    def test_matrix_rhs_shape(self):
        rng = np.random.default_rng(4)
        A = rng.standard_normal((9, 3))
        B = rng.standard_normal((9, 2))
        P = np.asarray(la.project_onto_colspace(A, B))
        assert P.shape == (9, 2)
