"""Batched (vmap) linalg variant tests."""

import numpy as np
import pytest

import linalg_tpu.ops.batched as batched


class TestBatched:
    def test_batched_qr(self):
        rng = np.random.default_rng(0)
        A = rng.standard_normal((5, 20, 8))
        Q, R, ok = batched.batched_qr(A)
        assert np.all(np.asarray(ok))
        for i in range(5):
            assert np.linalg.norm(np.asarray(Q)[i] @ np.asarray(R)[i] - A[i]) < 1e-10

    def test_batched_qr_flags_deficient(self):
        A = np.stack([np.eye(4, 3), np.ones((4, 3))])
        _, _, ok = batched.batched_qr(A)
        assert bool(ok[0]) and not bool(ok[1])

    def test_batched_householder(self):
        rng = np.random.default_rng(1)
        A = rng.standard_normal((4, 30, 11))
        Q, R = batched.batched_householder_qr(A, block=8)
        for i in range(4):
            Qi = np.asarray(Q)[i]
            assert np.linalg.norm(Qi @ np.asarray(R)[i] - A[i]) < 1e-10
            assert np.linalg.norm(Qi.T @ Qi - np.eye(11)) < 1e-10

    def test_batched_svd(self):
        rng = np.random.default_rng(2)
        A = rng.standard_normal((3, 12, 6))
        U, s, Vt = batched.batched_svd(A)
        for i in range(3):
            rec = np.asarray(U)[i] @ np.diag(np.asarray(s)[i]) @ np.asarray(Vt)[i]
            assert np.linalg.norm(rec - A[i]) < 1e-9
            s_np = np.linalg.svd(A[i], compute_uv=False)
            assert np.allclose(np.asarray(s)[i], s_np, atol=1e-9)

    def test_batched_solve(self):
        rng = np.random.default_rng(3)
        A = rng.standard_normal((6, 9, 9)) + 9 * np.eye(9)
        x0 = rng.standard_normal((6, 9))
        b = np.einsum("bij,bj->bi", A, x0)
        x, ok = batched.batched_solve(A, b)
        assert np.all(np.asarray(ok))
        assert np.allclose(np.asarray(x), x0, atol=1e-8)

    def test_batched_solve_flags_singular(self):
        A = np.stack([np.eye(3), np.zeros((3, 3))])
        b = np.ones((2, 3))
        _, ok = batched.batched_solve(A, b)
        assert bool(ok[0]) and not bool(ok[1])

    def test_batched_det(self):
        rng = np.random.default_rng(4)
        A = rng.standard_normal((7, 6, 6))
        d = np.asarray(batched.batched_det(A))
        want = np.linalg.det(A)
        assert np.allclose(d, want, rtol=1e-8, atol=1e-10)
