"""Pallas QR kernel tests (interpreter mode on CPU).

The TPU drives exercise the compiled path; these pin the kernel's math in
the test suite: panel factorization invariants (compact-WY identity,
reflector structure) and the full blocked QR against the lax core.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from linalg_tpu.ops.pallas.qr_panel import factor_panel, householder_qr_pallas
from linalg_tpu.ops.qr import _householder_core


def _rand(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


class TestPanelKernel:
    def test_compact_wy_identity(self):
        m, b = 24, 8
        A = _rand((m, b), 1)
        with pltpu.force_tpu_interpret_mode():
            St, Vt, Tt = factor_panel(jnp.asarray(A.T), 0, b)
        V = np.asarray(Vt).T
        T = np.asarray(Tt).T
        Qp = np.eye(m) - V @ T @ V.T
        # Q_panel is orthogonal and reconstructs the panel
        assert np.linalg.norm(Qp.T @ Qp - np.eye(m)) < 1e-5
        assert np.linalg.norm(Qp @ np.asarray(St).T - A) < 1e-4

    def test_reflector_structure(self):
        m, b = 16, 4
        A = _rand((m, b), 2)
        with pltpu.force_tpu_interpret_mode():
            St, Vt, Tt = factor_panel(jnp.asarray(A.T), 0, b)
        Vt = np.asarray(Vt)
        for j in range(b):
            # unit norm, zero left of the pivot lane
            assert abs(np.linalg.norm(Vt[j]) - 1.0) < 1e-5
            assert np.abs(Vt[j][:j]).max(initial=0.0) < 1e-7
        # Tt is lower-triangular (T upper-triangular), diag = tau = 2
        Tt = np.asarray(Tt)
        assert np.abs(np.triu(Tt, 1)).max() < 1e-6
        np.testing.assert_allclose(np.diag(Tt), 2.0, atol=1e-6)

    def test_offset_panel(self):
        # pivot rows starting at k > 0: rows above k untouched by reflectors
        m, b, k = 20, 4, 8
        A = _rand((m, b), 3)
        with pltpu.force_tpu_interpret_mode():
            St, Vt, Tt = factor_panel(jnp.asarray(A.T), k, b)
        Vt = np.asarray(Vt)
        assert np.abs(Vt[:, :k]).max() < 1e-7  # zero above the offset
        # rows < k of the panel unchanged
        np.testing.assert_allclose(np.asarray(St).T[:k], A[:k], atol=1e-5)

    def test_zero_column_skipped(self):
        m, b = 16, 4
        A = _rand((m, b), 4)
        A[:, 2] = 0.0
        with pltpu.force_tpu_interpret_mode():
            St, Vt, Tt = factor_panel(jnp.asarray(A.T), 0, b)
        assert np.abs(np.asarray(Vt)[2]).max() < 1e-7  # no reflector
        assert abs(np.asarray(Tt)[2, 2]) < 1e-7  # tau = 0


class TestBlockedQRPallas:
    @pytest.mark.parametrize("n,block", [(64, 16), (96, 32), (64, 64)])
    def test_matches_lax_core_quality(self, n, block):
        A = _rand((n, n), n)
        with pltpu.force_tpu_interpret_mode():
            Q, R = householder_qr_pallas(jnp.asarray(A), block=block)
        Qn, Rn = np.asarray(Q), np.asarray(R)
        rel = np.linalg.norm(Qn @ Rn - A) / np.linalg.norm(A)
        orth = np.linalg.norm(Qn.T @ Qn - np.eye(n))
        assert rel < 1e-5
        assert orth < 1e-4
        assert np.abs(np.tril(Rn, -1)).max() == 0.0
        # same quality class as the lax core
        Q2, R2 = _householder_core(jnp.asarray(A), block)
        rel2 = np.linalg.norm(np.asarray(Q2) @ np.asarray(R2) - A) / np.linalg.norm(A)
        assert rel < 10 * max(rel2, 1e-7)

    def test_tall_matrix(self):
        A = _rand((96, 32), 7)
        with pltpu.force_tpu_interpret_mode():
            Q, R = householder_qr_pallas(jnp.asarray(A), block=16)
        Qn = np.asarray(Q)
        assert Qn.shape == (96, 32)
        assert np.linalg.norm(Qn @ np.asarray(R) - A) / np.linalg.norm(A) < 1e-5
        assert np.linalg.norm(Qn.T @ Qn - np.eye(32)) < 1e-4


class TestStripKernel:
    """The unrolled static-index strip kernel must match factor_panel."""

    @pytest.mark.parametrize("k", [0, 8])
    def test_matches_panel_kernel(self, k):
        from linalg_tpu.ops.pallas.qr_panel import factor_strip

        m, b = 24, 8
        A = _rand((m, b), 11)
        with pltpu.force_tpu_interpret_mode():
            S1, V1, T1 = factor_panel(jnp.asarray(A.T), k, b)
            S2, V2, T2 = factor_strip(jnp.asarray(A.T), k, b)
        np.testing.assert_allclose(np.asarray(S1), np.asarray(S2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(V1), np.asarray(V2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(T1), np.asarray(T2), atol=1e-5)

    def test_zero_column_skipped(self):
        from linalg_tpu.ops.pallas.qr_panel import factor_strip

        m, b = 16, 4
        A = _rand((m, b), 4)
        A[:, 2] = 0.0
        with pltpu.force_tpu_interpret_mode():
            St, Vt, Tt = factor_strip(jnp.asarray(A.T), 0, b)
        assert np.abs(np.asarray(Vt)[2]).max() < 1e-7
        assert abs(np.asarray(Tt)[2, 2]) < 1e-7

    def test_two_level_equals_single_panel(self):
        # a width-2b panel factored as two strips + WY merge must produce
        # the same panel transform as one factor_panel sweep
        m, b = 32, 16
        A = _rand((m, b), 12)
        with pltpu.force_tpu_interpret_mode():
            # two-level via the full blocked driver with inner=b/2
            Q1, R1 = householder_qr_pallas(jnp.asarray(A), block=b, inner=8)
            Q2, R2 = householder_qr_pallas(jnp.asarray(A), block=b, inner=b)
        np.testing.assert_allclose(np.asarray(R1), np.asarray(R2), atol=2e-4)
        np.testing.assert_allclose(np.asarray(Q1), np.asarray(Q2), atol=2e-4)


class TestPairAggregation:
    """pair=True merges adjacent panels into rank-2b far-field operators;
    results must match the per-panel path and the lax core exactly (same
    reflectors, same arithmetic on the near field)."""

    @pytest.mark.parametrize("n,block", [(64, 16), (96, 16), (80, 16)])
    def test_pair_matches_single(self, n, block):
        A = jnp.asarray(_rand((n, n), 11))
        with pltpu.force_tpu_interpret_mode():
            Qp, Rp = householder_qr_pallas(A, block=block, inner=8,
                                           pair=True)
            Qs, Rs = householder_qr_pallas(A, block=block, inner=8,
                                           pair=False)
        # merged vs sequential application differ only in f32 rounding
        np.testing.assert_allclose(np.asarray(Qp), np.asarray(Qs),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(Rp), np.asarray(Rs),
                                   atol=2e-4)

    def test_pair_reconstructs_tall(self):
        m, n, block = 96, 48, 16
        A = jnp.asarray(_rand((m, n), 12))
        with pltpu.force_tpu_interpret_mode():
            Q, R = householder_qr_pallas(A, block=block, inner=8, pair=True)
        Q, R = np.asarray(Q), np.asarray(R)
        assert np.linalg.norm(Q @ R - np.asarray(A)) / np.linalg.norm(
            np.asarray(A)) < 1e-5
        assert np.linalg.norm(Q.T @ Q - np.eye(n)) < 1e-4


class TestAggregation:
    """agg=4 (quad runs) must match agg=1 and reconstruct A = QR."""

    @pytest.mark.parametrize("n,block,agg", [(64, 16, 4), (96, 16, 3),
                                             (80, 16, 4)])
    def test_agg_matches_single(self, n, block, agg):
        rng = np.random.default_rng(41)
        A = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            Qa, Ra = householder_qr_pallas(A, block=block, inner=8, agg=agg)
            Q1, R1 = householder_qr_pallas(A, block=block, inner=8,
                                           pair=False)
        np.testing.assert_allclose(np.asarray(Qa), np.asarray(Q1), atol=2e-4)
        np.testing.assert_allclose(np.asarray(Ra), np.asarray(R1), atol=2e-4)

    def test_agg_reconstructs_tall(self):
        rng = np.random.default_rng(42)
        A = jnp.asarray(rng.standard_normal((96, 64)), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            Q, R = householder_qr_pallas(A, block=16, inner=8, agg=4)
        np.testing.assert_allclose(np.asarray(Q @ R), np.asarray(A),
                                   atol=3e-5)
        np.testing.assert_allclose(np.asarray(Q.T @ Q), np.eye(64),
                                   atol=3e-5)
