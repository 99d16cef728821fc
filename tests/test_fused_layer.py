"""Fused LN+matmul kernels vs the unfused reference composition.

Forward and every gradient must match the closed-form custom_vjp chain
(nn.functional.layer_norm + plain matmuls) in interpreter mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from linalg_tpu.nn.fused_layer import fused_supported, ln_ffn, ln_qkv
from linalg_tpu.nn.functional import layer_norm, relu


def _rand(shape, seed):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), jnp.float32
    )


def _qkv_ref(x, g, b, wq, wk, wv):
    xn = layer_norm(x, g, b)
    return xn @ wq, xn @ wk, xn @ wv


def _ffn_ref(x, g, b, w1, b1, w2, b2):
    xn = layer_norm(x, g, b)
    return relu(xn @ w1 + b1) @ w2 + b2


class TestLnQKV:
    def _args(self, B=2, T=256, D=128, seed=0):
        return (_rand((B, T, D), seed), _rand((D,), seed + 1) * 0.1 + 1.0,
                _rand((D,), seed + 2) * 0.1,
                _rand((D, D), seed + 3) / np.sqrt(D),
                _rand((D, D), seed + 4) / np.sqrt(D),
                _rand((D, D), seed + 5) / np.sqrt(D))

    def test_forward_matches_unfused(self):
        args = self._args()
        with pltpu.force_tpu_interpret_mode():
            q, k, v = ln_qkv(*args)
        qr, kr, vr = _qkv_ref(*args)
        for a, r in ((q, qr), (k, kr), (v, vr)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       atol=2e-5)

    def test_gradients_match_unfused(self):
        args = self._args(B=1, T=256, D=128)
        w = [_rand((1, 256, 128), 9 + i) for i in range(3)]

        def loss_fused(*a):
            q, k, v = ln_qkv(*a)
            return jnp.sum(q * w[0]) + jnp.sum(k * w[1]) + jnp.sum(v * w[2])

        def loss_ref(*a):
            q, k, v = _qkv_ref(*a)
            return jnp.sum(q * w[0]) + jnp.sum(k * w[1]) + jnp.sum(v * w[2])

        with pltpu.force_tpu_interpret_mode():
            g1 = jax.grad(loss_fused, argnums=tuple(range(6)))(*args)
        g2 = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
        for a, r in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       atol=5e-4, rtol=1e-4)

    def test_multi_block_accumulation(self):
        # several grid steps: weight grads must SUM across token blocks
        args = self._args(B=4, T=256, D=128, seed=7)

        def loss_fused(*a):
            q, k, v = ln_qkv(*a)
            return jnp.sum(q ** 2) + jnp.sum(k ** 2) + jnp.sum(v ** 2)

        def loss_ref(*a):
            q, k, v = _qkv_ref(*a)
            return jnp.sum(q ** 2) + jnp.sum(k ** 2) + jnp.sum(v ** 2)

        with pltpu.force_tpu_interpret_mode():
            g1 = jax.grad(loss_fused, argnums=(3, 4, 5))(*args)
        g2 = jax.grad(loss_ref, argnums=(3, 4, 5))(*args)
        for a, r in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       atol=1e-3, rtol=1e-4)


class TestLnFFN:
    def _args(self, B=2, T=256, D=128, F=256, seed=20):
        return (_rand((B, T, D), seed), _rand((D,), seed + 1) * 0.1 + 1.0,
                _rand((D,), seed + 2) * 0.1,
                _rand((D, F), seed + 3) / np.sqrt(D),
                _rand((F,), seed + 4) * 0.1,
                _rand((F, D), seed + 5) / np.sqrt(F),
                _rand((D,), seed + 6) * 0.1)

    def test_forward_matches_unfused(self):
        args = self._args()
        with pltpu.force_tpu_interpret_mode():
            f = ln_ffn(*args)
        np.testing.assert_allclose(np.asarray(f),
                                   np.asarray(_ffn_ref(*args)), atol=5e-5)

    def test_gradients_match_unfused(self):
        args = self._args(B=2, T=256)
        w = _rand((2, 256, 128), 30)

        def loss_fused(*a):
            return jnp.sum(ln_ffn(*a) * w)

        def loss_ref(*a):
            return jnp.sum(_ffn_ref(*a) * w)

        with pltpu.force_tpu_interpret_mode():
            g1 = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
        g2 = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
        for a, r in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       atol=1e-3, rtol=1e-4)

    def test_bf16_io(self):
        args = tuple(a.astype(jnp.bfloat16) for a in self._args())
        with pltpu.force_tpu_interpret_mode():
            f = ln_ffn(*args)
        assert f.dtype == jnp.bfloat16
        ref = _ffn_ref(*[a.astype(jnp.float32) for a in args])
        np.testing.assert_allclose(np.asarray(f, dtype=np.float32),
                                   np.asarray(ref), atol=0.15)


class TestSupportGate:
    def test_fused_supported(self):
        assert fused_supported(16384, 512, 2048)
        assert not fused_supported(16384 + 1, 512, 2048)
        assert not fused_supported(16384, 512 + 1, 2048)
        assert not fused_supported(100, 512, 2048)


class TestFusedGPTEquivalence:
    """The full GPT forward/backward with the fused kernels must match the
    unfused path (interpret mode; on TPU the gate picks fused
    automatically for training shapes)."""

    def test_gpt_loss_and_grads_match(self, monkeypatch):
        import linalg_tpu.models.gpt as G

        cfg = G.GPTConfig(vocab_size=17, d_model=128, n_heads=4,
                          n_layers=2, d_ff=256, ctx_len=256)
        params = G.init_gpt_params(cfg, seed=0)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.integers(0, 17, (1, 256)), jnp.int32)
        y = jnp.asarray(rng.integers(0, 17, (1, 256)), jnp.int32)

        ref_loss, ref_grads = jax.value_and_grad(G.gpt_loss)(params, x, y, cfg)

        monkeypatch.setattr(G, "_pick_fused", lambda B, T, c: True)
        with pltpu.force_tpu_interpret_mode():
            f_loss, f_grads = jax.value_and_grad(G.gpt_loss)(params, x, y, cfg)

        assert abs(float(f_loss) - float(ref_loss)) < 1e-5
        for a, r in zip(jax.tree.leaves(f_grads), jax.tree.leaves(ref_grads)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       atol=1e-4, rtol=1e-3)


class TestFusedMoEEquivalence:
    def test_moe_loss_and_grads_match(self, monkeypatch):
        import linalg_tpu.models.gpt as G
        import linalg_tpu.models.moe as M

        cfg = M.MoEGPTConfig(vocab_size=17, d_model=128, n_heads=4,
                             n_layers=2, d_ff=256, ctx_len=256, n_experts=2,
                             capacity_factor=4.0)
        params = M.init_moe_params(cfg, seed=0)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.integers(0, 17, (1, 256)), jnp.int32)
        y = jnp.asarray(rng.integers(0, 17, (1, 256)), jnp.int32)
        ref_loss, ref_grads = jax.value_and_grad(M.moe_gpt_loss)(
            params, x, y, cfg)
        monkeypatch.setattr(G, "_pick_fused", lambda B, T, c: True)
        with pltpu.force_tpu_interpret_mode():
            f_loss, f_grads = jax.value_and_grad(M.moe_gpt_loss)(
                params, x, y, cfg)
        assert abs(float(f_loss) - float(ref_loss)) < 1e-5
        for a, r in zip(jax.tree.leaves(f_grads), jax.tree.leaves(ref_grads)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       atol=1e-4, rtol=1e-3)
