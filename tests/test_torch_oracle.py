"""Differential tests vs PyTorch autograd — the reference used its torch
twin as a behavioral oracle for the manual NumPy gradients
(ai_comps/pytorch_encoder_decoder_transformer.py); here the oracle checks
the custom_vjp closed forms directly with copied weights."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

import linalg_tpu.nn as lnn


def _t(x):
    return torch.as_tensor(np.asarray(x), dtype=torch.float64)


class TestLayerNormOracle:
    def test_forward_backward_match(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((4, 6, 8))
        gamma = rng.standard_normal(8)
        beta = rng.standard_normal(8)
        dy = rng.standard_normal((4, 6, 8))

        # torch
        xt = _t(x).requires_grad_(True)
        gt = _t(gamma).requires_grad_(True)
        bt = _t(beta).requires_grad_(True)
        yt = torch.nn.functional.layer_norm(xt, (8,), gt, bt, eps=1e-5)
        yt.backward(_t(dy))

        # ours
        y, pull = jax.vjp(
            lambda xx, g, b: lnn.layer_norm(xx, g, b, 1e-5),
            jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta),
        )
        dx, dgamma, dbeta = pull(jnp.asarray(dy))

        np.testing.assert_allclose(np.asarray(y), yt.detach().numpy(), atol=1e-10)
        np.testing.assert_allclose(np.asarray(dx), xt.grad.numpy(), atol=1e-9)
        np.testing.assert_allclose(np.asarray(dgamma), gt.grad.numpy(), atol=1e-9)
        np.testing.assert_allclose(np.asarray(dbeta), bt.grad.numpy(), atol=1e-9)


class TestSDPAOracle:
    def test_forward_backward_match(self):
        rng = np.random.default_rng(1)
        B, h, T, d = 2, 2, 5, 4
        q, k, v = (rng.standard_normal((B, h, T, d)) for _ in range(3))
        dO = rng.standard_normal((B, h, T, d))

        qt, kt, vt = (_t(a).requires_grad_(True) for a in (q, k, v))
        ot = torch.nn.functional.scaled_dot_product_attention(qt, kt, vt)
        ot.backward(_t(dO))

        o, pull = jax.vjp(
            lambda q, k, v: lnn.sdpa(q, k, v),
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        )
        dq, dk, dv = pull(jnp.asarray(dO))

        np.testing.assert_allclose(np.asarray(o), ot.detach().numpy(), atol=1e-9)
        np.testing.assert_allclose(np.asarray(dq), qt.grad.numpy(), atol=1e-9)
        np.testing.assert_allclose(np.asarray(dk), kt.grad.numpy(), atol=1e-9)
        np.testing.assert_allclose(np.asarray(dv), vt.grad.numpy(), atol=1e-9)

    def test_causal_matches(self):
        rng = np.random.default_rng(2)
        B, h, T, d = 1, 2, 6, 4
        q, k, v = (rng.standard_normal((B, h, T, d)) for _ in range(3))
        ot = torch.nn.functional.scaled_dot_product_attention(
            _t(q), _t(k), _t(v), is_causal=True
        )
        o = lnn.sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                     np.asarray(lnn.causal_mask(T, dtype=jnp.float64)))
        np.testing.assert_allclose(np.asarray(o), ot.numpy(), atol=1e-9)


class TestGELUOracle:
    def test_matches_torch_tanh_gelu(self):
        x = np.linspace(-4, 4, 101)
        ours = np.asarray(lnn.gelu(jnp.asarray(x)))
        theirs = torch.nn.functional.gelu(_t(x), approximate="tanh").numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-9)

        xt = _t(x).requires_grad_(True)
        torch.nn.functional.gelu(xt, approximate="tanh").sum().backward()
        np.testing.assert_allclose(
            np.asarray(lnn.gelu_backward(jnp.asarray(x))),
            xt.grad.numpy(), atol=1e-9,
        )


class TestSiLUOracle:
    def test_matches_torch_silu(self):
        x = np.linspace(-4, 4, 101)
        ours = np.asarray(lnn.silu(jnp.asarray(x)))
        theirs = torch.nn.functional.silu(_t(x)).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-9)

        xt = _t(x).requires_grad_(True)
        torch.nn.functional.silu(xt).sum().backward()
        np.testing.assert_allclose(
            np.asarray(lnn.silu_backward(jnp.asarray(x))),
            xt.grad.numpy(), atol=1e-9,
        )


class TestGatedFFNOracle:
    """swiglu/geglu forward AND backward vs a torch autograd gated unit."""

    def test_swiglu_matches_torch(self):
        rng = np.random.default_rng(0)
        a = rng.standard_normal((5, 9))
        g = rng.standard_normal((5, 9))
        ours = np.asarray(lnn.swiglu(jnp.asarray(a), jnp.asarray(g)))
        at = _t(a).requires_grad_(True)
        gt = _t(g).requires_grad_(True)
        out = torch.nn.functional.silu(at) * gt
        np.testing.assert_allclose(ours, out.detach().numpy(), atol=1e-9)
        out.sum().backward()
        da, dg = jax.grad(
            lambda a, g: jnp.sum(lnn.swiglu(a, g)), argnums=(0, 1)
        )(jnp.asarray(a), jnp.asarray(g))
        np.testing.assert_allclose(np.asarray(da), at.grad.numpy(),
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(dg), gt.grad.numpy(),
                                   atol=1e-9)

    def test_geglu_matches_torch(self):
        rng = np.random.default_rng(1)
        a = rng.standard_normal((5, 9))
        g = rng.standard_normal((5, 9))
        ours = np.asarray(lnn.geglu(jnp.asarray(a), jnp.asarray(g)))
        at = _t(a).requires_grad_(True)
        gt = _t(g).requires_grad_(True)
        out = torch.nn.functional.gelu(at, approximate="tanh") * gt
        np.testing.assert_allclose(ours, out.detach().numpy(), atol=1e-9)
        out.sum().backward()
        da, dg = jax.grad(
            lambda a, g: jnp.sum(lnn.geglu(a, g)), argnums=(0, 1)
        )(jnp.asarray(a), jnp.asarray(g))
        np.testing.assert_allclose(np.asarray(da), at.grad.numpy(),
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(dg), gt.grad.numpy(),
                                   atol=1e-9)


class TestTwinModel:
    def test_twin_builds_and_steps(self):
        from linalg_tpu.apps.torch_twin import TrainConfig, train_reverse_twin

        cfg = TrainConfig(epochs=3, batch_size=8, seq_len=5, d_model=32,
                          d_ff=64, n_enc_layers=1, n_dec_layers=1)
        model = train_reverse_twin(cfg)
        assert model is not None
