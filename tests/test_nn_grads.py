"""Gradient checks: hand-derived custom_vjp backwards vs JAX autodiff.

The reference verifies its manual backward passes with finite differences in
notebooks (03_attention.ipynb "Numerical Gradient Verification",
02_normalization.ipynb Part 4). Here the same claims are first-class tests:
every custom_vjp closed form must match jax.grad of an independent plain-jnp
forward to tight tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from linalg_tpu.nn import functional as F


def _plain_gelu(x):
    c = jnp.sqrt(2.0 / jnp.pi)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x**3)))


def _plain_layer_norm(x, gamma, beta, eps=1e-5):
    mu = x.mean(axis=-1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * gamma + beta


def _plain_rms_norm(x, gamma, eps=1e-6):
    rms = jnp.sqrt((x**2).mean(axis=-1, keepdims=True) + eps)
    return x / rms * gamma


def _plain_sdpa(Q, K, V, mask=None):
    d = Q.shape[-1]
    S = jnp.einsum("...td,...sd->...ts", Q, K) / jnp.sqrt(d)
    if mask is not None:
        S = S + mask
    P = jax.nn.softmax(S, axis=-1)
    return jnp.einsum("...ts,...sd->...td", P, V)


def _check_grads(fn_custom, fn_plain, args, argnums, atol=1e-9):
    loss_c = lambda *a: jnp.sum(jnp.sin(fn_custom(*a)))
    loss_p = lambda *a: jnp.sum(jnp.sin(fn_plain(*a)))
    gc = jax.grad(loss_c, argnums=argnums)(*args)
    gp = jax.grad(loss_p, argnums=argnums)(*args)
    for a, b in zip(jax.tree.leaves(gc), jax.tree.leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol, rtol=1e-7)


class TestActivationGrads:
    def test_relu_grad(self):
        x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 7)))
        _check_grads(F.relu, lambda x: jnp.maximum(0.0, x), (x,), 0)

    def test_gelu_grad(self):
        x = jnp.asarray(np.random.default_rng(1).standard_normal((4, 7)))
        _check_grads(F.gelu, _plain_gelu, (x,), 0)

    def test_backward_fns_match_grad(self):
        # The exported *_backward functions are the elementwise derivative.
        x = jnp.asarray(np.random.default_rng(2).standard_normal(64))
        g_auto = jax.vmap(jax.grad(_plain_gelu))(x)
        np.testing.assert_allclose(
            np.asarray(F.gelu_backward(x)), np.asarray(g_auto), atol=1e-10
        )


class TestGatedActivationGrads:
    """SwiGLU/GeGLU custom_vjp backwards (reference README.md:61,71 roadmap
    items) vs jax.grad of plain-jnp forwards."""

    def test_silu_grad(self):
        x = jnp.asarray(np.random.default_rng(3).standard_normal((4, 7)))
        _check_grads(F.silu, lambda x: x * jax.nn.sigmoid(x), (x,), 0)

    def test_silu_backward_matches_grad(self):
        x = jnp.asarray(np.random.default_rng(4).standard_normal(64))
        g_auto = jax.vmap(jax.grad(lambda x: x * jax.nn.sigmoid(x)))(x)
        np.testing.assert_allclose(
            np.asarray(F.silu_backward(x)), np.asarray(g_auto), atol=1e-10)

    @pytest.mark.parametrize("name", ["swiglu", "geglu"])
    def test_gated_grads(self, name):
        rng = np.random.default_rng(5)
        a = jnp.asarray(rng.standard_normal((3, 8)))
        g = jnp.asarray(rng.standard_normal((3, 8)))
        fn = getattr(F, name)
        if name == "swiglu":
            plain = lambda a, g: (a * jax.nn.sigmoid(a)) * g
        else:
            plain = lambda a, g: _plain_gelu(a) * g
        _check_grads(fn, plain, (a, g), (0, 1))

    @pytest.mark.parametrize("name", ["swiglu", "geglu"])
    def test_backward_fns_are_the_product_rule(self, name):
        rng = np.random.default_rng(6)
        a = jnp.asarray(rng.standard_normal(32))
        g = jnp.asarray(rng.standard_normal(32))
        bwd = getattr(F, f"{name}_backward")
        da_f, dg_f = bwd(a, g)
        if name == "swiglu":
            plain = lambda a, g: (a * jax.nn.sigmoid(a)) * g
        else:
            plain = lambda a, g: _plain_gelu(a) * g
        da_auto = jax.vmap(jax.grad(plain, argnums=0))(a, g)
        dg_auto = jax.vmap(jax.grad(plain, argnums=1))(a, g)
        np.testing.assert_allclose(np.asarray(da_f), np.asarray(da_auto),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(dg_f), np.asarray(dg_auto),
                                   atol=1e-10)

    def test_registry(self):
        from linalg_tpu.nn.activations import get_activation

        for name in ("relu", "gelu", "silu", "swiglu", "geglu"):
            fwd, bwd = get_activation(name)
            assert callable(fwd) and callable(bwd)
        with pytest.raises(KeyError):
            get_activation("mish")


class TestNormGrads:
    def test_layer_norm_grads(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((2, 5, 8)))
        gamma = jnp.asarray(rng.standard_normal(8))
        beta = jnp.asarray(rng.standard_normal(8))
        _check_grads(
            lambda x, g, b: F.layer_norm(x, g, b),
            lambda x, g, b: _plain_layer_norm(x, g, b),
            (x, gamma, beta),
            (0, 1, 2),
        )

    def test_rms_norm_grads(self):
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal((3, 6, 8)))
        gamma = jnp.asarray(rng.standard_normal(8))
        _check_grads(
            lambda x, g: F.rms_norm(x, g),
            lambda x, g: _plain_rms_norm(x, g),
            (x, gamma),
            (0, 1),
        )


class TestSDPAGrads:
    @pytest.mark.parametrize("with_mask", [False, True])
    def test_sdpa_grads(self, with_mask):
        rng = np.random.default_rng(5)
        B, h, T, d = 2, 3, 6, 4
        Q = jnp.asarray(rng.standard_normal((B, h, T, d)))
        K = jnp.asarray(rng.standard_normal((B, h, T, d)))
        V = jnp.asarray(rng.standard_normal((B, h, T, d)))
        mask = np.asarray(F.causal_mask(T, dtype=jnp.float64)) if with_mask else None
        _check_grads(
            lambda q, k, v: F.sdpa(q, k, v, mask),
            lambda q, k, v: _plain_sdpa(q, k, v, mask),
            (Q, K, V),
            (0, 1, 2),
            atol=1e-8,
        )

    def test_cross_attention_shapes(self):
        rng = np.random.default_rng(6)
        Q = jnp.asarray(rng.standard_normal((2, 2, 5, 4)))
        K = jnp.asarray(rng.standard_normal((2, 2, 9, 4)))
        V = jnp.asarray(rng.standard_normal((2, 2, 9, 4)))
        O = F.sdpa(Q, K, V)
        assert O.shape == (2, 2, 5, 4)
        dQ, dK, dV = jax.grad(
            lambda q, k, v: jnp.sum(F.sdpa(q, k, v) ** 2), argnums=(0, 1, 2)
        )(Q, K, V)
        assert dQ.shape == Q.shape and dK.shape == K.shape and dV.shape == V.shape


class TestRoPEGrads:
    def test_rotation_is_orthogonal(self):
        # RoPE preserves norms: ||rotate(x)|| == ||x||.
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal((2, 5, 8)))
        pos = jnp.arange(5, dtype=jnp.float64)[:, None]
        inv = 1.0 / (10000 ** (jnp.arange(0, 8, 2) / 8))
        ang = pos * inv[None, :]
        y = F.rope_rotate(x, jnp.cos(ang), jnp.sin(ang))
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(y), axis=-1),
            np.linalg.norm(np.asarray(x), axis=-1),
            atol=1e-10,
        )

    def test_rope_grad_flows(self):
        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.standard_normal((2, 5, 8)))
        pos = jnp.arange(5, dtype=jnp.float64)[:, None]
        inv = 1.0 / (10000 ** (jnp.arange(0, 8, 2) / 8))
        ang = pos * inv[None, :]
        cos, sin = jnp.cos(ang), jnp.sin(ang)
        g = jax.grad(lambda x: jnp.sum(F.rope_rotate(x, cos, sin) ** 2))(x)
        # d||Rx||^2/dx = 2x by orthogonality
        np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(x), atol=1e-10)
