"""(B, T, H*d)-layout fused attention tests (interpreter mode on CPU).

``attention_btd`` must match ``_unheads(sdpa(_heads(...)))`` — forward and
custom_vjp backward — and the in-model path it replaces must leave
``gpt_loss`` gradients unchanged.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from linalg_tpu.nn.flash_btd import attention_btd, btd_supported
from linalg_tpu.nn.functional import causal_mask, sdpa


def _rand(shape, seed):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), jnp.float32
    )


def _heads(x, h):
    B, T, D = x.shape
    return x.reshape(B, T, h, D // h).transpose(0, 2, 1, 3)


def _ref(q, k, v, h):
    T = q.shape[1]
    o = sdpa(_heads(q, h), _heads(k, h), _heads(v, h), causal_mask(T))
    B, H, T, d = o.shape
    return o.transpose(0, 2, 1, 3).reshape(B, T, H * d)


@pytest.mark.parametrize("B,T,H,d", [(2, 64, 2, 128), (3, 128, 4, 128)])
class TestAttentionBTD:
    def test_forward_matches_sdpa(self, B, T, H, d):
        D = H * d
        q, k, v = _rand((B, T, D), 0), _rand((B, T, D), 1), _rand((B, T, D), 2)
        with pltpu.force_tpu_interpret_mode():
            o = attention_btd(q, k, v, H, True)
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(_ref(q, k, v, H)), atol=1e-5
        )

    def test_backward_matches_sdpa(self, B, T, H, d):
        D = H * d
        q, k, v = _rand((B, T, D), 3), _rand((B, T, D), 4), _rand((B, T, D), 5)
        with pltpu.force_tpu_interpret_mode():
            g1 = jax.grad(
                lambda q, k, v: jnp.sum(jnp.sin(attention_btd(q, k, v, H, True))),
                argnums=(0, 1, 2),
            )(q, k, v)
        g2 = jax.grad(
            lambda q, k, v: jnp.sum(jnp.sin(_ref(q, k, v, H))),
            argnums=(0, 1, 2),
        )(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    def test_causality(self, B, T, H, d):
        D = H * d
        q, k, v = _rand((B, T, D), 6), _rand((B, T, D), 7), _rand((B, T, D), 8)
        k2 = k.at[:, T // 2:].set(99.0)
        v2 = v.at[:, T // 2:].set(-7.0)
        with pltpu.force_tpu_interpret_mode():
            o1 = attention_btd(q, k, v, H, True)
            o2 = attention_btd(q, k2, v2, H, True)
        np.testing.assert_allclose(
            np.asarray(o1[:, : T // 2]), np.asarray(o2[:, : T // 2]), atol=1e-5
        )


def test_supported_gate():
    # lane-aligned heads required: d_head=64 is rejected, 128 accepted
    assert btd_supported(4, 256, 512, 4)
    assert not btd_supported(4, 256, 512, 8)   # d_head 64
    assert not btd_supported(4, 2048, 512, 4)  # beyond VMEM score ceiling


def test_in_model_grads_match(monkeypatch):
    """gpt_loss gradients with the btd path == the default sdpa path."""
    from linalg_tpu.models import gpt as G

    cfg = G.GPTConfig(vocab_size=19, d_model=256, n_heads=2, n_layers=2,
                      ctx_len=32)
    params = G.init_gpt_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 19, size=(2, 32), dtype=np.int32))
    y = jnp.asarray(rng.integers(0, 19, size=(2, 32), dtype=np.int32))

    ref_loss, ref_g = jax.value_and_grad(G.gpt_loss)(params, x, y, cfg)

    # force the btd path on regardless of backend (interpret mode on CPU)
    from linalg_tpu.nn.flash_btd import attention_btd as btd

    monkeypatch.setattr(
        G, "_pick_attn_btd",
        lambda B, T, c: (lambda q, k, v: btd(q, k, v, c.n_heads, True)),
    )
    with pltpu.force_tpu_interpret_mode():
        loss, g = jax.value_and_grad(G.gpt_loss)(params, x, y, cfg)
    np.testing.assert_allclose(float(loss), float(ref_loss), atol=1e-5)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(ref_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)
