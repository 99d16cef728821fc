"""Stateful DecoderOnlyLayer / GPT / AdamW contract tests."""

import jax.numpy as jnp
import numpy as np

from linalg_tpu.models.gpt_modules import GPT, AdamW, DecoderOnlyLayer
from linalg_tpu.nn import causal_mask


class TestDecoderOnlyLayer:
    def test_roundtrip_and_step(self):
        lyr = DecoderOnlyLayer(d_model=16, n_heads=4, d_ff=32, seed=0)
        x = np.random.default_rng(0).standard_normal((2, 6, 16)).astype(np.float32)
        y = lyr.forward(x, causal_mask(6))
        assert np.asarray(y).shape == x.shape
        dx = lyr.backward(np.ones_like(np.asarray(y)))
        assert np.asarray(dx).shape == x.shape
        lyr.step(lr=1e-3, weight_decay=1e-4)


class TestGPTStack:
    def test_training_reduces_loss(self):
        gpt = GPT(num_layers=2, d_model=16, n_heads=2, seed=1)
        rng = np.random.default_rng(1)
        x = rng.standard_normal((2, 5, 16)).astype(np.float32)
        mask = causal_mask(5)

        def loss_and_grad():
            h = gpt.forward(x, mask)
            loss = float(jnp.sum(jnp.asarray(h) ** 2))
            gpt.backward(2 * np.asarray(h))
            return loss

        l0 = loss_and_grad()
        gpt.step(lr=1e-6)  # tiny step: first-order decrease must hold
        l1 = loss_and_grad()
        assert l1 < l0


class TestAdamWGroups:
    def test_matches_pure_adamw(self):
        from linalg_tpu.train.optim import adamw_init, adamw_update

        rng = np.random.default_rng(2)
        p = {"w": jnp.asarray(rng.standard_normal((3, 4)), jnp.float32)}
        g = {"w": jnp.asarray(rng.standard_normal((3, 4)), jnp.float32)}
        # pure pytree optimizer
        state = adamw_init(p)
        p_pure = dict(p)
        for _ in range(3):
            p_pure, state = adamw_update(p_pure, g, state, 1e-3, {"w": 0.01})
        # param-group class
        opt = AdamW(lr=1e-3, weight_decay=0.01)
        p_cls = p["w"]
        for _ in range(3):
            (p_cls,) = opt.step([{"p": p_cls, "g": g["w"], "weight_decay": 0.01}])
        np.testing.assert_allclose(
            np.asarray(p_pure["w"]), np.asarray(p_cls), rtol=1e-6
        )

    def test_zero_wd_group(self):
        opt = AdamW(lr=0.1)
        p = jnp.asarray([1.0])
        g = jnp.asarray([0.0])
        (p2,) = opt.step([{"p": p, "g": g, "weight_decay": 0.0}])
        assert float(p2[0]) == 1.0  # no grad, no decay -> unchanged
