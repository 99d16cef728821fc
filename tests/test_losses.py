"""Chunked fused softmax-CE vs the direct logits computation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from linalg_tpu.nn.losses import chunked_softmax_ce


def _direct_ce(h, W, b, y):
    logits = h.astype(jnp.float32) @ W.astype(jnp.float32).T + b
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, y[..., None], axis=-1)[..., 0]
    return jnp.mean(logz - gold)


def _args(N=64, D=32, V=300, seed=0):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.standard_normal((N, D)), jnp.float32),
            jnp.asarray(rng.standard_normal((V, D)) * 0.3, jnp.float32),
            jnp.asarray(rng.standard_normal((V,)) * 0.1, jnp.float32),
            jnp.asarray(rng.integers(0, V, (N,)), jnp.int32))


class TestChunkedCE:
    @pytest.mark.parametrize("chunk", [128, 300, 512])
    def test_loss_matches_direct(self, chunk):
        # chunk < V (multi-chunk), == V, and > V (padding) all agree
        h, W, b, y = _args()
        loss = chunked_softmax_ce(h, W, b, y, chunk)
        ref = _direct_ce(h, W, b, y)
        assert abs(float(loss) - float(ref)) < 1e-5

    def test_grads_match_direct(self):
        h, W, b, y = _args()
        g1 = jax.grad(lambda h, W, b: chunked_softmax_ce(h, W, b, y, 128),
                      argnums=(0, 1, 2))(h, W, b)
        g2 = jax.grad(lambda h, W, b: _direct_ce(h, W, b, y),
                      argnums=(0, 1, 2))(h, W, b)
        for a, r in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       atol=1e-5, rtol=1e-4)

    def test_batched_shape_and_bf16_hidden(self):
        h, W, b, y = _args()
        h3 = h.reshape(4, 16, 32).astype(jnp.bfloat16)
        y3 = y.reshape(4, 16)
        loss = chunked_softmax_ce(h3, W, b, y3, 128)
        ref = _direct_ce(h3.astype(jnp.float32), W, b, y3)
        assert abs(float(loss) - float(ref)) < 1e-2
        dh = jax.grad(lambda h: chunked_softmax_ce(h, W, b, y3, 128))(h3)
        assert dh.shape == h3.shape and dh.dtype == jnp.bfloat16

    def test_extreme_logits_stable(self):
        # online-softmax path must not overflow for large-magnitude logits
        h, W, b, y = _args()
        loss = chunked_softmax_ce(h * 100, W * 100, b, y, 128)
        ref = _direct_ce(h * 100, W * 100, b, y)
        assert np.isfinite(float(loss))
        assert abs(float(loss) - float(ref)) < 1e-3 * max(1.0, float(ref))


class TestGPTChunkedLoss:
    def test_gpt_loss_same_either_path(self, monkeypatch):
        import linalg_tpu.models.gpt as G

        cfg = G.GPTConfig(vocab_size=97, d_model=32, n_heads=2, n_layers=2,
                          ctx_len=16)
        params = G.init_gpt_params(cfg, seed=0)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.integers(0, 97, (2, 16)), jnp.int32)
        y = jnp.asarray(rng.integers(0, 97, (2, 16)), jnp.int32)
        ref_loss, ref_grads = jax.value_and_grad(G.gpt_loss)(params, x, y, cfg)
        monkeypatch.setattr(G, "CE_CHUNK_THRESHOLD", 1)  # force chunked
        c_loss, c_grads = jax.value_and_grad(G.gpt_loss)(params, x, y, cfg)
        assert abs(float(c_loss) - float(ref_loss)) < 1e-5
        for a, r in zip(jax.tree.leaves(c_grads), jax.tree.leaves(ref_grads)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       atol=1e-5, rtol=1e-4)
