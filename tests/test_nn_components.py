"""Component-contract tests for the stateful nn classes.

Verifies the reference's forward/backward/step interface (AGENTS.md contract
in the reference repo): grads stash, SGD step semantics, registries, cache
behavior, tokenizer round-trips.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import linalg_tpu.nn as nn


class TestRegistries:
    def test_activation_registry(self):
        f, b = nn.get_activation("relu")
        x = jnp.asarray([-1.0, 2.0])
        assert np.allclose(np.asarray(f(x)), [0.0, 2.0])
        assert np.allclose(np.asarray(b(x)), [0.0, 1.0])
        with pytest.raises(KeyError):
            nn.get_activation("swish")

    def test_norm_factory(self):
        assert isinstance(nn.get_norm("layernorm", 16), nn.LayerNorm)
        assert isinstance(nn.get_norm("rmsnorm", 16), nn.RMSNorm)
        with pytest.raises(KeyError):
            nn.get_norm("batchnorm", 16)

    def test_positional_factory(self):
        pe = nn.get_positional_encoding("sinusoidal", 10, 8)
        assert pe.shape == (10, 8)
        assert isinstance(
            nn.get_positional_encoding("learned", 10, 8),
            nn.LearnedPositionalEmbedding,
        )
        assert isinstance(
            nn.get_positional_encoding("rope", 10, 8),
            nn.RotaryPositionalEmbedding,
        )
        with pytest.raises(KeyError):
            nn.get_positional_encoding("alibi", 10, 8)


class TestLayerNormContract:
    def test_forward_normalizes(self):
        ln = nn.LayerNorm(16)
        x = np.random.default_rng(0).standard_normal((4, 16)).astype(np.float32)
        y = np.asarray(ln.forward(x))
        assert np.allclose(y.mean(-1), 0.0, atol=1e-5)
        assert np.allclose(y.std(-1), 1.0, atol=1e-2)

    def test_backward_stashes_grads_and_step_updates(self):
        ln = nn.LayerNorm(8)
        x = np.random.default_rng(1).standard_normal((3, 8)).astype(np.float32)
        y = ln.forward(x)
        dx = ln.backward(np.ones_like(np.asarray(y)))
        assert np.asarray(dx).shape == x.shape
        assert float(jnp.abs(ln.grads["beta"]).sum()) > 0
        g0 = np.asarray(ln.grads["gamma"]).copy()
        gamma_before = np.asarray(ln.gamma).copy()
        ln.step(lr=0.1)
        assert np.allclose(np.asarray(ln.gamma), gamma_before - 0.1 * g0, atol=1e-6)
        assert float(jnp.abs(ln.grads["gamma"]).sum()) == 0.0  # zeroed

    def test_rmsnorm_contract(self):
        rn = nn.RMSNorm(8)
        x = np.random.default_rng(2).standard_normal((2, 5, 8)).astype(np.float32)
        y = rn.forward(x)
        dx = rn.backward(np.asarray(y))
        assert np.asarray(dx).shape == x.shape
        rn.step(lr=0.01, weight_decay=0.1)


class TestMHAContract:
    def test_self_attention_roundtrip(self):
        mha = nn.MultiHeadAttention(d_model=16, n_heads=4, seed=0)
        x = np.random.default_rng(3).standard_normal((2, 6, 16)).astype(np.float32)
        mask = nn.causal_mask(6)
        y = mha.forward(x, mask=mask)
        assert np.asarray(y).shape == (2, 6, 16)
        dX, dKV = mha.backward(np.ones_like(np.asarray(y)))
        assert dKV is None
        assert np.asarray(dX).shape == x.shape
        for k in ("Wq", "Wk", "Wv", "Wo"):
            assert float(jnp.abs(mha.grads[k]).sum()) > 0
        mha.step(lr=1e-3, weight_decay=0.01)
        assert float(jnp.abs(mha.grads["Wq"]).sum()) == 0.0

    def test_cross_attention_returns_dkv(self):
        mha = nn.MultiHeadAttention(d_model=16, n_heads=2, seed=1)
        x = np.random.default_rng(4).standard_normal((2, 4, 16)).astype(np.float32)
        kv = np.random.default_rng(5).standard_normal((2, 9, 16)).astype(np.float32)
        y = mha.forward(x, KV=kv)
        assert np.asarray(y).shape == (2, 4, 16)
        dX, dKV = mha.backward(np.asarray(y))
        assert np.asarray(dKV).shape == kv.shape

    def test_causal_mask_blocks_future(self):
        # Token 0's output must not depend on token 2's input.
        mha = nn.MultiHeadAttention(d_model=8, n_heads=2, seed=2)
        x = np.random.default_rng(6).standard_normal((1, 3, 8)).astype(np.float32)
        mask = nn.causal_mask(3)
        y1 = np.asarray(mha.forward(x, mask=mask))
        x2 = x.copy()
        x2[0, 2] += 10.0
        y2 = np.asarray(mha.forward(x2, mask=mask))
        assert np.allclose(y1[0, :2], y2[0, :2], atol=1e-5)
        assert not np.allclose(y1[0, 2], y2[0, 2], atol=1e-3)

    def test_sdpa_class_backward_matches_vjp(self):
        att = nn.ScaledDotProductAttention()
        rng = np.random.default_rng(7)
        Q = jnp.asarray(rng.standard_normal((4, 5, 3)))
        K = jnp.asarray(rng.standard_normal((4, 5, 3)))
        V = jnp.asarray(rng.standard_normal((4, 5, 3)))
        O, cache = att.forward(Q, K, V)
        dO = jnp.ones_like(O)
        dQ, dK, dV = att.backward(dO, cache)
        gQ, gK, gV = jax.grad(
            lambda q, k, v: jnp.sum(nn.sdpa(q, k, v)), argnums=(0, 1, 2)
        )(Q, K, V)
        np.testing.assert_allclose(np.asarray(dQ), np.asarray(gQ), atol=1e-9)
        np.testing.assert_allclose(np.asarray(dK), np.asarray(gK), atol=1e-9)
        np.testing.assert_allclose(np.asarray(dV), np.asarray(gV), atol=1e-9)


class TestLearnedPE:
    def test_forward_backward_step(self):
        pe = nn.LearnedPositionalEmbedding(max_len=10, d_model=4, seed=0)
        out = pe.forward(6)
        assert np.asarray(out).shape == (6, 4)
        pe.backward(np.ones((3, 6, 4)))  # batch grad: summed over batch
        assert np.allclose(np.asarray(pe.gradW[:6]), 3.0)
        assert np.allclose(np.asarray(pe.gradW[6:]), 0.0)
        W0 = np.asarray(pe.W).copy()
        pe.step(lr=0.5)
        assert np.allclose(np.asarray(pe.W[:6]), W0[:6] - 1.5)

    def test_too_long_raises(self):
        pe = nn.LearnedPositionalEmbedding(max_len=4, d_model=2)
        with pytest.raises(AssertionError):
            pe.forward(5)


class TestRoPE:
    def test_offset_consistency(self):
        # Rotating tokens [2,3] with offset=2 must equal the tail of
        # rotating [0..3] with offset=0 — the KV-cache decode property.
        rope = nn.RotaryPositionalEmbedding(d_head=8, max_len=16)
        rng = np.random.default_rng(8)
        q = rng.standard_normal((1, 2, 4, 8)).astype(np.float32)
        k = rng.standard_normal((1, 2, 4, 8)).astype(np.float32)
        qa, ka = rope.forward(q, k, offset=0)
        qb, kb = rope.forward(q[:, :, 2:], k[:, :, 2:], offset=2)
        np.testing.assert_allclose(np.asarray(qa)[:, :, 2:], np.asarray(qb), atol=1e-6)
        np.testing.assert_allclose(np.asarray(ka)[:, :, 2:], np.asarray(kb), atol=1e-6)

    def test_relative_property(self):
        # <rope(q,i), rope(k,j)> depends only on i-j.
        rope = nn.RotaryPositionalEmbedding(d_head=8, max_len=32)
        rng = np.random.default_rng(9)
        q = rng.standard_normal((1, 1, 1, 8)).astype(np.float32)
        k = rng.standard_normal((1, 1, 1, 8)).astype(np.float32)

        def dot_at(i, j):
            qi, _ = rope.forward(q, q, offset=i)
            kj, _ = rope.forward(k, k, offset=j)
            return float(np.sum(np.asarray(qi) * np.asarray(kj)))

        assert abs(dot_at(3, 1) - dot_at(7, 5)) < 1e-4

    def test_overflow_asserts(self):
        rope = nn.RotaryPositionalEmbedding(d_head=4, max_len=4)
        q = np.zeros((1, 1, 3, 4), np.float32)
        with pytest.raises(AssertionError):
            rope.forward(q, q, offset=2)


class TestKVCache:
    def test_update_and_overflow(self):
        c = nn.KVCache(batch_size=2, n_heads=2, max_seq_len=4, d_head=3)
        assert c.is_empty
        k = np.ones((2, 2, 3, 3), np.float32)
        K, V = c.update(k, k * 2)
        assert K.shape == (2, 2, 3, 3)
        assert c.seq_len == 3
        K, V = c.update(k[:, :, :1], k[:, :, :1])
        assert K.shape == (2, 2, 4, 3)
        with pytest.raises(ValueError, match="overflow"):
            c.update(k, k)
        c.reset()
        assert c.is_empty

    def test_layer_cache(self):
        lc = nn.LayerKVCache(3, 1, 2, 8, 4)
        k = np.ones((1, 2, 2, 4), np.float32)
        for i in range(3):
            lc[i].update(k, k)
        assert lc.seq_len == 2
        lc.reset()
        assert lc.seq_len == 0

    def test_apply_kv_cache_passthrough(self):
        k = np.ones((1, 1, 2, 2), np.float32)
        K, V = nn.apply_kv_cache(k, k, None)
        assert K is k

    def test_functional_cache_matches_class(self):
        fc = nn.fkv_init(n_layers=1, batch=1, n_heads=2, max_seq_len=4, d_head=3)
        rng = np.random.default_rng(10)
        k1 = rng.standard_normal((1, 2, 2, 3)).astype(np.float32)
        fc, K, V = nn.fkv_update(fc, 0, jnp.asarray(k1), jnp.asarray(k1 * 2))
        fc = nn.fkv_advance(fc, 2)
        assert int(fc["length"]) == 2
        np.testing.assert_allclose(np.asarray(K)[:, :, :2], k1, atol=0)
        k2 = rng.standard_normal((1, 2, 1, 3)).astype(np.float32)
        fc, K, V = nn.fkv_update(fc, 0, jnp.asarray(k2), jnp.asarray(k2))
        np.testing.assert_allclose(np.asarray(K)[:, :, 2:3], k2, atol=0)
        np.testing.assert_allclose(np.asarray(K)[:, :, :2], k1, atol=0)


class TestTokenizers:
    def test_roundtrip(self):
        tok = nn.CharTokenizer(text="hello world")
        ids = tok.encode("hello")
        assert tok.decode(ids) == "hello"
        assert tok.vocab_size == len(set("hello world"))
        assert "h" in tok and "z" not in tok

    def test_drop_unknown(self):
        tok = nn.CharTokenizer(vocab=list("ab"))
        assert tok.decode(tok.encode("abcab")) == "abab"
        with pytest.raises(KeyError):
            tok.encode("abc", drop_unknown=False)

    def test_save_load(self):
        import json

        tok = nn.CharTokenizer(text="shakespeare")
        data = json.loads(json.dumps(tok.save()))  # JSON round-trip
        tok2 = nn.CharTokenizer.load(data)
        assert tok2.decode(tok2.encode("shake")) == "shake"
        assert tok2.vocab_size == tok.vocab_size

    def test_bpe_untrained_raises(self):
        with pytest.raises(NotImplementedError):
            nn.BPETokenizer()

    def test_bpe_roundtrip(self):
        corpus = "the theatre is the theme of the thesis " * 20
        bpe = nn.BPETokenizer.train(corpus, vocab_size=300)
        assert 256 < bpe.vocab_size <= 300
        for s in ["the theme", "thesis!", "日本語 text", "a"]:
            assert bpe.decode(bpe.encode(s)) == s
        # merges compress: "the" should take far fewer tokens than bytes
        assert len(bpe.encode(corpus)) < 0.6 * len(corpus.encode())

    def test_bpe_save_load(self):
        import json

        bpe = nn.BPETokenizer.train("banana bandana banana " * 10, vocab_size=280)
        data = json.loads(json.dumps(bpe.save()))
        bpe2 = nn.BPETokenizer.load(data)
        s = "banana bandana"
        np.testing.assert_array_equal(bpe.encode(s), bpe2.encode(s))
        assert bpe2.decode(bpe2.encode(s)) == s

    def test_sinusoidal_matches_formula(self):
        pe = np.asarray(nn.sinusoidal_encoding(6, 8))
        pos, i = 3, 2
        angle = pos / (10000 ** (2 * (i // 2) / 8))
        assert np.isclose(pe[pos, i], np.sin(angle), atol=1e-6)
        assert np.isclose(pe[pos, i + 1], np.cos(pos / (10000 ** (2 * ((i + 1) // 2) / 8))), atol=1e-6)
