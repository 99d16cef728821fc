"""Model-level tests: GPT forward/loss/decode, checkpoint round-trip,
encoder-decoder parity between stateful and functional paths."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from linalg_tpu.models.gpt import (
    GPTConfig,
    gpt_apply,
    gpt_decode_step,
    gpt_loss,
    gpt_prefill,
    init_gpt_params,
    sample_token,
)
from linalg_tpu.models.seq2seq import (
    Seq2SeqConfig,
    init_seq2seq_params,
    make_reverse_batch,
    seq2seq_apply,
    seq2seq_loss,
)
from linalg_tpu.train.checkpoint import load_ckpt, save_ckpt
from linalg_tpu.train.optim import adamw_init, adamw_update, gpt_wd_mask, warmup_cosine


CFG = GPTConfig(vocab_size=31, d_model=32, n_heads=4, n_layers=2, ctx_len=16)


def _params():
    return init_gpt_params(CFG, seed=0)


class TestGPT:
    def test_forward_shapes(self):
        params = _params()
        x = jnp.asarray(np.random.default_rng(0).integers(0, 31, (3, 16)))
        logits = gpt_apply(params, x, CFG)
        assert logits.shape == (3, 16, 31)

    def test_causality(self):
        # logits at position t must not depend on tokens > t
        params = _params()
        rng = np.random.default_rng(1)
        x1 = rng.integers(0, 31, (1, 16))
        x2 = x1.copy()
        x2[0, 10:] = rng.integers(0, 31, 6)
        l1 = np.asarray(gpt_apply(params, jnp.asarray(x1), CFG))
        l2 = np.asarray(gpt_apply(params, jnp.asarray(x2), CFG))
        np.testing.assert_allclose(l1[0, :10], l2[0, :10], atol=1e-5)

    def test_loss_decreases_under_training(self):
        params = _params()
        opt = adamw_init(params)
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.integers(0, 31, (8, 16)))
        y = jnp.asarray(rng.integers(0, 31, (8, 16)))
        wd = gpt_wd_mask(params, 0.01)

        @jax.jit
        def step(params, opt):
            loss, g = jax.value_and_grad(gpt_loss)(params, x, y, CFG)
            params, opt = adamw_update(params, g, opt, 1e-2, wd)
            return params, opt, loss

        params, opt, l0 = step(params, opt)
        for _ in range(20):
            params, opt, l = step(params, opt)
        assert float(l) < float(l0)

    def test_weight_tying(self):
        # head weights ARE the transposed embedding: perturbing tok_W moves
        # logits through both the input and output paths.
        params = _params()
        x = jnp.asarray([[1, 2, 3, 4]])
        g = jax.grad(
            lambda p: jnp.sum(gpt_apply(p, x, CFG) ** 2)
        )(params)
        assert float(jnp.abs(g["tok_W"]).sum()) > 0

    def test_decode_matches_full_forward(self):
        # KV-cached incremental decode must reproduce the full forward's
        # last-position logits at every step.
        params = _params()
        rng = np.random.default_rng(3)
        ids = rng.integers(0, 31, (1, 9)).astype(np.int32)
        logits_p, cache = gpt_prefill(params, jnp.asarray(ids[:, :5]), CFG)
        full = np.asarray(gpt_apply(params, jnp.asarray(ids[:, :5]), CFG))
        np.testing.assert_allclose(np.asarray(logits_p), full[:, -1], atol=2e-4)
        for t in range(5, 9):
            tok = jnp.asarray(ids[:, t])
            logits_d, cache = gpt_decode_step(params, cache, tok, CFG)
            full = np.asarray(gpt_apply(params, jnp.asarray(ids[:, : t + 1]), CFG))
            np.testing.assert_allclose(
                np.asarray(logits_d), full[:, -1], atol=2e-4
            )

    def test_sample_token_top_k(self):
        logits = jnp.asarray([[0.0, 5.0, -1.0, 4.9]])
        key = jax.random.PRNGKey(0)
        # top_k=1 must always pick the argmax
        for i in range(5):
            t = sample_token(jax.random.fold_in(key, i), logits, 1.0, top_k=1)
            assert int(t[0]) == 1

    def test_sample_temperature_distribution(self):
        # low temperature concentrates on the mode
        logits = jnp.asarray([[1.0, 2.0, 3.0]])
        key = jax.random.PRNGKey(1)
        cold = [int(sample_token(jax.random.fold_in(key, i), logits, 0.05)[0])
                for i in range(20)]
        assert all(c == 2 for c in cold)


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        params = _params()
        stoi = {chr(97 + i): i for i in range(31)}
        itos = {i: ch for ch, i in stoi.items()}
        save_ckpt(tmp_path, params, CFG, stoi, itos)
        params2, cfg2, stoi2, itos2 = load_ckpt(tmp_path)
        assert cfg2 == CFG
        assert stoi2 == stoi
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    def test_reference_key_naming(self, tmp_path):
        # the archive must use the reference's flat key scheme (gpt.py:438-464)
        params = _params()
        stoi = {"a": 0}
        save_ckpt(tmp_path, params, CFG, stoi, {0: "a"})
        z = np.load(tmp_path / "chars_gpt_best.npz")
        for key in ("tok_W", "head_W", "head_b", "l0_Wq", "l1_ln2_b", "l0_W1"):
            assert key in z, key

    def test_missing_raises(self, tmp_path):
        with pytest.raises(Exception):
            load_ckpt(tmp_path / "nonexistent")


class TestOptim:
    def test_adamw_matches_manual_formula(self):
        p = {"w": jnp.asarray([1.0, -2.0]), "b": jnp.asarray([0.5])}
        g = {"w": jnp.asarray([0.1, 0.2]), "b": jnp.asarray([-0.3])}
        state = adamw_init(p)
        wd = {"w": 0.1, "b": 0.0}
        lr, b1, b2, eps = 0.01, 0.9, 0.95, 1e-8
        p2, state2 = adamw_update(p, g, state, lr, wd, b1, b2, eps)
        # manual step-1: mhat = g, vhat = g^2
        for k in p:
            expect = np.asarray(p[k])
            expect = expect - lr * wd[k] * expect
            mhat = np.asarray(g[k])
            vhat = np.asarray(g[k]) ** 2
            expect = expect - lr * mhat / (np.sqrt(vhat) + eps)
            np.testing.assert_allclose(np.asarray(p2[k]), expect, rtol=1e-6)
        assert int(state2.t) == 1

    def test_wd_mask_rules(self):
        params = _params()
        wd = gpt_wd_mask(params, 0.5)
        assert wd["layers"]["Wq"] == 0.5
        assert wd["layers"]["W1"] == 0.5
        assert wd["layers"]["b1"] == 0.0
        assert wd["layers"]["ln1_g"] == 0.0
        assert wd["tok_W"] == 0.0
        assert wd["head_b"] == 0.0

    def test_warmup_cosine(self):
        kw = dict(base=1.0, min_lr=0.1, warmup=10, max_steps=100)
        assert float(warmup_cosine(0, **kw)) == 0.0
        assert float(warmup_cosine(5, **kw)) == pytest.approx(0.5)
        assert float(warmup_cosine(10, **kw)) == pytest.approx(1.0, abs=1e-6)
        assert float(warmup_cosine(100, **kw)) == pytest.approx(0.1, abs=1e-6)


class TestSeq2Seq:
    CFG = Seq2SeqConfig(vocab_size=12, d_model=32, n_heads=4,
                        n_enc_layers=2, n_dec_layers=2, d_ff=64, max_len=16)

    def test_shapes_and_loss(self):
        params = init_seq2seq_params(self.CFG, seed=0)
        src, tgt_in, tgt_out = make_reverse_batch(4, 8, 12, rng=np.random.default_rng(0))
        logits = seq2seq_apply(params, jnp.asarray(src), jnp.asarray(tgt_in), self.CFG)
        assert logits.shape == (4, 8, 12)
        loss = seq2seq_loss(params, jnp.asarray(src), jnp.asarray(tgt_in),
                            jnp.asarray(tgt_out), self.CFG)
        assert np.isfinite(float(loss))

    def test_decoder_causality(self):
        params = init_seq2seq_params(self.CFG, seed=1)
        rng = np.random.default_rng(1)
        src = rng.integers(1, 12, (1, 8)).astype(np.int32)
        t1 = rng.integers(0, 12, (1, 8)).astype(np.int32)
        t2 = t1.copy()
        t2[0, 5:] = rng.integers(0, 12, 3)
        l1 = np.asarray(seq2seq_apply(params, jnp.asarray(src), jnp.asarray(t1), self.CFG))
        l2 = np.asarray(seq2seq_apply(params, jnp.asarray(src), jnp.asarray(t2), self.CFG))
        np.testing.assert_allclose(l1[0, :5], l2[0, :5], atol=1e-5)

    def test_learns_reversal_quickly(self):
        from linalg_tpu.apps.reverse_demo import train_reverse_demo

        _params, _cfg, acc = train_reverse_demo(
            epochs=500, B=64, T=6, V=8, lr=3e-3, seed=0
        )
        assert acc > 0.9


class TestOrbaxCheckpoint:
    def test_orbax_roundtrip(self, tmp_path):
        import jax
        import numpy as _np

        from linalg_tpu.train.checkpoint import load_ckpt_orbax, save_ckpt_orbax

        params = _params()
        stoi = {chr(97 + i): i for i in range(31)}
        itos = {i: ch for ch, i in stoi.items()}
        save_ckpt_orbax(tmp_path, params, CFG, stoi, itos)
        params2, cfg2, stoi2, _ = load_ckpt_orbax(tmp_path)
        assert cfg2 == CFG and stoi2 == stoi
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
            _np.testing.assert_allclose(_np.asarray(a), _np.asarray(b), atol=0)
