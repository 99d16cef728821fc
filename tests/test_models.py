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

    def test_padded_prefill_matches_unpadded(self):
        # The sampler right-pads every prompt to one fixed shape (one XLA
        # compile for all prompt lengths); causality must keep the pads
        # inert: same last-position logits, and decode over pad slots must
        # still match the full forward.
        params = _params()
        rng = np.random.default_rng(7)
        ids = rng.integers(0, 31, (1, 9)).astype(np.int32)
        logits_ref, _ = gpt_prefill(params, jnp.asarray(ids[:, :5]), CFG)
        padded = np.zeros((1, 12), np.int32)
        padded[:, :5] = ids[:, :5]
        logits_pad, cache = gpt_prefill(params, jnp.asarray(padded), CFG, 5)
        np.testing.assert_allclose(
            np.asarray(logits_pad), np.asarray(logits_ref), atol=1e-5
        )
        assert int(cache["length"]) == 5
        # decode overwrites the pad K/V slots before the length mask ever
        # exposes them — logits must track the unpadded full forward
        for t in range(5, 9):
            tok = jnp.asarray(ids[:, t])
            logits_d, cache = gpt_decode_step(params, cache, tok, CFG)
            full = np.asarray(gpt_apply(params, jnp.asarray(ids[:, : t + 1]), CFG))
            np.testing.assert_allclose(
                np.asarray(logits_d), full[:, -1], atol=2e-4
            )

    def test_bf16_decode_matches_bf16_forward(self):
        # prefill/decode mirror gpt_apply's mixed precision: bf16 weights,
        # activations AND KV cache, f32 logits — a bf16-trained model must
        # not silently decode in f32 (2x the weight traffic, different
        # rounding than its own training forward)
        cfg16 = GPTConfig(vocab_size=31, d_model=32, n_heads=4, n_layers=2,
                          ctx_len=16, dtype="bfloat16")
        params = _params()
        rng = np.random.default_rng(11)
        ids = rng.integers(0, 31, (1, 9)).astype(np.int32)
        logits_p, cache = gpt_prefill(params, jnp.asarray(ids[:, :5]), cfg16)
        assert cache["k"].dtype == jnp.bfloat16
        assert logits_p.dtype == jnp.float32
        full = np.asarray(gpt_apply(params, jnp.asarray(ids[:, :5]), cfg16))
        np.testing.assert_allclose(np.asarray(logits_p), full[:, -1],
                                   atol=2e-2)
        for t in range(5, 9):
            tok = jnp.asarray(ids[:, t])
            logits_d, cache = gpt_decode_step(params, cache, tok, cfg16)
            assert logits_d.dtype == jnp.float32
            full = np.asarray(
                gpt_apply(params, jnp.asarray(ids[:, : t + 1]), cfg16))
            np.testing.assert_allclose(np.asarray(logits_d), full[:, -1],
                                       atol=2e-2)

    def test_bf16_compute_close_to_f32(self):
        # mixed precision: same params, bfloat16 compute — logits stay f32
        # out and within bf16 resolution of the f32 forward; loss trains
        cfg16 = GPTConfig(vocab_size=31, d_model=32, n_heads=4, n_layers=2,
                          ctx_len=16, dtype="bfloat16")
        params = _params()
        x = jnp.asarray(np.random.default_rng(7).integers(0, 31, (2, 16)))
        l32 = gpt_apply(params, x, CFG)
        l16 = gpt_apply(params, x, cfg16)
        assert l16.dtype == jnp.float32
        # bf16 has ~3 decimal digits; logits are O(1)
        np.testing.assert_allclose(np.asarray(l16), np.asarray(l32),
                                   atol=0.15)

    def test_bf16_training_decreases_loss(self):
        cfg16 = GPTConfig(vocab_size=31, d_model=32, n_heads=4, n_layers=2,
                          ctx_len=16, dtype="bfloat16")
        params = _params()
        opt = adamw_init(params)
        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.integers(0, 31, (8, 16)))
        y = jnp.asarray(rng.integers(0, 31, (8, 16)))
        wd = gpt_wd_mask(params, 0.0)

        @jax.jit
        def step(params, opt):
            loss, g = jax.value_and_grad(gpt_loss)(params, x, y, cfg16)
            params, opt = adamw_update(params, g, opt, 1e-2, wd)
            return params, opt, loss

        params, opt, l0 = step(params, opt)
        for _ in range(20):
            params, opt, l = step(params, opt)
        assert float(l) < float(l0)
        # master params stay f32
        assert params["tok_W"].dtype == jnp.float32

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

    def test_sample_token_top_p(self):
        # probs (0.5, 0.3, 0.2): nucleus at p=0.6 is {0, 1} — the smallest
        # set with mass >= 0.6 (exclusive-cumsum rule keeps 0.5 then 0.3)
        logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.2]]))
        key = jax.random.PRNGKey(2)
        seen = {int(sample_token(jax.random.fold_in(key, i), logits,
                                 1.0, top_p=0.6)[0])
                for i in range(300)}
        assert seen == {0, 1}
        # p=0 (off) keeps the full support
        seen_all = {int(sample_token(jax.random.fold_in(key, i), logits,
                                     1.0, top_p=0.0)[0])
                    for i in range(300)}
        assert seen_all == {0, 1, 2}
        # composes with top_k: k=2 renormalizes to (0.625, 0.375), so
        # p=0.6 keeps only the mode and p=0.7 keeps both (token 2 never)
        seen_k6 = {int(sample_token(jax.random.fold_in(key, i), logits,
                                    1.0, top_k=2, top_p=0.6)[0])
                   for i in range(300)}
        assert seen_k6 == {0}
        seen_k7 = {int(sample_token(jax.random.fold_in(key, i), logits,
                                    1.0, top_k=2, top_p=0.7)[0])
                   for i in range(300)}
        assert seen_k7 == {0, 1}


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


RCFG = GPTConfig(vocab_size=31, d_model=32, n_heads=4, n_layers=2,
                 ctx_len=16, pos="rope")


class TestRoPEGPT:
    """GPTConfig(pos='rope'): the RoPE integration the reference never did
    (reference built RoPE with decode offsets, ai_comps/positional.py:92-157,
    but its sampler is sinusoidal-only, gpt.py:522-546)."""

    def _params(self):
        return init_gpt_params(RCFG, seed=0)

    def test_config_validation(self):
        with pytest.raises(ValueError, match="positional"):
            GPTConfig(vocab_size=8, pos="rotary-xl")  # unknown mode
        with pytest.raises(ValueError, match="even"):
            GPTConfig(vocab_size=8, d_model=9, n_heads=3, pos="rope")

    def test_rope_changes_the_function(self):
        # same params, different pos -> different logits (RoPE is live)
        params = self._params()
        x = jnp.asarray(np.random.default_rng(0).integers(0, 31, (2, 16)))
        l_rope = np.asarray(gpt_apply(params, x, RCFG))
        l_sin = np.asarray(gpt_apply(params, x, CFG))
        assert not np.allclose(l_rope, l_sin, atol=1e-3)

    def test_causality(self):
        params = self._params()
        rng = np.random.default_rng(1)
        x1 = rng.integers(0, 31, (1, 16))
        x2 = x1.copy()
        x2[0, 10:] = rng.integers(0, 31, 6)
        l1 = np.asarray(gpt_apply(params, jnp.asarray(x1), RCFG))
        l2 = np.asarray(gpt_apply(params, jnp.asarray(x2), RCFG))
        np.testing.assert_allclose(l1[0, :10], l2[0, :10], atol=1e-5)

    def test_decode_matches_full_forward(self):
        # the decode step applies RoPE at the traced cache position; it must
        # agree with the full forward's static position tables at every step
        params = self._params()
        rng = np.random.default_rng(3)
        ids = rng.integers(0, 31, (1, 9)).astype(np.int32)
        logits_p, cache = gpt_prefill(params, jnp.asarray(ids[:, :5]), RCFG)
        full = np.asarray(gpt_apply(params, jnp.asarray(ids[:, :5]), RCFG))
        np.testing.assert_allclose(np.asarray(logits_p), full[:, -1], atol=2e-4)
        for t in range(5, 9):
            tok = jnp.asarray(ids[:, t])
            logits_d, cache = gpt_decode_step(params, cache, tok, RCFG)
            full = np.asarray(
                gpt_apply(params, jnp.asarray(ids[:, : t + 1]), RCFG)
            )
            np.testing.assert_allclose(
                np.asarray(logits_d), full[:, -1], atol=2e-4
            )

    def test_loss_decreases_under_training(self):
        params = self._params()
        opt = adamw_init(params)
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.integers(0, 31, (8, 16)))
        y = jnp.asarray(rng.integers(0, 31, (8, 16)))
        wd = gpt_wd_mask(params, 0.01)

        @jax.jit
        def step(params, opt):
            loss, g = jax.value_and_grad(gpt_loss)(params, x, y, RCFG)
            params, opt = adamw_update(params, g, opt, 1e-2, wd)
            return params, opt, loss

        params, opt, l0 = step(params, opt)
        for _ in range(20):
            params, opt, l = step(params, opt)
        assert float(l) < float(l0)

    def test_ckpt_roundtrip_preserves_pos(self, tmp_path):
        params = self._params()
        stoi = {chr(97 + i): i for i in range(31)}
        itos = {i: ch for ch, i in stoi.items()}
        save_ckpt(tmp_path, params, RCFG, stoi, itos)
        _, cfg2, _, _ = load_ckpt(tmp_path)
        assert cfg2.pos == "rope"
        assert cfg2 == RCFG


class TestReferenceCkptInterop:
    def test_loads_reference_produced_archive(self, tmp_path):
        """Build an archive exactly the way the REFERENCE save code does
        (flat f64 per-layer keys + meta without 'pos', gpt.py:440-476) and
        load it — true one-way interop, not just our own round trip."""
        import json

        rng = np.random.default_rng(7)
        V, D, F, L, T = 13, 8, 32, 2, 16
        arrays = {
            "tok_W": rng.normal(size=(V, D)),        # float64, as reference
            "head_W": rng.normal(size=(D, V)),
            "head_b": rng.normal(size=(V,)),
        }
        per_layer = {
            "Wq": (D, D), "Wk": (D, D), "Wv": (D, D), "Wo": (D, D),
            "W1": (D, F), "b1": (F,), "W2": (F, D), "b2": (D,),
            "ln1_g": (D,), "ln1_b": (D,), "ln2_g": (D,), "ln2_b": (D,),
        }
        for i in range(L):
            for k, shape in per_layer.items():
                arrays[f"l{i}_{k}"] = rng.normal(size=shape)
        np.savez_compressed(tmp_path / "chars_gpt_best.npz", **arrays)
        stoi = {chr(97 + i): i for i in range(V)}
        meta = {  # reference meta: no 'pos' key (gpt.py:465-476)
            "stoi": stoi,
            "itos": {str(i): ch for ch, i in stoi.items()},
            "d_model": D, "heads": 2, "layers": L, "ctx_len": T,
        }
        (tmp_path / "chars_gpt_meta.json").write_text(json.dumps(meta))

        params, cfg, stoi2, itos2 = load_ckpt(tmp_path)
        assert cfg.pos == "sinusoidal"  # reference models are sinusoidal
        assert cfg.d_model == D and cfg.n_layers == L
        assert params["tok_W"].dtype == jnp.float32
        np.testing.assert_allclose(
            np.asarray(params["layers"]["Wq"][1]),
            arrays["l1_Wq"].astype(np.float32), atol=0,
        )
        # and it must actually run
        x = jnp.asarray(rng.integers(0, V, (2, T)))
        assert gpt_apply(params, x, cfg).shape == (2, T, V)


class TestLrScales:
    def test_param_group_lrs_take_effect(self):
        from linalg_tpu.train.optim import gpt_lr_scales

        params = _params()
        scales = gpt_lr_scales(params, embed=0.0, head=2.0)
        assert float(scales["tok_W"]) == 0.0
        assert float(scales["head_b"]) == 2.0
        assert float(scales["layers"]["Wq"]) == 1.0

        opt = adamw_init(params)
        g = jax.tree.map(jnp.ones_like, params)
        wd = gpt_wd_mask(params, 0.0)
        p2, _ = adamw_update(params, g, opt, 1e-2, wd, lr_scales=scales)
        # embed frozen (scale 0), head bias moved at 2x the base rate
        np.testing.assert_allclose(
            np.asarray(p2["tok_W"]), np.asarray(params["tok_W"]), atol=0
        )
        moved = np.abs(np.asarray(p2["head_b"] - params["head_b"]))
        base_moved = np.abs(
            np.asarray(
                adamw_update(params, g, opt, 1e-2, wd)[0]["head_b"]
                - params["head_b"]
            )
        )
        np.testing.assert_allclose(moved, 2.0 * base_moved, rtol=1e-5)


class TestStepTimer:
    def test_multi_step_ticks(self):
        import time as _time

        from linalg_tpu.utils.profiling import StepTimer

        t = StepTimer(tokens_per_step=10, window=5)
        _time.sleep(0.02)
        t.tick(20)
        _time.sleep(0.02)
        t.tick(20)
        assert t.steps_per_sec > 0
        assert t.tokens_per_sec == pytest.approx(t.steps_per_sec * 10)


class TestLearnedPositions:
    """--pos learned wires nn/positional.py's LearnedPositionalEmbedding
    capability (reference positional.py:36-89, built but never wired into a
    model) into the GPT as trainable params."""

    CFG = GPTConfig(vocab_size=23, d_model=32, n_heads=2, n_layers=2,
                    ctx_len=16, pos="learned")

    def test_params_and_grads(self):
        params = init_gpt_params(self.CFG, seed=0)
        assert params["pos_W"].shape == (16, 32)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.integers(0, 23, (2, 16)), jnp.int32)
        y = jnp.asarray(rng.integers(0, 23, (2, 16)), jnp.int32)
        g = jax.grad(gpt_loss)(params, x, y, self.CFG)
        assert float(jnp.max(jnp.abs(g["pos_W"]))) > 0  # positions train

    def test_decode_matches_full_forward(self):
        params = init_gpt_params(self.CFG, seed=1)
        rng = np.random.default_rng(1)
        ids = rng.integers(0, 23, (1, 9)).astype(np.int32)
        logits_p, cache = gpt_prefill(params, jnp.asarray(ids[:, :5]),
                                      self.CFG)
        full = np.asarray(gpt_apply(params, jnp.asarray(ids[:, :5]),
                                    self.CFG))
        np.testing.assert_allclose(np.asarray(logits_p), full[:, -1],
                                   atol=1e-5)
        for t in range(5, 9):
            tok = jnp.asarray(ids[:, t])
            logits_d, cache = gpt_decode_step(params, cache, tok, self.CFG)
            full = np.asarray(
                gpt_apply(params, jnp.asarray(ids[:, : t + 1]), self.CFG))
            np.testing.assert_allclose(np.asarray(logits_d), full[:, -1],
                                       atol=2e-4)

    def test_ckpt_roundtrip(self, tmp_path):
        params = init_gpt_params(self.CFG, seed=2)
        stoi = {chr(97 + i): i for i in range(23)}
        itos = {i: ch for ch, i in stoi.items()}
        save_ckpt(tmp_path, params, self.CFG, stoi, itos)
        params2, cfg2, _, _ = load_ckpt(tmp_path)
        assert cfg2.pos == "learned"
        np.testing.assert_allclose(np.asarray(params2["pos_W"]),
                                   np.asarray(params["pos_W"]))


class TestBatchedGenerate:
    """Batched serving path: left-padded prefill + shared-position decode
    must EXACTLY reproduce the unbatched path for every sequence."""

    def test_batched_prefill_matches_unbatched(self):
        from linalg_tpu.models.gpt import gpt_prefill_batched

        params = _params()
        rng = np.random.default_rng(5)
        p1 = rng.integers(0, 31, (5,)).astype(np.int32)
        p2 = rng.integers(0, 31, (9,)).astype(np.int32)
        W = 12
        buf = np.zeros((2, W), np.int32)
        buf[0, W - 5:] = p1
        buf[1, W - 9:] = p2
        start = jnp.asarray([W - 5, W - 9], jnp.int32)
        logits, cache = gpt_prefill_batched(params, jnp.asarray(buf),
                                            start, CFG)
        for b, p in enumerate((p1, p2)):
            ref = np.asarray(gpt_apply(params, jnp.asarray(p[None]), CFG))
            np.testing.assert_allclose(np.asarray(logits[b]), ref[0, -1],
                                       atol=2e-4)

    def test_batched_decode_matches_unbatched(self):
        from linalg_tpu.models.gpt import gpt_prefill_batched

        params = _params()
        rng = np.random.default_rng(6)
        p1 = rng.integers(0, 31, (4,)).astype(np.int32)
        p2 = rng.integers(0, 31, (7,)).astype(np.int32)
        forced = rng.integers(0, 31, (2, 4)).astype(np.int32)
        W = 10
        buf = np.zeros((2, W), np.int32)
        buf[0, W - 4:] = p1
        buf[1, W - 7:] = p2
        start = jnp.asarray([W - 4, W - 7], jnp.int32)
        _, cache = gpt_prefill_batched(params, jnp.asarray(buf), start, CFG)
        seqs = [list(p1), list(p2)]
        for t in range(4):
            tok = jnp.asarray(forced[:, t])
            logits, cache = gpt_decode_step(params, cache, tok, CFG)
            for b in range(2):
                seqs[b].append(int(forced[b, t]))
                full = np.asarray(gpt_apply(
                    params, jnp.asarray(np.asarray(seqs[b])[None]), CFG))
                np.testing.assert_allclose(np.asarray(logits[b]),
                                           full[0, -1], atol=3e-4)

    def test_generate_shapes_and_determinism(self):
        from linalg_tpu.models.gpt import gpt_generate

        params = _params()
        prompts = [np.asarray([1, 2, 3]), np.asarray([4, 5, 6, 7, 8])]
        out1 = gpt_generate(params, CFG, prompts, n_tokens=6, seed=3)
        out2 = gpt_generate(params, CFG, prompts, n_tokens=6, seed=3)
        assert out1.shape == (2, 6)
        assert (np.asarray(out1) == np.asarray(out2)).all()
        assert int(jnp.max(out1)) < CFG.vocab_size


class TestDecodeChunkEquivalence:
    """The hoisted-invariants chunk body must sample exactly the tokens the
    reference per-step path (sample_token + gpt_decode_step) produces."""

    @pytest.mark.parametrize("pos", ["sinusoidal", "rope", "learned",
                                     "alibi"])
    def test_chunk_matches_stepwise(self, pos):
        from linalg_tpu.models.gpt import gpt_decode_chunk

        cfg = GPTConfig(vocab_size=29, d_model=32, n_heads=4, n_layers=2,
                        ctx_len=16, pos=pos)
        params = init_gpt_params(cfg, seed=0)
        rng = np.random.default_rng(0)
        prompt = jnp.asarray(rng.integers(0, 29, (1, 5)), jnp.int32)
        logits0, cache0 = gpt_prefill(params, prompt, cfg)
        key = jax.random.PRNGKey(9)
        n = 6
        toks, logits_c, cache_c = gpt_decode_chunk(
            params, cache0, logits0, key, cfg, n, 0.8, 3)
        # reference: the same loop with the per-step public API
        keys = jax.random.split(key, n)
        logits, cache = logits0, cache0
        ref = []
        for i in range(n):
            tok = sample_token(keys[i], logits, 0.8, 3)
            ref.append(int(tok[0]))
            logits, cache = gpt_decode_step(params, cache, tok, cfg)
        assert [int(t) for t in np.asarray(toks[0])] == ref
        np.testing.assert_allclose(np.asarray(logits_c), np.asarray(logits),
                                   atol=1e-4)
        assert int(cache_c["length"]) == int(cache["length"])
        np.testing.assert_allclose(np.asarray(cache_c["k"]),
                                   np.asarray(cache["k"]), atol=1e-5)


class TestFFNVariants:
    """SwiGLU/GeGLU/GELU FFN configs (reference README.md:61,71 roadmap
    items): decode == forward, training decreases loss, checkpoint meta
    round-trips, and gated gradients flow into the gate branch."""

    @pytest.mark.parametrize("ffn", ["gelu", "swiglu", "geglu"])
    def test_decode_matches_full_forward(self, ffn):
        cfg = GPTConfig(vocab_size=31, d_model=32, n_heads=4, n_layers=2,
                        ctx_len=16, ffn=ffn)
        params = init_gpt_params(cfg, seed=0)
        rng = np.random.default_rng(3)
        ids = rng.integers(0, 31, (1, 9)).astype(np.int32)
        logits_p, cache = gpt_prefill(params, jnp.asarray(ids[:, :5]), cfg)
        full = np.asarray(gpt_apply(params, jnp.asarray(ids[:, :5]), cfg))
        np.testing.assert_allclose(np.asarray(logits_p), full[:, -1],
                                   atol=2e-4)
        for t in range(5, 9):
            tok = jnp.asarray(ids[:, t])
            logits_d, cache = gpt_decode_step(params, cache, tok, cfg)
            full = np.asarray(
                gpt_apply(params, jnp.asarray(ids[:, : t + 1]), cfg))
            np.testing.assert_allclose(np.asarray(logits_d), full[:, -1],
                                       atol=2e-4)

    def test_variants_change_the_function(self):
        x = jnp.asarray(np.random.default_rng(0).integers(0, 31, (2, 8)))
        outs = []
        for ffn in ("relu", "gelu", "swiglu", "geglu"):
            cfg = GPTConfig(vocab_size=31, d_model=32, n_heads=4,
                            n_layers=2, ctx_len=16, ffn=ffn)
            outs.append(np.asarray(gpt_apply(init_gpt_params(cfg, seed=0),
                                             x, cfg)))
        for i in range(len(outs)):
            for j in range(i + 1, len(outs)):
                assert np.abs(outs[i] - outs[j]).max() > 1e-3

    def test_gate_branch_gets_gradients(self):
        cfg = GPTConfig(vocab_size=31, d_model=32, n_heads=4, n_layers=2,
                        ctx_len=16, ffn="swiglu")
        params = init_gpt_params(cfg, seed=0)
        assert params["layers"]["Wg"].shape == (2, 32, cfg.dff)
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.integers(0, 31, (4, 16)))
        y = jnp.asarray(rng.integers(0, 31, (4, 16)))
        g = jax.grad(gpt_loss)(params, x, y, cfg)
        assert float(jnp.abs(g["layers"]["Wg"]).sum()) > 0
        assert float(jnp.abs(g["layers"]["bg"]).sum()) > 0

    @pytest.mark.parametrize("ffn", ["swiglu", "geglu"])
    def test_loss_decreases_under_training(self, ffn):
        cfg = GPTConfig(vocab_size=31, d_model=32, n_heads=4, n_layers=2,
                        ctx_len=16, ffn=ffn)
        params = init_gpt_params(cfg, seed=0)
        opt = adamw_init(params)
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.integers(0, 31, (8, 16)))
        y = jnp.asarray(rng.integers(0, 31, (8, 16)))
        wd = gpt_wd_mask(params, 0.01)
        assert jax.tree.leaves(wd["layers"])  # Wg included in decay


        @jax.jit
        def step(params, opt):
            loss, g = jax.value_and_grad(gpt_loss)(params, x, y, cfg)
            params, opt = adamw_update(params, g, opt, 1e-2, wd)
            return params, opt, loss

        params, opt, l0 = step(params, opt)
        for _ in range(20):
            params, opt, l = step(params, opt)
        assert float(l) < float(l0)

    def test_ckpt_roundtrip_preserves_ffn(self, tmp_path):
        cfg = GPTConfig(vocab_size=31, d_model=32, n_heads=4, n_layers=2,
                        ctx_len=16, ffn="swiglu")
        params = init_gpt_params(cfg, seed=0)
        stoi = {chr(97 + i): i for i in range(31)}
        itos = {i: c for c, i in stoi.items()}
        save_ckpt(tmp_path, params, cfg, stoi, itos)
        p2, cfg2, _, _ = load_ckpt(tmp_path)
        assert cfg2.ffn == "swiglu"
        x = jnp.asarray(np.random.default_rng(0).integers(0, 31, (2, 8)))
        np.testing.assert_allclose(np.asarray(gpt_apply(params, x, cfg)),
                                   np.asarray(gpt_apply(p2, x, cfg2)),
                                   atol=1e-6)

    def test_config_validation(self):
        with pytest.raises(ValueError, match="ffn"):
            GPTConfig(vocab_size=31, ffn="mish")

    def test_moe_gated_experts(self):
        from linalg_tpu.models.moe import (MoEGPTConfig, init_moe_params,
                                           moe_gpt_loss)

        cfg = MoEGPTConfig(vocab_size=31, d_model=32, n_heads=2,
                           n_layers=2, ctx_len=16, n_experts=2,
                           ffn="swiglu")
        params = init_moe_params(cfg, seed=0)
        assert params["layers"]["Wg"].shape == (2, 2, 32, cfg.dff)
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.integers(0, 31, (4, 16)))
        y = jnp.asarray(rng.integers(0, 31, (4, 16)))
        loss, g = jax.value_and_grad(moe_gpt_loss)(params, x, y, cfg)
        assert np.isfinite(float(loss))
        assert float(jnp.abs(g["layers"]["Wg"]).sum()) > 0

    def test_quant_decode_close_to_fp(self):
        from linalg_tpu.models.quant import (gpt_decode_chunk_q,
                                             quantize_gpt_params)

        cfg = GPTConfig(vocab_size=31, d_model=32, n_heads=4, n_layers=2,
                        ctx_len=16, ffn="swiglu")
        params = init_gpt_params(cfg, seed=0)
        qp = quantize_gpt_params(params, cfg)
        # fused up+gate quant storage: (L, D, 2F) int8
        assert qp["layers"]["W1_q"].shape == (2, 32, 2 * cfg.dff)
        rng = np.random.default_rng(5)
        ids = rng.integers(0, 31, (1, 5)).astype(np.int32)
        logits, cache = gpt_prefill(params, jnp.asarray(ids), cfg)
        from linalg_tpu.models.gpt import gpt_decode_chunk

        t_fp, _, _ = gpt_decode_chunk(params, cache, logits,
                                      jax.random.PRNGKey(0), cfg, 8,
                                      temperature=0.0, top_k=1)
        t_q, _, _ = gpt_decode_chunk_q(qp, cache, logits,
                                       jax.random.PRNGKey(0), cfg, 8,
                                       temperature=0.0, top_k=1)
        # greedy tokens should nearly always agree at int8 fidelity
        agree = np.mean(np.asarray(t_fp) == np.asarray(t_q))
        assert agree >= 0.75
