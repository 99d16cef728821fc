"""Int8 weight-only quantized decode (linalg_tpu/models/quant.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from linalg_tpu.models.gpt import (
    GPTConfig,
    gpt_decode_chunk,
    gpt_prefill,
    init_gpt_params,
)
from linalg_tpu.models.quant import (
    _ddot,
    _qdot,
    gpt_decode_chunk_q,
    quantize_gpt_params,
    quantize_weight,
)

CFG = GPTConfig(vocab_size=31, d_model=64, n_heads=2, n_layers=2, ctx_len=64)
PARAMS = init_gpt_params(CFG, seed=11)


class TestQuantPrimitives:
    def test_weight_roundtrip_error_bound(self):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.normal(size=(32, 48)), jnp.float32)
        q, s = quantize_weight(w, axis=-2)
        assert q.dtype == jnp.int8 and s.shape == (48,)
        deq = np.asarray(q, np.float32) * np.asarray(s)[None, :]
        # per-channel max-abs scaling: error <= scale/2 per element
        err = np.abs(deq - np.asarray(w))
        assert (err <= np.asarray(s)[None, :] * 0.5 + 1e-7).all()

    def test_weight_channel_independence(self):
        # scaling ONE output channel must not perturb the others' quants
        rng = np.random.default_rng(1)
        w = rng.normal(size=(16, 8)).astype(np.float32)
        q1, s1 = quantize_weight(jnp.asarray(w))
        w2 = w.copy()
        w2[:, 3] *= 100.0
        q2, s2 = quantize_weight(jnp.asarray(w2))
        keep = [c for c in range(8) if c != 3]
        np.testing.assert_array_equal(np.asarray(q1)[:, keep],
                                      np.asarray(q2)[:, keep])

    @pytest.mark.parametrize("dot", [_qdot, _ddot])
    def test_qdot_close_to_exact(self, dot):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(4, 1, 64)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(64, 96)), jnp.float32)
        q, s = quantize_weight(w)
        got = np.asarray(dot(x, q, s))
        want = np.asarray(x @ w)
        # int8 weights with per-channel scales: ~1% relative
        rel = np.abs(got - want) / np.maximum(np.abs(want).max(), 1e-6)
        assert rel.max() < 0.02, rel.max()

    def test_qdot_int32_accumulation(self):
        # worst case: all-max inputs must not overflow the int32 accumulator
        K = 4096
        x = jnp.full((1, 1, K), 100.0, jnp.float32)
        w = jnp.full((K, 4), 100.0, jnp.float32)
        q, s = quantize_weight(w)
        got = np.asarray(_qdot(x, q, s))  # 127*127*4096 ~ 6.6e7 << 2^31
        np.testing.assert_allclose(got, np.full((1, 1, 4), 100.0 * 100 * K),
                                   rtol=1e-6)


class TestQuantDecode:
    def _prefill(self, cfg=CFG, params=PARAMS, seed=0):
        rng = np.random.default_rng(seed)
        prompt = rng.integers(0, cfg.vocab_size, size=12)
        ids = jnp.asarray(prompt[None].astype(np.int32))
        return gpt_prefill(params, ids, cfg)

    @pytest.mark.parametrize("mode", ["int8", "deq"])
    def test_first_step_logits_close(self, mode):
        """Teacher-free one-step check: same prefill state, greedy first
        token, compare the post-step logits of the quantized vs
        full-precision decode before any trajectory divergence."""
        logits, cache = self._prefill()
        q = quantize_gpt_params(PARAMS, CFG)
        key = jax.random.PRNGKey(0)
        _, lg_f, _ = gpt_decode_chunk(PARAMS, cache, logits, key, CFG, 1,
                                      1.0, 1, 0.0)
        _, lg_q, _ = gpt_decode_chunk_q(q, cache, logits, key, CFG, 1,
                                        1.0, 1, 0.0, mode=mode)
        lf, lq = np.asarray(lg_f)[0], np.asarray(lg_q)[0]
        assert np.argmax(lf) == np.argmax(lq)
        c = np.corrcoef(lf, lq)[0, 1]
        assert c > 0.999, c

    def test_unknown_mode_raises(self):
        logits, cache = self._prefill()
        q = quantize_gpt_params(PARAMS, CFG)
        with pytest.raises(ValueError, match="mode"):
            gpt_decode_chunk_q(q, cache, logits, jax.random.PRNGKey(0),
                               CFG, 1, 1.0, 1, 0.0, mode="fp4")

    @pytest.mark.parametrize("pos", ["sinusoidal", "rope", "alibi",
                                     "learned"])
    def test_greedy_agreement_all_pos_modes(self, pos):
        cfg = GPTConfig(vocab_size=31, d_model=64, n_heads=2, n_layers=2,
                        ctx_len=64, pos=pos)
        params = init_gpt_params(cfg, seed=3)
        logits, cache = self._prefill(cfg, params, seed=4)
        q = quantize_gpt_params(params, cfg)
        key = jax.random.PRNGKey(1)
        t_f, _, _ = gpt_decode_chunk(params, cache, logits, key, cfg, 24,
                                     1.0, 1, 0.0)
        t_q, _, _ = gpt_decode_chunk_q(q, cache, logits, key, cfg, 24,
                                       1.0, 1, 0.0)
        t_f, t_q = np.asarray(t_f)[0], np.asarray(t_q)[0]
        # UNTRAINED random params give near-uniform logits, so greedy can
        # legitimately fork at a near-tie and diverge after; the logits
        # fidelity itself is pinned by test_first_step_logits_close. Here
        # require a meaningful exact common prefix (observed 9-24 across
        # modes at this size).
        prefix = int(np.argmin(t_f == t_q)) if (t_f != t_q).any() else 24
        assert prefix >= 6, (prefix, t_f.tolist(), t_q.tolist())

    def test_bf16_compute_dtype(self):
        cfg = GPTConfig(vocab_size=31, d_model=64, n_heads=2, n_layers=2,
                        ctx_len=64, dtype="bfloat16")
        params = init_gpt_params(cfg, seed=5)
        logits, cache = self._prefill(cfg, params, seed=6)
        q = quantize_gpt_params(params, cfg)
        toks, lg, cache2 = gpt_decode_chunk_q(
            q, cache, logits, jax.random.PRNGKey(2), cfg, 8, 1.0, 1, 0.0)
        assert np.asarray(toks).shape == (1, 8)
        assert lg.dtype == jnp.float32
        assert cache2["k"].dtype == jnp.bfloat16

    def test_sampler_integration(self):
        from linalg_tpu.train.trainer import sample

        itos = {i: chr(97 + i % 26) for i in range(CFG.vocab_size)}
        out_q = "".join(sample(PARAMS, CFG, np.asarray([1, 2, 3]), itos,
                               steps=40, seed=9, quant="int8", top_k=1))
        out_f = "".join(sample(PARAMS, CFG, np.asarray([1, 2, 3]), itos,
                               steps=40, seed=9, top_k=1))
        assert len(out_q) == 40
        # greedy full-precision and int8 agree on a long prefix
        agree = sum(1 for a, b in zip(out_q, out_f) if a == b)
        assert agree >= 20, (agree, out_q, out_f)

    def test_moe_quant_raises(self):
        from linalg_tpu.models.moe import MoEGPTConfig, init_moe_params
        from linalg_tpu.train.trainer import sample

        mcfg = MoEGPTConfig(vocab_size=31, d_model=32, n_heads=2,
                            n_layers=2, ctx_len=64, n_experts=2)
        with pytest.raises(ValueError, match="dense"):
            list(sample(init_moe_params(mcfg, seed=0), mcfg,
                        np.asarray([1]), {i: "a" for i in range(31)},
                        steps=2, quant="int8"))

    def test_quantized_size_halves(self):
        q = quantize_gpt_params(PARAMS, CFG)

        def nbytes(t):
            return sum(np.asarray(x).nbytes for x in jax.tree.leaves(t))

        # int8 weights + f32 scales: well under half the f32 original
        assert nbytes(q) < 0.45 * nbytes(PARAMS)


class TestKV8:
    """Int8 KV cache: per-row write-time quantization, {q, s} pytree cache
    through the shared decode core."""

    def _prefill(self, cfg=CFG, params=PARAMS, seed=0):
        rng = np.random.default_rng(seed)
        prompt = rng.integers(0, cfg.vocab_size, size=12)
        ids = jnp.asarray(prompt[None].astype(np.int32))
        return gpt_prefill(params, ids, cfg)

    def test_roundtrip_error_bound(self):
        from linalg_tpu.models.quant import _kv_row_quantize

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(2, 2, 8, 16)), jnp.float32)
        q, s = _kv_row_quantize(x)
        assert q.dtype == jnp.int8 and s.shape == (2, 2, 8, 1)
        err = np.abs(np.asarray(q, np.float32) * np.asarray(s)
                     - np.asarray(x))
        assert (err <= np.asarray(s) * 0.5 + 1e-7).all()

    @pytest.mark.parametrize("pos", ["sinusoidal", "rope", "alibi"])
    def test_kv8_first_step_logits_close(self, pos):
        from linalg_tpu.models.quant import quantize_kv_cache

        cfg = GPTConfig(vocab_size=31, d_model=64, n_heads=2, n_layers=2,
                        ctx_len=64, pos=pos)
        params = init_gpt_params(cfg, seed=13)
        logits, cache = self._prefill(cfg, params, seed=8)
        q = quantize_gpt_params(params, cfg)
        key = jax.random.PRNGKey(0)
        _, lf, _ = gpt_decode_chunk(params, cache, logits, key, cfg, 1,
                                    1.0, 1, 0.0)
        _, lq, c2 = gpt_decode_chunk_q(q, quantize_kv_cache(cache), logits,
                                       key, cfg, 1, 1.0, 1, 0.0, kv8=True)
        a, b = np.asarray(lf)[0], np.asarray(lq)[0]
        assert np.argmax(a) == np.argmax(b)
        assert np.corrcoef(a, b)[0, 1] > 0.995
        # the evolved cache keeps the int8 representation
        assert c2["k"]["q"].dtype == jnp.int8

    def test_kv8_greedy_prefix_agreement(self):
        from linalg_tpu.models.quant import quantize_kv_cache

        logits, cache = self._prefill()
        q = quantize_gpt_params(PARAMS, CFG)
        key = jax.random.PRNGKey(1)
        t_f, _, _ = gpt_decode_chunk(PARAMS, cache, logits, key, CFG, 24,
                                     1.0, 1, 0.0)
        t_q, _, _ = gpt_decode_chunk_q(q, quantize_kv_cache(cache), logits,
                                       key, CFG, 24, 1.0, 1, 0.0, kv8=True)
        t_f, t_q = np.asarray(t_f)[0], np.asarray(t_q)[0]
        prefix = int(np.argmin(t_f == t_q)) if (t_f != t_q).any() else 24
        assert prefix >= 6, (prefix, t_f.tolist(), t_q.tolist())

    def test_kv8_cache_halves(self):
        from linalg_tpu.models.quant import quantize_kv_cache

        _, cache = self._prefill()
        c8 = quantize_kv_cache(cache)

        def nbytes(t):
            return sum(np.asarray(x).nbytes for x in jax.tree.leaves(t))

        # int8 rows + one f32 scale per d_head row: well under 0.5x of f32
        assert nbytes((c8["k"], c8["v"])) < 0.45 * nbytes(
            (cache["k"], cache["v"]))

    def test_kv8_sampler_integration(self):
        from linalg_tpu.train.trainer import sample

        itos = {i: chr(97 + i % 26) for i in range(CFG.vocab_size)}
        out = "".join(sample(PARAMS, CFG, np.asarray([1, 2, 3]), itos,
                             steps=40, seed=9, quant="int8kv", top_k=1))
        out_f = "".join(sample(PARAMS, CFG, np.asarray([1, 2, 3]), itos,
                               steps=40, seed=9, top_k=1))
        assert len(out) == 40
        agree = sum(1 for a, b in zip(out, out_f) if a == b)
        assert agree >= 20, (agree, out, out_f)
