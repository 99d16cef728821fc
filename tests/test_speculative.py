"""Prompt-lookup speculative decoding: exactness, equivalence, plumbing.

The load-bearing claims, each pinned here:
- ``gpt_decode_block`` with S=1 reproduces ``gpt_decode_step`` exactly
  (same math, block form).
- Greedy speculative output is BIT-IDENTICAL to standard greedy decode
  for every positional mode (acceptance at temperature -> 0 degenerates
  to argmax matching).
- The point-mass rejection step's marginal law is exactly the target
  softmax (Monte Carlo).
- Rollback is free: rejected drafts leave stale K/V beyond ``length``
  that later rounds overwrite — covered implicitly by the greedy
  equality on prompts that force rejections (random model ≈ frequent
  rejections).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from linalg_tpu.models.gpt import (
    GPTConfig,
    gpt_decode_step,
    gpt_prefill,
    init_gpt_params,
)
from linalg_tpu.models.speculative import (
    gpt_decode_block,
    gpt_generate_speculative,
    spec_accept_or_resample,
)


def _greedy_ref(params, cfg, prompt, n):
    logits, cache = gpt_prefill(
        params, jnp.asarray([prompt], jnp.int32), cfg)
    out = []
    for _ in range(n):
        t = int(jnp.argmax(logits[0]))
        out.append(t)
        logits, cache = gpt_decode_step(
            params, cache, jnp.asarray([t], jnp.int32), cfg)
    return out


class TestDecodeBlock:
    @pytest.mark.parametrize("pos", ["sinusoidal", "rope", "learned",
                                     "alibi"])
    def test_s1_matches_decode_step(self, pos):
        cfg = GPTConfig(vocab_size=13, d_model=32, n_heads=4, n_layers=2,
                        ctx_len=32, pos=pos)
        params = init_gpt_params(cfg, seed=0)
        rng = np.random.default_rng(0)
        prompt = jnp.asarray(rng.integers(0, 13, (1, 7)), jnp.int32)
        _, cache = gpt_prefill(params, prompt, cfg)
        tok = jnp.asarray([5], jnp.int32)
        l_step, _ = gpt_decode_step(params, cache, tok, cfg)
        l_blk, _ = gpt_decode_block(params, cache, tok[None, :], cfg, 1)
        np.testing.assert_allclose(np.asarray(l_blk[0, 0]),
                                   np.asarray(l_step[0]), atol=1e-5)

    def test_block_rows_match_sequential_steps(self):
        """Row r of a 3-block equals the r-th sequential decode step."""
        cfg = GPTConfig(vocab_size=13, d_model=32, n_heads=4, n_layers=2,
                        ctx_len=32)
        params = init_gpt_params(cfg, seed=0)
        rng = np.random.default_rng(1)
        prompt = jnp.asarray(rng.integers(0, 13, (1, 6)), jnp.int32)
        toks = [4, 9, 2]
        _, cache0 = gpt_prefill(params, prompt, cfg)
        l_blk, _ = gpt_decode_block(
            params, cache0, jnp.asarray([toks], jnp.int32), cfg, 3)
        cache = cache0
        for r, t in enumerate(toks):
            l_step, cache = gpt_decode_step(
                params, cache, jnp.asarray([t], jnp.int32), cfg)
            np.testing.assert_allclose(np.asarray(l_blk[0, r]),
                                       np.asarray(l_step[0]), atol=1e-5)


class TestGreedyEquality:
    @pytest.mark.parametrize("pos", ["sinusoidal", "rope", "learned",
                                     "alibi"])
    def test_repetitive_prompt(self, pos):
        cfg = GPTConfig(vocab_size=11, d_model=32, n_heads=4, n_layers=2,
                        ctx_len=96, pos=pos)
        params = init_gpt_params(cfg, seed=0)
        base = [1, 2, 3, 4, 5, 1, 2, 3, 4, 5, 1, 2, 3]
        out, rounds = gpt_generate_speculative(
            params, cfg, base, 40, n_draft=6, temperature=1e-6, seed=0)
        assert list(out) == _greedy_ref(params, cfg, base, 40)
        assert 1 <= rounds <= 40

    def test_random_prompt_forces_rejections(self):
        cfg = GPTConfig(vocab_size=29, d_model=32, n_heads=4, n_layers=2,
                        ctx_len=96)
        params = init_gpt_params(cfg, seed=3)
        rng = np.random.default_rng(7)
        base = list(rng.integers(0, 29, 17))
        out, rounds = gpt_generate_speculative(
            params, cfg, base, 30, n_draft=4, temperature=1e-6, seed=2)
        assert list(out) == _greedy_ref(params, cfg, base, 30)

    def test_single_token_prompt(self):
        cfg = GPTConfig(vocab_size=11, d_model=32, n_heads=4, n_layers=2,
                        ctx_len=64)
        params = init_gpt_params(cfg, seed=0)
        out, _ = gpt_generate_speculative(
            params, cfg, [4], 20, n_draft=4, temperature=1e-6, seed=1)
        assert list(out) == _greedy_ref(params, cfg, [4], 20)


class TestExactness:
    def test_accept_or_resample_marginal_is_target(self):
        """Monte Carlo: the emitted token's law equals softmax(z) no
        matter what the draft is."""
        z = jnp.asarray([1.2, -0.3, 0.7, -2.0, 0.1])
        target = np.asarray(jax.nn.softmax(z))
        draw = jax.vmap(
            lambda k: spec_accept_or_resample(k, z, jnp.int32(0))[0])
        toks = np.asarray(draw(jax.random.split(jax.random.PRNGKey(0),
                                                40000)))
        emp = np.bincount(toks, minlength=5) / toks.size
        np.testing.assert_allclose(emp, target, atol=0.01)

    def test_stochastic_output_in_range(self):
        cfg = GPTConfig(vocab_size=11, d_model=32, n_heads=4, n_layers=2,
                        ctx_len=96)
        params = init_gpt_params(cfg, seed=0)
        out, _ = gpt_generate_speculative(
            params, cfg, [1, 2, 3, 1, 2, 3], 30, n_draft=4,
            temperature=0.9, top_k=5, seed=3)
        assert out.shape == (30,)
        assert out.min() >= 0 and out.max() < 11


class TestGuards:
    def test_context_overflow_raises(self):
        cfg = GPTConfig(vocab_size=11, d_model=32, n_heads=4, n_layers=2,
                        ctx_len=32)
        params = init_gpt_params(cfg, seed=0)
        with pytest.raises(ValueError, match="ctx_len"):
            gpt_generate_speculative(params, cfg, [1] * 10, 30, n_draft=4)

    def test_empty_prompt_raises(self):
        cfg = GPTConfig(vocab_size=11, d_model=32, n_heads=4, n_layers=2,
                        ctx_len=32)
        params = init_gpt_params(cfg, seed=0)
        with pytest.raises(ValueError, match="non-empty"):
            gpt_generate_speculative(params, cfg, [], 4)


class TestDraftModel:
    """Draft-MODEL speculative decoding (greedy drafter = point mass, so
    the exactness scheme is shared with prompt-lookup)."""

    def _cfgs(self, pos="sinusoidal"):
        cfg = GPTConfig(vocab_size=23, d_model=32, n_heads=4, n_layers=3,
                        ctx_len=96, pos=pos)
        dcfg = GPTConfig(vocab_size=23, d_model=16, n_heads=2, n_layers=1,
                         ctx_len=96, pos=pos)
        return cfg, dcfg

    def test_self_draft_accepts_everything(self):
        """Draft == target: greedy drafting always matches the greedy
        target, so every round emits n_draft+1 tokens."""
        from linalg_tpu.models.speculative import \
            gpt_generate_speculative_draft

        cfg, _ = self._cfgs()
        params = init_gpt_params(cfg, seed=0)
        base = [1, 2, 3, 4, 5]
        out, rounds = gpt_generate_speculative_draft(
            params, cfg, params, cfg, base, 30, n_draft=5,
            temperature=1e-6, seed=0)
        assert list(out) == _greedy_ref(params, cfg, base, 30)
        # near-ceil(30/6): the S=1 draft forward and the S=6 verify
        # forward are mathematically identical but differently shaped, so
        # near-tie argmaxes of an untrained model can flip a round; a
        # cache-sync bug would reject every draft (rounds ~ 30)
        assert rounds <= -(-30 // 6) + 2, rounds

    @pytest.mark.parametrize("pos", ["sinusoidal", "rope", "alibi"])
    def test_small_random_draft_greedy_equality(self, pos):
        """A useless random draft model cannot change the emitted stream:
        greedy output is bit-identical to plain greedy decode."""
        from linalg_tpu.models.speculative import \
            gpt_generate_speculative_draft

        cfg, dcfg = self._cfgs(pos)
        params = init_gpt_params(cfg, seed=1)
        dparams = init_gpt_params(dcfg, seed=99)
        rng = np.random.default_rng(5)
        base = list(rng.integers(0, 23, 9))
        out, rounds = gpt_generate_speculative_draft(
            params, cfg, dparams, dcfg, base, 25, n_draft=4,
            temperature=1e-6, seed=3)
        assert list(out) == _greedy_ref(params, cfg, base, 25)
        assert -(-25 // 5) <= rounds <= 25

    def test_stochastic_in_range_and_reproducible(self):
        from linalg_tpu.models.speculative import \
            gpt_generate_speculative_draft

        cfg, dcfg = self._cfgs()
        params = init_gpt_params(cfg, seed=2)
        dparams = init_gpt_params(dcfg, seed=4)
        a, _ = gpt_generate_speculative_draft(
            params, cfg, dparams, dcfg, [3, 1], 20, n_draft=3,
            temperature=1.0, top_k=5, seed=11)
        b, _ = gpt_generate_speculative_draft(
            params, cfg, dparams, dcfg, [3, 1], 20, n_draft=3,
            temperature=1.0, top_k=5, seed=11)
        assert list(a) == list(b)
        assert all(0 <= t < 23 for t in a)

    def test_vocab_mismatch_raises(self):
        from linalg_tpu.models.speculative import \
            gpt_generate_speculative_draft

        cfg, dcfg = self._cfgs()
        bad = GPTConfig(vocab_size=7, d_model=16, n_heads=2, n_layers=1,
                        ctx_len=96)
        params = init_gpt_params(cfg, seed=0)
        with pytest.raises(ValueError, match="vocab"):
            gpt_generate_speculative_draft(
                params, cfg, init_gpt_params(bad, seed=0), bad, [1], 4)
