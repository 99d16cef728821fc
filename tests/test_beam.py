"""Beam search (models/beam.py): exactness against brute-force enumeration,
greedy equivalence at beam=1, monotonicity in beam width, stop tokens.

The strong claim: with beam >= V**n the search IS exhaustive (no prefix can
be pruned), so it must return the global argmax-log-probability sequence —
pinned against scoring every one of the V**n continuations with a
teacher-forced forward pass.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from linalg_tpu.models.beam import gpt_generate_beam
from linalg_tpu.models.gpt import (
    GPTConfig,
    gpt_apply,
    gpt_decode_chunk,
    gpt_prefill,
    init_gpt_params,
)

CFG = GPTConfig(vocab_size=5, d_model=16, n_heads=2, n_layers=2, ctx_len=16)
PARAMS = init_gpt_params(CFG, seed=3)


def brute_force(params, cfg, prompt, n):
    """Score every V**n continuation teacher-forced; return (best, scores)."""
    V = cfg.vocab_size
    m = len(prompt)
    seqs = np.array(list(itertools.product(range(V), repeat=n)), np.int32)
    full = np.concatenate(
        [np.tile(np.asarray(prompt, np.int32), (len(seqs), 1)), seqs], axis=1)
    logits = np.asarray(gpt_apply(params, jnp.asarray(full), cfg))
    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    logp = np.asarray(logp)
    rows = np.arange(len(seqs))[:, None]
    cols = np.arange(n)[None, :]
    tot = logp[rows, m - 1 + cols, seqs].sum(axis=1)
    return seqs, tot


class TestBeamExactness:
    def test_exhaustive_beam_finds_global_argmax(self):
        prompt = [1, 3, 0]
        n = 3
        seqs, tot = brute_force(PARAMS, CFG, prompt, n)
        want = seqs[np.argmax(tot)]
        toks, score = gpt_generate_beam(PARAMS, CFG, prompt, n,
                                        beam=CFG.vocab_size ** n)
        np.testing.assert_array_equal(toks, want)
        assert score == pytest.approx(float(tot.max()), abs=1e-4)

    def test_score_is_true_logprob(self):
        # the reported score of ANY beam width must equal the brute-force
        # log-probability of the returned sequence
        prompt = [2, 4]
        n = 3
        seqs, tot = brute_force(PARAMS, CFG, prompt, n)
        for beam in (1, 2, 4):
            toks, score = gpt_generate_beam(PARAMS, CFG, prompt, n,
                                            beam=beam)
            i = np.flatnonzero((seqs == toks).all(axis=1))[0]
            assert score == pytest.approx(float(tot[i]), abs=1e-4)

    def test_monotone_in_beam_width(self):
        prompt = [0, 2, 1, 4]
        n = 4
        scores = [gpt_generate_beam(PARAMS, CFG, prompt, n, beam=b)[1]
                  for b in (1, 2, 8, 64)]
        for a, b in zip(scores, scores[1:]):
            assert b >= a - 1e-5  # wider beams never score worse


class TestBeamGreedy:
    def test_beam1_equals_greedy_decode(self):
        prompt = [3, 1]
        n = 6
        logits, cache = gpt_prefill(
            PARAMS, jnp.asarray(np.asarray(prompt, np.int32)[None]), CFG)
        greedy, _, _ = gpt_decode_chunk(PARAMS, cache, logits,
                                        jax.random.PRNGKey(0), CFG, n,
                                        1.0, 1, 0.0)
        toks, _ = gpt_generate_beam(PARAMS, CFG, prompt, n, beam=1)
        np.testing.assert_array_equal(toks, np.asarray(greedy)[0])


class TestBeamStop:
    def test_stop_token_truncates(self):
        prompt = [3, 1]
        # make the stop token the greedy first choice: beam=1 must emit
        # exactly [stop] and freeze there
        greedy, _ = gpt_generate_beam(PARAMS, CFG, prompt, 1, beam=1)
        stop = int(greedy[0])
        toks, score = gpt_generate_beam(PARAMS, CFG, prompt, 5, beam=1,
                                        stop_token=stop)
        assert toks.tolist() == [stop]
        # frozen score == the single-token logprob (no post-stop drift)
        _, s1 = gpt_generate_beam(PARAMS, CFG, prompt, 1, beam=1)
        assert score == pytest.approx(s1, abs=1e-4)

    def test_stop_only_terminal(self):
        prompt = [0, 4, 2]
        for beam in (2, 8):
            toks, _ = gpt_generate_beam(PARAMS, CFG, prompt, 6, beam=beam,
                                        stop_token=3)
            body = toks.tolist()
            assert 3 not in body[:-1]  # stop can only be the last token

    def test_length_penalty_selects_normalized(self):
        toks, score = gpt_generate_beam(PARAMS, CFG, [1, 2], 4, beam=8,
                                        stop_token=0, length_penalty=0.8)
        assert 1 <= len(toks) <= 4
        assert np.isfinite(score)


class TestBeamValidation:
    def test_rejects_bad_args(self):
        with pytest.raises(ValueError, match="beam"):
            gpt_generate_beam(PARAMS, CFG, [1], 2, beam=0)
        with pytest.raises(ValueError, match="empty"):
            gpt_generate_beam(PARAMS, CFG, [], 2)
        with pytest.raises(ValueError, match="ctx_len"):
            gpt_generate_beam(PARAMS, CFG, [1] * 15, 5)
