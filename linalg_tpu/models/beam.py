"""Beam-search decoding for the decoder-only GPT.

Deterministic length-``n_new`` beam search over the KV-cached decode step:
every step expands each live beam over the full vocabulary, keeps the
``beam`` highest-scoring prefixes (sum of token log-probabilities), and
reorders the KV cache rows to follow the surviving beams. The whole search
runs as ONE ``lax.scan`` on device — beams ride the cache's batch axis, so
a step costs one batched decode forward plus a top-k over ``beam * V``
candidates and a gather of the cache's beam rows.

Optional ``stop_token`` support: a beam that emits the stop token is
frozen — its only continuation has log-probability 0 (re-emitting the stop
token), so its score stays fixed while live beams keep competing. The
returned sequence is truncated at the first stop token.

The reference has no beam search (its only decoder is the temperature /
top-k ancestral sampler, /root/reference/gpt.py:518-546); this extends the
serving surface the same way speculative decoding does — exactly, not
approximately: with ``beam`` >= V**n the search provably returns the
global argmax sequence, which the tests pin against brute-force
enumeration.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..nn.cache import fkv_write
from .gpt import GPTConfig, _dt_decode_ops, _make_decode_step, gpt_prefill

__all__ = ["gpt_generate_beam"]


@partial(jax.jit, static_argnames=("cfg", "n_new", "beam", "stop_token"))
def _beam_scan(params, logits, cache, cfg: GPTConfig, n_new: int, beam: int,
               stop_token: int):
    """Device side: returns (tokens (beam, n_new), scores (beam,),
    lengths (beam,)) sorted by the scan's final top-k order."""
    ops = _dt_decode_ops(params, cfg)
    step = _make_decode_step(cfg, ops, jnp.zeros((), jnp.int32), fkv_write)
    V = cfg.vocab_size

    # tile the B=1 prefill across the beam axis; only beam 0 is live at
    # t=0 (all beams hold identical caches — without this the first top-k
    # would select `beam` copies of the same best token)
    kb = jnp.repeat(cache["k"], beam, axis=1)
    vb = jnp.repeat(cache["v"], beam, axis=1)
    lg = jnp.repeat(logits, beam, axis=0)                  # (beam, V)
    scores = jnp.where(jnp.arange(beam) == 0, 0.0, -jnp.inf)
    toks = jnp.zeros((beam, n_new), jnp.int32)
    done = jnp.zeros((beam,), bool)
    lengths = jnp.full((beam,), n_new, jnp.int32)

    def body(carry, t):
        lg, kb, vb, pos, scores, toks, done, lengths = carry
        logp = jax.nn.log_softmax(lg, axis=-1)             # (beam, V)
        if stop_token >= 0:
            # frozen beams may only re-emit the stop token, at logp 0
            frozen = jnp.full((V,), -jnp.inf).at[stop_token].set(0.0)
            logp = jnp.where(done[:, None], frozen[None, :], logp)
        total = scores[:, None] + logp                     # (beam, V)
        vals, idx = lax.top_k(total.reshape(-1), beam)
        bsel = idx // V
        tsel = (idx % V).astype(jnp.int32)
        kb = jnp.take(kb, bsel, axis=1)
        vb = jnp.take(vb, bsel, axis=1)
        toks = jnp.take(toks, bsel, axis=0).at[:, t].set(tsel)
        prev_done = jnp.take(done, bsel)
        lengths = jnp.take(lengths, bsel)
        if stop_token >= 0:
            stopped_now = ~prev_done & (tsel == stop_token)
            lengths = jnp.where(stopped_now,
                                (t + 1).astype(jnp.int32), lengths)
            done = prev_done | stopped_now
        else:
            done = prev_done
        kb, vb, lg = step(kb, vb, pos, tsel)
        return (lg, kb, vb, pos + 1, vals, toks, done, lengths), None

    pos0 = cache["length"]
    (lg, kb, vb, pos, scores, toks, done, lengths), _ = lax.scan(
        body, (lg, kb, vb, pos0, scores, toks, done, lengths),
        jnp.arange(n_new))
    return toks, scores, lengths


def gpt_generate_beam(params, cfg: GPTConfig, prompt_ids, n_new: int,
                      beam: int = 4, stop_token: int = -1,
                      length_penalty: float = 0.0):
    """Beam-search-decode ``n_new`` tokens after ``prompt_ids``.

    Returns ``(tokens, score)``: the best beam's new tokens as a 1-D int32
    numpy array (truncated at the first ``stop_token`` if one fired) and
    its total log-probability (float, the raw sum — not length-normalized).

    ``length_penalty`` > 0 ranks final beams by ``score / len**penalty``
    (GNMT-style normalization; only meaningful with a ``stop_token``,
    where beams end at different lengths). The returned ``score`` is
    always the raw sum for the selected beam.
    """
    if beam < 1:
        raise ValueError("beam must be >= 1")
    if n_new < 1:
        raise ValueError("n_new must be >= 1")
    ids = np.asarray(prompt_ids, np.int32).reshape(-1)
    if ids.size == 0:
        raise ValueError("empty prompt")
    if ids.size + n_new > cfg.ctx_len:
        raise ValueError(
            f"prompt ({ids.size}) + n_new ({n_new}) exceeds ctx_len "
            f"{cfg.ctx_len}")
    logits, cache = gpt_prefill(params, jnp.asarray(ids[None]), cfg)
    toks, scores, lengths = _beam_scan(params, logits, cache, cfg, n_new,
                                       beam, int(stop_token))
    toks = np.asarray(toks)
    scores = np.asarray(scores)
    lengths = np.asarray(lengths)
    if length_penalty > 0.0:
        ranked = scores / np.maximum(lengths, 1) ** length_penalty
    else:
        ranked = scores
    best = int(np.argmax(ranked))
    return toks[best, : int(lengths[best])], float(scores[best])
