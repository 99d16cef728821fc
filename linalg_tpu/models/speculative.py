"""Prompt-lookup speculative decoding for the single-stream serving path.

The autoregressive decode step is HBM-bandwidth-bound: one token's matvecs
read every weight once, so a block of S tokens costs nearly the same wall
time as one (the weights dominate the traffic at serving batch sizes).
Speculative decoding exploits that: draft S candidate tokens cheaply,
verify them all in ONE block forward, and keep the longest accepted
prefix — per round the model does one step's work but emits 1..S+1 tokens.

Two drafters, one verifier:

- prompt-lookup (``gpt_generate_speculative``): n-gram copying, the
  "assisted generation" scheme — char-level text is highly repetitive, so
  the continuation of the most recent occurrence of the current bigram is
  a strong guess. No draft model, no extra weights, no training.
- draft model (``gpt_generate_speculative_draft``): a smaller GPT proposes
  GREEDILY with its own KV cache (classic Leviathan et al. two-model
  serving); greedy drafting keeps the proposal a point mass, so both
  drafters share the same exact verifier below.

Verification is the exact Leviathan et al. rejection scheme specialized to
a point-mass draft distribution: accept draft d_i with probability
p_i(d_i) under the TARGET distribution (after the same temperature/top-k/
top-p filter the standard sampler applies — ``gpt.filter_logits``); on
rejection, resample from p_i with d_i zeroed out and renormalized. The
emitted token stream is therefore distributed IDENTICALLY to standard
autoregressive sampling — greedy (temperature -> 0) output is
bit-identical — while the KV cache needs no special rollback: the
functional cache masks every slot beyond ``length``, so rejected drafts'
K/V entries are simply never advanced over and later block writes
overwrite them.

The reference has no serving path at all (its sampler re-runs the full
forward per token, gpt.py:522-546); this composes with the rebuild's
cached decode as a latency optimization for B=1 serving. The batched
path (``gpt_generate``) keeps plain decode: its design shares ONE decode
position across the batch, and per-sequence acceptance counts would
diverge it.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .gpt import (
    GPTConfig,
    _alibi_decode_bias,
    _ffn_dense,
    _heads,
    _unheads,
    filter_logits,
    gpt_prefill,
)
from ..nn.functional import (
    layer_norm,
    rope_rotate,
    rope_tables,
    sinusoidal_encoding,
)

__all__ = ["gpt_decode_block", "gpt_generate_speculative",
           "gpt_generate_speculative_draft", "spec_accept_or_resample"]


def spec_accept_or_resample(key, z, draft):
    """One point-mass rejection-sampling step: returns (token, accepted).

    ``z`` is the FILTERED target logits row; the draft distribution is a
    point mass at ``draft``. Accept the draft with probability p(draft);
    otherwise sample from p with the draft zeroed and renormalized. The
    marginal law of the returned token is exactly softmax(z) — the
    property the Monte-Carlo test pins (Leviathan et al. 2023, §3.1,
    specialized to a deterministic drafter).
    """
    ku, kc = jax.random.split(key)
    p_d = jax.nn.softmax(z)[draft]
    accept = jax.random.uniform(ku) < p_d
    z_res = z.at[draft].set(-jnp.inf)
    tok = jnp.where(accept, draft,
                    jax.random.categorical(kc, z_res).astype(draft.dtype))
    return tok, accept


@partial(jax.jit, static_argnames=("cfg", "S"))
def gpt_decode_block(params, cache, tokens, cfg: GPTConfig, S: int):
    """Process S tokens in one cached forward: (1, S) ids -> (1, S, V).

    Row r's logits are the next-token distribution AFTER ``tokens[:, r]``
    — the block twin of ``gpt_decode_step`` (S=1 reproduces it exactly;
    pinned by tests). K/V for all S rows are written into the cache
    buffers at slots [length, length+S); the returned cache's ``length``
    is NOT advanced — the caller advances by however many rows it
    accepts (``fkv_advance``), which is what makes speculative rollback
    free.
    """
    B = tokens.shape[0]
    pos = cache["length"]
    dt = cfg.compute_dtype
    start = cache.get("start", jnp.zeros((), jnp.int32))
    offs = jnp.arange(S, dtype=jnp.int32)
    rel = (pos - start) + offs  # logical positions of the S rows

    if cfg.pos == "rope":
        h = params["tok_W"][tokens]
        c, s_ = rope_tables(cfg.d_head, rel)  # (S, d/2)
        rope = (c[None, None].astype(dt), s_[None, None].astype(dt))
    elif cfg.pos == "alibi":
        h = params["tok_W"][tokens]
        rope = None
    else:
        pe = (params["pos_W"] if cfg.pos == "learned"
              else sinusoidal_encoding(cfg.ctx_len, cfg.d_model))
        h = params["tok_W"][tokens] + pe[rel][None]
        rope = None
    h = h.astype(dt)
    layers = jax.tree.map(lambda w: w.astype(dt), params["layers"])

    # buffer row count comes from the cache, not cfg.ctx_len: callers may
    # pass ctx+S padded buffers so the S-row block write can never clamp
    # at the end of the buffer (serve._extend_prefix does)
    t_ids = jnp.arange(cache["k"].shape[-2])
    # row r (cache slot pos+r) attends to slots start <= j <= pos+r
    live = (t_ids[None, None, :] <= (pos + offs)[None, :, None]) & (
        t_ids[None, None, :] >= jnp.atleast_1d(start)[:, None, None])
    if cfg.window is not None:  # sliding-window band, row-relative
        live &= t_ids[None, None, :] > (pos + offs)[None, :, None] - cfg.window
    attn_mask = jnp.where(live, 0.0, -1e9).astype(dt)[:, None]  # (B,1,S,ctx)
    if cfg.pos == "alibi":
        # per-row bias: slope_h * (j - (pos + r))
        from ..nn.positional import alibi_slopes

        sl = alibi_slopes(cfg.n_heads)
        dist = (t_ids[None, :] - (pos + offs)[:, None]).astype(jnp.float32)
        attn_mask = attn_mask + (sl[:, None, None] * dist[None]).astype(
            dt)[None]  # (B, H, S, ctx)

    from .gpt import _gqa_decode_attn

    def body(carry, xs):
        h_in = carry
        lp, k_l, v_l = xs
        xn = layer_norm(h_in, lp["ln1_g"], lp["ln1_b"])
        q = _heads(xn @ lp["Wq"], cfg.n_heads)
        k = _heads(xn @ lp["Wk"], cfg.kv_heads)
        v = _heads(xn @ lp["Wv"], cfg.kv_heads)
        if rope is not None:
            q = rope_rotate(q, rope[0], rope[1])
            k = rope_rotate(k, rope[0], rope[1])
        # block write: S rows at slots [pos, pos+S)
        z32 = jnp.zeros((), pos.dtype)
        k_l = lax.dynamic_update_slice(
            k_l, k.astype(k_l.dtype), (z32, z32, pos, z32))
        v_l = lax.dynamic_update_slice(
            v_l, v.astype(v_l.dtype), (z32, z32, pos, z32))
        a = _unheads(_gqa_decode_attn(q, k_l, v_l, attn_mask)) @ lp["Wo"]
        h1 = h_in + a
        f = _ffn_dense(lp, layer_norm(h1, lp["ln2_g"], lp["ln2_b"]),
                       cfg.ffn)
        return h1 + f, (k_l, v_l)

    h, (K, V) = lax.scan(body, h, (layers, cache["k"], cache["v"]))
    logits = (h @ params["tok_W"].T.astype(dt)
              + params["head_b"].astype(dt)).astype(jnp.float32)
    return logits, dict(cache, k=K, v=V)


def _draft_lookup(hist, hist_len, S: int):
    """Prompt-lookup drafting: (ctx,) id history -> (S,) draft ids.

    Finds the most recent earlier occurrence of the trailing bigram
    (falling back to the trailing unigram) and copies the S ids that
    followed it. Pure fixed-shape ops — runs inside jit.
    """
    C = hist.shape[0]
    idx = jnp.arange(C)
    last = hist[hist_len - 1]
    prev = hist[hist_len - 2]  # garbage when hist_len < 2 — masked below
    # bigram (hist[j], hist[j+1]) == (prev, last), ending before the tail
    nxt = jnp.roll(hist, -1)
    big = (hist == prev) & (nxt == last) & (idx + 2 < hist_len) & (
        hist_len >= 2)
    uni = (hist == last) & (idx + 1 < hist_len)
    j_big = jnp.max(jnp.where(big, idx, -1))
    j_uni = jnp.max(jnp.where(uni, idx, -1))
    # source index of the first draft token
    src = jnp.where(j_big >= 0, j_big + 2,
                    jnp.where(j_uni >= 0, j_uni + 1, hist_len - 1))
    src = jnp.clip(src, 0, C - S)
    draft = lax.dynamic_slice_in_dim(hist, src, S)
    # positions past the known history just repeat the last id (cheap
    # guesses; the verifier rejects wrong ones at no extra cost)
    dpos = src + jnp.arange(S)
    return jnp.where(dpos < hist_len, draft, last)


def gpt_generate_speculative(params, cfg: GPTConfig, prompt, n_tokens: int,
                             *, n_draft: int = 8, temperature: float = 1.0,
                             top_k: int = 0, top_p: float = 0.0,
                             seed: int = 0):
    """Single-stream generation with prompt-lookup speculative decoding.

    Returns (tokens (n_tokens,), rounds): ``rounds`` is the number of
    block forwards used — ``n_tokens / rounds`` is the realized
    tokens-per-step speedup over plain decode (1.0 means no draft ever
    accepted; n_draft+1 is the ceiling).

    The emitted stream follows the standard sampler's distribution
    exactly (point-mass rejection sampling; greedy output is identical).
    Requires ``len(prompt) + n_tokens + n_draft + 1 <= cfg.ctx_len`` (no
    context-rollover support on the speculative path).
    """
    prompt = np.asarray(prompt, dtype=np.int32).ravel()
    P = int(prompt.shape[0])
    S = n_draft + 1
    if P < 1:
        raise ValueError("prompt must be non-empty")
    if P + n_tokens + S > cfg.ctx_len:
        raise ValueError(
            f"prompt ({P}) + n_tokens ({n_tokens}) + draft block ({S}) "
            f"must fit ctx_len ({cfg.ctx_len}); the speculative path does "
            "not roll the context window")

    # prefill processes prompt[:-1]; the last prompt id becomes the first
    # unprocessed block token so every round is one uniform block forward
    if P > 1:
        _, cache = gpt_prefill(params, jnp.asarray(prompt[None, :-1]), cfg)
    else:
        from ..nn.cache import fkv_init

        cache = fkv_init(cfg.n_layers, 1, cfg.kv_heads, cfg.ctx_len,
                         cfg.d_head, dtype=cfg.compute_dtype)

    out, rounds = _spec_loop(params, cache, cfg, S,
                             jnp.asarray(prompt), n_tokens,
                             jnp.float32(temperature), int(top_k),
                             jnp.float32(top_p), jax.random.PRNGKey(seed))
    return np.asarray(out), int(rounds)


@partial(jax.jit, static_argnames=("cfg", "S", "n_tokens", "top_k"))
def _spec_loop(params, cache, cfg: GPTConfig, S: int, prompt, n_tokens: int,
               temperature, top_k: int, top_p, key):
    C = cfg.ctx_len
    P = prompt.shape[0]
    hist0 = jnp.zeros((C,), jnp.int32).at[:P].set(prompt)

    def cond(st):
        _, _, _, count, _, rounds = st
        return count < n_tokens

    def step(st):
        cache, hist, hlen, count, key, rounds = st
        key, kacc, krep = jax.random.split(key, 3)
        drafts = _draft_lookup(hist, hlen, S - 1)           # (S-1,)
        pending = hist[hlen - 1]                            # unprocessed
        block = jnp.concatenate([pending[None], drafts])[None]  # (1, S)
        logits, cache = gpt_decode_block(params, cache, block, cfg, S)
        z = filter_logits(logits[0], temperature, top_k, top_p)  # (S, V)
        probs = jax.nn.softmax(z, axis=-1)

        # accept draft i iff u_i < p_i(drafts[i]) AND all before accepted
        u = jax.random.uniform(kacc, (S - 1,))
        p_draft = probs[jnp.arange(S - 1), drafts]
        ok = u < p_draft
        n_acc = jnp.argmin(jnp.concatenate(
            [ok.astype(jnp.int32), jnp.zeros((1,), jnp.int32)])
        ).astype(jnp.int32)
        # row n_acc supplies the next sampled token: the bonus draw when
        # everything was accepted, the residual draw otherwise (z with the
        # rejected draft removed — exact point-mass rejection sampling)
        all_ok = n_acc == (S - 1)
        d_rej = drafts[jnp.minimum(n_acc, S - 2)]
        z_fix = z[n_acc].at[d_rej].set(
            jnp.where(all_ok, z[n_acc, d_rej], -jnp.inf))
        extra = jax.random.categorical(krep, z_fix).astype(jnp.int32)

        # emit n_acc accepted drafts then the sampled token
        emit = jnp.concatenate([drafts, extra[None]])       # (S,)
        emit = jnp.where(jnp.arange(S) > n_acc, 0, emit)  # zero stale tail
        emit = emit.at[n_acc].set(extra)
        hist = lax.dynamic_update_slice(hist, emit, (hlen,))
        cache = dict(cache, length=cache["length"] + n_acc + 1)
        return (cache, hist, hlen + n_acc + 1, count + n_acc + 1, key,
                rounds + 1)

    st = (cache, hist0, jnp.asarray(P, jnp.int32), jnp.asarray(0, jnp.int32),
          key, jnp.asarray(0, jnp.int32))
    cache, hist, hlen, count, key, rounds = lax.while_loop(cond, step, st)
    return hist[P:P + n_tokens], rounds


def gpt_generate_speculative_draft(params, cfg: GPTConfig, draft_params,
                                   draft_cfg: GPTConfig, prompt,
                                   n_tokens: int, *, n_draft: int = 4,
                                   temperature: float = 1.0,
                                   top_k: int = 0, top_p: float = 0.0,
                                   seed: int = 0):
    """Draft-MODEL speculative decoding: a small GPT proposes, the target
    verifies (Leviathan et al. 2023 with a deterministic drafter).

    The draft model drafts GREEDILY (argmax), so its proposal distribution
    is a point mass and verification reuses the exact point-mass
    rejection scheme of the prompt-lookup path: the emitted stream follows
    the target sampler's distribution EXACTLY, whatever the draft model
    knows. A good draft raises the acceptance rate (up to n_draft+1
    tokens per target forward); a useless one only costs the cheap draft
    steps. Both models must share the vocabulary; the draft keeps its own
    KV cache, re-synced to the accepted prefix each round (the functional
    cache masks slots past ``length``, so rollback is free on both).

    Returns (tokens (n_tokens,), rounds) like ``gpt_generate_speculative``.
    """
    if draft_cfg.vocab_size != cfg.vocab_size:
        raise ValueError(
            f"draft vocab {draft_cfg.vocab_size} != target vocab "
            f"{cfg.vocab_size}")
    if draft_cfg.ctx_len < cfg.ctx_len:
        raise ValueError(
            f"draft ctx_len {draft_cfg.ctx_len} must cover the target's "
            f"{cfg.ctx_len} (both caches index the same positions)")
    prompt = np.asarray(prompt, dtype=np.int32).ravel()
    P = int(prompt.shape[0])
    S = n_draft + 1
    if P < 1:
        raise ValueError("prompt must be non-empty")
    if P + n_tokens + S > cfg.ctx_len:
        raise ValueError(
            f"prompt ({P}) + n_tokens ({n_tokens}) + draft block ({S}) "
            f"must fit ctx_len ({cfg.ctx_len}); the speculative path does "
            "not roll the context window")

    from ..nn.cache import fkv_init

    if P > 1:
        _, cache = gpt_prefill(params, jnp.asarray(prompt[None, :-1]), cfg)
        _, dcache = gpt_prefill(draft_params, jnp.asarray(prompt[None, :-1]),
                                draft_cfg)
    else:
        cache = fkv_init(cfg.n_layers, 1, cfg.kv_heads, cfg.ctx_len,
                         cfg.d_head, dtype=cfg.compute_dtype)
        dcache = fkv_init(draft_cfg.n_layers, 1, draft_cfg.kv_heads,
                          draft_cfg.ctx_len, draft_cfg.d_head,
                          dtype=draft_cfg.compute_dtype)

    out, rounds = _spec_draft_loop(
        params, cache, draft_params, dcache, cfg, draft_cfg, S,
        jnp.asarray(prompt), n_tokens, jnp.float32(temperature), int(top_k),
        jnp.float32(top_p), jax.random.PRNGKey(seed))
    return np.asarray(out), int(rounds)


@partial(jax.jit,
         static_argnames=("cfg", "draft_cfg", "S", "n_tokens", "top_k"))
def _spec_draft_loop(params, cache, draft_params, dcache, cfg: GPTConfig,
                     draft_cfg: GPTConfig, S: int, prompt, n_tokens: int,
                     temperature, top_k: int, top_p, key):
    C = cfg.ctx_len
    P = prompt.shape[0]
    hist0 = jnp.zeros((C,), jnp.int32).at[:P].set(prompt)

    def cond(st):
        return st[3] < n_tokens

    def step(st):
        cache, dcache, hist, count, hlen, key, rounds = st
        key, kacc, krep = jax.random.split(key, 3)
        pending = hist[hlen - 1]

        # -- draft: S-1 greedy single-token steps on the SMALL model -----
        def dstep(carry, _):
            dc, tok = carry
            lg, dc = gpt_decode_block(draft_params, dc, tok[None, None],
                                      draft_cfg, 1)
            dc = dict(dc, length=dc["length"] + 1)
            nxt = jnp.argmax(lg[0, 0]).astype(jnp.int32)
            return (dc, nxt), nxt

        (dcache, _), drafts = lax.scan(dstep, (dcache, pending),
                                       None, length=S - 1)

        # -- verify: ONE target block forward over pending + drafts ------
        block = jnp.concatenate([pending[None], drafts])[None]  # (1, S)
        logits, cache = gpt_decode_block(params, cache, block, cfg, S)
        z = filter_logits(logits[0], temperature, top_k, top_p)  # (S, V)
        probs = jax.nn.softmax(z, axis=-1)

        u = jax.random.uniform(kacc, (S - 1,))
        p_draft = probs[jnp.arange(S - 1), drafts]
        ok = u < p_draft
        n_acc = jnp.argmin(jnp.concatenate(
            [ok.astype(jnp.int32), jnp.zeros((1,), jnp.int32)])
        ).astype(jnp.int32)
        all_ok = n_acc == (S - 1)
        d_rej = drafts[jnp.minimum(n_acc, S - 2)]
        z_fix = z[n_acc].at[d_rej].set(
            jnp.where(all_ok, z[n_acc, d_rej], -jnp.inf))
        extra = jax.random.categorical(krep, z_fix).astype(jnp.int32)

        emit = jnp.concatenate([drafts, extra[None]])
        emit = jnp.where(jnp.arange(S) > n_acc, 0, emit)
        emit = emit.at[n_acc].set(extra)
        hist = lax.dynamic_update_slice(hist, emit, (hlen,))
        cache = dict(cache, length=cache["length"] + n_acc + 1)
        # draft cache re-sync: it processed pending + ALL S-1 drafts; only
        # pending + the n_acc accepted ones are real history, so its live
        # length equals the target's (both have consumed hist[:hlen'-1]);
        # the rejected tail past ``length`` is masked and overwritten
        dcache = dict(dcache, length=cache["length"])
        return (cache, dcache, hist, count + n_acc + 1, hlen + n_acc + 1,
                key, rounds + 1)

    st = (cache, dcache, hist0, jnp.asarray(0, jnp.int32),
          jnp.asarray(P, jnp.int32), key, jnp.asarray(0, jnp.int32))
    st = lax.while_loop(cond, step, st)
    return st[2][P:P + n_tokens], st[6]
