"""Unbounded streaming decode for sliding-window models (ring-buffer KV).

With ``GPTConfig.window`` set, a token's attention reads only the last
``window`` positions — so decode needs only a WINDOW of live KV rows, not
``ctx_len``. This module keeps exactly that: a ring buffer of
``R = window`` rows per layer, each new token overwriting the row that
just slid out of every future window. Consequences:

- KV state is O(window), independent of how long the stream runs;
- the absolute position is unbounded — generation can run arbitrarily
  far past ``ctx_len`` with NO context rollover (the bounded-cache
  sampler re-prefills every ctx/2 tokens; this path never prefills
  again), while remaining EXACTLY the windowed model's forward;
- restricted to ``pos`` in {"rope", "alibi"}: both are relative encodings
  computable at any absolute position (sinusoidal/learned need a
  position-table row per absolute position and stay on the bounded path).

RoPE correctness in the ring: keys are stored ROTATED at their absolute
position j and the query rotated at p; the rotary dot depends only on
p - j, so reusing a ring slot for a new absolute position just works.
ALiBi reads the per-row absolute positions (``rpos``) for its distance
bias. The masks ban rows with ``rpos <= p - window`` (stale) or
``rpos < 0`` (never written).

No reference counterpart (/root/reference/gpt.py:518-546 recomputes a
full forward per token and hard-truncates context); this is the TPU
serving extension built on the sliding-window attention semantics of
``models.gpt`` (tests pin exact equality to the windowed full forward).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import lax

from ..nn.functional import rope_rotate, rope_tables
from ..nn.positional import alibi_slopes
from .gpt import (GPTConfig, Params, _dt_decode_ops, _gqa_decode_attn,
                  _heads, _unheads, filter_logits, gpt_prefill)

__all__ = ["init_stream_cache", "stream_fill", "gpt_stream_prefill",
           "gpt_stream_chunk"]


def _check_stream_cfg(cfg: GPTConfig) -> int:
    if cfg.window is None:
        raise ValueError("streaming decode needs GPTConfig.window")
    if cfg.pos not in ("rope", "alibi"):
        raise ValueError(
            "streaming decode supports pos in {'rope', 'alibi'} (relative "
            "encodings valid at unbounded absolute positions); "
            f"got {cfg.pos!r}")
    return cfg.window


def init_stream_cache(cfg: GPTConfig, batch: int = 1) -> Dict[str, Any]:
    """Ring cache: {k, v: (L, B, hk, window, d), rpos: (window,) int32
    absolute position per ring row (-1 = never written), pos: scalar int32
    next absolute position}. Positions are SHARED across the batch (the
    single-stream / aligned-batch decode model)."""
    R = _check_stream_cfg(cfg)
    dt = cfg.compute_dtype
    shape = (cfg.n_layers, batch, cfg.kv_heads, R, cfg.d_head)
    return {
        "k": jnp.zeros(shape, dt),
        "v": jnp.zeros(shape, dt),
        "rpos": jnp.full((R,), -1, jnp.int32),
        "pos": jnp.zeros((), jnp.int32),
    }


@partial(jax.jit, static_argnames=("cfg",))
def stream_fill(ring: Dict[str, Any], cache: Dict[str, Any], plen,
                cfg: GPTConfig) -> Dict[str, Any]:
    """Load a prefilled bounded cache's last ``min(window, plen)`` rows
    into the ring (row j -> slot j % window, rpos = j)."""
    R = _check_stream_cfg(cfg)
    plen = jnp.asarray(plen, jnp.int32)
    j = plen - R + jnp.arange(R, dtype=jnp.int32)  # absolute, may be < 0
    slot = j % R  # a permutation of 0..R-1
    inv = jnp.argsort(slot)  # inv[s] = index i with slot[i] == s
    j_for_slot = j[inv]
    ctx = cache["k"].shape[-2]
    gather = jnp.clip(j_for_slot, 0, ctx - 1)
    k = jnp.take(cache["k"], gather, axis=-2)
    v = jnp.take(cache["v"], gather, axis=-2)
    valid = j_for_slot >= 0
    k = jnp.where(valid[:, None], k, 0)
    v = jnp.where(valid[:, None], v, 0)
    rpos = jnp.where(valid, j_for_slot, -1)
    return dict(ring, k=k.astype(ring["k"].dtype),
                v=v.astype(ring["v"].dtype), rpos=rpos, pos=plen)


def gpt_stream_prefill(params: Params, x_ids, cfg: GPTConfig, length=None):
    """Prompt prefill straight into a ring cache: (1|B, T) ids ->
    (logits, ring). The prompt itself is bounded by ctx_len (as in the
    reference); only the generation that follows is unbounded."""
    logits, cache = gpt_prefill(params, x_ids, cfg, length=length)
    ring = init_stream_cache(cfg, batch=x_ids.shape[0])
    return logits, stream_fill(ring, cache, cache["length"], cfg)


def _make_stream_step(cfg: GPTConfig, ops):
    """One-token ring decode step: (kbuf, vbuf, rpos, pos, token) ->
    (K, V, rpos', logits). The ring twin of ``gpt._make_decode_step``."""
    dt = cfg.compute_dtype
    D = cfg.d_model
    KD = cfg.kv_heads * cfg.d_head
    R = cfg.window
    slopes = alibi_slopes(cfg.n_heads) if cfg.pos == "alibi" else None

    def decode_step(kbuf, vbuf, rpos, pos, token):
        h = ops["embed"](token)
        rope = None
        if cfg.pos == "rope":
            c, s_ = rope_tables(cfg.d_head, jnp.atleast_1d(pos)[:, None])
            rope = (c[:, None].astype(dt), s_[:, None].astype(dt))
        h = h.astype(dt)
        slot = pos % R
        rpos2 = rpos.at[slot].set(pos)
        # live = written rows still inside the window ending at pos
        live = (rpos2 >= 0) & (rpos2 > pos - R)
        mask = jnp.where(live, 0.0, -1e9).astype(dt)[None, None, None, :]
        if slopes is not None:
            bias = (slopes[None, :, None, None]
                    * (rpos2 - pos)[None, None, None, :].astype(jnp.float32))
            mask = mask + bias.astype(dt)

        z32 = jnp.zeros((), jnp.int32)

        def body(carry, xs):
            h_in = carry
            lw, k_l, v_l = xs
            xn = ops["ln1"](lw, h_in)
            qkv = ops["qkv"](lw, xn)
            q = _heads(qkv[..., :D], cfg.n_heads)
            k = _heads(qkv[..., D:D + KD], cfg.kv_heads)
            v = _heads(qkv[..., D + KD:], cfg.kv_heads)
            if rope is not None:
                q = rope_rotate(q, rope[0], rope[1])
                k = rope_rotate(k, rope[0], rope[1])
            k_l = lax.dynamic_update_slice(
                k_l, k.astype(k_l.dtype), (z32, z32, slot, z32))
            v_l = lax.dynamic_update_slice(
                v_l, v.astype(v_l.dtype), (z32, z32, slot, z32))
            a = ops["out"](lw, _unheads(_gqa_decode_attn(q, k_l, v_l, mask)))
            h1 = h_in + a
            f = ops["ffn"](lw, ops["ln2"](lw, h1))
            return h1 + f, (k_l, v_l)

        h2, (K, V) = lax.scan(body, h, (ops["lws"], kbuf, vbuf))
        return K, V, rpos2, ops["head"](h2[:, -1])

    return decode_step


def _make_stream_step_slots(cfg: GPTConfig, ops):
    """Per-slot ring decode step: positions, ring rows, and row-position
    maps are all PER SLOT — the continuous-batching twin of
    ``_make_stream_step`` (``serve.engine`` ring mode). ``pos`` is (B,),
    ``rpos`` (B, R)."""
    from ..nn.cache import fkv_write_slots

    dt = cfg.compute_dtype
    D = cfg.d_model
    KD = cfg.kv_heads * cfg.d_head
    R = cfg.window
    slopes = alibi_slopes(cfg.n_heads) if cfg.pos == "alibi" else None

    def decode_step(kbuf, vbuf, rpos, pos, token):
        B = pos.shape[0]
        h = ops["embed"](token)
        rope = None
        if cfg.pos == "rope":
            c, s_ = rope_tables(cfg.d_head, pos[:, None])  # (B, 1, d/2)
            rope = (c[:, None].astype(dt), s_[:, None].astype(dt))
        h = h.astype(dt)
        slot = pos % R  # (B,)
        rpos2 = rpos.at[jnp.arange(B), slot].set(pos)
        live = (rpos2 >= 0) & (rpos2 > pos[:, None] - R)
        mask = jnp.where(live, 0.0, -1e9).astype(dt)[:, None, None, :]
        if slopes is not None:
            bias = (slopes[None, :, None, None]
                    * (rpos2 - pos[:, None])[:, None, None, :]
                    .astype(jnp.float32))
            mask = mask + bias.astype(dt)

        def body(carry, xs):
            h_in = carry
            lw, k_l, v_l = xs
            xn = ops["ln1"](lw, h_in)
            qkv = ops["qkv"](lw, xn)
            q = _heads(qkv[..., :D], cfg.n_heads)
            k = _heads(qkv[..., D:D + KD], cfg.kv_heads)
            v = _heads(qkv[..., D + KD:], cfg.kv_heads)
            if rope is not None:
                q = rope_rotate(q, rope[0], rope[1])
                k = rope_rotate(k, rope[0], rope[1])
            k_l, v_l = fkv_write_slots(k_l, v_l, slot, k, v)
            a = ops["out"](lw, _unheads(_gqa_decode_attn(q, k_l, v_l, mask)))
            h1 = h_in + a
            f = ops["ffn"](lw, ops["ln2"](lw, h1))
            return h1 + f, (k_l, v_l)

        h2, (K, V) = lax.scan(body, h, (ops["lws"], kbuf, vbuf))
        return K, V, rpos2, ops["head"](h2[:, -1])

    return decode_step


@partial(jax.jit, static_argnames=("cfg", "n_tokens"))
def stream_chunk_slots(params, cache, logits, key, temp, top_p, top_k,
                       cfg: GPTConfig, n_tokens: int):
    """Per-slot ring decode chunk: the ring-mode twin of
    ``serve.engine.decode_chunk_slots``. ``cache`` is {k, v:
    (L, B, hk, window, d), rpos: (B, window), pos: (B,)}; sampling
    params are per-slot (B,) vectors. Positions are unbounded — slots
    generate past ctx_len with O(window) rows each."""
    _check_stream_cfg(cfg)
    ops = _dt_decode_ops(params, cfg)
    decode_step = _make_stream_step_slots(cfg, ops)
    temp = jnp.asarray(temp, jnp.float32)[:, None]
    top_p = jnp.asarray(top_p, jnp.float32)[:, None]
    top_k = jnp.asarray(top_k, jnp.int32)

    def outer(carry, k):
        lg, kb, vb, rpos, pos = carry
        tok = jax.random.categorical(
            k, filter_logits(lg, temp, top_k, top_p), axis=-1)
        kb, vb, rpos, new_logits = decode_step(kb, vb, rpos, pos, tok)
        return (new_logits, kb, vb, rpos, pos + 1), tok

    keys = jax.random.split(key, n_tokens)
    (logits, K, V, rpos, pos), toks = lax.scan(
        outer, (logits, cache["k"], cache["v"], cache["rpos"],
                cache["pos"]), keys)
    return toks.T, logits, dict(cache, k=K, v=V, rpos=rpos, pos=pos)


@partial(jax.jit, static_argnames=("cfg", "n_tokens", "top_k"))
def gpt_stream_chunk(params, ring, logits, key, cfg: GPTConfig,
                     n_tokens: int, temperature=1.0, top_k: int = 0,
                     top_p=0.0):
    """Sample ``n_tokens`` through the ring in ONE device computation —
    the unbounded twin of ``gpt_decode_chunk`` (no ctx_len ceiling, no
    rollover; chain chunks forever)."""
    _check_stream_cfg(cfg)
    ops = _dt_decode_ops(params, cfg)
    decode_step = _make_stream_step(cfg, ops)

    def outer(carry, k):
        lg, kb, vb, rpos, pos = carry
        tok = jax.random.categorical(
            k, filter_logits(lg, temperature, top_k, top_p), axis=-1)
        kb, vb, rpos, new_logits = decode_step(kb, vb, rpos, pos, tok)
        return (new_logits, kb, vb, rpos, pos + 1), tok

    keys = jax.random.split(key, n_tokens)
    (logits, K, V, rpos, pos), toks = lax.scan(
        outer, (logits, ring["k"], ring["v"], ring["rpos"], ring["pos"]),
        keys)
    return toks.T, logits, dict(ring, k=K, v=V, rpos=rpos, pos=pos)
