"""Speculative decoding INSIDE the continuous-batching engine.

``models.speculative`` proves the single-stream case: draft S-1 tokens,
verify them in ONE block forward, emit 1..S tokens per round with the
target sampler's exact distribution. This module lifts that into the slot
engine, where it composes with continuous batching — the round-3/4
verdicts' top ask. The ingredients the slot engine already had:

- PER-SLOT cache positions (``cache["pos"]``) — per-slot acceptance
  counts become per-slot position advances;
- a per-slot block write (``fkv_write_slots`` with t=S rows: one
  contiguous DUS block per slot);
- the block verifier's math (``models.speculative._draft_lookup`` and the
  point-mass rejection step), applied batched over slots.

Each engine "chunk" runs ``n_rounds`` speculative rounds in one device
dispatch. A round, per slot: look up S-1 draft tokens from the slot's
on-device token history (prompt-lookup n-gram copying — char text is
repetitive), run ONE (B, S) block forward at per-slot positions, accept
the longest prefix of drafts under the slot's own temperature/top-k/top-p
filtered target distribution, resample on first rejection. Slots advance
by DIFFERENT amounts; a per-(slot, round) ``valid`` count rides back to
the host so it can track counts and retire completed budgets. Both the
tokens AND the valid counts copy device->host ASYNC: the engine drains
valid copies lazily in dispatch order (``ServeEngine._drain_spec``) —
blocking on the tiny array per chunk costs a full host round trip
(~40 ms through this runtime's tunnel; measured 4x engine slowdown),
while lazy draining only delays retirement by the copies in flight,
which the device-side budget gate makes safe.

Budget gating runs ON DEVICE: a slot whose emitted count reached its
budget stops advancing (rounds still execute at fixed shape; its writes
re-land harmlessly at its frozen position), which bounds every active
slot's peak cache row to plen + budget + 2S — the reservation
``submit()`` checks. The emitted stream of every request is distributed
IDENTICALLY to the plain engine's sampler (exact point-mass rejection
sampling; greedy output is bit-equal — pinned by tests/test_spec_serve).

The verify block consumes the engine's ``select_decode_ops`` dict (the
same weight-representation seam the plain decode chunk scans with), so
speculative batching composes with the per-slot multi-LoRA side-path —
and with the paged pool via ``write_fn``/``read_fn`` (layout and weight
representation never touch each other).

Precision note (TPU): greedy bit-equality with the plain engine holds
exactly on CPU and on TPU under ``jax.default_matmul_precision
("highest")``. At the TPU's DEFAULT bf16-truncated matmul precision,
the (B, S) verify block and the (B, 1) decode step accumulate
differently (different tilings of mathematically equal contractions),
so an UNTRAINED model's near-tie argmaxes can flip (measured: 2 flips
in ~250 tokens, deterministic, lengths exact) — the property every
speculative verifier has; both streams follow the same sampler law.

Reference: extends /root/reference/gpt.py:518-546's sampler semantics;
per-slot verification follows Leviathan et al. 2023 specialized to the
deterministic drafter, as models/speculative.py does for one stream.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..models.gpt import (
    GPTConfig,
    _gqa_decode_attn,
    _heads,
    _unheads,
    filter_logits,
)
from ..models.speculative import _draft_lookup
from ..nn.cache import fkv_write_slots
from ..nn.functional import rope_rotate, rope_tables

__all__ = ["decode_chunk_spec", "spec_cache_fields"]


def spec_cache_fields(cfg: GPTConfig, n_slots: int):
    """Extra engine-cache leaves for speculative mode: the per-slot token
    history (drafting source), the pending sampled-but-unprocessed token,
    and the emitted count (device-side budget gate)."""
    return {
        "hist": jnp.zeros((n_slots, cfg.ctx_len), jnp.int32),
        "pending": jnp.zeros((n_slots,), jnp.int32),
        "emitted": jnp.zeros((n_slots,), jnp.int32),
    }


def _block_step_slots(ops, cfg: GPTConfig, kbuf, vbuf, pos, tokens,
                      S: int, write_fn=None, read_fn=None):
    """One (B, S) block forward at PER-SLOT positions ``pos`` (B,).

    The batched twin of ``models.speculative.gpt_decode_block``: slot b's
    S rows land at cache rows [pos_b, pos_b + S) (``fkv_write_slots``'s
    contiguous per-slot DUS branch) and row r attends causally over
    j <= pos_b + r. Returns (logits (B, S, V), K, V). Positions are the
    caller's responsibility to keep in range (the engine's budget gate);
    the write clamps like a DUS for idle slots.

    ``ops`` is the engine's weight-representation dispatch
    (``serve.engine.select_decode_ops`` — the same dict the plain decode
    chunk scans with), which is what lets speculative batching compose
    with the per-slot multi-LoRA side-path: every callback is
    shape-polymorphic in the token axis, so the (B, 1, D) decode forms
    apply unchanged at (B, S, D). The one-token ``embed``/``pe``
    callbacks ((B,) -> (B, 1, D)) are vmapped over the S block axis.

    ``write_fn``/``read_fn`` re-seat the cache layout: the paged spec
    engine passes a page-table block scatter and a table-gather view
    (pool pages in, (B, hk, ctx, d) out) — defaults are the dense slot
    layout (fkv_write_slots / identity).
    """
    if write_fn is None:
        write_fn = fkv_write_slots
    if read_fn is None:
        read_fn = lambda x: x
    dt = cfg.compute_dtype
    D = cfg.d_model
    KD = cfg.kv_heads * cfg.d_head
    B = tokens.shape[0]
    offs = jnp.arange(S, dtype=jnp.int32)
    rel = pos[:, None] + offs[None, :]  # (B, S) absolute positions

    h = jnp.squeeze(
        jax.vmap(ops["embed"], in_axes=1, out_axes=2)(tokens), axis=1)
    rope = None
    if cfg.pos == "rope":
        c, s_ = rope_tables(cfg.d_head, rel)  # (B, S, d/2)
        rope = (c[:, None].astype(dt), s_[:, None].astype(dt))
    elif cfg.pos != "alibi":
        h = h + jnp.squeeze(
            jax.vmap(ops["pe"], in_axes=1, out_axes=2)(rel), axis=1)
    h = h.astype(dt)

    t_ids = jnp.arange(cfg.ctx_len)
    # row r of slot b attends to cache rows j <= pos_b + r
    live = t_ids[None, None, :] <= rel[:, :, None]  # (B, S, ctx)
    if cfg.window is not None:
        live &= t_ids[None, None, :] > rel[:, :, None] - cfg.window
    mask = jnp.where(live, 0.0, -1e9).astype(dt)[:, None]  # (B, 1, S, ctx)
    if cfg.pos == "alibi":
        from ..nn.positional import alibi_slopes

        sl = alibi_slopes(cfg.n_heads)
        dist = (t_ids[None, None, :] - rel[:, :, None]).astype(jnp.float32)
        mask = mask + (sl[None, :, None, None]
                       * dist[:, None]).astype(dt)  # (B, H, S, ctx)

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
        k_l, v_l = write_fn(k_l, v_l, pos, k.astype(dt), v.astype(dt))
        a = ops["out"](lw, _unheads(
            _gqa_decode_attn(q, read_fn(k_l), read_fn(v_l), mask)))
        h1 = h_in + a
        f = ops["ffn"](lw, ops["ln2"](lw, h1))
        return h1 + f, (k_l, v_l)

    h, (K, V) = lax.scan(body, h, (ops["lws"], kbuf, vbuf))
    return ops["head"](h), K, V


@partial(jax.jit, static_argnames=("cfg", "n_rounds", "n_draft"))
def decode_chunk_spec(params, cache, key, temp, top_p, top_k, budget,
                      cfg: GPTConfig, n_rounds: int, n_draft: int):
    """Run ``n_rounds`` per-slot speculative rounds in ONE dispatch.

    ``cache``: the slot cache plus ``spec_cache_fields`` leaves.
    ``temp``/``top_p``/``top_k``: (B,) per-slot sampling vectors (traced).
    ``budget``: (B,) int32 per-slot max_new_tokens — the device-side gate:
    a slot stops advancing once ``emitted >= budget`` (its rounds become
    no-ops at fixed shape), so positions stay inside the submit-time
    reservation.

    Returns (toks (B, n_rounds, S), valid (B, n_rounds), cache') where
    ``valid[b, r]`` is how many of round r's S token rows slot b really
    emitted (0 for gated/idle slots). Greedy output is bit-equal to the
    plain engine's; sampled output follows the identical distribution
    (exact point-mass rejection sampling per slot).
    """
    S = n_draft + 1
    B = cache["pos"].shape[0]
    dt = cfg.compute_dtype
    paged = "table" in cache  # paged spec engine: pool + per-slot tables
    if paged:
        table = cache["table"]  # (B, Pmax) — loop-invariant in a chunk
        page = cache["pool_k"].shape[3]
        ctx = cfg.ctx_len
        bidx_p = jnp.arange(B)
        offs_p = jnp.arange(S)

        def write_fn(pk_l, pv_l, pos, k, v):
            # S rows per slot scattered at (page, row) addresses through
            # the table — the flat single-leading-index form of
            # serve/paged.py::write_paged generalized to a block
            p = jnp.minimum(pos[:, None] + offs_p[None, :], ctx - 1)
            pidx = table[bidx_p[:, None], p // page]          # (B, S)
            row = p % page
            n_pg, hk, pg, d = pk_l.shape
            ridx = ((pidx[:, None, :] * hk
                     + jnp.arange(hk)[None, :, None]) * pg
                    + row[:, None, :]).reshape(-1)            # (B*hk*S,)

            def put(buf, new):  # new: (B, hk, S, d)
                flat = buf.reshape(n_pg * hk * pg, d)
                return flat.at[ridx].set(
                    new.reshape(-1, d)).reshape(buf.shape)

            return put(pk_l, k), put(pv_l, v)

        def read_fn(pool):  # (n_pages, hk, page, d) -> (B, hk, ctx, d)
            x = jnp.swapaxes(pool[table], 1, 2)
            return x.reshape(B, x.shape[1], ctx, x.shape[-1])

        kbuf0, vbuf0 = cache["pool_k"], cache["pool_v"]
    else:
        write_fn = read_fn = None
        kbuf0, vbuf0 = cache["k"], cache["v"]
    from .engine import select_decode_ops

    ops = select_decode_ops(params, cfg, cache)

    temp = jnp.asarray(temp, jnp.float32)[:, None, None]  # vs (B, S, V)
    top_p = jnp.asarray(top_p, jnp.float32)[:, None, None]
    top_k = jnp.asarray(top_k, jnp.int32)  # (B,) -> broadcast in filter
    budget = jnp.asarray(budget, jnp.int32)
    bidx = jnp.arange(B)

    def round_body(carry, key_r):
        kbuf, vbuf, pos, hist, pending, emitted = carry
        kacc, krep = jax.random.split(key_r)
        gate = emitted < budget  # (B,) slots still working

        # draft S-1 tokens per slot from its own history (hlen = pos + 1:
        # pos rows processed + the pending token)
        drafts = jax.vmap(_draft_lookup, in_axes=(0, 0, None))(
            hist, pos + 1, S - 1)  # (B, S-1)
        block = jnp.concatenate([pending[:, None], drafts], axis=1)  # (B,S)
        logits, kbuf, vbuf = _block_step_slots(
            ops, cfg, kbuf, vbuf, pos, block, S, write_fn, read_fn)
        z = filter_logits(logits, temp, top_k, top_p)  # (B, S, V)
        probs = jax.nn.softmax(z, axis=-1)

        # accept draft i iff u_i < p_i(draft_i) AND all earlier accepted
        u = jax.random.uniform(kacc, (B, S - 1))
        p_draft = probs[bidx[:, None], jnp.arange(S - 1)[None], drafts]
        ok = (u < p_draft).astype(jnp.int32)
        n_acc = jnp.argmin(
            jnp.concatenate([ok, jnp.zeros((B, 1), jnp.int32)], axis=1),
            axis=1).astype(jnp.int32)  # (B,) in [0, S-1]
        all_ok = n_acc == (S - 1)
        d_rej = drafts[bidx, jnp.minimum(n_acc, S - 2)]
        z_acc = z[bidx, n_acc]  # (B, V) row supplying the sampled token
        z_fix = z_acc.at[bidx, d_rej].set(
            jnp.where(all_ok, z_acc[bidx, d_rej], -jnp.inf))
        extra = jax.random.categorical(krep, z_fix, axis=-1).astype(
            jnp.int32)  # bonus draw when all accepted, residual otherwise

        # emit n_acc accepted drafts then the sampled token
        emit = jnp.concatenate([drafts, extra[:, None]], axis=1)  # (B, S)
        cols = jnp.arange(S)[None, :]
        emit = jnp.where(cols > n_acc[:, None], 0, emit)
        emit = emit.at[bidx, n_acc].set(extra)
        adv = jnp.where(gate, n_acc + 1, 0)  # gated slots freeze

        # write the emitted rows into the history at hlen = pos + 1 (the
        # flattened single-index scatter form; rows past adv untouched)
        widx = ((bidx[:, None] * cfg.ctx_len)
                + jnp.minimum(pos[:, None] + 1 + cols,
                              cfg.ctx_len - 1)).reshape(-1)
        keep = (cols < adv[:, None]).reshape(-1)
        flat = hist.reshape(-1)
        hist = flat.at[widx].set(
            jnp.where(keep, emit.reshape(-1), flat[widx])).reshape(
                B, cfg.ctx_len)

        pending = jnp.where(gate, emit[bidx, n_acc], pending)
        pos = pos + adv
        emitted = emitted + adv
        return (kbuf, vbuf, pos, hist, pending, emitted), (emit, adv)

    keys = jax.random.split(key, n_rounds)
    (K, V, pos, hist, pending, emitted), (toks, valid) = lax.scan(
        round_body,
        (kbuf0, vbuf0, cache["pos"], cache["hist"], cache["pending"],
         cache["emitted"]),
        keys)
    kv = ({"pool_k": K, "pool_v": V} if paged else {"k": K, "v": V})
    cache = dict(cache, pos=pos, hist=hist, pending=pending,
                 emitted=emitted, **kv)
    # scan stacks on the leading axis: (rounds, B, S) -> (B, rounds, S)
    return toks.transpose(1, 0, 2), valid.T, cache
