"""Mixture-of-Experts GPT: Switch-style top-1 routed FFN, expert-parallel.

The reference's FFN is a dense 2-layer ReLU MLP
(/root/reference/ai_comps/transformer.py:102-206). This module scales that
capability the TPU-native way: each layer carries E expert FFNs and a
linear router; every token is dispatched to its top-1 expert with a
capacity bound (GShard/Switch dense-dispatch einsums — one-hot dispatch and
combine tensors, no gather/scatter, so XLA keeps everything MXU-shaped and
GSPMD can shard the expert axis over an 'ep' mesh axis, turning the
dispatch einsums into all-to-all collectives over ICI).

Routing uses the Switch Transformer load-balancing auxiliary loss
``E * sum_e f_e * P_e`` (f = fraction of tokens routed to e, P = mean
router probability); tokens over capacity are dropped (their FFN output is
zero — the residual connection carries them through).

Everything is plain differentiable jnp: jax.grad flows through router,
dispatch and experts with no custom rules needed.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..nn.functional import causal_mask, layer_norm, relu, rope_rotate, rope_tables
from .gpt import (GPTConfig, _alibi_decode_bias, _gqa_decode_attn,
                  _gqa_expand, _heads, _pick_attn_cfg,
                  _trunk_mask, _unheads, _embed)

__all__ = [
    "MoEGPTConfig",
    "init_moe_params",
    "moe_ffn",
    "moe_gpt_apply",
    "moe_gpt_loss",
]

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class MoEGPTConfig(GPTConfig):
    n_experts: int = 8
    capacity_factor: float = 1.25
    aux_weight: float = 0.01
    router_top_k: int = 1  # 1 = Switch, 2 = GShard top-2
    dispatch: str = "einsum"  # "einsum" (default) | "gather" (see moe_ffn)

    def __post_init__(self):
        super().__post_init__()
        if self.router_top_k not in (1, 2):
            raise ValueError("router_top_k must be 1 or 2")
        if self.dispatch not in ("gather", "einsum"):
            raise ValueError("dispatch must be 'gather' or 'einsum'")
        if self.router_top_k > self.n_experts:
            raise ValueError("router_top_k cannot exceed n_experts")


def init_moe_params(cfg: MoEGPTConfig, seed: int = 123) -> Params:
    """GPT params with per-layer router + stacked expert FFN weights."""
    rng = np.random.default_rng(seed)
    D, F, L, V, E = cfg.d_model, cfg.dff, cfg.n_layers, cfg.vocab_size, cfg.n_experts

    def he(fan_in, shape):
        return jnp.asarray(
            rng.normal(0.0, math.sqrt(2.0 / fan_in), size=shape), jnp.float32
        )

    KD = cfg.kv_heads * cfg.d_head  # GQA: grouped K/V projection width
    layers = {
        "ln1_g": jnp.ones((L, D), jnp.float32),
        "ln1_b": jnp.zeros((L, D), jnp.float32),
        "Wq": he(D, (L, D, D)),
        "Wk": he(D, (L, D, KD)),
        "Wv": he(D, (L, D, KD)),
        "Wo": he(D, (L, D, D)),
        "ln2_g": jnp.ones((L, D), jnp.float32),
        "ln2_b": jnp.zeros((L, D), jnp.float32),
        # router: small init so early routing is near-uniform
        "Wr": jnp.asarray(rng.normal(0.0, 0.02, size=(L, D, E)), jnp.float32),
        "W1": he(D, (L, E, D, F)),
        "b1": jnp.zeros((L, E, F), jnp.float32),
        "W2": he(F, (L, E, F, D)),
        "b2": jnp.zeros((L, E, D), jnp.float32),
    }
    if cfg.gated_ffn:  # per-expert gate branch (swiglu/geglu experts)
        layers["Wg"] = he(D, (L, E, D, F))
        layers["bg"] = jnp.zeros((L, E, F), jnp.float32)
    out = {
        "tok_W": jnp.asarray(rng.normal(0.0, 0.02, size=(V, D)), jnp.float32),
        "head_b": jnp.zeros((V,), jnp.float32),
        "layers": layers,
    }
    if cfg.pos == "learned":
        out["pos_W"] = jnp.asarray(
            rng.normal(0.0, 0.02, size=(cfg.ctx_len, D)), jnp.float32)
    return out


def _expert_mlp(xin, W1, b1, W2, b2, Wg, bg, ffn: str):
    """The per-expert position-wise MLP over dispatched slots
    ``xin`` (B, E, C, D) — relu/gelu or the gated swiglu/geglu variants
    (``Wg``/``bg`` are the per-expert gate branch, None for ungated)."""
    from ..nn.functional import geglu, gelu, swiglu

    u = jnp.einsum("becd,edf->becf", xin, W1) + b1[None, :, None, :]
    if ffn in ("swiglu", "geglu"):
        gate_fn = swiglu if ffn == "swiglu" else geglu
        h = gate_fn(u, jnp.einsum("becd,edf->becf", xin, Wg)
                    + bg[None, :, None, :])
    else:
        h = gelu(u) if ffn == "gelu" else relu(u)
    return jnp.einsum("becf,efd->becd", h, W2) + b2[None, :, None, :]


def moe_ffn(x, Wr, W1, b1, W2, b2, capacity: int,
            top_k: int = 1, mode: str = "einsum", valid=None,
            Wg=None, bg=None, ffn: str = "relu",
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k routed expert FFN (k=1 Switch, k=2 GShard), per-row GROUPS.

    x: (B, T, D); Wr: (D, E); W1: (E, D, F); b1: (E, F); W2: (E, F, D);
    b2: (E, D). Returns (out (B, T, D), aux_loss scalar). ``capacity`` is
    the static per-expert budget PER GROUP (row of x); overflow tokens get
    a zero output (the residual carries them).

    Routing each row independently (GShard-style grouping) keeps the
    dispatch LINEAR in total tokens; to route a flat token set as one
    group, reshape to (1, N, D).

    ``mode`` selects the dispatch implementation — identical semantics:

    - ``"einsum"`` (default): dense one-hot dispatch/combine tensors
      (GShard paper form). The one-hot MACs look wasteful
      (O(B·T·E·C·D)) but run on the MXU; measured at the published MoE
      config they BEAT the gather path 27.8 vs 35.5 ms/step f32 —
      TPU-style dense-over-sparse. GSPMD also turns these einsums into
      all-to-alls when the expert axis is sharded (the ep trainer).
      Slot bookkeeping runs in f32 regardless of the compute dtype
      (exact counts to 2^24 — a bf16 cumsum miscounts queue positions
      past 256 tokens, silently misrouting long contexts).
    - ``"gather"``: int32 slot->token index table + token movement as
      gathers, O(B·T·D) data movement. Loses on this chip (XLA lowers
      the (B, E, C, D) dynamic gathers poorly) but kept as the
      measured alternate; wins would be expected where E·C is huge.
    """
    B, T, D = x.shape
    E = Wr.shape[-1]
    C = capacity
    # ``valid`` (B, T) bool excludes tokens from routing entirely (their
    # output is zero; the residual carries them) — the batched serving
    # path uses it so LEFT-pad tokens never steal capacity (pads precede
    # real tokens in the positional cumsum) nor skew the aux loss.

    # Router math in f32 regardless of the compute dtype (bf16 softmax
    # perturbs routing decisions and the load-balance loss — standard
    # MoE practice keeps the router full precision).
    router_logits = (x @ Wr).astype(jnp.float32)  # (B, T, E)
    probs = jax.nn.softmax(router_logits, axis=-1)
    vals, idxs = lax.top_k(probs, top_k)         # (B, T, K)
    if top_k == 1:
        gates = vals  # Switch: the gate is the raw top-1 probability
    else:
        # GShard: renormalize so the combine is a convex mix of experts
        gates = vals / jnp.maximum(jnp.sum(vals, axis=-1, keepdims=True),
                                   1e-9)
    gates = gates.astype(x.dtype)

    # Capacity is granted level by level (GShard semantics): every token's
    # first choice queues ahead of any token's second choice, and within a
    # level priority is positional (cumsum order).  ``offset`` carries how
    # full each (group, expert) already is from earlier levels.
    if mode == "gather":
        b_ix = jnp.arange(B, dtype=jnp.int32)[:, None]  # (B, 1)
        t_ix = jnp.broadcast_to(
            jnp.arange(T, dtype=jnp.int32)[None, :], (B, T))
        # slot -> token index table; slot C is the overflow sink, token
        # index T the "empty" sentinel (both sliced/zeroed away)
        tok_slot = jnp.full((B, E, C + 1), T, jnp.int32)
        offset = jnp.zeros((B, E), jnp.int32)
        lvl_slots = []
        for lvl in range(top_k):
            e_id = idxs[..., lvl]                          # (B, T)
            oh = jax.nn.one_hot(e_id, E, dtype=jnp.int32)  # exact counts
            if valid is not None:
                oh = oh * valid[..., None].astype(jnp.int32)
            pos = jnp.cumsum(oh, axis=1) - oh              # (B, T, E)
            pos_tok = jnp.take_along_axis(
                pos, e_id[..., None], axis=-1)[..., 0]
            pos_tok = pos_tok + jnp.take_along_axis(offset, e_id, axis=1)
            slot = jnp.minimum(pos_tok, C)                 # overflow -> C
            if valid is not None:
                slot = jnp.where(valid, slot, C)           # pads -> sink
            tok_slot = tok_slot.at[b_ix, e_id, slot].set(t_ix)
            lvl_slots.append((e_id, slot))
            offset = offset + jnp.sum(oh, axis=1)
        onehot1 = jax.nn.one_hot(idxs[..., 0], E, dtype=jnp.float32)
        if valid is not None:
            onehot1 = onehot1 * valid[..., None]

        # dispatch: gather token rows into expert slots (empty -> 0 row)
        x_pad = jnp.concatenate([x, jnp.zeros((B, 1, D), x.dtype)], axis=1)
        xin = x_pad[b_ix[..., None], tok_slot[:, :, :C]]   # (B, E, C, D)
        out_e = _expert_mlp(xin, W1, b1, W2, b2, Wg, bg, ffn)
        # combine: each token reads its slot back (overflow slot C = 0 row)
        out_e_pad = jnp.concatenate(
            [out_e, jnp.zeros((B, E, 1, D), out_e.dtype)], axis=2)
        out = jnp.zeros((B, T, D), x.dtype)
        for lvl, (e_id, slot) in enumerate(lvl_slots):
            o = out_e_pad[b_ix, e_id, slot]                # (B, T, D)
            out = out + o * gates[..., lvl][..., None]
    else:
        dispatch = jnp.zeros((B, T, E, C), x.dtype)
        combine = jnp.zeros((B, T, E, C), x.dtype)
        offset = jnp.zeros((B, E), jnp.float32)
        onehot1 = None
        for lvl in range(top_k):
            # bookkeeping in f32: queue positions are COUNTS and must be
            # exact (bf16 integers saturate at 256 -> misrouting past it)
            oh = jax.nn.one_hot(idxs[..., lvl], E, dtype=jnp.float32)
            if valid is not None:
                oh = oh * valid[..., None].astype(jnp.float32)
            if lvl == 0:
                onehot1 = oh
            pos = jnp.cumsum(oh, axis=1) - oh + offset[:, None, :]
            pos_tok = jnp.sum(pos * oh, axis=-1)           # (B, T)
            keep = (pos_tok < C).astype(jnp.float32)
            slot = jax.nn.one_hot(pos_tok.astype(jnp.int32), C,
                                  dtype=jnp.float32)
            d = (oh[..., None] * slot[..., None, :]
                 * keep[..., None, None]).astype(x.dtype)  # exact 0/1
            dispatch = dispatch + d
            combine = combine + d * gates[..., lvl][..., None, None]
            offset = offset + jnp.sum(oh, axis=1)

        # dense dispatch/combine (GShard): everything stays einsum-shaped
        xin = jnp.einsum("btec,btd->becd", dispatch, x)    # (B, E, C, D)
        out_e = _expert_mlp(xin, W1, b1, W2, b2, Wg, bg, ffn)
        out = jnp.einsum("btec,becd->btd", combine, out_e)

    # Switch load-balance loss over ALL tokens: E * sum_e f_e * P_e, with f
    # the first-choice assignment fraction (GShard aux uses first choices);
    # f32 like the router, independent of the compute dtype
    if valid is None:
        f = jnp.mean(onehot1, axis=(0, 1))
        P_mean = jnp.mean(probs, axis=(0, 1))
    else:
        n_valid = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
        f = jnp.sum(onehot1, axis=(0, 1)) / n_valid
        P_mean = jnp.sum(
            probs * valid[..., None].astype(jnp.float32), axis=(0, 1)
        ) / n_valid
    aux = E * jnp.sum(f * P_mean)
    return out, aux


def _moe_layer(h_in, lp, mask, n_heads: int, attn_fn: Callable,
               rope, capacity: int, top_k: int = 1, fused: bool = False,
               mode: str = "gather", valid=None, n_kv: Optional[int] = None,
               ffn: str = "relu"):
    """Pre-LN decoder block with the dense FFN swapped for the routed MoE.

    Returns (out, (k, v), aux) — the K/V pair feeds the decode cache (at
    the grouped ``n_kv`` head count under GQA). ``fused=True`` uses the
    fused LN+QKV Pallas kernel for the attention half (the MoE FFN keeps
    its routed dispatch)."""
    n_kv = n_heads if n_kv is None else n_kv
    if fused:
        from ..nn.fused_layer import ln_qkv

        qf, kf, vf = ln_qkv(h_in, lp["ln1_g"], lp["ln1_b"],
                            lp["Wq"], lp["Wk"], lp["Wv"])
        q, k, v = (_heads(qf, n_heads), _heads(kf, n_kv),
                   _heads(vf, n_kv))
    else:
        xn = layer_norm(h_in, lp["ln1_g"], lp["ln1_b"])
        q = _heads(xn @ lp["Wq"], n_heads)
        k = _heads(xn @ lp["Wk"], n_kv)
        v = _heads(xn @ lp["Wv"], n_kv)
    if rope is not None:
        cos, sin = rope
        q = rope_rotate(q, cos, sin)
        k = rope_rotate(k, cos, sin)
    if getattr(attn_fn, "gqa_native", False):
        a = _unheads(attn_fn(q, k, v, mask)) @ lp["Wo"]
    else:
        a = _unheads(attn_fn(q, _gqa_expand(k, n_heads),
                             _gqa_expand(v, n_heads), mask)) @ lp["Wo"]
    h1 = h_in + a
    x2 = layer_norm(h1, lp["ln2_g"], lp["ln2_b"])
    f, aux = moe_ffn(x2, lp["Wr"], lp["W1"], lp["b1"], lp["W2"], lp["b2"],
                     capacity, top_k, mode, valid,
                     Wg=lp.get("Wg"), bg=lp.get("bg"), ffn=ffn)
    return h1 + f, (k, v), aux


def _capacity(cfg: MoEGPTConfig, group_tokens: int) -> int:
    """Per-expert slot budget for a routing group of ``group_tokens``;
    scales with router_top_k (top-2 dispatches ~2x the assignments)."""
    return max(1, int(math.ceil(cfg.capacity_factor * cfg.router_top_k
                                * group_tokens / cfg.n_experts)))


def moe_gpt_apply(params: Params, x_ids, cfg: MoEGPTConfig,
                  attn_fn: Optional[Callable] = None):
    """Forward: ids (B, T) -> (logits (B, T, V), mean aux loss over layers)."""
    B, T = x_ids.shape
    if attn_fn is None:
        attn_fn = _pick_attn_cfg(cfg, T)
    h, rope = _embed(params, x_ids, cfg, T)

    # mixed precision, mirroring gpt_apply: f32 masters, compute in
    # cfg.compute_dtype (the router inside moe_ffn stays f32)
    dt = cfg.compute_dtype
    h = h.astype(dt)
    if rope is not None:
        rope = (rope[0].astype(dt), rope[1].astype(dt))
    mask = _trunk_mask(cfg, T, dt)
    layers = jax.tree.map(lambda w: w.astype(dt), params["layers"])
    cap = _capacity(cfg, T)  # per-row routing groups
    from .gpt import _pick_fused

    fused = _pick_fused(B, T, cfg)

    def body(carry, lp):
        out, _, aux = _moe_layer(carry, lp, mask, cfg.n_heads, attn_fn, rope,
                                 cap, cfg.router_top_k, fused, cfg.dispatch,
                                 n_kv=cfg.kv_heads, ffn=cfg.ffn)
        return out, aux

    h, auxes = lax.scan(body, h, layers)
    logits = (h @ params["tok_W"].T.astype(dt)
              + params["head_b"].astype(dt)).astype(jnp.float32)
    return logits, jnp.mean(auxes)


def moe_gpt_loss(params: Params, x_ids, y_ids, cfg: MoEGPTConfig,
                 attn_fn: Optional[Callable] = None) -> jnp.ndarray:
    """Mean CE plus the weighted load-balancing auxiliary loss."""
    logits, aux = moe_gpt_apply(params, x_ids, cfg, attn_fn)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, y_ids[..., None], axis=-1)[..., 0]
    return jnp.mean(logz - gold) + cfg.aux_weight * aux


# ---------------------------------------------------------------------------
# KV-cached decode (mirrors models.gpt's prefill/step/chunk for the MoE)
# ---------------------------------------------------------------------------


from functools import partial as _partial  # noqa: E402

from ..nn.cache import fkv_advance, fkv_write  # noqa: E402
from ..nn.functional import sdpa, sinusoidal_encoding  # noqa: E402


@_partial(jax.jit, static_argnames=("cfg",))
def moe_prefill(params: Params, x_ids, cfg: MoEGPTConfig, length=None):
    """Run the full prompt, returning (last-position logits, filled cache).

    ``length`` is the true prompt length when x_ids is right-padded to a
    fixed shape (one XLA compile for all prompt lengths); see gpt_prefill.
    Pads cannot perturb real-token routing PRIORITY: capacity order is
    positional (the cumsum in moe_ffn), so pads — always to the right —
    only take leftover expert slots. The capacity VALUE itself scales with
    the padded T though (it is a static shape), so padding can only route
    real tokens the unpadded prompt would have dropped to overflow — never
    the reverse. The serve engine pins its equality tests against the
    window-padded prefill for exactly this reason.
    """
    B, T = x_ids.shape
    h, rope = _embed(params, x_ids, cfg, T)
    # mixed precision mirrors moe_gpt_apply: bf16 weights/activations and
    # KV cache, f32 router (inside moe_ffn) and f32 logits
    dt = cfg.compute_dtype
    h = h.astype(dt)
    if rope is not None:
        rope = (rope[0].astype(dt), rope[1].astype(dt))
    mask = _trunk_mask(cfg, T, dt)
    layers = jax.tree.map(lambda w: w.astype(dt), params["layers"])
    cap = _capacity(cfg, T)  # per-row routing groups

    def body(carry, lp):
        out, (k, v), _ = _moe_layer(carry, lp, mask, cfg.n_heads, sdpa,
                                    rope, cap, cfg.router_top_k,
                                    mode=cfg.dispatch, n_kv=cfg.kv_heads,
                                    ffn=cfg.ffn)
        return out, (k, v)

    h, (K, V) = lax.scan(body, h, layers)
    if length is None:
        last = h[:, -1]
        n = jnp.asarray(T, jnp.int32)
    else:
        n = jnp.asarray(length, jnp.int32)
        last = h[jnp.arange(B), n - 1]
    logits = (last @ params["tok_W"].T.astype(dt)
              + params["head_b"].astype(dt)).astype(jnp.float32)
    pad = cfg.ctx_len - T
    K = jnp.pad(K, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
    V = jnp.pad(V, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
    return logits, {"k": K, "v": V, "length": n}


@_partial(jax.jit, static_argnames=("cfg",))
def moe_prefill_batched(params: Params, x_ids, start, cfg: MoEGPTConfig):
    """Batched serving prefill for the MoE GPT (see gpt_prefill_batched).

    Beyond the dense version, LEFT-pad tokens are excluded from expert
    ROUTING via the ``valid`` mask — pads precede real tokens in the
    capacity cumsum and would otherwise steal every early slot.
    """
    B, W = x_ids.shape
    dt = cfg.compute_dtype
    start = jnp.asarray(start, jnp.int32)
    cols = jnp.arange(W)
    pos_idx = jnp.maximum(cols[None, :] - start[:, None], 0)
    valid = cols[None, :] >= start[:, None]  # (B, W)
    rope = None
    if cfg.pos == "rope":
        h = params["tok_W"][x_ids]
        c, s_ = rope_tables(cfg.d_head, pos_idx)
        rope = (c[:, None].astype(dt), s_[:, None].astype(dt))
    elif cfg.pos == "alibi":
        h = params["tok_W"][x_ids]
    else:
        pe = (params["pos_W"] if cfg.pos == "learned"
              else sinusoidal_encoding(cfg.ctx_len, cfg.d_model))
        h = params["tok_W"][x_ids] + pe[pos_idx]
    h = h.astype(dt)
    live = (cols[None, :, None] >= cols[None, None, :]) & (
        cols[None, None, :] >= start[:, None, None])
    if cfg.window is not None:  # sliding-window band (column-relative)
        live &= (cols[None, :, None] - cols[None, None, :]) < cfg.window
    mask = jnp.where(live, 0.0, -1e9).astype(dt)[:, None]
    if cfg.pos == "alibi":
        from ..nn.positional import alibi_slopes
        sl = alibi_slopes(cfg.n_heads)
        bias = sl[:, None, None] * (
            cols[None, None, :] - cols[None, :, None]).astype(jnp.float32)
        mask = mask + bias.astype(dt)[None]  # (B, H, W, W)
    layers = jax.tree.map(lambda w: w.astype(dt), params["layers"])
    cap = _capacity(cfg, W)

    def body(carry, lp):
        out, (k, v), _ = _moe_layer(carry, lp, mask, cfg.n_heads, sdpa,
                                    rope, cap, cfg.router_top_k,
                                    mode=cfg.dispatch, valid=valid,
                                    n_kv=cfg.kv_heads, ffn=cfg.ffn)
        return out, (k, v)

    h, (K, V) = lax.scan(body, h, layers)
    logits = (h[:, -1] @ params["tok_W"].T.astype(dt)
              + params["head_b"].astype(dt)).astype(jnp.float32)
    pad = cfg.ctx_len - W
    K = jnp.pad(K, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
    V = jnp.pad(V, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
    return logits, {"k": K, "v": V, "length": jnp.asarray(W, jnp.int32),
                    "start": start}


@_partial(jax.jit, static_argnames=("cfg",))
def moe_decode_step(params: Params, cache, token, cfg: MoEGPTConfig):
    """One incremental decode step for the MoE GPT: O(T) per token, with
    the single live token routed to its top-1 expert."""
    pos = cache["length"]
    dt = cfg.compute_dtype
    start = cache.get("start", jnp.zeros((), jnp.int32))
    rel = jnp.atleast_1d(pos - start)  # logical positions (1,) or (B,)
    if cfg.pos == "rope":
        h = params["tok_W"][token][:, None, :]
        c, s_ = rope_tables(cfg.d_head, rel[:, None])
        rope = (c[:, None].astype(dt), s_[:, None].astype(dt))
    elif cfg.pos == "alibi":
        h = params["tok_W"][token][:, None, :]
        rope = None
    else:
        pe = (params["pos_W"] if cfg.pos == "learned"
              else sinusoidal_encoding(cfg.ctx_len, cfg.d_model))
        h = params["tok_W"][token][:, None, :] + pe[rel][:, None, :]
        rope = None
    h = h.astype(dt)
    layers = jax.tree.map(lambda w: w.astype(dt), params["layers"])
    cap = _capacity(cfg, 1)  # one live token per routing group (row)

    t_ids = jnp.arange(cfg.ctx_len)
    live = (t_ids[None, :] <= pos) & (
        t_ids[None, :] >= jnp.atleast_1d(start)[:, None])
    if cfg.window is not None:
        live &= t_ids[None, :] > pos - cfg.window
    attn_mask = (jnp.where(live, 0.0, -1e9).astype(dt)[:, None, None, :]
                 + _alibi_decode_bias(cfg, t_ids, pos, dt))

    def body(carry, xs):
        h_in = carry
        lp, k_l, v_l = xs
        xn = layer_norm(h_in, lp["ln1_g"], lp["ln1_b"])
        q = _heads(xn @ lp["Wq"], cfg.n_heads)
        k = _heads(xn @ lp["Wk"], cfg.kv_heads)
        v = _heads(xn @ lp["Wv"], cfg.kv_heads)
        if rope is not None:
            cos, sin = rope
            q = rope_rotate(q, cos, sin)
            k = rope_rotate(k, cos, sin)
        k_l, v_l = fkv_write(k_l, v_l, pos, k, v)
        a = _unheads(_gqa_decode_attn(q, k_l, v_l, attn_mask)) @ lp["Wo"]
        h1 = h_in + a
        x2 = layer_norm(h1, lp["ln2_g"], lp["ln2_b"])
        f, _ = moe_ffn(x2, lp["Wr"], lp["W1"], lp["b1"], lp["W2"],
                       lp["b2"], cap, cfg.router_top_k, cfg.dispatch,
                       Wg=lp.get("Wg"), bg=lp.get("bg"), ffn=cfg.ffn)
        return h1 + f, (k_l, v_l)

    h, (K, V) = lax.scan(body, h, (layers, cache["k"], cache["v"]))
    logits = (h[:, -1] @ params["tok_W"].T.astype(dt)
              + params["head_b"].astype(dt)).astype(jnp.float32)
    new_cache = fkv_advance(dict(cache, k=K, v=V, length=pos), 1)
    return logits, new_cache


def _moe_decode_ops(params: Params, cfg: MoEGPTConfig):
    """Hoisted MoE decode ops for ``models.gpt._decode_chunk_core``.

    The attention half is identical to the dense ``_dt_decode_ops`` twin
    (PE table, dtype casts, and the concatenated (D, 3D) QKV matrix hoisted
    out of the per-token scan — worth ~9x single-stream throughput on the
    v5e); the FFN is the routed ``moe_ffn`` with a one-token-per-row
    routing group (each sequence routes its live token independently, so
    per-slot serving positions need no extra handling).
    """
    dt = cfg.compute_dtype
    layers = jax.tree.map(lambda w: w.astype(dt), params["layers"])
    W3 = jnp.concatenate(
        [layers["Wq"], layers["Wk"], layers["Wv"]], axis=-1)  # (L, D, 3D)
    tokW = params["tok_W"].astype(dt)
    head_b = params["head_b"].astype(dt)
    pe = None
    if cfg.pos not in ("rope", "alibi"):
        pe = (params["pos_W"] if cfg.pos == "learned"
              else sinusoidal_encoding(cfg.ctx_len, cfg.d_model)).astype(dt)
    cap = _capacity(cfg, 1)
    return {
        "lws": {"lp": layers, "W3": W3},
        "embed": lambda token: tokW[token][:, None, :],
        "pe": (None if pe is None else
               lambda rel: pe[jnp.minimum(rel, cfg.ctx_len - 1)][:, None, :]),
        "ln1": lambda lw, x: layer_norm(x, lw["lp"]["ln1_g"],
                                        lw["lp"]["ln1_b"]),
        "qkv": lambda lw, xn: xn @ lw["W3"],
        "out": lambda lw, y: y @ lw["lp"]["Wo"],
        "ln2": lambda lw, x: layer_norm(x, lw["lp"]["ln2_g"],
                                        lw["lp"]["ln2_b"]),
        "ffn": lambda lw, x2: moe_ffn(
            x2, lw["lp"]["Wr"], lw["lp"]["W1"], lw["lp"]["b1"],
            lw["lp"]["W2"], lw["lp"]["b2"], cap, cfg.router_top_k,
            cfg.dispatch, Wg=lw["lp"].get("Wg"), bg=lw["lp"].get("bg"),
            ffn=cfg.ffn)[0],
        "head": lambda h: (h @ tokW.T + head_b).astype(jnp.float32),
    }


@_partial(jax.jit, static_argnames=("cfg", "n_tokens", "top_k"))
def moe_decode_chunk(params, cache, logits, key, cfg: MoEGPTConfig,
                     n_tokens: int, temperature=1.0, top_k: int = 0,
                     top_p=0.0):
    """Sample ``n_tokens`` autoregressively in ONE device computation —
    the MoE instantiation of ``models.gpt._decode_chunk_core`` (see
    ``_moe_decode_ops`` for the hoisting story)."""
    from .gpt import _decode_chunk_core

    ops = _moe_decode_ops(params, cfg)
    start = cache.get("start", jnp.zeros((), jnp.int32))
    toks, logits, K, V, pos = _decode_chunk_core(
        cfg, ops, logits, cache["k"], cache["v"], cache["length"], start,
        key, n_tokens, temperature, top_k, top_p, fkv_write)
    return toks, logits, dict(cache, k=K, v=V, length=pos)
