"""Pipeline parallelism: GPipe-style microbatch schedule over a 'pp' axis.

The GPT's layer stack is already a leading-axis pytree (L, ...) scanned by
``gpt_apply``; pipeline parallelism shards that leading axis over a 'pp'
mesh axis so each device owns ``n_layers/pp`` contiguous blocks, then runs
the classic SPMD pipeline inside ``shard_map``: every tick each stage runs
its layers on the microbatch it holds and hands the activation to the next
stage with ``lax.ppermute``. After ``M + S - 1`` ticks all ``M``
microbatches have drained; the last stage accumulates the CE loss as
microbatches retire, and gradients flow through ``jax.grad`` unchanged
(ppermute's transpose is the reverse rotation — the backward pipeline runs
the same schedule mirrored, for free).

Embeddings and the weight-tied head are replicated: stage 0 consumes the
embedding, the last stage the head, and the psum over 'pp' merges their
tok_W gradient contributions.

Reference has no parallelism (SURVEY §2.5); this is the TPU-native
expression of depth scaling for its GPT (/root/reference/gpt.py:192-215,
a Python loop over layers) when one chip's HBM can't hold the stack.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.gpt import GPTConfig, _layer, _pick_attn_cfg, _trunk_mask
from ..nn.functional import causal_mask, rope_tables, sinusoidal_encoding

__all__ = [
    "pp_param_specs",
    "make_pp_loss",
    "make_pp_train_step",
    "make_pp_1f1b_grads",
    "make_pp_1f1b_train_step",
    "make_pp_device_train_step",
    "make_pp_eval",
]


def pp_param_specs(dp: Optional[str] = None) -> dict:
    """PartitionSpecs for the GPT pytree under pipeline parallelism: the
    stacked layer axis sharded on 'pp', embeddings/head replicated."""
    def layer_spec(ndim_tail: int) -> P:
        return P(*(("pp",) + (None,) * ndim_tail))

    layer_specs = {
        "ln1_g": layer_spec(1), "ln1_b": layer_spec(1),
        "Wq": layer_spec(2), "Wk": layer_spec(2), "Wv": layer_spec(2),
        "Wo": layer_spec(2),
        "ln2_g": layer_spec(1), "ln2_b": layer_spec(1),
        "W1": layer_spec(2), "b1": layer_spec(1),
        "W2": layer_spec(2), "b2": layer_spec(1),
    }
    return {"tok_W": P(), "head_b": P(), "layers": layer_specs}


def _pp_local_loss(cfg: GPTConfig, n_microbatches: int, attn_fn,
                   dp_axis: Optional[str]):
    """Device-local pipelined loss body (runs inside shard_map).

    params['layers'] leaves arrive with the local (L/S, ...) stage slice;
    x/y arrive (B_local, T). Returns the GLOBAL mean CE (psum'd), so every
    device's jax.grad sees the same scalar.
    """
    M = n_microbatches

    def local_loss(params, x, y):
        S = lax.axis_size("pp")
        stage = lax.axis_index("pp")
        B, T = x.shape
        mb = B // M
        x_mb = x.reshape(M, mb, T)
        y_mb = y.reshape(M, mb, T)
        dt = cfg.compute_dtype  # bf16 also halves the ppermute ICI bytes
        mask = _trunk_mask(cfg, T, dt)
        tok_W = params["tok_W"]
        layers = jax.tree.map(lambda w: w.astype(dt), params["layers"])
        D = tok_W.shape[1]

        if cfg.pos == "rope":
            r32 = rope_tables(cfg.d_head, jnp.arange(T))
            rope = (r32[0].astype(dt), r32[1].astype(dt))
            pe = None
        elif cfg.pos == "alibi":
            rope = None
            pe = None  # position rides in the per-head mask bias
        else:
            rope = None
            pe = sinusoidal_encoding(cfg.ctx_len, cfg.d_model)[:T]

        def embed(m_idx):
            ids = x_mb[jnp.clip(m_idx, 0, M - 1)]
            h = tok_W[ids]
            return (h if pe is None else h + pe[None]).astype(dt)

        def run_stage(h):
            def body(c, lp):
                out, _ = _layer(c, lp, mask, cfg.n_heads, attn_fn, rope,
                                n_kv=cfg.kv_heads, ffn=cfg.ffn)
                return out, None
            out, _ = lax.scan(body, h, layers)
            return out

        perm = [(i, i + 1) for i in range(S - 1)]  # stage i -> i+1, no wrap

        def tick(carry, t):
            state, loss_sum = carry
            h_in = jnp.where(stage == 0, embed(t), state)
            h_out = run_stage(h_in)
            # microbatch retiring at the last stage this tick
            m_idx = t - (S - 1)
            yb = y_mb[jnp.clip(m_idx, 0, M - 1)]
            logits = (h_out @ tok_W.T.astype(dt)
                      + params["head_b"].astype(dt)).astype(jnp.float32)
            logz = jax.nn.logsumexp(logits, axis=-1)
            gold = jnp.take_along_axis(logits, yb[..., None], axis=-1)[..., 0]
            ce = jnp.sum(logz - gold)
            valid = jnp.logical_and(stage == S - 1, m_idx >= 0)
            loss_sum = loss_sum + jnp.where(valid, ce, 0.0)
            state = lax.ppermute(h_out, "pp", perm)
            return (state, loss_sum), None

        init = (jnp.zeros((mb, T, D), dt), jnp.float32(0.0))
        (_, loss_sum), _ = lax.scan(tick, init, jnp.arange(M + S - 1))

        axes = ("pp",) if dp_axis is None else (dp_axis, "pp")
        total = lax.psum(loss_sum, axes)
        n_tok = M * mb * T * (lax.axis_size(dp_axis) if dp_axis else 1)
        return total / n_tok

    return local_loss


def _pp_loss_raw(cfg: GPTConfig, mesh: Mesh, n_microbatches: int,
                 dp_axis: Optional[str]):
    """Unjitted shard_map'd pipeline loss (params, x, y) -> scalar."""
    assert cfg.n_layers % mesh.shape["pp"] == 0, (
        "n_layers must divide by the pp axis size"
    )
    attn_fn = _pick_attn_cfg(cfg, cfg.ctx_len)
    local = _pp_local_loss(cfg, n_microbatches, attn_fn, dp_axis)
    pspecs = pp_param_specs(dp_axis)
    batch_spec = P(dp_axis, None)
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(pspecs, batch_spec, batch_spec),
        out_specs=P(),
        check_vma=False,
    )


def make_pp_loss(cfg: GPTConfig, mesh: Mesh, n_microbatches: int, *,
                 dp_axis: Optional[str] = None):
    """jitted (params, x, y) -> loss over a pipeline mesh.

    ``mesh`` must have a 'pp' axis whose size divides cfg.n_layers, and the
    global batch must divide by n_microbatches (times dp if given).
    """
    pspecs = pp_param_specs(dp_axis)
    sharded = _pp_loss_raw(cfg, mesh, n_microbatches, dp_axis)
    param_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs,
                            is_leaf=lambda v: isinstance(v, P))
    batch_sh = NamedSharding(mesh, P(dp_axis, None))
    return jax.jit(sharded, in_shardings=(param_sh, batch_sh, batch_sh),
                   out_shardings=NamedSharding(mesh, P()))


def _pp_1f1b_local(cfg: GPTConfig, n_microbatches: int, attn_fn,
                   dp_axis: Optional[str]):
    """Device-local 1F1B pipeline returning (loss, grads) directly.

    Unlike ``_pp_local_loss`` (whose backward is jax.grad's transpose of
    the forward scan — stashing one stage-input per tick, O(M + S)
    activations), this schedules forward AND backward slots explicitly and
    keeps a ring of only ``2S - 1`` stage-input activations per device, so
    activation memory is O(S) — independent of the microbatch count.  The
    per-stage backward recomputes the stage forward from the stashed input
    (Megatron-style 1F1B + activation recomputation): ~1.5x the
    stage-compute of the GPipe path for an O(M/S) activation-memory cut.

    Schedule (double-pumped ticks; each tick = one fwd slot + one bwd
    slot per stage):  stage s forwards microbatch ``t - s`` and backwards
    microbatch ``t - (2S - 2 - s)``; activations ppermute up, gradient
    cotangents ppermute down, and everything drains in ``M + 2S - 2``
    ticks.
    """
    M = n_microbatches

    def local(params, x, y):
        S = lax.axis_size("pp")
        stage = lax.axis_index("pp")
        B, T = x.shape
        mb = B // M
        R = 2 * S - 1  # ring slots: fwd->bwd distance at stage 0 is 2S-2
        x_mb = x.reshape(M, mb, T)
        y_mb = y.reshape(M, mb, T)
        mask = _trunk_mask(cfg, T, jnp.float32)
        D = params["tok_W"].shape[1]
        n_tok = M * mb * T * (lax.axis_size(dp_axis) if dp_axis else 1)

        if cfg.pos == "rope":
            rope = rope_tables(cfg.d_head, jnp.arange(T))
            pe = None
        elif cfg.pos == "alibi":
            rope = None
            pe = None  # position rides in the per-head mask bias
        else:
            rope = None
            pe = sinusoidal_encoding(cfg.ctx_len, cfg.d_model)[:T]

        def embed(m_idx):
            ids = x_mb[jnp.clip(m_idx, 0, M - 1)]
            h = params["tok_W"][ids]
            return h if pe is None else h + pe[None]

        def stage_fwd_ce(p, h_in, yb):
            """Stage forward plus (masked-at-seed-time) head CE sum.

            One function for every stage keeps the SPMD trace uniform: the
            head/CE part only contributes to gradients when its cotangent
            seed is nonzero (last stage).  Compute runs in
            cfg.compute_dtype; the pipeline buffers/cotangents stay f32
            (params are f32 masters, so vjp grads come out f32).
            """
            dt = cfg.compute_dtype
            mask_dt = mask.astype(dt)
            rope_dt = (None if rope is None
                       else (rope[0].astype(dt), rope[1].astype(dt)))
            layers = jax.tree.map(lambda w: w.astype(dt), p["layers"])

            def body(c, lp):
                out, _ = _layer(c, lp, mask_dt, cfg.n_heads, attn_fn,
                                rope_dt, n_kv=cfg.kv_heads, ffn=cfg.ffn)
                return out, None

            h_out, _ = lax.scan(body, h_in.astype(dt), layers)
            logits = (h_out @ p["tok_W"].T.astype(dt)
                      + p["head_b"].astype(dt)).astype(jnp.float32)
            logz = jax.nn.logsumexp(logits, axis=-1)
            gold = jnp.take_along_axis(logits, yb[..., None],
                                       axis=-1)[..., 0]
            return h_out.astype(jnp.float32), jnp.sum(logz - gold)

        up = [(i, i + 1) for i in range(S - 1)]
        down = [(i + 1, i) for i in range(S - 1)]
        is_last = stage == S - 1

        zero_grads = jax.tree.map(jnp.zeros_like, params)

        def tick(carry, t):
            state_f, state_b, stash, grads, ce_sum = carry

            # ---- forward slot: microbatch t - stage
            m_f = t - stage
            valid_f = jnp.logical_and(m_f >= 0, m_f < M)
            h_in = jnp.where(stage == 0, embed(m_f), state_f)
            slot_f = jnp.mod(m_f, R)
            stash = lax.dynamic_update_index_in_dim(
                stash,
                jnp.where(valid_f, h_in, lax.dynamic_index_in_dim(
                    stash, slot_f, keepdims=False)),
                slot_f, axis=0)
            h_out, _ = stage_fwd_ce(params, h_in,
                                    y_mb[jnp.clip(m_f, 0, M - 1)])
            state_f = lax.ppermute(h_out, "pp", up)

            # ---- backward slot: microbatch t - (2S - 2 - stage)
            m_b = t - (2 * S - 2 - stage)
            valid_b = jnp.logical_and(m_b >= 0, m_b < M)
            h_stash = lax.dynamic_index_in_dim(stash, jnp.mod(m_b, R),
                                               keepdims=False)
            yb = y_mb[jnp.clip(m_b, 0, M - 1)]
            (_, ce), vjp_fn = jax.vjp(
                lambda p, h: stage_fwd_ce(p, h, yb), params, h_stash)
            g_in = jnp.where(is_last, jnp.float32(0.0), state_b)
            seed = jnp.where(is_last, 1.0 / n_tok,
                             0.0).astype(jnp.float32)
            gP, gH = vjp_fn((g_in, seed))
            gP = jax.tree.map(
                lambda g: jnp.where(valid_b, g, 0.0), gP)
            # stage 0 consumed the embedding: fold d tok_W from the ids
            emb_ok = jnp.logical_and(stage == 0, valid_b)
            ids_b = x_mb[jnp.clip(m_b, 0, M - 1)]
            gP["tok_W"] = gP["tok_W"] + jnp.where(
                emb_ok,
                jnp.zeros_like(gP["tok_W"]).at[ids_b].add(gH),
                0.0)
            grads = jax.tree.map(jnp.add, grads, gP)
            ce_sum = ce_sum + jnp.where(
                jnp.logical_and(valid_b, is_last), ce / n_tok, 0.0)
            state_b = lax.ppermute(jnp.where(valid_b, gH, 0.0), "pp", down)

            return (state_f, state_b, stash, grads, ce_sum), None

        init = (
            jnp.zeros((mb, T, D), jnp.float32),
            jnp.zeros((mb, T, D), jnp.float32),
            jnp.zeros((R, mb, T, D), jnp.float32),
            zero_grads,
            jnp.float32(0.0),
        )
        (_, _, _, grads, ce_sum), _ = lax.scan(
            tick, init, jnp.arange(M + 2 * S - 2))

        # loss lives at the last stage; replicated leaves' grads are summed
        # across stages (and dp).  Layer grads stay stage-local (pp-sharded
        # out_specs) but sum over dp.
        axes = ("pp",) if dp_axis is None else (dp_axis, "pp")
        loss = lax.psum(ce_sum, axes)
        grads["tok_W"] = lax.psum(grads["tok_W"], axes)
        grads["head_b"] = lax.psum(grads["head_b"], axes)
        if dp_axis is not None:
            grads["layers"] = jax.tree.map(
                lambda g: lax.psum(g, dp_axis), grads["layers"])
        return loss, grads

    return local


def make_pp_1f1b_grads(cfg: GPTConfig, mesh: Mesh, n_microbatches: int, *,
                       dp_axis: Optional[str] = None):
    """jitted (params, x, y) -> (loss, grads) via the explicit 1F1B
    schedule (O(S) activation memory; see ``_pp_1f1b_local``)."""
    assert cfg.n_layers % mesh.shape["pp"] == 0, (
        "n_layers must divide by the pp axis size"
    )
    attn_fn = _pick_attn_cfg(cfg, cfg.ctx_len)
    local = _pp_1f1b_local(cfg, n_microbatches, attn_fn, dp_axis)
    pspecs = pp_param_specs(dp_axis)
    batch_spec = P(dp_axis, None)
    sharded = jax.shard_map(
        local, mesh=mesh,
        in_specs=(pspecs, batch_spec, batch_spec),
        out_specs=(P(), pspecs),
        check_vma=False,
    )
    param_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs,
                            is_leaf=lambda v: isinstance(v, P))
    batch_sh = NamedSharding(mesh, P(dp_axis, None))
    return jax.jit(sharded, in_shardings=(param_sh, batch_sh, batch_sh),
                   out_shardings=(NamedSharding(mesh, P()), param_sh))


def make_pp_1f1b_train_step(cfg: GPTConfig, mesh: Mesh,
                            n_microbatches: int, *, lr: float = 3e-4,
                            weight_decay: float = 0.01,
                            dp_axis: Optional[str] = None):
    """jitted (params, opt_state, x, y) -> (params, opt_state, loss) using
    the 1F1B schedule's manual gradients."""
    from ..train.optim import AdamWState, adamw_update, gpt_wd_mask

    attn_fn = _pick_attn_cfg(cfg, cfg.ctx_len)
    local = _pp_1f1b_local(cfg, n_microbatches, attn_fn, dp_axis)
    pspecs = pp_param_specs(dp_axis)
    batch_spec = P(dp_axis, None)
    loss_and_grads = jax.shard_map(
        local, mesh=mesh,
        in_specs=(pspecs, batch_spec, batch_spec),
        out_specs=(P(), pspecs),
        check_vma=False,
    )
    param_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs,
                            is_leaf=lambda v: isinstance(v, P))
    scalar_sh = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(dp_axis, None))
    opt_state_sh = AdamWState(m=param_sh, v=param_sh, t=scalar_sh)

    def step(params, opt_state, x, y):
        loss, grads = loss_and_grads(params, x, y)
        wd_tree = gpt_wd_mask(params, weight_decay)
        params, opt_state = adamw_update(params, grads, opt_state, lr,
                                         wd_tree)
        return params, opt_state, loss

    return jax.jit(
        step,
        in_shardings=(param_sh, opt_state_sh, batch_sh, batch_sh),
        out_shardings=(param_sh, opt_state_sh, scalar_sh),
    )


def make_pp_train_step(cfg: GPTConfig, mesh: Mesh, n_microbatches: int, *,
                       lr: float = 3e-4, weight_decay: float = 0.01,
                       dp_axis: Optional[str] = None):
    """jitted (params, opt_state, x, y) -> (params, opt_state, loss) with
    the layer stack pipeline-sharded on 'pp'.

    Gradients come from jax.grad THROUGH the shard_map pipeline (the
    backward schedule is the transposed ppermute rotation); replicated
    leaves (tok_W, head_b) receive psum'd grads from GSPMD since the loss
    itself is psum'd inside.
    """
    from ..train.optim import AdamWState, adamw_update, gpt_wd_mask

    loss_fn = _pp_loss_raw(cfg, mesh, n_microbatches, dp_axis)

    pspecs = pp_param_specs(dp_axis)
    param_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs,
                            is_leaf=lambda v: isinstance(v, P))
    scalar_sh = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(dp_axis, None))
    opt_state_sh = AdamWState(m=param_sh, v=param_sh, t=scalar_sh)

    def step(params, opt_state, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y)
        wd_tree = gpt_wd_mask(params, weight_decay)
        params, opt_state = adamw_update(params, grads, opt_state, lr,
                                         wd_tree)
        return params, opt_state, loss

    return jax.jit(
        step,
        in_shardings=(param_sh, opt_state_sh, batch_sh, batch_sh),
        out_shardings=(param_sh, opt_state_sh, scalar_sh),
    )


def make_pp_device_train_step(cfg: GPTConfig, mesh: Mesh, batch_size: int,
                              *, n_microbatches: int, base_lr: float,
                              min_lr: float, warmup: int, max_steps: int,
                              weight_decay: float,
                              lr_embed_scale: float = 1.0,
                              lr_head_scale: float = 1.0,
                              clip_norm: float = 0.0):
    """Device-resident pipeline train step over a (dp, pp) mesh.

    Same loop contract as ``sharding.make_sharded_device_train_step``
    (corpus replicated, windows sampled in-jit, warmup-cosine schedule
    driven by the AdamW step counter, per-group lr scales) — but gradients
    come from the explicit 1F1B schedule (O(S) activation memory,
    ``_pp_1f1b_local``), making pipeline parallelism reachable from the
    CLI trainer rather than only as a library demo.
    """
    from ..train.optim import (AdamWState, adamw_update, gpt_lr_scales,
                               gpt_wd_mask, warmup_cosine)

    assert cfg.n_layers % mesh.shape["pp"] == 0, (
        "n_layers must divide by the pp axis size"
    )
    attn_fn = _pick_attn_cfg(cfg, cfg.ctx_len)
    local = _pp_1f1b_local(cfg, n_microbatches, attn_fn, "dp")
    pspecs = pp_param_specs("dp")
    batch_spec = P("dp", None)
    loss_and_grads = jax.shard_map(
        local, mesh=mesh,
        in_specs=(pspecs, batch_spec, batch_spec),
        out_specs=(P(), pspecs),
        check_vma=False,
    )
    param_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs,
                            is_leaf=lambda v: isinstance(v, P))
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, batch_spec)
    opt_sh = AdamWState(m=param_sh, v=param_sh, t=repl)
    B, T = batch_size, cfg.ctx_len

    def step(params, opt_state, data_ids, key):
        key, sub = jax.random.split(key)
        L = data_ids.shape[0]
        ix = jax.random.randint(sub, (B,), 0, L - T - 1)
        offs = ix[:, None] + jnp.arange(T)[None, :]
        x = lax.with_sharding_constraint(data_ids[offs], batch_sh)
        y = lax.with_sharding_constraint(data_ids[offs + 1], batch_sh)
        loss, grads = loss_and_grads(params, x, y)
        lr = warmup_cosine(opt_state.t + 1, base=base_lr, min_lr=min_lr,
                           warmup=warmup, max_steps=max_steps)
        wd_tree = gpt_wd_mask(params, weight_decay)
        lr_tree = gpt_lr_scales(params, embed=lr_embed_scale,
                                head=lr_head_scale)
        params, opt_state = adamw_update(params, grads, opt_state, lr,
                                         wd_tree, lr_scales=lr_tree,
                                         clip_norm=clip_norm)
        return params, opt_state, key, loss

    return jax.jit(
        step,
        in_shardings=(param_sh, opt_sh, repl, repl),
        out_shardings=(param_sh, opt_sh, repl, repl),
    )


def make_pp_eval(cfg: GPTConfig, mesh: Mesh, batch: int, batches: int, *,
                 n_microbatches: int):
    """Device-resident (dp, pp) eval companion to
    ``make_pp_device_train_step`` — GPipe forward-only loss (no backward,
    so the cheaper schedule), mean over ``batches`` sampled batches."""
    attn_fn = _pick_attn_cfg(cfg, cfg.ctx_len)
    local = _pp_local_loss(cfg, n_microbatches, attn_fn, "dp")
    pspecs = pp_param_specs("dp")
    batch_spec = P("dp", None)
    loss_fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(pspecs, batch_spec, batch_spec),
        out_specs=P(),
        check_vma=False,
    )
    param_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs,
                            is_leaf=lambda v: isinstance(v, P))
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, batch_spec)
    T = cfg.ctx_len

    def evaluate(params, val_ids, key):
        L = val_ids.shape[0]

        def body(carry, k):
            ix = jax.random.randint(k, (batch,), 0, L - T - 1)
            offs = ix[:, None] + jnp.arange(T)[None, :]
            x = lax.with_sharding_constraint(val_ids[offs], batch_sh)
            y = lax.with_sharding_constraint(val_ids[offs + 1], batch_sh)
            return carry + loss_fn(params, x, y), None

        keys = jax.random.split(key, batches)
        total, _ = lax.scan(body, jnp.float32(0), keys)
        return total / batches

    return jax.jit(
        evaluate,
        in_shardings=(param_sh, repl, repl),
        out_shardings=repl,
    )
