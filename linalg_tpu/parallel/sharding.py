"""Sharded GPT training: data-parallel batch x tensor-parallel heads/FFN.

TPU-native scaling story: pick a mesh, annotate parameter and batch
shardings, and let XLA GSPMD insert the collectives (all-reduce for the
data-parallel gradient sum and the tensor-parallel attention/FFN output
reductions) over ICI. No hand-written communication.

Layout (megatron-style):
- Wq/Wk/Wv (L, D, h*dh): output dim sharded by 'tp' -> each tp shard owns
  n_heads/tp heads end-to-end through attention.
- Wo (L, h*dh, D): input dim sharded by 'tp' (row-parallel; XLA inserts the
  psum over tp to reassemble the residual stream).
- W1 (L, D, F) column-parallel on F; W2 (L, F, D) row-parallel on F.
- Embeddings, LayerNorm, biases: replicated.
- Batch (B, T): sharded on 'dp'.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.gpt import GPTConfig, gpt_loss, init_gpt_params
from ..train.optim import adamw_init, adamw_update, gpt_wd_mask
from .mesh import make_mesh, pick_dp_tp

__all__ = [
    "gpt_param_specs",
    "make_sharded_attn",
    "make_sharded_train_step",
    "make_sharded_device_train_step",
    "make_sharded_eval",
    "make_sp_train_step",
    "make_sp_device_train_step",
    "make_sp_eval",
    "dryrun_multichip",
]


def gpt_param_specs(params, cfg=None) -> Dict[str, Any]:
    """PartitionSpec pytree for the GPT param pytree (see module docstring).

    Pass ``cfg`` (or a params dict) so configs with extra top-level leaves
    (learned positions' ``pos_W``) get a matching replicated spec."""
    layer_specs = {
        "ln1_g": P(), "ln1_b": P(),
        "Wq": P(None, None, "tp"),
        "Wk": P(None, None, "tp"),
        "Wv": P(None, None, "tp"),
        "Wo": P(None, "tp", None),
        "ln2_g": P(), "ln2_b": P(),
        "W1": P(None, None, "tp"),
        "b1": P(None, "tp"),
        "W2": P(None, "tp", None),
        "b2": P(),
    }
    if (params is not None and "Wg" in params.get("layers", {})) or (
            cfg is not None and getattr(cfg, "gated_ffn", False)):
        # gated FFN (swiglu/geglu): the gate branch shards like W1 —
        # column-parallel on F, so the elementwise gate product stays
        # tp-local and only the W2 row-parallel psum remains
        layer_specs["Wg"] = P(None, None, "tp")
        layer_specs["bg"] = P(None, "tp")
    specs = {"tok_W": P(), "head_b": P(), "layers": layer_specs}
    if (params is not None and "pos_W" in params) or (
            cfg is not None and getattr(cfg, "pos", None) == "learned"):
        specs["pos_W"] = P()
    return specs


def _shardings(mesh: Mesh, spec_tree):
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), spec_tree,
        is_leaf=lambda x: isinstance(x, P),
    )


def make_sharded_attn(mesh: Mesh, T: int, d_head: int,
                      batch_axis: str = "dp", head_axis: str = "tp",
                      cfg: GPTConfig | None = None):
    """shard_map-wrapped attention for the dp x tp step.

    Heads are tp-local by parameter layout (Wq/Wk/Wv column-sharded), and
    attention is pointwise over (batch, head), so the kernel runs with zero
    collectives: each device gets its (B/dp, h/tp, T, d) block. The local
    kernel is the same fused Pallas flash pick as the single-chip hot path
    (``models.gpt._pick_attn``) — the multi-device step no longer gives up
    the flash kernel.

    ``head_axis=None`` replicates heads (used by the dp x ep MoE step,
    where the model-parallel axis shards experts, not heads).

    ``cfg`` (optional) carries the positional mode: for ``pos="alibi"``
    each device rebuilds the per-head distance bias for ITS OWN head
    slice (``lax.axis_index`` picks the slope block), so the bias stays
    tp-local with zero collectives — the (H, T, T) global mask is never
    materialized.
    """
    from ..models.gpt import _REMAT_SDPA, _pick_attn
    from ..nn.functional import causal_mask

    if cfg is not None and cfg.pos == "alibi":
        from ..nn.positional import alibi_slopes

        sl_all = alibi_slopes(cfg.n_heads)
        i = jnp.arange(T)
        dist = (i[None, :] - i[:, None]).astype(jnp.float32)  # j - i
        base = causal_mask(T, dtype=jnp.float32)  # (1, 1, T, T)
        if cfg.window is not None:  # sliding-window band under ALiBi
            far = (i[:, None] - i[None, :]) >= cfg.window
            base = jnp.where(far[None, None], -1e9, base)

        def local_attn(q, k, v):
            h_loc = q.shape[1]
            if head_axis is None:
                sl = sl_all
            else:
                idx = jax.lax.axis_index(head_axis)
                sl = jax.lax.dynamic_slice_in_dim(
                    sl_all, idx * h_loc, h_loc)
            mask = (base
                    + (sl[:, None, None] * dist)[None]).astype(q.dtype)
            return _REMAT_SDPA(q, k, v, mask)
    elif cfg is not None and cfg.window is not None:
        # sliding window: the flash kernels bake in pure causal, so the
        # tp-local attention is the rematted sdpa over the banded mask
        from ..models.gpt import _trunk_mask

        def local_attn(q, k, v):
            return _REMAT_SDPA(q, k, v, _trunk_mask(cfg, T, q.dtype))
    else:
        local = _pick_attn(T, d_head)

        def local_attn(q, k, v):
            return local(q, k, v, causal_mask(T, dtype=q.dtype))

    spec = P(batch_axis, head_axis, None, None)
    fa = jax.shard_map(local_attn, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=spec, check_vma=False)
    return lambda q, k, v, mask: fa(q, k, v)


def make_sharded_train_step(cfg: GPTConfig, mesh: Mesh, *,
                            lr: float = 3e-4, weight_decay: float = 0.01,
                            attn_fn=None):
    """jitted (params, opt_state, x, y) -> (params, opt_state, loss) with
    dp x tp shardings bound via in/out_shardings."""
    pspecs = gpt_param_specs(None, cfg)
    param_sh = _shardings(mesh, pspecs)
    batch_sh = NamedSharding(mesh, P("dp", None))
    scalar_sh = NamedSharding(mesh, P())

    # opt state mirrors params twice plus a scalar count
    from ..train.optim import AdamWState

    opt_state_sh = AdamWState(m=param_sh, v=param_sh, t=scalar_sh)

    if attn_fn is None:
        attn_fn = make_sharded_attn(mesh, cfg.ctx_len, cfg.d_head, cfg=cfg)

    def step(params, opt_state, x, y):
        loss, grads = jax.value_and_grad(
            lambda p, xx, yy: gpt_loss(p, xx, yy, cfg, attn_fn=attn_fn)
        )(params, x, y)
        wd_tree = gpt_wd_mask(params, weight_decay)
        params, opt_state = adamw_update(params, grads, opt_state, lr, wd_tree)
        return params, opt_state, loss

    return jax.jit(
        step,
        in_shardings=(param_sh, opt_state_sh, batch_sh, batch_sh),
        out_shardings=(param_sh, opt_state_sh, scalar_sh),
    )


def make_sp_train_step(cfg: GPTConfig, mesh: Mesh, *,
                       lr: float = 3e-4, weight_decay: float = 0.01,
                       pallas: bool = False):
    """Sequence-parallel training step over a (dp, sp) mesh.

    Context parallelism: the batch is sharded (dp, sp) — every activation
    tensor carries its T axis sharded over 'sp'. LayerNorm/FFN/embeddings
    are pointwise over T (GSPMD shards them for free); attention runs the
    ring (K/V chunks rotate over ICI, ``parallel.ring``). Parameters are
    replicated. This is how a ctx length that doesn't fit one chip's HBM
    trains; for short ctx prefer dp x tp.

    ``pallas=True`` swaps in the in-kernel DMA ring (forward AND backward
    Pallas kernels, ``parallel.ring_pallas``) for compute/comm overlap.
    """
    attn_fn = _sp_ring(mesh, pallas, cfg)

    repl_leaf = NamedSharding(mesh, P())
    param_sh = jax.tree.map(lambda _: repl_leaf, gpt_param_specs(None, cfg),
                            is_leaf=lambda v: isinstance(v, P))
    batch_sh = NamedSharding(mesh, P("dp", "sp"))

    from ..train.optim import AdamWState

    opt_state_sh = AdamWState(m=param_sh, v=param_sh, t=repl_leaf)

    def step(params, opt_state, x, y):
        loss, grads = jax.value_and_grad(
            lambda p, xx, yy: gpt_loss(p, xx, yy, cfg, attn_fn=attn_fn)
        )(params, x, y)
        wd_tree = gpt_wd_mask(params, weight_decay)
        params, opt_state = adamw_update(params, grads, opt_state, lr,
                                         wd_tree)
        return params, opt_state, loss

    return jax.jit(
        step,
        in_shardings=(param_sh, opt_state_sh, batch_sh, batch_sh),
        out_shardings=(param_sh, opt_state_sh, repl_leaf),
    )


def _sp_ring(mesh: Mesh, pallas: bool, cfg: GPTConfig | None = None):
    """The sp attention ring: in-kernel DMA Pallas ring (compute/comm
    overlap, the TPU training default) or the XLA ppermute ring.

    ``cfg.pos == "alibi"`` threads the per-head distance-bias slopes into
    the ring bodies (global row/col positions are already tracked for the
    causal mask, so the bias is a fused multiply-add per chunk — zero
    extra communication; the Pallas kernels bake the slopes in as
    compile-time constants selected by head grid index).
    """
    slopes = None
    window = None if cfg is None else cfg.window
    if cfg is not None and cfg.pos == "alibi":
        from ..nn.positional import alibi_slopes

        slopes = tuple(float(s) for s in alibi_slopes(cfg.n_heads))
    if pallas:
        from .ring_pallas import make_ring_attention_pallas

        ring = make_ring_attention_pallas(mesh, axis="sp", causal=True,
                                          batch_axis="dp", slopes=slopes,
                                          window=window)
    else:
        from .ring import make_ring_attention

        ring = make_ring_attention(mesh, axis="sp", causal=True,
                                   batch_axis="dp", slopes=slopes,
                                   window=window)
    return lambda q, k, v, mask: ring(q, k, v)


def make_sp_device_train_step(cfg: GPTConfig, mesh: Mesh, batch_size: int,
                              *, base_lr: float, min_lr: float, warmup: int,
                              max_steps: int, weight_decay: float,
                              lr_embed_scale: float = 1.0,
                              lr_head_scale: float = 1.0,
                              pallas: bool = False,
                              clip_norm: float = 0.0):
    """Device-resident sequence-parallel step over a (dp, sp) mesh.

    Same loop contract as ``make_sharded_device_train_step`` (corpus
    replicated, windows sampled in-jit), but the batch is sharded
    (dp, sp) — activations carry T sharded over 'sp' and attention runs
    the ring. ``pallas=True`` (the trainer's TPU default) uses the
    in-kernel remote-DMA ring with fwd+bwd Pallas kernels
    (``parallel.ring_pallas``); ``False`` the XLA ppermute ring.
    Parameters replicated.
    """
    from ..train.optim import AdamWState, adamw_update, gpt_lr_scales, \
        gpt_wd_mask, warmup_cosine

    attn_fn = _sp_ring(mesh, pallas, cfg)

    repl = NamedSharding(mesh, P())
    param_sh = jax.tree.map(lambda _: repl, gpt_param_specs(None, cfg),
                            is_leaf=lambda v: isinstance(v, P))
    batch_sh = NamedSharding(mesh, P("dp", "sp"))
    opt_sh = AdamWState(m=param_sh, v=param_sh, t=repl)
    B, T = batch_size, cfg.ctx_len

    def step(params, opt_state, data_ids, key):
        key, sub = jax.random.split(key)
        L = data_ids.shape[0]
        ix = jax.random.randint(sub, (B,), 0, L - T - 1)
        offs = ix[:, None] + jnp.arange(T)[None, :]
        x = jax.lax.with_sharding_constraint(data_ids[offs], batch_sh)
        y = jax.lax.with_sharding_constraint(data_ids[offs + 1], batch_sh)
        loss, grads = jax.value_and_grad(
            lambda p, xx, yy: gpt_loss(p, xx, yy, cfg, attn_fn=attn_fn)
        )(params, x, y)
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


def make_sp_eval(cfg: GPTConfig, mesh: Mesh, batch: int, batches: int,
                 pallas: bool = False):
    """Device-resident (dp, sp) eval companion to make_sp_device_train_step."""
    attn_fn = _sp_ring(mesh, pallas, cfg)
    repl = NamedSharding(mesh, P())
    param_sh = jax.tree.map(lambda _: repl, gpt_param_specs(None, cfg),
                            is_leaf=lambda v: isinstance(v, P))
    batch_sh = NamedSharding(mesh, P("dp", "sp"))
    T = cfg.ctx_len

    def evaluate(params, val_ids, key):
        L = val_ids.shape[0]

        def body(carry, k):
            ix = jax.random.randint(k, (batch,), 0, L - T - 1)
            offs = ix[:, None] + jnp.arange(T)[None, :]
            x = jax.lax.with_sharding_constraint(val_ids[offs], batch_sh)
            y = jax.lax.with_sharding_constraint(val_ids[offs + 1], batch_sh)
            return carry + gpt_loss(params, x, y, cfg, attn_fn=attn_fn), None

        keys = jax.random.split(key, batches)
        total, _ = jax.lax.scan(body, jnp.float32(0), keys)
        return total / batches

    return jax.jit(
        evaluate,
        in_shardings=(param_sh, repl, repl),
        out_shardings=repl,
    )


def make_sharded_device_train_step(cfg: GPTConfig, mesh: Mesh,
                                   batch_size: int, *, base_lr: float,
                                   min_lr: float, warmup: int,
                                   max_steps: int, weight_decay: float,
                                   lr_embed_scale: float = 1.0,
                                   lr_head_scale: float = 1.0,
                                   clip_norm: float = 0.0):
    """Device-resident sharded step: (params, opt, data_ids, key) ->
    (params, opt, key, loss).

    The corpus is uploaded ONCE (replicated); every step samples random
    windows with jax.random inside the jit and constrains the batch to the
    dp axis — no per-step host upload (the ~40 ms round trip that made the
    round-1 sharded loop dispatch-bound). Mirrors the single-chip
    ``trainer.make_device_train_step``.
    """
    from ..train.optim import AdamWState, gpt_lr_scales, warmup_cosine

    pspecs = gpt_param_specs(None, cfg)
    param_sh = _shardings(mesh, pspecs)
    scalar_sh = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("dp", None))
    opt_state_sh = AdamWState(m=param_sh, v=param_sh, t=scalar_sh)
    attn_fn = make_sharded_attn(mesh, cfg.ctx_len, cfg.d_head, cfg=cfg)
    B, T = batch_size, cfg.ctx_len

    def step(params, opt_state, data_ids, key):
        key, sub = jax.random.split(key)
        L = data_ids.shape[0]
        ix = jax.random.randint(sub, (B,), 0, L - T - 1)
        offs = ix[:, None] + jnp.arange(T)[None, :]
        x = jax.lax.with_sharding_constraint(data_ids[offs], batch_sh)
        y = jax.lax.with_sharding_constraint(data_ids[offs + 1], batch_sh)
        loss, grads = jax.value_and_grad(
            lambda p, xx, yy: gpt_loss(p, xx, yy, cfg, attn_fn=attn_fn)
        )(params, x, y)
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
        in_shardings=(param_sh, opt_state_sh, scalar_sh, scalar_sh),
        out_shardings=(param_sh, opt_state_sh, scalar_sh, scalar_sh),
    )


def make_sharded_eval(cfg: GPTConfig, mesh: Mesh, batch: int, batches: int):
    """Device-resident sharded eval: mean val loss over ``batches``
    randomly-windowed dp-sharded batches, one jit call, one readback."""
    pspecs = gpt_param_specs(None, cfg)
    param_sh = _shardings(mesh, pspecs)
    scalar_sh = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("dp", None))
    attn_fn = make_sharded_attn(mesh, cfg.ctx_len, cfg.d_head, cfg=cfg)
    T = cfg.ctx_len

    def evaluate(params, val_ids, key):
        L = val_ids.shape[0]

        def body(carry, k):
            ix = jax.random.randint(k, (batch,), 0, L - T - 1)
            offs = ix[:, None] + jnp.arange(T)[None, :]
            x = jax.lax.with_sharding_constraint(val_ids[offs], batch_sh)
            y = jax.lax.with_sharding_constraint(val_ids[offs + 1], batch_sh)
            return carry + gpt_loss(params, x, y, cfg, attn_fn=attn_fn), None

        keys = jax.random.split(key, batches)
        total, _ = jax.lax.scan(body, jnp.float32(0), keys)
        return total / batches

    return jax.jit(
        evaluate,
        in_shardings=(param_sh, scalar_sh, scalar_sh),
        out_shardings=scalar_sh,
    )


def dryrun_multichip(n_devices: int) -> None:
    """Create an n-device mesh, jit the FULL training step over real dp x tp
    shardings, and run ONE step on tiny shapes. Used by the driver with
    virtual CPU devices to validate the multi-chip path."""
    devices = jax.devices()
    assert len(devices) >= n_devices, (
        f"need {n_devices} devices, have {len(devices)}"
    )
    n_heads = 4
    dp, tp = pick_dp_tp(n_devices, n_heads)
    mesh = make_mesh((dp, tp), ("dp", "tp"), devices[:n_devices])
    cfg = GPTConfig(vocab_size=37, d_model=32, n_heads=n_heads, n_layers=2,
                    d_ff=64, ctx_len=16)
    params = init_gpt_params(cfg, seed=0)
    opt_state = adamw_init(params)

    param_sh = _shardings(mesh, gpt_param_specs(None, cfg))
    params = jax.device_put(params, param_sh)
    from ..train.optim import AdamWState

    opt_state = jax.device_put(
        opt_state,
        AdamWState(m=param_sh, v=param_sh, t=NamedSharding(mesh, P())),
    )

    rng = np.random.default_rng(0)
    B = max(2 * dp, dp)  # divisible by dp
    x = jnp.asarray(rng.integers(0, 37, size=(B, 16), dtype=np.int32))
    y = jnp.asarray(rng.integers(0, 37, size=(B, 16), dtype=np.int32))
    batch_sh = NamedSharding(mesh, P("dp", None))
    x = jax.device_put(x, batch_sh)
    y = jax.device_put(y, batch_sh)

    step = make_sharded_train_step(cfg, mesh)
    params, opt_state, loss = step(params, opt_state, x, y)
    jax.block_until_ready(loss)

    # sequence-parallel path: ring attention over an 'sp' ring must match
    # the exact sdpa on the same mesh devices
    from ..nn.functional import causal_mask, sdpa
    from .mesh import make_mesh as _mk
    from .ring import make_ring_attention

    sp_mesh = _mk((n_devices,), ("sp",), devices[:n_devices])
    rng2 = np.random.default_rng(1)
    qkv = [
        jnp.asarray(rng2.normal(size=(2, 2, 8 * n_devices, 8)), jnp.float32)
        for _ in range(3)
    ]
    ring_out = make_ring_attention(sp_mesh)(*qkv)
    ref = sdpa(*qkv, causal_mask(8 * n_devices))
    ring_ok = bool(jnp.max(jnp.abs(ring_out - ref)) < 1e-4)

    # Pallas ring (in-kernel remote-DMA rotation) must agree too —
    # forward AND backward (the custom_vjp dk/dv/dq ring kernels), so the
    # artifact certifies gradients, not just losses
    from .ring_pallas import make_ring_attention_pallas

    pring_fn = make_ring_attention_pallas(sp_mesh)
    pring = pring_fn(*qkv)
    ring_ok = ring_ok and bool(jnp.max(jnp.abs(pring - ref)) < 1e-4)
    w = jnp.asarray(rng2.normal(size=ref.shape), jnp.float32)
    g_pallas = jax.grad(
        lambda q, k, v: jnp.sum(pring_fn(q, k, v) * w), argnums=(0, 1, 2)
    )(*qkv)
    g_ref = jax.grad(
        lambda q, k, v: jnp.sum(sdpa(q, k, v, causal_mask(ref.shape[2]))
                                * w),
        argnums=(0, 1, 2),
    )(*qkv)
    for gp, gr in zip(g_pallas, g_ref):
        ring_ok = ring_ok and bool(jnp.max(jnp.abs(gp - gr)) < 1e-3)

    # sliding-window band through BOTH rings (fwd + Pallas bwd): banded
    # sdpa is the oracle
    win = 12
    Tg = ref.shape[2]
    ii = jnp.arange(Tg)
    band = jnp.where((ii[:, None] - ii[None, :]) >= win,
                     jnp.float32(-1e9), causal_mask(Tg))
    ref_w = sdpa(*qkv, band)
    ring_w = make_ring_attention(sp_mesh, window=win)(*qkv)
    ring_ok = ring_ok and bool(jnp.max(jnp.abs(ring_w - ref_w)) < 1e-4)
    pring_w_fn = make_ring_attention_pallas(sp_mesh, window=win)
    ring_ok = ring_ok and bool(
        jnp.max(jnp.abs(pring_w_fn(*qkv) - ref_w)) < 1e-4)
    g_pw = jax.grad(
        lambda q, k, v: jnp.sum(pring_w_fn(q, k, v) * w), argnums=(0, 1, 2)
    )(*qkv)
    g_rw = jax.grad(
        lambda q, k, v: jnp.sum(sdpa(q, k, v, band) * w), argnums=(0, 1, 2)
    )(*qkv)
    for gp, gr in zip(g_pw, g_rw):
        ring_ok = ring_ok and bool(jnp.max(jnp.abs(gp - gr)) < 1e-3)

    # pipeline-parallel path: GPipe microbatch schedule over a 'pp' ring
    # must reproduce the unsharded loss exactly
    from ..models.gpt import gpt_loss
    from .pipeline import make_pp_train_step

    pp = min(n_devices, 4)
    pp_dp = n_devices // pp
    pp_mesh = _mk((pp_dp, pp), ("dp", "pp"), devices[:n_devices])
    pp_cfg = GPTConfig(vocab_size=37, d_model=32, n_heads=4,
                       n_layers=2 * pp, d_ff=64, ctx_len=16)
    pp_params = init_gpt_params(pp_cfg, seed=0)
    Bpp = 4 * pp_dp
    xpp = jnp.asarray(rng.integers(0, 37, size=(Bpp, 16), dtype=np.int32))
    ypp = jnp.asarray(rng.integers(0, 37, size=(Bpp, 16), dtype=np.int32))
    ref_pp = float(gpt_loss(pp_params, xpp, ypp, pp_cfg))
    pp_step = make_pp_train_step(pp_cfg, pp_mesh, n_microbatches=2,
                                 dp_axis="dp")
    _, _, pp_loss = pp_step(pp_params, adamw_init(pp_params), xpp, ypp)
    pp_ok = abs(float(pp_loss) - ref_pp) < 1e-4

    # 1F1B schedule (explicit fwd/bwd slots, O(S) activation ring):
    # loss AND GRADS must match the unsharded jax.grad exactly
    from .pipeline import make_pp_1f1b_grads

    f1_loss, f1_grads = make_pp_1f1b_grads(pp_cfg, pp_mesh, n_microbatches=2,
                                           dp_axis="dp")(pp_params, xpp, ypp)
    pp_ok = pp_ok and abs(float(f1_loss) - ref_pp) < 1e-4
    ref_grads = jax.grad(gpt_loss)(pp_params, xpp, ypp, pp_cfg)
    for a, b in zip(jax.tree.leaves(f1_grads), jax.tree.leaves(ref_grads)):
        pp_ok = pp_ok and bool(jnp.max(jnp.abs(a - b)) < 1e-4)

    # one OPTIMIZER step through the trainer's pp path (the
    # device-resident 1F1B step the CLI --pp flag uses)
    from .pipeline import make_pp_device_train_step

    pp_step2 = make_pp_device_train_step(
        pp_cfg, pp_mesh, Bpp, n_microbatches=2, base_lr=1e-3, min_lr=1e-4,
        warmup=10, max_steps=100, weight_decay=0.0)
    data_ids = jnp.asarray(rng.integers(0, 37, size=(512,), dtype=np.int32))
    pkey = jax.random.PRNGKey(0)
    p2, o2, pkey, pp_train_loss = pp_step2(
        pp_params, adamw_init(pp_params), data_ids, pkey)
    pp_ok = pp_ok and bool(jnp.isfinite(pp_train_loss))
    # params must actually move (the optimizer ran)
    moved = jnp.max(jnp.abs(p2["tok_W"] - pp_params["tok_W"]))
    pp_ok = pp_ok and bool(moved > 0)

    # expert-parallel path: MoE-GPT with experts sharded on 'ep'
    from ..models.moe import MoEGPTConfig, init_moe_params, moe_gpt_loss
    from .expert import make_ep_train_step

    ep = min(n_devices, 4)
    ep_dp = n_devices // ep
    ep_mesh = _mk((ep_dp, ep), ("dp", "ep"), devices[:n_devices])
    ep_cfg = MoEGPTConfig(vocab_size=37, d_model=32, n_heads=4, n_layers=2,
                          d_ff=64, ctx_len=16, n_experts=ep)
    ep_params = init_moe_params(ep_cfg, seed=0)
    Bep = 2 * ep_dp
    xep = jnp.asarray(rng.integers(0, 37, size=(Bep, 16), dtype=np.int32))
    yep = jnp.asarray(rng.integers(0, 37, size=(Bep, 16), dtype=np.int32))
    ref_ep = float(moe_gpt_loss(ep_params, xep, yep, ep_cfg))
    ep_step = make_ep_train_step(ep_cfg, ep_mesh, dp_axis="dp")
    _, _, ep_loss = ep_step(ep_params, adamw_init(ep_params), xep, yep)
    ep_ok = abs(float(ep_loss) - ref_ep) < 1e-4

    # tensor-parallel SERVING: the continuous-batching engine over a tp
    # mesh (megatron param shards + head-sharded KV cache, GQA grouping)
    # must emit token-identical greedy output to the unsharded engine
    from ..serve.engine import Request, ServeEngine

    sv_tp = min(n_devices, 4)
    sv_mesh = _mk((1, sv_tp), ("dp", "tp"), devices[:sv_tp])
    sv_cfg = GPTConfig(vocab_size=37, d_model=32, n_heads=4, n_layers=2,
                       ctx_len=32, n_kv_heads=2, pos="rope")
    sv_params = init_gpt_params(sv_cfg, seed=0)
    prompts = [[1, 2, 3], [4, 5, 6, 7, 8]]

    def _serve(mesh_arg):
        eng = ServeEngine(sv_params, sv_cfg, n_slots=2, chunk=4, top_k=1,
                          mesh=mesh_arg)
        ids = [eng.submit(Request(p, 6)) for p in prompts]
        done = {c.request_id: c.tokens for c in eng.run()}
        return [done[i] for i in ids]

    sv_ok = _serve(sv_mesh) == _serve(None)

    # FSDP (ZeRO-3): params+moments stored 1/N per device; one optimizer
    # step must produce the same loss as the unsharded grad path and keep
    # the sharded storage layout
    from .fsdp import fsdp_shardings, make_fsdp_device_train_step

    fs_mesh = _mk((n_devices,), ("fsdp",), devices[:n_devices])
    fs_cfg = GPTConfig(vocab_size=37, d_model=64, n_heads=4, n_layers=2,
                       d_ff=256, ctx_len=16)
    fs_params = init_gpt_params(fs_cfg, seed=0)
    fs_sh = fsdp_shardings(fs_params, fs_mesh)
    fs_repl = NamedSharding(fs_mesh, P())
    fs_sharded = jax.device_put(fs_params, fs_sh)
    fs_opt = jax.device_put(
        adamw_init(fs_params),
        AdamWState(m=fs_sh, v=fs_sh, t=fs_repl))
    fs_step = make_fsdp_device_train_step(
        fs_cfg, fs_mesh, fs_params, 2 * n_devices, base_lr=1e-3,
        min_lr=1e-4, warmup=10, max_steps=100, weight_decay=0.0)
    fs_data = jax.device_put(
        jnp.asarray(rng.integers(0, 37, size=(512,), dtype=np.int32)),
        fs_repl)
    fs_p2, fs_o2, _, fs_loss = fs_step(
        fs_sharded, fs_opt, fs_data,
        jax.device_put(jax.random.PRNGKey(0), fs_repl))
    w1 = fs_p2["layers"]["W1"]
    fs_ok = (bool(jnp.isfinite(fs_loss))
             and w1.addressable_shards[0].data.size * n_devices == w1.size
             and bool(jnp.max(jnp.abs(fs_p2["tok_W"]
                                      - fs_params["tok_W"])) > 0))

    print(
        f"dryrun_multichip ok: mesh dp={dp} tp={tp}, one train step, "
        f"loss={float(loss):.4f}; ring attention sp={n_devices} "
        f"{'ok' if ring_ok else 'MISMATCH'}; "
        f"pipeline dp={pp_dp} pp={pp} {'ok' if pp_ok else 'MISMATCH'}; "
        f"moe dp={ep_dp} ep={ep} {'ok' if ep_ok else 'MISMATCH'}; "
        f"tp-serving tp={sv_tp} {'ok' if sv_ok else 'MISMATCH'}; "
        f"fsdp={n_devices} {'ok' if fs_ok else 'MISMATCH'}"
    )
    assert ring_ok, "ring attention mismatch vs sdpa"
    assert pp_ok, "pipeline-parallel loss mismatch vs unsharded"
    assert ep_ok, "expert-parallel loss mismatch vs unsharded"
    assert sv_ok, "tp-serving tokens mismatch vs unsharded engine"
    assert fs_ok, "fsdp step failed (loss/sharded-storage/update)"
