"""Fully-sharded data parallelism (ZeRO-3 style) over one mesh axis.

Plain data parallelism (``parallel.sharding``) replicates parameters and
optimizer state on every device — at N devices the model memory is paid
N times. FSDP shards *storage* of every parameter leaf (and therefore
its AdamW m/v moments and its gradient) across the SAME axis the batch
is split over: per-device model+optimizer memory drops to ~1/N, and
GSPMD inserts the classic FSDP collectives automatically —

- forward/backward: all-gather the layer's weight shards right where
  they are consumed (inside the scan-over-layers body, so only one
  layer's full weights are live at a time),
- gradients: reduce-scatter straight back to the sharded layout (the
  data-parallel mean and the re-shard fuse into one collective),
- optimizer update: runs on the 1/N local shard — no communication.

This is the scaling-book recipe verbatim: pick a mesh, annotate
shardings (params sharded on 'fsdp', batch sharded on 'fsdp'), and let
XLA place the collectives over ICI. No hand-written communication.

The reference has no parallelism of any kind (SURVEY §2.5); this is a
TPU-native addition alongside dp/tp/sp/pp/ep.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.gpt import GPTConfig, gpt_loss

__all__ = [
    "fsdp_param_specs",
    "fsdp_shardings",
    "make_fsdp_device_train_step",
    "make_fsdp_eval",
]


def _leaf_spec(shape, n: int, axis: str, min_elems: int) -> P:
    """Shard the largest dimension divisible by ``n``; replicate leaves
    that are too small to be worth a gather (LN scales, biases) or have
    no divisible dim (e.g. a 65-row char vocab embedding's row axis —
    its d_model column axis shards instead).

    Ties prefer the EARLIER dimension: the last axis is the TPU lane
    dimension (128-wide tiles), and an all-gather that concatenates on a
    sublane axis relayouts more cheaply than one on the lane axis.
    """
    if math.prod(shape) < min_elems:
        return P()
    best_dim, best_size = None, 0
    for i, s in enumerate(shape):
        if s % n == 0 and s > best_size:
            best_dim, best_size = i, s
    if best_dim is None:
        return P()
    entries = [None] * len(shape)
    entries[best_dim] = axis
    return P(*entries)


def fsdp_param_specs(params, n: int, *, axis: str = "fsdp",
                     min_elems: int = 2 ** 14):
    """PartitionSpec pytree sharding every large leaf of ``params`` over
    ``axis`` (mesh size ``n``). Specs are derived from leaf SHAPES, so
    GQA's narrower Wk/Wv, MoE expert stacks, and learned positions all
    shard without special cases. ``params`` may be real arrays or
    ShapeDtypeStructs."""
    return jax.tree.map(
        lambda p: _leaf_spec(jnp.shape(p), n, axis, min_elems), params
    )


def fsdp_shardings(params, mesh: Mesh, *, axis: str = "fsdp"):
    """NamedSharding pytree for ``params`` over ``mesh``'s fsdp axis."""
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        fsdp_param_specs(params, mesh.shape[axis], axis=axis),
        is_leaf=lambda v: isinstance(v, P),
    )


def _attn_for(cfg: GPTConfig, mesh: Mesh):
    """Batch-only shard_map'd attention (heads replicated): activations
    carry B sharded on 'fsdp', so the fused flash/sdpa pick runs
    per-device exactly as in the dp path (``sharding.make_sharded_attn``).
    """
    from .sharding import make_sharded_attn

    return make_sharded_attn(mesh, cfg.ctx_len, cfg.d_head,
                             batch_axis="fsdp", head_axis=None, cfg=cfg)


def make_fsdp_device_train_step(cfg: GPTConfig, mesh: Mesh, params,
                                batch_size: int, *, base_lr: float,
                                min_lr: float, warmup: int, max_steps: int,
                                weight_decay: float,
                                lr_embed_scale: float = 1.0,
                                lr_head_scale: float = 1.0,
                                clip_norm: float = 0.0):
    """Device-resident FSDP step over a ('fsdp',) mesh.

    Same loop contract as ``sharding.make_sharded_device_train_step``
    (corpus replicated, windows sampled in-jit, AdamW + warmup-cosine),
    but parameters AND optimizer moments are stored sharded over 'fsdp':
    in/out_shardings pin the 1/N layout, so the all-gathers happen inside
    the step and the full weights never persist between steps. ``params``
    is only read for leaf shapes (arrays or ShapeDtypeStructs).
    """
    from ..train.optim import (AdamWState, adamw_update, gpt_lr_scales,
                               gpt_wd_mask, warmup_cosine)

    attn_fn = _attn_for(cfg, mesh)
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("fsdp", None))
    param_sh = fsdp_shardings(params, mesh)
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


def make_fsdp_eval(cfg: GPTConfig, mesh: Mesh, params, batch: int,
                   batches: int):
    """Device-resident FSDP eval: params stay sharded, batches sharded on
    'fsdp', one jit call, one scalar readback."""
    attn_fn = _attn_for(cfg, mesh)
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("fsdp", None))
    param_sh = fsdp_shardings(params, mesh)
    T = cfg.ctx_len

    def evaluate(params, val_ids, key):
        L = val_ids.shape[0]

        def body(carry, k):
            ix = jax.random.randint(k, (batch,), 0, L - T - 1)
            offs = ix[:, None] + jnp.arange(T)[None, :]
            x = jax.lax.with_sharding_constraint(val_ids[offs], batch_sh)
            y = jax.lax.with_sharding_constraint(val_ids[offs + 1],
                                                 batch_sh)
            return carry + gpt_loss(params, x, y, cfg, attn_fn=attn_fn), None

        keys = jax.random.split(key, batches)
        total, _ = jax.lax.scan(body, jnp.float32(0), keys)
        return total / batches

    return jax.jit(
        evaluate,
        in_shardings=(param_sh, repl, repl),
        out_shardings=repl,
    )
