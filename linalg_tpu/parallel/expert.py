"""Expert parallelism: MoE expert weights sharded over an 'ep' mesh axis.

The MoE layer (models.moe) keeps all routing math as dense einsums over an
explicit expert axis, so expert parallelism is pure GSPMD: shard the E axis
of the expert weights (and nothing else) and XLA lowers the dispatch
einsum ``nec,nd->ecd`` / combine ``nec,ecd->nd`` into the all-to-all style
collectives over ICI. No shard_map, no hand-written comm.

Composes with data parallelism: pass a ('dp', 'ep') mesh and the batch is
dp-sharded while experts are ep-sharded.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.moe import MoEGPTConfig, moe_gpt_loss

__all__ = [
    "moe_param_specs",
    "make_ep_train_step",
    "make_ep_device_train_step",
    "make_ep_eval",
]


def moe_param_specs(cfg=None) -> dict:
    """PartitionSpecs for the MoE-GPT pytree: expert axis (axis 1 of the
    (L, E, ...) stacked weights) on 'ep'; attention/router/embeddings
    replicated."""
    layer_specs = {
        "ln1_g": P(), "ln1_b": P(),
        "Wq": P(), "Wk": P(), "Wv": P(), "Wo": P(),
        "ln2_g": P(), "ln2_b": P(),
        "Wr": P(),
        "W1": P(None, "ep", None, None),
        "b1": P(None, "ep", None),
        "W2": P(None, "ep", None, None),
        "b2": P(None, "ep", None),
    }
    if cfg is not None and getattr(cfg, "gated_ffn", False):
        # gated experts: the gate branch shards on the expert axis like W1
        layer_specs["Wg"] = P(None, "ep", None, None)
        layer_specs["bg"] = P(None, "ep", None)
    specs = {"tok_W": P(), "head_b": P(), "layers": layer_specs}
    if cfg is not None and getattr(cfg, "pos", None) == "learned":
        specs["pos_W"] = P()  # replicated learned-position table
    return specs


def _einsum_cfg(cfg: MoEGPTConfig) -> MoEGPTConfig:
    """ep-sharded steps keep the GShard dense-dispatch einsums: GSPMD turns
    them into all-to-alls over ICI; gathers indexed across a sharded expert
    axis lower to much worse collectives."""
    import dataclasses as _dc

    return cfg if cfg.dispatch == "einsum" else _dc.replace(
        cfg, dispatch="einsum")


def make_ep_train_step(cfg: MoEGPTConfig, mesh: Mesh, *,
                       lr: float = 3e-4, weight_decay: float = 0.01,
                       dp_axis: Optional[str] = None):
    """jitted (params, opt_state, x, y) -> (params, opt_state, loss) with
    experts ep-sharded (and the batch dp-sharded when ``dp_axis`` given)."""
    from ..train.optim import AdamWState, adamw_update, gpt_wd_mask

    assert cfg.n_experts % mesh.shape["ep"] == 0, (
        "n_experts must divide by the ep axis size"
    )
    cfg = _einsum_cfg(cfg)
    pspecs = moe_param_specs(cfg)
    param_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs,
                            is_leaf=lambda v: isinstance(v, P))
    scalar_sh = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(dp_axis, None))
    opt_state_sh = AdamWState(m=param_sh, v=param_sh, t=scalar_sh)

    def step(params, opt_state, x, y):
        loss, grads = jax.value_and_grad(
            lambda p, xx, yy: moe_gpt_loss(p, xx, yy, cfg)
        )(params, x, y)
        wd_tree = gpt_wd_mask(params, weight_decay)
        params, opt_state = adamw_update(params, grads, opt_state, lr,
                                         wd_tree)
        return params, opt_state, loss

    return jax.jit(
        step,
        in_shardings=(param_sh, opt_state_sh, batch_sh, batch_sh),
        out_shardings=(param_sh, opt_state_sh, scalar_sh),
    )


def _ep_shardings(cfg: MoEGPTConfig, mesh: Mesh):
    from ..train.optim import AdamWState

    assert cfg.n_experts % mesh.shape["ep"] == 0, (
        "n_experts must divide by the ep axis size"
    )
    param_sh = jax.tree.map(lambda s: NamedSharding(mesh, s),
                            moe_param_specs(cfg),
                            is_leaf=lambda v: isinstance(v, P))
    scalar_sh = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("dp", None))
    opt_sh = AdamWState(m=param_sh, v=param_sh, t=scalar_sh)
    return param_sh, opt_sh, batch_sh, scalar_sh


def make_ep_device_train_step(cfg: MoEGPTConfig, mesh: Mesh,
                              batch_size: int, *, base_lr: float,
                              min_lr: float, warmup: int, max_steps: int,
                              weight_decay: float,
                              lr_embed_scale: float = 1.0,
                              lr_head_scale: float = 1.0,
                              clip_norm: float = 0.0):
    """Device-resident dp x ep MoE step: (params, opt, data_ids, key) ->
    (params, opt, key, loss).

    The MoE twin of ``sharding.make_sharded_device_train_step``: the corpus
    stays on device (replicated), batch windows are sampled inside the jit
    and dp-sharded, experts are ep-sharded (GSPMD turns the dispatch
    einsums into all-to-alls over ICI), and attention runs the fused flash
    kernel via shard_map with heads replicated over 'ep'.
    """
    from ..train.optim import adamw_update, gpt_lr_scales, gpt_wd_mask, \
        warmup_cosine
    from .sharding import make_sharded_attn

    cfg = _einsum_cfg(cfg)
    param_sh, opt_sh, batch_sh, scalar_sh = _ep_shardings(cfg, mesh)
    attn_fn = make_sharded_attn(mesh, cfg.ctx_len, cfg.d_head,
                                head_axis=None, cfg=cfg)
    B, T = batch_size, cfg.ctx_len

    def step(params, opt_state, data_ids, key):
        key, sub = jax.random.split(key)
        L = data_ids.shape[0]
        ix = jax.random.randint(sub, (B,), 0, L - T - 1)
        offs = ix[:, None] + jnp.arange(T)[None, :]
        x = jax.lax.with_sharding_constraint(data_ids[offs], batch_sh)
        y = jax.lax.with_sharding_constraint(data_ids[offs + 1], batch_sh)
        loss, grads = jax.value_and_grad(
            lambda p, xx, yy: moe_gpt_loss(p, xx, yy, cfg, attn_fn=attn_fn)
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
        in_shardings=(param_sh, opt_sh, scalar_sh, scalar_sh),
        out_shardings=(param_sh, opt_sh, scalar_sh, scalar_sh),
    )


def make_ep_eval(cfg: MoEGPTConfig, mesh: Mesh, batch: int, batches: int):
    """Device-resident dp x ep eval: mean val loss over ``batches`` windowed
    batches in one jit call (MoE twin of ``sharding.make_sharded_eval``)."""
    from .sharding import make_sharded_attn

    cfg = _einsum_cfg(cfg)
    param_sh, _, batch_sh, scalar_sh = _ep_shardings(cfg, mesh)
    attn_fn = make_sharded_attn(mesh, cfg.ctx_len, cfg.d_head,
                                head_axis=None, cfg=cfg)
    T = cfg.ctx_len

    def evaluate(params, val_ids, key):
        L = val_ids.shape[0]

        def body(carry, k):
            ix = jax.random.randint(k, (batch,), 0, L - T - 1)
            offs = ix[:, None] + jnp.arange(T)[None, :]
            x = jax.lax.with_sharding_constraint(val_ids[offs], batch_sh)
            y = jax.lax.with_sharding_constraint(val_ids[offs + 1], batch_sh)
            return carry + moe_gpt_loss(params, x, y, cfg,
                                        attn_fn=attn_fn), None

        keys = jax.random.split(key, batches)
        total, _ = jax.lax.scan(body, jnp.float32(0), keys)
        return total / batches

    return jax.jit(
        evaluate,
        in_shardings=(param_sh, scalar_sh, scalar_sh),
        out_shardings=scalar_sh,
    )
