"""AdamW from scratch (pure pytree optimizer) and LR schedules.

Capability parity with the reference's hand-written AdamW
(/root/reference/gpt.py:103-151): decoupled weight decay applied as
``p -= lr*wd*p`` before the moment update, betas (0.9, 0.95), bias
correction, per-parameter weight-decay rules (decay on matmul weights, none
on LayerNorm/embedding/bias — gpt.py:296-335).

TPU-first: state is a pytree mirroring the params, the update is one fused
``jax.tree.map`` inside the jitted train step — no Python-side per-parameter
loop, no id()-keyed state dict.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp

__all__ = ["AdamWState", "adamw_init", "adamw_update", "clip_by_global_norm",
           "gpt_wd_mask", "gpt_lr_scales", "warmup_cosine"]


def clip_by_global_norm(grads, max_norm: float):
    """Scale the gradient pytree so its global L2 norm is <= ``max_norm``.

    The standard large-model stabilizer (the reference has no equivalent —
    its AdamW consumes raw grads, gpt.py:121-151). Returns (clipped_grads,
    global_norm); the scale is computed in f32 regardless of grad dtype so
    bf16 training clips on an accurate norm.
    """
    sq = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
             for g in jax.tree.leaves(grads))
    norm = jnp.sqrt(sq)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
    return jax.tree.map(lambda g: (g * scale).astype(g.dtype), grads), norm


class AdamWState(NamedTuple):
    m: Any
    v: Any
    t: jnp.ndarray


def adamw_init(params) -> AdamWState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamWState(m=zeros, v=jax.tree.map(jnp.zeros_like, params),
                      t=jnp.zeros((), jnp.int32))


def adamw_update(
    params,
    grads,
    state: AdamWState,
    lr,
    wd_tree,
    b1: float = 0.9,
    b2: float = 0.95,
    eps: float = 1e-8,
    lr_scales=None,
    clip_norm: float = 0.0,
) -> Tuple[Any, AdamWState]:
    """One AdamW step. ``wd_tree`` is a pytree of per-leaf weight-decay
    coefficients (floats), same structure as params. ``lr_scales`` is an
    optional pytree of per-leaf lr multipliers (param-group lr, reference
    gpt.py's --lr_embed/--lr_head intent). ``clip_norm`` > 0 clips the
    gradient pytree to that global L2 norm first — placed HERE so every
    train-step builder (single-chip and all sharded axes) gets it from one
    seam; under GSPMD/shard_map the grads arriving here are already the
    globally-reduced full-batch grads, so the clip is the global one."""
    if clip_norm > 0.0:
        grads, _ = clip_by_global_norm(grads, clip_norm)
    t = state.t + 1
    tf = t.astype(jnp.float32)
    c1 = 1.0 - b1**tf
    c2 = 1.0 - b2**tf

    def leaf(p, g, m, v, wd, s):
        lr_l = lr * s
        m = b1 * m + (1.0 - b1) * g
        v = b2 * v + (1.0 - b2) * (g * g)
        mhat = m / c1
        vhat = v / c2
        p = p - lr_l * wd * p  # decoupled decay (no-op when wd == 0)
        p = p - lr_l * mhat / (jnp.sqrt(vhat) + eps)
        return p, m, v

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state.m)
    flat_v = treedef.flatten_up_to(state.v)
    flat_wd = treedef.flatten_up_to(wd_tree)
    flat_s = ([1.0] * len(flat_p) if lr_scales is None
              else treedef.flatten_up_to(lr_scales))
    out = [leaf(p, g, m, v, wd, s)
           for p, g, m, v, wd, s in zip(flat_p, flat_g, flat_m, flat_v,
                                        flat_wd, flat_s)]
    new_p = treedef.unflatten([o[0] for o in out])
    new_m = treedef.unflatten([o[1] for o in out])
    new_v = treedef.unflatten([o[2] for o in out])
    return new_p, AdamWState(m=new_m, v=new_v, t=t)


def gpt_wd_mask(params, wd: float):
    """Weight-decay tree for the GPT param pytree: decay on attention/FFN
    matmul weights only; zero on embeddings, head bias, LayerNorm params and
    FFN biases (reference rules, gpt.py:296-335)."""
    decay_keys = {"Wq", "Wk", "Wv", "Wo", "W1", "W2", "Wg"}

    def build(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        return wd if name in decay_keys else 0.0

    return jax.tree_util.tree_map_with_path(build, params)


def gpt_lr_scales(params, *, embed: float = 1.0, head: float = 1.0):
    """Per-leaf lr multipliers for the GPT pytree, honoring the reference
    CLI's --lr_embed/--lr_head param groups (gpt.py:352-358 parsed but
    ignored them; here they take effect). With the weight-tied head, the
    embedding matrix carries BOTH roles, so ``embed`` scales ``tok_W`` and
    ``head`` scales the head bias."""

    def build(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "tok_W":
            return embed
        if name == "head_b":
            return head
        return 1.0

    return jax.tree_util.tree_map_with_path(build, params)


def warmup_cosine(step, *, base: float, min_lr: float, warmup: int, max_steps: int):
    """Linear warmup then cosine decay to min_lr (reference gpt.py:289-294).
    Traceable: step may be a traced int."""
    step = jnp.asarray(step, jnp.float32)
    warm = base * step / max(1, warmup)
    t = (step - warmup) / max(1, max_steps - warmup)
    cos = min_lr + 0.5 * (base - min_lr) * (1 + jnp.cos(jnp.pi * t))
    return jnp.where(step < warmup, warm, cos)
