"""LoRA: low-rank adaptation finetuning for the GPT stack.

The reference has no finetuning story at all — its only training entry
point is full-parameter training from scratch or a resumed checkpoint
(/root/reference/gpt.py:255-273). This module adds the standard
parameter-efficient finetune: every target weight W gets a frozen base
plus a trainable low-rank delta,

    W_eff = W + (alpha / rank) * A @ B,       A: (d_in, r), B: (r, d_out)

with B zero-initialized so training starts EXACTLY at the base model
(Hu et al. 2021, "LoRA: Low-Rank Adaptation of Large Language Models").

TPU-first design: adapters keep the stacked-(L, ...) layout of
``init_gpt_params`` (models/gpt.py:128-164), and adaptation is a PURE
PYTREE TRANSFORM — ``lora_merge`` builds the effective dense params
inside the jitted step (one (L, d, r) x (L, r, d) einsum per target,
negligible next to the model matmuls; XLA fuses the add into the
consumers). Because merging happens at the param level rather than
inside the layer code, EVERY existing execution path — flash kernels,
KV-cached decode, the serve engine, quantization, sharded meshes — runs
adapted models unchanged: for inference, merge once and the adapter
disappears (zero runtime overhead, the whole point of LoRA over
bottleneck adapters).

Training differentiates the loss w.r.t. the ADAPTER pytree only; the
base params are a closed-over constant. Optimizer state is O(rank/d)
of full finetuning: at d_model 512, rank 8, "attn" targets, the
adapters are ~3% of the model's parameters.
"""

from __future__ import annotations

import dataclasses
import json
import math
import pathlib
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["LoRAConfig", "init_lora_params", "lora_merge", "save_lora",
           "load_lora", "TARGET_SETS", "init_lora_stacks", "stack_lora",
           "lora_decode_ops", "lora_merge_stacks"]

# which stacked layer weights get adapters; "attn" is the classic LoRA
# recipe (attention projections only), "all" adds the FFN matmuls
TARGET_SETS: Dict[str, Tuple[str, ...]] = {
    "attn": ("Wq", "Wk", "Wv", "Wo"),
    # "all" adds the FFN matmuls; Wg (the swiglu/geglu gate branch) is
    # skipped automatically on ungated configs (init_lora_params filters
    # to the keys present in the pytree)
    "all": ("Wq", "Wk", "Wv", "Wo", "W1", "W2", "Wg"),
}


@dataclasses.dataclass(frozen=True)
class LoRAConfig:
    rank: int = 8
    alpha: float = 16.0  # delta scale = alpha / rank (PEFT convention)
    targets: str = "attn"  # key into TARGET_SETS

    def __post_init__(self):
        if self.rank < 1:
            raise ValueError("LoRA rank must be >= 1")
        if self.targets not in TARGET_SETS:
            raise ValueError(
                f"targets must be one of {sorted(TARGET_SETS)}, "
                f"got {self.targets!r}")

    @property
    def scale(self) -> float:
        return self.alpha / self.rank


def init_lora_params(params, lcfg: LoRAConfig, seed: int = 0):
    """Adapter pytree for a GPT/MoE param pytree.

    For each target name ``W`` with stacked shape (L, d_in, d_out), the
    adapters are ``W_A``: (L, d_in, r) ~ N(0, 1/r) and ``W_B``:
    (L, r, d_out) = 0 — the zero B makes the initial delta exactly zero,
    so step 0 of finetuning reproduces the base model bit-for-bit.
    """
    rng = np.random.default_rng(seed)
    r = lcfg.rank
    out = {}
    layers = params["layers"]
    for name in TARGET_SETS[lcfg.targets]:
        if name not in layers:  # MoE configs route FFN through experts
            continue
        L, din, dout = layers[name].shape
        out[f"{name}_A"] = jnp.asarray(
            rng.normal(0.0, 1.0 / math.sqrt(r), size=(L, din, r)),
            jnp.float32)
        out[f"{name}_B"] = jnp.zeros((L, r, dout), jnp.float32)
    if not out:
        raise ValueError("no LoRA targets present in this param pytree")
    return {"layers": out}


def lora_merge(params, lora, lcfg: LoRAConfig):
    """Effective dense params: base + (alpha/rank) * A @ B per target.

    Pure and jit-safe; used both INSIDE the finetune step (so grads flow
    through the merge into A/B only — ``params`` is a constant there) and
    once at load time for inference (after which the adapter costs
    nothing).
    """
    scale = lcfg.scale
    layers = dict(params["layers"])
    for key, a in lora["layers"].items():
        if not key.endswith("_A"):
            continue
        name = key[:-2]
        b = lora["layers"][f"{name}_B"]
        delta = scale * jnp.einsum("lir,lro->lio", a, b)
        layers[name] = layers[name] + delta.astype(layers[name].dtype)
    return dict(params, layers=layers)


# ---------------------------------------------------------------------------
# Multi-LoRA serving: stacked adapters + a per-slot low-rank decode path
# ---------------------------------------------------------------------------


def init_lora_stacks(params, max_loras: int, rank: int, dtype=None):
    """Zeroed adapter STACKS for multi-tenant serving: per attention
    target, A: (L, max_loras+1, d_in, rank) and B: (L, max_loras+1, rank,
    d_out), plus a per-adapter ``scale`` vector. Index 0 is the base
    model (all-zero adapter). Fixed shapes — registering an adapter
    writes a row and never recompiles the engine."""
    layers = params["layers"]
    dt = dtype or layers["Wq"].dtype
    out = {"scale": jnp.zeros((max_loras + 1,), jnp.float32)}
    for name in TARGET_SETS["attn"]:
        L, din, dout = layers[name].shape
        out[f"{name}_A"] = jnp.zeros((L, max_loras + 1, din, rank), dt)
        out[f"{name}_B"] = jnp.zeros((L, max_loras + 1, rank, dout), dt)
    return out


def stack_lora(stacks, lora, lcfg: LoRAConfig, idx: int):
    """Write adapter ``lora`` into row ``idx`` of the stacks, zero-padding
    a smaller rank up to the stack's. Targets must be "attn" (the decode
    side-path adapts the attention projections)."""
    if lcfg.targets != "attn":
        raise ValueError("multi-LoRA serving supports targets='attn'")
    r_stack = stacks["Wq_A"].shape[-1]
    if lcfg.rank > r_stack:
        raise ValueError(
            f"adapter rank {lcfg.rank} exceeds the engine's lora_rank "
            f"{r_stack}")
    out = dict(stacks, scale=stacks["scale"].at[idx].set(lcfg.scale))
    for name in TARGET_SETS["attn"]:
        a = lora["layers"][f"{name}_A"]
        b = lora["layers"][f"{name}_B"]
        pad = r_stack - lcfg.rank
        if pad:
            a = jnp.pad(a, ((0, 0), (0, 0), (0, pad)))
            b = jnp.pad(b, ((0, 0), (0, pad), (0, 0)))
        dt = stacks[f"{name}_A"].dtype
        out[f"{name}_A"] = stacks[f"{name}_A"].at[:, idx].set(a.astype(dt))
        out[f"{name}_B"] = stacks[f"{name}_B"].at[:, idx].set(b.astype(dt))
    return out


def lora_merge_stacks(params, stacks, idx):
    """Effective dense params for stack row ``idx`` (0 = the all-zero base
    row): base + scale[idx] * A[:, idx] @ B[:, idx] per attention target.

    Pure and jit-safe with a TRACED ``idx``: the multi-LoRA engine calls
    this INSIDE its jitted admission prefill, so the merged weights exist
    only as transients of one XLA invocation — steady-state engine HBM is
    base + stacks, never O(adapters x model) (the round-4 design kept a
    persistent merged copy per registered adapter)."""
    idx = jnp.asarray(idx, jnp.int32)
    sc = stacks["scale"][idx]
    layers = dict(params["layers"])
    for name in TARGET_SETS["attn"]:
        a = stacks[f"{name}_A"][:, idx].astype(jnp.float32)  # (L, d_in, r)
        b = stacks[f"{name}_B"][:, idx].astype(jnp.float32)  # (L, r, d_out)
        delta = sc * jnp.einsum("lir,lro->lio", a, b)
        layers[name] = layers[name] + delta.astype(layers[name].dtype)
    return dict(params, layers=layers)


def lora_decode_ops(ops, stacks, ids, cfg):
    """Wrap a decode ``ops`` dict (models.gpt._dt_decode_ops) so each
    SLOT's token runs through its own adapter: per layer and target,
    y += scale[id_b] * (x @ A[id_b]) @ B[id_b] — the low-rank side-path
    form (merged weights cannot batch slots that wear different
    adapters; the side-path gathers (B, d, r) adapter rows instead,
    which is tiny next to the shared base matvec). ``ids`` is the (B,)
    per-slot adapter-id vector; id 0 is the all-zero base row, so
    un-adapted slots pay two einsums of zeros rather than a branch.
    """
    del cfg
    sc = stacks["scale"][ids]  # (B,)
    base_qkv, base_out = ops["qkv"], ops["out"]

    def delta(x, a_l, b_l):
        # x: (B, 1, d_in); a_l: (n, d_in, r); b_l: (n, r, d_out)
        lo = jnp.einsum("btd,bdr->btr", x, a_l[ids].astype(x.dtype))
        hi = jnp.einsum("btr,bro->bto", lo, b_l[ids].astype(x.dtype))
        return hi * sc[:, None, None].astype(x.dtype)

    def qkv(lw, xn):
        base = base_qkv(lw, xn)
        return base + jnp.concatenate(
            [delta(xn, lw["Wq_A"], lw["Wq_B"]),
             delta(xn, lw["Wk_A"], lw["Wk_B"]),
             delta(xn, lw["Wv_A"], lw["Wv_B"])], axis=-1)

    def out(lw, y):
        return base_out(lw, y) + delta(y, lw["Wo_A"], lw["Wo_B"])

    lws = dict(ops["lws"])
    for name in TARGET_SETS["attn"]:
        lws[f"{name}_A"] = stacks[f"{name}_A"]
        lws[f"{name}_B"] = stacks[f"{name}_B"]
    return dict(ops, lws=lws, qkv=qkv, out=out)


def save_lora(path, lora, lcfg: LoRAConfig):
    """Adapter-only checkpoint: flat npz + JSON meta (rank/alpha/targets).
    Mirrors the base checkpoint's npz+sidecar discipline
    (train/checkpoint.py; reference gpt.py:438-476)."""
    path = pathlib.Path(path)
    path.mkdir(parents=True, exist_ok=True)
    flat = {k: np.asarray(v) for k, v in lora["layers"].items()}
    np.savez_compressed(path / "lora_adapters.npz", **flat)
    (path / "lora_meta.json").write_text(json.dumps({
        "rank": lcfg.rank, "alpha": lcfg.alpha, "targets": lcfg.targets,
    }), encoding="utf-8")
    return path / "lora_adapters.npz"


def load_lora(path):
    """Returns (lora_pytree, LoRAConfig). Raises on a missing/invalid dir
    (callers decide whether that means fresh-init, as the trainer's
    resume-or-init does for base checkpoints)."""
    path = pathlib.Path(path)
    meta = json.loads((path / "lora_meta.json").read_text(encoding="utf-8"))
    lcfg = LoRAConfig(rank=int(meta["rank"]), alpha=float(meta["alpha"]),
                      targets=str(meta["targets"]))
    with np.load(path / "lora_adapters.npz") as z:
        layers = {k: jnp.asarray(z[k]) for k in z.files}
    return {"layers": layers}, lcfg
