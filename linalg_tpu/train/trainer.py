"""Char/BPE-GPT trainer: jitted train step, eval, best-val checkpointing,
sampling.

Capability parity with the reference's training loop
(/root/reference/gpt.py:255-478): AdamW(lr 3e-4, betas (0.9, 0.95), wd
rules), linear-warmup + cosine schedule, 90/10 split, random-window batches,
loss prints every 20 steps, val eval every ``eval_every`` with
save-best-checkpoint, resume-or-init on start.

TPU-first: the whole step (forward, hand-derived backward via custom_vjp,
AdamW update, LR schedule) is ONE jitted XLA computation; only batch
sampling and checkpoint writes cross the host boundary. Multi-device
training (``--dp/--tp/--sp/--pp``, and ``--experts`` for expert
parallelism) shares this single loop — each axis only swaps which
device-resident step/eval builder is used.
"""

from __future__ import annotations

import pathlib
import time
from functools import partial
from typing import Iterator, Tuple

import jax
from jax import lax
import jax.numpy as jnp
import numpy as np

from ..models.gpt import GPTConfig, gpt_loss, gpt_prefill, init_gpt_params
from .checkpoint import load_ckpt, load_tokenizer, save_ckpt
from .data import load_text
from .optim import (adamw_init, adamw_update, gpt_lr_scales, gpt_wd_mask,
                    warmup_cosine)

__all__ = ["train", "train_sharded", "train_lora", "sample",
           "make_train_step", "eval_avg"]


def _loss_fn_for(cfg: GPTConfig):
    """Pick the loss for the config type (dense GPT vs routed MoE)."""
    from ..models.moe import MoEGPTConfig, moe_gpt_loss

    return moe_gpt_loss if isinstance(cfg, MoEGPTConfig) else gpt_loss


def make_train_step(cfg: GPTConfig, *, base_lr: float, min_lr: float,
                    warmup: int, max_steps: int, weight_decay: float):
    """Build the jitted (params, opt_state, x, y, step) -> updated fn."""
    loss_fn = _loss_fn_for(cfg)

    @jax.jit
    def train_step(params, opt_state, x, y, step):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y, cfg)
        lr = warmup_cosine(step, base=base_lr, min_lr=min_lr,
                           warmup=warmup, max_steps=max_steps)
        wd_tree = gpt_wd_mask(params, weight_decay)
        params, opt_state = adamw_update(params, grads, opt_state, lr, wd_tree)
        return params, opt_state, loss

    return train_step


def make_device_train_step(cfg: GPTConfig, batch_size: int, *, base_lr: float,
                           min_lr: float, warmup: int, max_steps: int,
                           weight_decay: float, lr_embed_scale: float = 1.0,
                           lr_head_scale: float = 1.0, grad_accum: int = 1,
                           clip_norm: float = 0.0, lora=None):
    """Fully device-resident step: batch windows are SAMPLED ON DEVICE.

    The corpus token array is uploaded once; each step draws random windows
    with jax.random + a gather inside the jit. This removes the per-step
    host->device transfer, which costs ~40 ms of round-trip latency on this
    runtime — 20x the actual compute of a step at the published config.

    ``grad_accum`` > 1 splits the batch into that many sequential
    microbatches inside the jit (lax.scan over value_and_grad) and applies
    ONE optimizer update on the averaged gradients — mathematically the
    full-batch step (equal microbatch sizes: mean of means == mean), at
    1/grad_accum the activation memory. For effective batches whose
    activations don't fit HBM (long context, wide d_model).

    ``lora`` = (frozen_base_params, LoRAConfig) switches the step to
    parameter-efficient finetuning: the trainable pytree is the ADAPTER
    tree, the loss runs on ``lora_merge(frozen, adapters)`` (the merge is
    traced into the jit, so grads flow only into A/B), and the base is a
    closed-over constant. The name-keyed wd/lr masks see adapter leaf
    names ("Wq_A", ...) and correctly give them zero decay and unit lr
    scale.
    """
    B = batch_size
    T = cfg.ctx_len
    if grad_accum < 1 or B % grad_accum:
        raise ValueError(
            f"grad_accum must divide batch_size: {grad_accum} vs {B}"
        )
    micro = B // grad_accum
    loss_fn = _loss_fn_for(cfg)
    if lora is not None:
        from ..models.lora import lora_merge

        frozen, lcfg = lora
        base_loss = loss_fn

        def loss_fn(adapters, x, y, cfg):
            return base_loss(lora_merge(frozen, adapters, lcfg), x, y, cfg)

    # NOT donated: donating params/opt_state here measured +9.5 ms/step
    # (+52%) on this runtime even at the every-20-step sync cadence — the
    # donated execution serializes with the periodic scalar readback
    # (docs/repro_dispatch_queue.py). The in-place-update memory win is
    # not worth a 1.5x step time on the bench hardware.
    @jax.jit
    def train_step(params, opt_state, data_ids, key):
        key, sub = jax.random.split(key)  # RNG advances on device
        L = data_ids.shape[0]
        ix = jax.random.randint(sub, (B,), 0, L - T - 1)
        offs = ix[:, None] + jnp.arange(T)[None, :]
        x = data_ids[offs]
        y = data_ids[offs + 1]
        if grad_accum == 1:
            loss, grads = jax.value_and_grad(loss_fn)(params, x, y, cfg)
        else:
            xm = x.reshape(grad_accum, micro, T)
            ym = y.reshape(grad_accum, micro, T)

            def accum(carry, xy):
                loss_acc, g_acc = carry
                l, g = jax.value_and_grad(loss_fn)(params, *xy, cfg)
                return (loss_acc + l, jax.tree.map(jnp.add, g_acc, g)), None

            zeros = jax.tree.map(jnp.zeros_like, params)
            (loss, grads), _ = lax.scan(accum, (jnp.float32(0), zeros),
                                        (xm, ym))
            inv = 1.0 / grad_accum
            loss = loss * inv
            grads = jax.tree.map(lambda g: g * inv, grads)
        # the AdamW state's own step counter drives the schedule — no
        # per-step host scalar crosses the tunnel
        lr = warmup_cosine(opt_state.t + 1, base=base_lr, min_lr=min_lr,
                           warmup=warmup, max_steps=max_steps)
        wd_tree = gpt_wd_mask(params, weight_decay)
        lr_tree = gpt_lr_scales(params, embed=lr_embed_scale,
                                head=lr_head_scale)
        params, opt_state = adamw_update(params, grads, opt_state, lr, wd_tree,
                                         lr_scales=lr_tree,
                                         clip_norm=clip_norm)
        return params, opt_state, key, loss

    return train_step


@partial(jax.jit, static_argnames=("cfg",))
def _eval_loss(params, x, y, cfg: GPTConfig):
    return _loss_fn_for(cfg)(params, x, y, cfg)


def eval_avg(params, cfg: GPTConfig, it: Iterator, batches: int = 10) -> float:
    losses = []
    for _ in range(batches):
        x, y = next(it)
        losses.append(float(_eval_loss(params, jnp.asarray(x), jnp.asarray(y), cfg)))
    return float(np.mean(losses))


@partial(jax.jit, static_argnames=("cfg", "batch", "batches"))
def _eval_device(params, val_ids, key, cfg: GPTConfig, batch: int, batches: int):
    """Mean val loss over ``batches`` randomly-windowed device batches —
    one jit call, one scalar readback."""
    T = cfg.ctx_len
    L = val_ids.shape[0]

    loss_fn = _loss_fn_for(cfg)

    def body(carry, k):
        ix = jax.random.randint(k, (batch,), 0, L - T - 1)
        offs = ix[:, None] + jnp.arange(T)[None, :]
        x = val_ids[offs]
        y = val_ids[offs + 1]
        return carry + loss_fn(params, x, y, cfg), None

    keys = jax.random.split(key, batches)
    total, _ = jax.lax.scan(body, jnp.float32(0), keys)
    return total / batches


# ---------------------------------------------------------------------------
# shared resume-or-init + training loop (used by every parallelism axis)
# ---------------------------------------------------------------------------


def _make_tokenizer(args, text: str):
    """Fresh-model tokenizer from CLI flags: char (reference default) or
    byte-level BPE (``--tokenizer bpe --vocab_size N``)."""
    kind = getattr(args, "tokenizer", "char") or "char"
    if kind == "bpe":
        from ..nn.tokenizers import BPETokenizer

        return BPETokenizer.train(
            text, int(getattr(args, "vocab_size", 512) or 512))
    from ..nn.tokenizers import CharTokenizer

    return CharTokenizer(text)


def _tok_maps(tok) -> Tuple[dict, dict]:
    """(stoi, itos) for the meta sidecar: the reference's char maps, or
    empty dicts for BPE (whose state is the merge table)."""
    if hasattr(tok, "stoi"):
        return tok.stoi, tok.itos
    return {}, {}


def _resume_or_init(args):
    """Reference resume-or-init semantics (gpt.py:264-273): try the
    checkpoint; on ANY failure build a fresh model from the flags.

    Returns (text, params, cfg, tok, stoi, itos).
    """
    text = load_text(getattr(args, "data", None))
    try:
        params, cfg, stoi, itos = load_ckpt(args.ckpt_dir)
        tok = load_tokenizer(args.ckpt_dir)
        print(f"resumed from {args.ckpt_dir}")
        return text, params, cfg, tok, stoi, itos
    except Exception:
        print("Error loading checkpoint, starting from scratch")
    tok = _make_tokenizer(args, text)
    stoi, itos = _tok_maps(tok)
    common = dict(
        vocab_size=tok.vocab_size,
        d_model=args.d_model,
        n_heads=args.heads,
        n_layers=args.layers,
        ctx_len=args.ctx_len,
        pos=getattr(args, "pos", "sinusoidal") or "sinusoidal",
        dtype=getattr(args, "dtype", "float32") or "float32",
        n_kv_heads=getattr(args, "kv_heads", None),  # GQA/MQA
        window=getattr(args, "window", None),  # sliding-window attention
        ffn=getattr(args, "ffn", "relu") or "relu",  # FFN variant
    )
    n_experts = int(getattr(args, "experts", 0) or 0)
    if n_experts > 0:
        from ..models.moe import MoEGPTConfig, init_moe_params

        cfg = MoEGPTConfig(
            n_experts=n_experts,
            router_top_k=int(getattr(args, "router_top_k", 1) or 1),
            dispatch=getattr(args, "dispatch", "einsum") or "einsum",
            **common,
        )
        params = init_moe_params(cfg, seed=123)
    else:
        cfg = GPTConfig(**common)
        params = init_gpt_params(cfg, seed=123)
    return text, params, cfg, tok, stoi, itos


class _MetricsLog:
    """Append-mode JSONL metrics sink (``--log_file``); None path = no-op.

    Rows are written only at the loop's EXISTING host-sync points (the
    every-20-step loss readback and evals) — observability must not add
    device round trips. Append mode keeps the history across
    resume-or-init restarts.
    """

    def __init__(self, path):
        self._f = open(path, "a", encoding="utf-8") if path else None

    def write(self, **row):
        if self._f is not None:
            import json

            self._f.write(json.dumps(row) + "\n")
            self._f.flush()

    def close(self):
        if self._f is not None:
            self._f.close()


def _train_loop(args, cfg, params, opt_state, key, step_fn, eval_fn,
                train_ids, val_ids, tok, stoi, itos, desc: str,
                save_fn=None):
    """The one training loop every axis shares.

    ``step_fn(params, opt_state, train_ids, key) -> (params, opt_state,
    key, loss)`` and ``eval_fn(params, val_ids, key) -> scalar`` are the
    only axis-specific pieces. Printing every 20 steps is the only host
    sync; it also caps the async dispatch queue (deep queues degrade
    badly on this runtime — docs/repro_dispatch_queue.py).

    ``save_fn(params) -> path`` overrides best-checkpoint saving (LoRA
    saves adapter-only checkpoints, not the frozen base).
    """
    from ..utils.profiling import StepTimer, trace

    best = 1e9
    t0 = time.time()
    tokens_per_step = args.batch_size * cfg.ctx_len
    timer = StepTimer(tokens_per_step, window=10)
    last_sync = 0
    mlog = _MetricsLog(getattr(args, "log_file", None))
    with trace(getattr(args, "profile", None)):
        for step in range(1, args.steps + 1):
            params, opt_state, key, loss = step_fn(
                params, opt_state, train_ids, key
            )
            if step % 20 == 0 or step == 1:
                loss_f = float(loss)  # the host sync point
                timer.tick(step - last_sync)
                last_sync = step
                rate = (f"  ({timer.steps_per_sec:.1f} steps/s, "
                        f"{timer.tokens_per_sec:.0f} tok/s)"
                        if step > 1 else "")
                print(f"step {step:6d}  loss {loss_f:.4f}{rate}")
                mlog.write(event="train", step=step, loss=loss_f,
                           steps_per_sec=(timer.steps_per_sec
                                          if step > 1 else None),
                           tokens_per_sec=(timer.tokens_per_sec
                                           if step > 1 else None),
                           elapsed_s=round(time.time() - t0, 3))
            if step % args.eval_every == 0:
                key, sub = jax.random.split(key)
                val_loss = float(eval_fn(params, val_ids, sub))
                print(f"[eval] step {step:6d}  val_loss {val_loss:.4f}")
                saved = None
                if val_loss < best:
                    best = val_loss
                    path = (save_fn(params) if save_fn is not None else
                            save_ckpt(args.ckpt_dir, params, cfg, stoi,
                                      itos, tokenizer=tok))
                    print(f"  saved best -> {path}  (val {best:.4f})")
                    saved = str(path)
                mlog.write(event="eval", step=step, val_loss=val_loss,
                           best=best, ckpt=saved,
                           elapsed_s=round(time.time() - t0, 3))
    dt = time.time() - t0
    print(f"done in {dt:.1f}s  ({desc}{args.steps / dt:.2f} steps/s, "
          f"{args.steps * tokens_per_step / dt:.0f} tok/s)")
    mlog.write(event="done", steps=args.steps, wall_s=round(dt, 3),
               steps_per_sec=round(args.steps / dt, 3),
               tokens_per_sec=round(args.steps * tokens_per_step / dt, 1),
               best_val_loss=(best if best < 1e9 else None))
    mlog.close()
    return params


def _lr_kwargs(args):
    base_lr = args.lr_model
    return dict(
        base_lr=base_lr, min_lr=base_lr / 10, warmup=200,
        max_steps=args.steps, weight_decay=args.weight_decay,
        lr_embed_scale=(getattr(args, "lr_embed", base_lr) / base_lr
                        if base_lr else 1.0),
        lr_head_scale=(getattr(args, "lr_head", base_lr) / base_lr
                       if base_lr else 1.0),
    )


def train_sharded(args, dp: int, tp: int) -> Tuple[dict, GPTConfig, dict, dict]:
    """Multi-device training over a dp x {tp|sp|pp|ep} mesh (GSPMD/shard_map).

    Same loop semantics as ``train``, and the same device-resident data
    path: the corpus is uploaded once (replicated over the mesh), batch
    windows are sampled with jax.random INSIDE the jitted step, eval runs
    as one device computation — no per-step host upload.

    Axis selection: ``--tp`` shards heads/FFN (megatron) — or EXPERTS when
    ``--experts`` is set; ``--sp`` shards the sequence (ring attention);
    ``--pp`` shards the layer stack (1F1B pipeline); ``--fsdp`` shards
    parameter/optimizer STORAGE over the data axis (ZeRO-3).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import make_mesh
    from ..parallel.sharding import (
        gpt_param_specs,
        make_sharded_device_train_step,
        make_sharded_eval,
    )
    from .optim import AdamWState

    from ..models.moe import MoEGPTConfig

    text, params, cfg, tok, stoi, itos = _resume_or_init(args)
    assert args.batch_size % dp == 0, "batch_size must divide by dp"

    # Model-parallel axis selection: MoE shards EXPERTS ('ep') with the
    # --tp degree; --sp shards the SEQUENCE (ring attention); --pp shards
    # the LAYER STACK (1F1B pipeline schedule).
    sp = int(getattr(args, "sp", 1) or 1)
    pp = int(getattr(args, "pp", 1) or 1)
    fsdp = int(getattr(args, "fsdp", 1) or 1)
    is_moe = isinstance(cfg, MoEGPTConfig)
    is_sp = sp > 1
    is_pp = pp > 1
    is_fsdp = fsdp > 1
    microbatches = 0
    if is_fsdp:
        from ..parallel.fsdp import fsdp_param_specs

        assert dp == 1 and tp == 1 and not (is_sp or is_pp), (
            "--fsdp is itself the data axis; it does not compose with "
            "--dp/--tp/--sp/--pp")
        assert not is_moe, "--fsdp with --experts is not supported"
        assert args.batch_size % fsdp == 0, "batch_size must divide by fsdp"
        mesh = make_mesh((fsdp,), ("fsdp",))
        pspecs = fsdp_param_specs(params, fsdp)
    elif is_pp:
        assert tp == 1 and not is_sp, "--pp composes with --dp only"
        assert cfg.pos != "learned", (
            "--pos learned is not supported with --pp (the pipeline "
            "stages hardcode sinusoidal/rope position handling)")
        assert not is_moe, "--pp with --experts is not supported"
        assert cfg.n_layers % pp == 0, "layers must divide by pp"
        from ..parallel.pipeline import pp_param_specs

        microbatches = int(getattr(args, "microbatches", 0) or 0)
        if microbatches <= 0:  # auto: 2*pp keeps the 1F1B bubble small
            microbatches = 2 * pp if args.batch_size % (dp * 2 * pp) == 0 \
                else pp
        assert args.batch_size % (dp * microbatches) == 0, (
            "batch_size must divide by dp * microbatches"
        )
        mesh = make_mesh((dp, pp), ("dp", "pp"))
        pspecs = pp_param_specs("dp")
    elif is_sp:
        assert tp == 1, "--sp composes with --dp only (not --tp)"
        assert not is_moe, "--sp with --experts is not supported"
        assert cfg.ctx_len % sp == 0, "ctx_len must divide by sp"
        mesh = make_mesh((dp, sp), ("dp", "sp"))
        pspecs = jax.tree.map(lambda s: P(), gpt_param_specs(None, cfg),
                              is_leaf=lambda v: isinstance(v, P))
    elif is_moe:
        from ..parallel.expert import (make_ep_device_train_step, make_ep_eval,
                                       moe_param_specs)

        assert cfg.n_experts % tp == 0, "n_experts must divide by tp (=ep)"
        mesh = make_mesh((dp, tp), ("dp", "ep"))
        pspecs = moe_param_specs(cfg)
    else:
        assert cfg.n_heads % tp == 0, "n_heads must divide by tp"
        mesh = make_mesh((dp, tp), ("dp", "tp"))
        pspecs = gpt_param_specs(None, cfg)
    param_sh = jax.tree.map(
        lambda s: NamedSharding(mesh, s), pspecs,
        is_leaf=lambda v: isinstance(v, P),
    )
    replicated = NamedSharding(mesh, P())
    params = jax.device_put(params, param_sh)
    opt_state = jax.device_put(
        adamw_init(params),
        AdamWState(m=param_sh, v=param_sh, t=replicated),
    )

    ids = tok.encode(text)
    split = int(0.9 * len(ids))
    train_ids = jax.device_put(jnp.asarray(ids[:split]), replicated)
    val_ids = jax.device_put(jnp.asarray(ids[split:]), replicated)

    lr_kwargs = _lr_kwargs(args)
    # global-norm clipping lives in adamw_update — one seam, every axis
    lr_kwargs["clip_norm"] = float(getattr(args, "clip_norm", 0.0) or 0.0)
    if int(getattr(args, "grad_accum", 1) or 1) > 1:
        # explicit > silent: the sharded steps don't microbatch (shard the
        # batch over dp instead, or drop the sharded axes)
        raise ValueError("--grad_accum composes with the single-chip "
                         "trainer only; use --dp to split the batch "
                         "across devices instead")
    if is_fsdp:
        from ..parallel.fsdp import (make_fsdp_device_train_step,
                                     make_fsdp_eval)

        step_fn = make_fsdp_device_train_step(cfg, mesh, params,
                                              args.batch_size, **lr_kwargs)
        eval_fn = make_fsdp_eval(cfg, mesh, params, args.batch_size, 10)
    elif is_pp:
        from ..parallel.pipeline import make_pp_device_train_step, make_pp_eval

        step_fn = make_pp_device_train_step(
            cfg, mesh, args.batch_size, n_microbatches=microbatches,
            **lr_kwargs)
        eval_fn = make_pp_eval(cfg, mesh, args.batch_size, 10,
                               n_microbatches=microbatches)
    elif is_sp:
        from ..parallel.sharding import (make_sp_device_train_step,
                                         make_sp_eval)

        ring_kind = getattr(args, "ring", "auto") or "auto"
        pallas = (jax.default_backend() == "tpu" if ring_kind == "auto"
                  else ring_kind == "pallas")
        step_fn = make_sp_device_train_step(cfg, mesh, args.batch_size,
                                            pallas=pallas, **lr_kwargs)
        eval_fn = make_sp_eval(cfg, mesh, args.batch_size, 10, pallas=pallas)
    elif is_moe:
        step_fn = make_ep_device_train_step(cfg, mesh, args.batch_size,
                                            **lr_kwargs)
        eval_fn = make_ep_eval(cfg, mesh, args.batch_size, 10)
    else:
        step_fn = make_sharded_device_train_step(cfg, mesh, args.batch_size,
                                                 **lr_kwargs)
        eval_fn = make_sharded_eval(cfg, mesh, args.batch_size, 10)

    key = jax.device_put(jax.random.PRNGKey(args.seed), replicated)
    if is_fsdp:
        desc = f"mesh fsdp={fsdp}, "
    else:
        axis = ("pp" if is_pp else "sp" if is_sp
                else "ep" if is_moe and tp > 1 else "tp")
        deg = pp if is_pp else sp if is_sp else tp
        desc = f"mesh dp={dp} {axis}={deg}, "
    params = _train_loop(args, cfg, params, opt_state, key, step_fn, eval_fn,
                         train_ids, val_ids, tok, stoi, itos, desc=desc)
    return params, cfg, stoi, itos


def train_lora(args) -> Tuple[dict, GPTConfig, dict, dict]:
    """LoRA finetune: freeze a trained base checkpoint, train rank-r
    adapters on the corpus, save adapter-only checkpoints to
    ``--lora_dir`` (default <ckpt_dir>/lora). Returns the MERGED params
    so callers chain straight into sampling. No reference counterpart —
    the reference's only training mode is full-parameter
    (/root/reference/gpt.py:255-273)."""
    from ..models.lora import (LoRAConfig, init_lora_params, load_lora,
                               lora_merge, save_lora)

    text = load_text(getattr(args, "data", None))
    try:
        params, cfg, stoi, itos = load_ckpt(args.ckpt_dir)
        tok = load_tokenizer(args.ckpt_dir)
    except Exception as e:
        raise ValueError(
            "LoRA finetuning adapts a TRAINED base model: --ckpt_dir must "
            "hold a loadable checkpoint (train one first, without "
            "--lora_rank)") from e
    lora_dir = getattr(args, "lora_dir", "") or str(
        pathlib.Path(args.ckpt_dir) / "lora")
    lcfg = LoRAConfig(rank=int(args.lora_rank),
                      alpha=float(getattr(args, "lora_alpha", 16.0)),
                      targets=getattr(args, "lora_targets", "attn"))
    try:
        adapters, lcfg = load_lora(lora_dir)
        print(f"resumed LoRA adapters from {lora_dir} "
              f"(rank {lcfg.rank}, targets {lcfg.targets})")
    except Exception:
        adapters = init_lora_params(params, lcfg, seed=args.seed)
        n_ad = sum(x.size for x in jax.tree.leaves(adapters))
        n_base = sum(x.size for x in jax.tree.leaves(params))
        print(f"fresh LoRA adapters: rank {lcfg.rank}, targets "
              f"{lcfg.targets}, {n_ad:,} trainable params "
              f"({100 * n_ad / n_base:.1f}% of the base model)")

    ids = tok.encode(text)
    split = int(0.9 * len(ids))
    train_ids = jnp.asarray(ids[:split])
    val_ids = jnp.asarray(ids[split:])

    opt_state = adamw_init(adapters)  # moments over adapters only
    step_fn = make_device_train_step(
        cfg, args.batch_size, lora=(params, lcfg),
        grad_accum=int(getattr(args, "grad_accum", 1) or 1),
        clip_norm=float(getattr(args, "clip_norm", 0.0) or 0.0),
        **_lr_kwargs(args))
    eval_fn = lambda a, v, k: _eval_device(
        lora_merge(params, a, lcfg), v, k, cfg, args.batch_size, 20)
    save_fn = lambda a: save_lora(lora_dir, a, lcfg)
    key = jax.random.PRNGKey(args.seed)
    adapters = _train_loop(args, cfg, adapters, opt_state, key, step_fn,
                           eval_fn, train_ids, val_ids, tok, stoi, itos,
                           desc="lora: ", save_fn=save_fn)
    return lora_merge(params, adapters, lcfg), cfg, stoi, itos


def train(args) -> Tuple[dict, GPTConfig, dict, dict]:
    """Run the training loop; returns (params, cfg, stoi, itos)."""
    dp = int(getattr(args, "dp", 1) or 1)
    tp = int(getattr(args, "tp", 1) or 1)
    sp = int(getattr(args, "sp", 1) or 1)
    pp = int(getattr(args, "pp", 1) or 1)
    fsdp = int(getattr(args, "fsdp", 1) or 1)
    if int(getattr(args, "lora_rank", 0) or 0) > 0:
        if dp * tp * sp * pp * fsdp > 1:
            raise ValueError("LoRA finetuning runs single-device; drop the "
                             "--dp/--tp/--sp/--pp/--fsdp flags")
        return train_lora(args)
    if dp * tp * sp * pp * fsdp > 1:
        return train_sharded(args, dp, tp)
    text, params, cfg, tok, stoi, itos = _resume_or_init(args)

    ids = tok.encode(text)
    split = int(0.9 * len(ids))
    train_ids = jnp.asarray(ids[:split])  # whole corpus on device, once
    val_ids = jnp.asarray(ids[split:])

    opt_state = adamw_init(params)
    step_fn = make_device_train_step(
        cfg, args.batch_size,
        grad_accum=int(getattr(args, "grad_accum", 1) or 1),
        clip_norm=float(getattr(args, "clip_norm", 0.0) or 0.0),
        **_lr_kwargs(args))
    eval_fn = lambda p, v, k: _eval_device(p, v, k, cfg, args.batch_size, 20)
    key = jax.random.PRNGKey(args.seed)
    params = _train_loop(args, cfg, params, opt_state, key, step_fn, eval_fn,
                         train_ids, val_ids, tok, stoi, itos, desc="")
    return params, cfg, stoi, itos


def sample(params, cfg: GPTConfig, ctx_ids, itos, steps: int = 200,
           temperature: float = 1.0, top_k: int = 0, seed: int = 0,
           chunk: int = 256, top_p: float = 0.0, quant: str = "none"):
    """Streaming generator of text pieces — KV-cached incremental decode.

    ``itos`` is either the char id->char dict (reference API) or any
    tokenizer object with ``token_bytes``/``decode`` (BPE): BPE tokens
    stream through an incremental UTF-8 decoder so multi-byte characters
    split across tokens reassemble correctly.

    Unlike the reference sampler (full O(T^2 L) forward per token,
    gpt.py:518-546), this prefills the prompt once and then samples
    ``chunk`` tokens per device dispatch (the whole sample->step loop runs
    as a lax.scan on device — one host round trip per chunk instead of two
    per character).
    """
    from ..models.moe import MoEGPTConfig

    if isinstance(cfg, MoEGPTConfig):
        if quant not in ("", "none"):
            raise ValueError("quant decode supports the dense GPT only")
        from ..models.moe import moe_decode_chunk as gpt_decode_chunk
        from ..models.moe import moe_prefill as prefill_fn
    elif quant in ("int8", "int8kv"):
        # int8 weight-only decode: prefill stays full-precision (compute-
        # bound), the per-token matvecs read int8 weights (traffic-bound);
        # "int8kv" additionally stores the KV cache int8 (halves the
        # cache traffic that dominates long-context decode)
        from ..models.quant import (gpt_decode_chunk_q, quantize_gpt_params,
                                    quantize_kv_cache)

        qparams = quantize_gpt_params(params, cfg)
        kv8 = quant == "int8kv"
        gpt_decode_chunk = (lambda p, *a, **kw:
                            gpt_decode_chunk_q(qparams, *a, kv8=kv8, **kw))

        def prefill_fn(p, ids, c, length=None):
            logits, cache = gpt_prefill(p, ids, c, length=length)
            return logits, (quantize_kv_cache(cache) if kv8 else cache)
    elif quant in ("", "none"):
        from ..models.gpt import gpt_decode_chunk

        prefill_fn = gpt_prefill
    else:
        raise ValueError(f"unknown quant mode: {quant!r}")

    if hasattr(itos, "token_bytes"):  # BPE-style tokenizer
        import codecs

        utf8 = codecs.getincrementaldecoder("utf-8")("replace")
        emit = lambda t: utf8.decode(itos.token_bytes(t))
    elif hasattr(itos, "itos"):  # char tokenizer object
        emit = itos.itos.__getitem__
    else:  # plain id->char dict (reference API)
        emit = itos.__getitem__

    key = jax.random.PRNGKey(seed)
    ids = list(int(i) for i in np.asarray(ctx_ids).ravel())
    # ONE fixed decode-scan length for the whole session.  Every distinct
    # scan length n is a separate XLA compile (~30-45 s each through the
    # axon tunnel, and the server-side compile cache can't amortize it), so
    # variable n = min(chunk, remaining, room) paid minutes of warmup.
    # Decoding a fixed n and discarding over-generated tokens costs at most
    # one extra chunk of device time (~100 ms) and compiles exactly once.
    n = max(1, min(chunk, cfg.ctx_len // 2))
    keep = cfg.ctx_len - n  # sliding-window size that always leaves room n

    def _prefill(ids):
        # Right-pad every prompt to the fixed window length so prefill also
        # compiles exactly once (each distinct prompt length is otherwise
        # its own XLA compile); causality keeps the pads inert.
        ids = ids[-keep:]
        buf = np.zeros((1, keep), dtype=np.int32)
        buf[0, :len(ids)] = ids
        return prefill_fn(params, jnp.asarray(buf), cfg, len(ids))

    stream = (cfg.window is not None and cfg.pos in ("rope", "alibi")
              and not isinstance(cfg, MoEGPTConfig)
              and quant in ("", "none"))
    logits, cache = _prefill(ids)
    if stream:
        # sliding-window model: decode through the O(window) ring cache —
        # the absolute position is unbounded, so the stream NEVER
        # re-prefills (the bounded path below pays a full prefill every
        # ctx/2 tokens; models/stream.py pins ring == windowed forward)
        from ..models.stream import (gpt_stream_chunk, init_stream_cache,
                                     stream_fill)

        ring = stream_fill(init_stream_cache(cfg), cache, cache["length"],
                           cfg)
        remaining = steps
        while remaining > 0:
            key, sub = jax.random.split(key)
            toks, logits, ring = gpt_stream_chunk(
                params, ring, logits, sub, cfg, n, temperature, top_k, top_p)
            emit_n = min(n, remaining)
            for t in np.asarray(toks[0])[:emit_n]:
                yield emit(int(t))
            remaining -= emit_n
        return
    remaining = steps
    while remaining > 0:
        room = cfg.ctx_len - int(cache["length"])
        if room < n:
            # Context (nearly) full: slide the window.  Re-prefilling at
            # ctx_len-1 would leave room=1, i.e. one full prefill per
            # generated token (measured: 14 tok/s vs ~1000 tok/s).
            logits, cache = _prefill(ids)
        key, sub = jax.random.split(key)
        toks, logits, cache = gpt_decode_chunk(
            params, cache, logits, sub, cfg, n, temperature, top_k, top_p
        )
        emit_n = min(n, remaining)
        for t in np.asarray(toks[0])[:emit_n]:
            ids.append(int(t))
            yield emit(int(t))
        remaining -= emit_n
