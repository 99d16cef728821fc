"""Continuous-batching serving engine (slot-based, fixed-shape decode).

Design (TPU-first):

- The engine owns a KV cache of ``n_slots`` independent sequences
  ``(L, B, h, ctx, d)`` with a PER-SLOT position vector — requests sit at
  different sequence lengths, join when a slot frees, and leave when done.
  Every device computation has ONE fixed shape, so the whole engine
  compiles exactly twice (one prefill shape + one decode-chunk shape) no
  matter how many requests stream through.
- Decode runs in chunks of ``chunk`` tokens inside a single ``lax.scan``
  dispatch; completions are detected on the host between chunks.
- The engine is ASYNC: sampled chunk tokens stay on device, every chunk's
  device->host copy is issued ``copy_to_host_async`` at dispatch, and the
  host never blocks on tokens unless it must. Length-terminated requests
  finish at host-computable chunk counts, so the SLOT frees immediately
  (admission needs bookkeeping, not token values) while the completion is
  EMITTED lazily once its async copies land. Only stop-token requests
  force a blocking per-chunk fetch (the host has to SEE the tokens to
  stop early), and only while one is active. On this runtime a blocking
  readback costs ~40 ms of latency; the synchronous design measured
  2.6k tok/s vs static batching's 13k on the bench workload — one
  blocking sync per completion was the entire gap.
- Admission = one single-prompt prefill (right-padded to a fixed window)
  scattered into the freed slot's cache rows via ``dynamic_update_slice``.
  Prompts LONGER than the window admit via CHUNKED PREFILL: the first
  window prefills, the rest block-extends window-at-a-time through the
  prefix-extension forward — same two compiled shapes, any prompt length
  up to the ctx budget.
- ``speculative=K`` composes speculative decoding WITH continuous
  batching: chunks become per-slot draft+verify rounds (serve/spec.py),
  greedy tokens stay bit-equal to the plain engine. The verify block
  runs ``select_decode_ops``'s dict, so it also composes with
  multi-LoRA (per-slot adapters keep drafting/verifying per slot).
- ``paged=True`` composes with multi-LoRA, int8 weight-only decode, and
  int8 KV pages (``kv8=True``) — see the PARITY.md feature matrix.
- Sampling parameters ride as traced per-slot vectors (temperature, top_p,
  top_k) — admission NEVER recompiles. Per-slot top-k uses
  ``filter_logits``'s vector path (k-th-largest read off a full sort whose
  cost the top-p transform already pays) instead of a per-k
  ``lax.top_k`` shape.
- Serves the dense GPT and the MoE with the same engine: the decode chunk
  is ``models.gpt._decode_chunk_core`` with per-model ops, and MoE routing
  groups are per-row, so each slot routes its live token independently
  (an idle slot's garbage tokens cannot steal expert capacity). One MoE
  caveat: expert capacity during the admission prefill scales with the
  static ``prefill_window``, not the prompt length, so a real token the
  unpadded prompt would drop to overflow may be routed (strictly FEWER
  drops, never more — pads queue after real tokens in the capacity
  cumsum). Token equality is pinned against the window-padded
  single-stream prefill (tests/test_serve.py::TestServeMoE).

Relation to the reference: extends the sampler semantics of
/root/reference/gpt.py:518-546 (temperature / top-k, context-window cap)
from one stream to a concurrent request stream; per-request outputs are
pinned equal to the single-stream KV-cached decode by tests/test_serve.py.
"""

from __future__ import annotations

import dataclasses
import itertools
import time
from collections import deque
from functools import partial
from typing import Any, Deque, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..nn.cache import fkv_write_slots
from ..models.gpt import GPTConfig, gpt_prefill

__all__ = ["Request", "Completion", "ServeEngine", "serve"]


@dataclasses.dataclass
class Request:
    """One generation request. ``stop_token`` < 0 disables early stop;
    ``top_k`` None inherits the engine-wide default (0 = disabled)."""

    prompt: Sequence[int]
    max_new_tokens: int
    temperature: float = 1.0
    top_p: float = 0.0
    top_k: Optional[int] = None
    stop_token: int = -1
    # id from ``ServeEngine.register_prefix``: the request's effective
    # prompt is prefix + prompt, but admission reuses the prefix's cached
    # KV and prefills only ``prompt`` (the suffix)
    prefix_id: Optional[int] = None
    # id from ``ServeEngine.register_lora``: this request decodes through
    # that adapter (0 = the base model); slots wearing different adapters
    # batch together in one decode chunk
    lora_id: int = 0
    request_id: int = -1  # assigned by the engine at submit()


@dataclasses.dataclass
class Completion:
    request_id: int
    tokens: List[int]
    prompt_len: int
    finish_reason: str  # "length" | "stop"
    submitted_at: float = 0.0
    admitted_at: float = 0.0  # when the request left the queue for a slot
    finished_at: float = 0.0

    @property
    def queue_s(self) -> float:
        """Seconds spent waiting for a slot (and, in paged mode, pages)."""
        return self.admitted_at - self.submitted_at

    @property
    def latency_s(self) -> float:
        return self.finished_at - self.submitted_at

    @property
    def decode_tok_s(self) -> float:
        """Generated tokens per second of post-admission time."""
        return len(self.tokens) / max(self.finished_at - self.admitted_at,
                                      1e-9)


def select_decode_ops(params, cfg: GPTConfig, cache):
    """Weight-representation dispatch shared by the slot AND paged decode
    chunks: MoE routing, int8 weight-only, per-slot LoRA side-path, or the
    plain hoisted dense ops — all behind ``models.gpt._decode_chunk_core``'s
    ``ops`` seam, which is what makes the engine features compose (the ops
    never touch the KV layout; the layout never touches the weights)."""
    from ..models.gpt import _dt_decode_ops
    from ..models.moe import MoEGPTConfig, _moe_decode_ops

    if isinstance(cfg, MoEGPTConfig):
        return _moe_decode_ops(params, cfg)
    lora = params.get("_lora")
    base = {k: v for k, v in params.items() if k != "_lora"}
    if "tok_W_q" in base:  # int8 weight-only engine (quant="int8")
        from ..models.quant import _q_decode_ops

        ops = _q_decode_ops(base, cfg)
    else:
        ops = _dt_decode_ops(base, cfg)
    if lora is not None:  # multi-LoRA: per-slot adapter side-path
        from ..models.lora import lora_decode_ops

        ops = lora_decode_ops(ops, lora, cache["lora_ids"], cfg)
    return ops


@partial(jax.jit, static_argnames=("cfg", "n_tokens"))
def decode_chunk_slots(params, cache, logits, key, temp, top_p, top_k,
                       cfg: GPTConfig, n_tokens: int):
    """Sample ``n_tokens`` for every slot in ONE device computation, with a
    PER-SLOT cache position (the continuous-batching instantiation of
    ``models.gpt._decode_chunk_core``; ``gpt_decode_chunk`` is the
    shared-position one).

    ``cache`` is {k, v: (L, B, h, ctx, d), pos: (B,) int32}; ``temp``,
    ``top_p``, and ``top_k`` are (B,) per-slot sampling vectors (traced —
    admission never recompiles; ``filter_logits`` takes the vector-k path,
    whose full-V sort the top-p transform pays anyway). Slots always start
    at cache position 0, so the logical position IS the cache position.

    Write positions are clamped to ctx-1: idle slots keep decoding garbage
    into their own (soon re-prefilled) rows without ever overflowing the
    buffer; active slots never hit the clamp because admission reserves
    ceil(max_new/chunk)*chunk positions up front.

    Works for the dense GPT and the MoE (routing groups are per-row, so
    each slot routes its live token independently — idle slots' garbage
    tokens can steal nothing from other slots' expert capacity).
    """
    from ..models.gpt import _decode_chunk_core

    ops = select_decode_ops(params, cfg, cache)
    temp = jnp.asarray(temp, jnp.float32)[:, None]  # (B, 1) vs (B, V)
    top_p = jnp.asarray(top_p, jnp.float32)[:, None]
    top_k = jnp.asarray(top_k, jnp.int32)  # (B,); filter_logits broadcasts

    def write_slots(k_l, v_l, pos, k, v):
        return fkv_write_slots(k_l, v_l, jnp.minimum(pos, cfg.ctx_len - 1),
                               k, v)

    toks, logits, K, V, pos = _decode_chunk_core(
        cfg, ops, logits, cache["k"], cache["v"], cache["pos"],
        jnp.zeros((), jnp.int32), key, n_tokens, temp, top_k, top_p,
        write_slots)
    return toks, logits, dict(cache, k=K, v=V, pos=pos)


@partial(jax.jit, static_argnames=("cfg", "S"))
def _extend_prefix(params, pk, pv, plen, suffix_ids, slen, cfg: GPTConfig,
                   S: int):
    """Extend a cached prefix KV by a request's suffix in one block forward.

    ``pk``/``pv`` are the prefix's (L, 1, h, ctx, d) buffers (rows
    [0, plen) live), ``suffix_ids`` is (1, S) right-padded, ``slen`` the
    real suffix length. Reuses ``gpt_decode_block`` (the speculative
    verifier's block forward): suffix K/V land at rows [plen, plen+S) and
    each suffix row attends causally over prefix + earlier suffix with
    correct absolute positions for every positional mode. Rows beyond
    ``slen`` are padding — their K/V are garbage above the slot position,
    which later decode masks (j < pos) and then overwrites in place.

    Returns the post-suffix next-token logits (1, V) and the extended
    buffers, ready for ``_admit_slot`` with position ``plen + slen``.

    The block writes S rows at [plen, plen+S), which can run past ctx for
    long prefixes (``dynamic_update_slice`` would CLAMP the start and
    silently overwrite prefix rows) — so the buffers are padded by S rows
    for the extend and sliced back; rows the slice drops are padding by
    the submit-time budget check (plen + slen + reserved <= ctx).
    """
    from ..models.speculative import gpt_decode_block

    pad = [(0, 0)] * pk.ndim
    pad[-2] = (0, S)
    cache = {"k": jnp.pad(pk, pad), "v": jnp.pad(pv, pad),
             "length": jnp.asarray(plen, jnp.int32)}
    logits, cache = gpt_decode_block(params, cache, suffix_ids, cfg, S)
    last = lax.dynamic_slice_in_dim(
        logits, jnp.asarray(slen, jnp.int32) - 1, 1, axis=1)  # (1, 1, V)
    ctx = pk.shape[-2]
    return (last[:, 0], cache["k"][..., :ctx, :], cache["v"][..., :ctx, :])


@partial(jax.jit, static_argnames=("cfg",))
def _prefill_lora(params, stacks, idx, ids, length, cfg: GPTConfig):
    """Admission prefill through adapter ``idx`` WITHOUT a persistent
    merged model: the stack row merges into dense weights inside this one
    XLA invocation (transient), so engine HBM stays base + stacks
    (``models.lora.lora_merge_stacks``)."""
    from ..models.lora import lora_merge_stacks

    return gpt_prefill(lora_merge_stacks(params, stacks, idx), ids, cfg,
                       length=length)


@partial(jax.jit, static_argnames=("cfg", "S"))
def _extend_prefix_lora(params, stacks, idx, pk, pv, plen, suffix_ids, slen,
                        cfg: GPTConfig, S: int):
    """Adapter twin of ``_extend_prefix`` (same transient-merge story)."""
    from ..models.lora import lora_merge_stacks

    return _extend_prefix(lora_merge_stacks(params, stacks, idx), pk, pv,
                          plen, suffix_ids, slen, cfg, S)


@partial(jax.jit, static_argnames=("cfg",))
def _admit_slot_ring(cache, logits, slot_k, slot_v, plen, slot_logits, b,
                     cfg: GPTConfig):
    """Ring-mode admission: compress a ctx-sized prefill (or prefix-
    extended) KV down to its last ``window`` rows (``models.stream``'s
    fill) and scatter them into ring slot ``b`` with per-row absolute
    positions."""
    from ..models.stream import init_stream_cache, stream_fill

    ring1 = stream_fill(init_stream_cache(cfg, batch=1),
                        {"k": slot_k, "v": slot_v}, plen, cfg)
    z = jnp.zeros((), jnp.int32)
    b = jnp.asarray(b, jnp.int32)
    k = lax.dynamic_update_slice(cache["k"], ring1["k"], (z, b, z, z, z))
    v = lax.dynamic_update_slice(cache["v"], ring1["v"], (z, b, z, z, z))
    rpos = lax.dynamic_update_slice(cache["rpos"], ring1["rpos"][None],
                                    (b, z))
    pos = lax.dynamic_update_slice(
        cache["pos"], jnp.asarray(plen, jnp.int32)[None], (b,))
    logits = lax.dynamic_update_slice(logits, slot_logits, (b, z))
    return dict(cache, k=k, v=v, rpos=rpos, pos=pos), logits


@jax.jit
def _set_slot_lora(cache, b, lora_id):
    """Point slot ``b`` at adapter ``lora_id`` (0 = base model)."""
    ids = lax.dynamic_update_slice(
        cache["lora_ids"], jnp.asarray(lora_id, jnp.int32)[None],
        (jnp.asarray(b, jnp.int32),))
    return dict(cache, lora_ids=ids)


@jax.jit
def _set_slot_spec(cache, b, hist_row, pending):
    """Speculative-mode admission extras for slot ``b``: the on-device
    token history (drafting source), the pending unprocessed token, and a
    zeroed emitted count (serve/spec.py)."""
    b = jnp.asarray(b, jnp.int32)
    z = jnp.zeros((), jnp.int32)
    hist = lax.dynamic_update_slice(cache["hist"], hist_row[None], (b, z))
    pend = lax.dynamic_update_slice(
        cache["pending"], jnp.asarray(pending, jnp.int32)[None], (b,))
    emitted = lax.dynamic_update_slice(
        cache["emitted"], jnp.zeros((1,), jnp.int32), (b,))
    return dict(cache, hist=hist, pending=pend, emitted=emitted)


@partial(jax.jit, static_argnames=())
def _admit_slot(cache, logits, slot_k, slot_v, plen, slot_logits, b):
    """Scatter one prefilled sequence into slot ``b`` of the engine cache.

    slot_k/slot_v are (L, 1, h, ctx, d) from ``gpt_prefill``; the whole
    slot row is replaced (stale garbage from the previous occupant dies
    here) and its position resets to the prompt length.
    """
    z = jnp.zeros((), jnp.int32)
    b = jnp.asarray(b, jnp.int32)
    k = lax.dynamic_update_slice(cache["k"], slot_k, (z, b, z, z, z))
    v = lax.dynamic_update_slice(cache["v"], slot_v, (z, b, z, z, z))
    pos = lax.dynamic_update_slice(
        cache["pos"], jnp.asarray(plen, jnp.int32)[None], (b,))
    logits = lax.dynamic_update_slice(logits, slot_logits, (b, z))
    return dict(cache, k=k, v=v, pos=pos), logits


class ServeEngine:
    """Slot-based continuous-batching engine over one GPT.

    Usage::

        eng = ServeEngine(params, cfg, n_slots=8, chunk=32)
        eng.submit(Request(prompt, max_new_tokens=100))
        done = eng.run()          # drain queue + in-flight, list[Completion]

    or incrementally: ``submit()`` any time, ``step()`` to advance one
    decode chunk (admitting queued requests into free slots first).

    Prefix reuse, from explicit to fully automatic:

    - ``register_prefix(tokens)`` + ``Request(prefix_id=...)`` — the
      caller names the shared prefix per request;
    - ``auto_prefix=True`` — ``submit()`` matches full prompts against
      the registered prefixes itself (longest proper prefix, per
      adapter);
    - ``page_cache=True`` (paged engines) — no registration at all:
      retired requests leave their full prompt pages in the pool under
      content-addressed chain keys; admissions reuse the longest cached
      block run, refcounted while in use, refs-0 entries evicted LRU
      under page pressure (vLLM-style automatic prefix caching).
    """

    def __init__(self, params, cfg: GPTConfig, n_slots: int = 8,
                 chunk: int = 32, top_k: int = 0,
                 prefill_window: Optional[int] = None, seed: int = 0,
                 quant: str = "none", mesh=None, paged: bool = False,
                 page: int = 64, n_pages: Optional[int] = None,
                 paged_attn: str = "auto", max_loras: int = 0,
                 lora_rank: int = 8, speculative: int = 0,
                 kv8: bool = False, schedule: str = "fifo",
                 auto_prefix: bool = False, page_cache: bool = False):
        from ..models.moe import MoEGPTConfig, moe_prefill

        # auto_prefix: submit() transparently reuses the longest
        # registered prefix (same adapter) that is a proper prefix of the
        # prompt — register_prefix becomes a cache the caller never has
        # to address per-request (_match_prefix below)
        self._auto_prefix = bool(auto_prefix)

        self._prefill = (moe_prefill if isinstance(cfg, MoEGPTConfig)
                         else gpt_prefill)
        if chunk < 1:
            raise ValueError("chunk must be >= 1")
        if mesh is not None:
            # tensor-parallel serving: params megatron-sharded over the
            # mesh's 'tp' axis and the KV cache sharded on its heads axis;
            # GSPMD propagates through the (unannotated) jitted decode/
            # prefill and inserts the one psum after Wo — token-identical
            # to unsharded serving (tests/test_serve.py::TestServeTP).
            # Best when tp divides kv_heads (each device owns whole KV
            # heads); other tp values are correct but reshard.
            if isinstance(cfg, MoEGPTConfig) or quant not in ("", "none"):
                raise ValueError(
                    "mesh serving supports the full-precision dense GPT")
            if "tp" not in mesh.axis_names:
                raise ValueError("serving mesh needs a 'tp' axis")
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.sharding import gpt_param_specs

            psh = jax.tree.map(
                lambda s: NamedSharding(mesh, s), gpt_param_specs(None, cfg),
                is_leaf=lambda v: isinstance(v, P))
            params = jax.device_put(params, psh)
            # head-shard the cache only when tp divides the KV head count
            # (device_put needs even shards); otherwise keep it replicated
            # and let GSPMD shard activations where it pays
            tp = mesh.shape["tp"]
            kv_spec = (P(None, None, "tp", None, None)
                       if cfg.kv_heads % tp == 0 else P())
            self._kv_sh = NamedSharding(mesh, kv_spec)
            self._repl_sh = NamedSharding(mesh, P())
        else:
            self._kv_sh = self._repl_sh = None
        self.mesh = mesh
        if quant == "int8":
            # int8 weight-only DECODE; admission prefill stays in the
            # compute dtype (it is MXU-compute-bound, not weight-bound)
            if isinstance(cfg, MoEGPTConfig):
                raise ValueError("quant decode supports the dense GPT only")
            from ..models.quant import quantize_gpt_params

            self._decode_params = quantize_gpt_params(params, cfg)
        elif quant in ("", "none"):
            self._decode_params = params
        else:
            raise ValueError(f"unknown quant mode: {quant!r}")
        self.params = params
        self.cfg = cfg
        self.n_slots = n_slots
        self.chunk = chunk
        self.top_k = top_k
        self.prefill_window = (min(cfg.ctx_len - chunk, 256)
                               if prefill_window is None else prefill_window)
        if not (0 < self.prefill_window <= cfg.ctx_len - chunk):
            raise ValueError(
                f"prefill_window must be in (0, ctx_len - chunk]; got "
                f"{self.prefill_window} (ctx_len={cfg.ctx_len}, "
                f"chunk={chunk})")
        dt = cfg.compute_dtype
        # ring mode: a windowed model with a relative positional encoding
        # keeps each slot's KV as an O(window) ring with UNBOUNDED
        # positions — slot memory drops ctx/window-fold and a request's
        # generation budget is no longer capped by ctx_len
        from ..models.moe import MoEGPTConfig as _MoE

        self._ring = (cfg.window is not None
                      and cfg.pos in ("rope", "alibi")
                      and not isinstance(cfg, _MoE)
                      and quant in ("", "none") and mesh is None)
        # paged mode: pool-of-pages KV with per-slot page tables
        # (serve/paged.py) — admission control by actual memory
        self._paged = bool(paged)
        self._allocator = None
        self._slot_pages: List[List[int]] = [[] for _ in range(n_slots)]
        if kv8 and not self._paged:
            raise ValueError("kv8 (int8 KV pages) requires paged=True")
        # admission policy under page pressure (paged mode; elsewhere
        # admission never fails so the policies coincide):
        # - "fifo" (default): strict arrival order — one large queued
        #   request stalls everything behind it, but nothing starves
        #   (head-of-line blocking IS the no-starvation guarantee).
        # - "best-fit": admit the first queued request whose page
        #   reservation fits the current free pool — small requests flow
        #   past a blocked large one (better utilization; the large
        #   request can in principle wait unboundedly under a steady
        #   stream of small ones).
        if schedule not in ("fifo", "best-fit"):
            raise ValueError("schedule must be 'fifo' or 'best-fit'")
        self.schedule = schedule
        if self._paged:
            # composes with int8 weight-only decode (quant="int8"),
            # multi-LoRA (max_loras>0) and int8 KV pages (kv8) — the
            # weight representation and the KV layout meet only at
            # _decode_chunk_core's seams; ring/mesh/MoE stay excluded
            if self._ring or mesh is not None or isinstance(cfg, _MoE):
                raise ValueError("paged KV supports the dense GPT "
                                 "without --window/mesh")
            from .paged import PageAllocator, init_paged_cache

            if n_pages is None:  # dense-equivalent capacity + trash page
                n_pages = 1 + n_slots * (cfg.ctx_len // page)
            self._cache = init_paged_cache(cfg, n_slots, n_pages, page,
                                           kv8=kv8)
            self._page = page
            self._allocator = PageAllocator(n_pages)
            self._shared_held = 0  # pages pinned by registered prefixes
            # automatic (content-addressed) prefix caching: retired
            # requests leave their full prompt pages in the pool under a
            # per-adapter chain hash; admissions reuse the longest cached
            # block run and prefill only the tail. Refcounted while in
            # use; refs-0 entries evict LRU under page pressure.
            self._page_cache = bool(page_cache)
            if self._page_cache:
                if kv8:
                    raise ValueError(
                        "page_cache requires kv8=False: reused pages "
                        "would be DEQUANTIZED into the extend forward, "
                        "so warm admissions would drift off the cold "
                        "path's exact tokens")
                from collections import OrderedDict

                # key -> [page_id, refs]; insertion order is the LRU
                # order (move_to_end on every hit)
                self._pcache: "OrderedDict[tuple, list]" = OrderedDict()
                # per-slot admission bookkeeping: (hit keys to decref,
                # [(key, page_id)] insert candidates at retire)
                self._slot_pc: List = [None] * n_slots
            # attention read: Pallas in-place page kernel vs XLA
            # table-gather. The gather materializes the gathered KV per
            # step (~3x attention HBM traffic — 0.95x of slot chunk
            # throughput at ctx 4096); the kernel reads pages in place
            # and stops its walk at each slot's position (0.99x of slot
            # HALF-full, ahead as caches fill), but pays ~35 us of
            # dispatch per layer-step, which LOSES at short contexts
            # where the gather traffic is trivial (BASELINE.md round 4).
            # auto = kernel on TPU from ctx 2048 up at d_head % 128 == 0,
            # gather otherwise.
            if paged_attn not in ("auto", "kernel", "gather"):
                raise ValueError("paged_attn must be auto|kernel|gather")
            if paged_attn == "kernel" and page % 8:
                raise ValueError("the paged-attention kernel needs "
                                 "page % 8 == 0")
            if paged_attn == "kernel" and kv8:
                raise ValueError("the Pallas paged kernels read plain "
                                 "pools; kv8 serves via paged_attn="
                                 "'gather'")
            # auto never picks the kernel for a speculative engine (the
            # spec chunk reads via the gather); explicit "kernel" +
            # speculative raises below
            # auto picks the DMA kernel only for d_head % 128 == 0:
            # narrow heads ride it via row folding, but the fold measured
            # 0.81x of slot at hk2/d64/ctx4096 vs the gather's 0.95x
            # (round-5 ab_paged --long) — folding halves the page count
            # per DMA but pays fold-residue masked scores; explicit
            # paged_attn="kernel" still forces it
            self._paged_kernel = (
                not kv8
                and (paged_attn == "kernel"
                     or (paged_attn == "auto" and not speculative
                         and page % 8 == 0 and cfg.ctx_len >= 2048
                         and cfg.d_head % 128 == 0
                         and jax.default_backend() == "tpu")))
        else:
            if page_cache:
                raise ValueError("page_cache requires paged=True (the "
                                 "cache lives in the page pool)")
            self._page_cache = False
            rows = cfg.window if self._ring else cfg.ctx_len
            shape = (cfg.n_layers, n_slots, cfg.kv_heads, rows, cfg.d_head)
            self._cache = {
                "k": jnp.zeros(shape, dt),
                "v": jnp.zeros(shape, dt),
                "pos": jnp.zeros((n_slots,), jnp.int32),
            }
        if self._ring:
            self._cache["rpos"] = jnp.full((n_slots, cfg.window), -1,
                                           jnp.int32)
        # multi-LoRA serving: fixed-shape adapter stacks + a per-slot
        # adapter-id vector; requests wearing different adapters batch in
        # ONE decode chunk (models/lora.py::lora_decode_ops side-path)
        self._max_loras = int(max_loras)
        self._n_loras = 0  # adapters registered so far
        if self._max_loras:
            # composes with paged KV (incl. kv8) — the adapter side-path
            # reads activations, never the cache layout — and with int8
            # weight-only decode: the base matvecs read int8 while the
            # low-rank side-path stays full precision (admission prefill
            # is fp either way), the standard serving split
            if self._ring or mesh is not None or isinstance(cfg, _MoE):
                raise ValueError("multi-LoRA serving supports the "
                                 "dense slot/paged engine (no ring/mesh)")
            from ..models.lora import init_lora_stacks

            self._lora_stacks = init_lora_stacks(
                params, self._max_loras, lora_rank, dtype=dt)
            self._cache["lora_ids"] = jnp.zeros((n_slots,), jnp.int32)
            self._decode_params = dict(self._decode_params,
                                       _lora=self._lora_stacks)
        # speculative decoding: per-slot prompt-lookup draft + block
        # verify, composed WITH continuous batching (serve/spec.py). Each
        # chunk runs rounds of (1 + n_draft)-token block forwards; slots
        # accept variable prefixes and advance independently.
        self._spec = int(speculative)
        if self._spec:
            # composes with the paged pool (spec chunk block-scatters
            # through the table and reads via the gather; kernel/kv8
            # paged reads stay excluded) AND with multi-LoRA (the verify
            # block runs the same per-slot side-path ops the plain chunk
            # scans with). int8 weights stay excluded for a NUMERIC
            # reason, not a plumbing one: the plain quant engine computes
            # every prompt row once, in the f32 admission prefill, while
            # a speculative round would recompute the pending prompt
            # token through the int8 decode ops — the ~1% quantization
            # seam lands inside the comparison, so token equality vs the
            # plain engine (the exactness contract every other
            # composition is pinned by) is structurally unguaranteed.
            if (self._ring or mesh is not None
                    or quant not in ("", "none")
                    or isinstance(cfg, _MoE) or kv8
                    or (self._paged and self._paged_kernel)):
                raise ValueError(
                    "speculative serving supports the full-precision "
                    "dense slot or paged(gather) engine, with or "
                    "without multi-LoRA (no ring/mesh/quant/kv8: quant "
                    "would recompute the pending prompt token through "
                    "int8 ops that admission prefilled in f32)")
            from .spec import spec_cache_fields

            self._cache.update(spec_cache_fields(cfg, n_slots))
            # rounds per dispatch: a chunk's token budget in the best case
            self._spec_rounds = max(1, chunk // (self._spec + 1))
            self._budget = np.zeros((n_slots,), np.int32)
            self._valids: Dict[int, np.ndarray] = {}
            # (cid, device valid array, active slots) in dispatch order,
            # drained lazily — see _drain_spec
            self._spec_pending: List = []
        self._logits = jnp.full((n_slots, cfg.vocab_size), -1e9, jnp.float32)
        if mesh is not None:
            self._cache = jax.device_put(
                self._cache, {"k": self._kv_sh, "v": self._kv_sh,
                              "pos": self._repl_sh})
            self._logits = jax.device_put(self._logits, self._repl_sh)
        self._temp = np.ones((n_slots,), np.float32)
        self._top_p = np.zeros((n_slots,), np.float32)
        self._top_k = np.full((n_slots,), top_k, np.int32)
        # device copy of (temp, top_p, top_k), admission-dirty
        self._samp_dev = None
        self._slot_req: List[Optional[Request]] = [None] * n_slots
        # async token plumbing: chunk arrays stay on device in _store and
        # are materialized (ONE host sync) only when a slot needs them
        self._slot_chunks: List[List[int]] = [[] for _ in range(n_slots)]
        self._count = [0] * n_slots       # tokens decoded per slot
        self._scanned = [0] * n_slots     # tokens already checked for stop
        self._store: Dict[int, Any] = {}  # chunk_id -> (B, chunk) device arr
        self._np: Dict[int, np.ndarray] = {}
        self._refs: Dict[int, int] = {}
        self._chunk_ids = itertools.count()
        # budget-completed requests whose token copies are still in flight:
        # (req, chunk_ids, batch_row, finished_ts)
        self._pending_done: List[tuple] = []
        self._since_sync = 0
        self.sync_every = 16  # safety valve on dispatch-queue depth
        self._queue: Deque[Request] = deque()
        # prefix_id -> (k, v, logits, plen, shared_pages, lora_id): KV of a
        # shared prompt prefix, prefilled ONCE and scattered+extended per
        # admission (through the prefix's adapter when it wears one)
        self._prefixes: Dict[int, tuple] = {}
        self._prefix_ids = itertools.count()
        self._key = jax.random.PRNGKey(seed)
        self._ids = itertools.count()
        self._submit_ts: Dict[int, float] = {}
        self._admit_ts: Dict[int, float] = {}
        self.completions: List[Completion] = []
        self.stats = {"chunks": 0, "decode_tokens": 0, "emitted_tokens": 0,
                      "prefills": 0, "syncs": 0, "page_cache_hits": 0,
                      "page_cache_evicted": 0}

    # -- submission ---------------------------------------------------------

    def register_prefix(self, tokens: Sequence[int],
                        lora_id: int = 0) -> int:
        """Prefill a shared prompt prefix ONCE and cache its KV.

        Requests submitted with ``prefix_id=<returned id>`` behave as if
        their prompt were ``tokens + prompt``, but admission scatters the
        cached prefix KV into the slot and block-extends it with only the
        suffix — the prefix's prefill FLOPs (the quadratic part) are paid
        once per prefix, not once per request. This also lifts the
        effective prompt-length cap: prefix length is bounded by
        ``ctx_len``, not ``prefill_window``.

        ``lora_id`` (multi-LoRA engines) prefills the prefix through that
        adapter's merged weights; the prefix is then usable ONLY by
        requests wearing the same adapter (the cached KV bakes the
        adapter's projections in).

        Dense GPT only (the block-extend forward has no MoE routing).
        """
        from ..models.moe import MoEGPTConfig

        if isinstance(self.cfg, MoEGPTConfig):
            raise ValueError("prefix caching supports the dense GPT only")
        if lora_id and (not self._max_loras or lora_id > self._n_loras):
            raise ValueError(f"unknown lora_id {lora_id} "
                             f"({self._n_loras} registered)")
        plen = len(tokens)
        limit = self.cfg.ctx_len - self.chunk - 1
        if not (0 < plen <= limit):
            raise ValueError(
                f"prefix length must be in (0, ctx_len - chunk - 1] = "
                f"(0, {limit}]; got {plen}")
        # ONE compile for any prefix length: right-pad to the cap
        ids = np.zeros((1, limit), np.int32)
        ids[0, :plen] = np.asarray(tokens, np.int32)
        if lora_id:
            logits, cache = _prefill_lora(self.params, self._lora_stacks,
                                          lora_id, jnp.asarray(ids), plen,
                                          self.cfg)
        else:
            logits, cache = self._prefill(self.params, jnp.asarray(ids),
                                          self.cfg, length=plen)
        shared: List[int] = []
        if self._paged:
            # page sharing: the prefix's FULL pages are scattered into the
            # pool once and pinned for the engine's lifetime; admissions
            # point their tables at them and privately own only the
            # partial boundary page onward (which the suffix extension
            # rewrites). plen // page full pages are shareable.
            nfull = plen // self._page
            if nfull > self._allocator.n_free:
                raise ValueError(
                    f"prefix needs {nfull} pages, "
                    f"{self._allocator.n_free} free")
            shared = self._allocator.alloc(nfull)
            self._shared_held += nfull
            if nfull:
                from .paged import _scatter_pages

                full = np.zeros((self.cfg.ctx_len // self._page,), np.int32)
                full[:nfull] = shared
                self._cache = _scatter_pages(
                    self._cache, cache["k"], cache["v"], jnp.asarray(full))
        pid = next(self._prefix_ids)
        # tokens (index 6) feed speculative-mode slot histories
        self._prefixes[pid] = (cache["k"], cache["v"], logits, plen, shared,
                               lora_id, list(tokens))
        return pid

    def _match_prefix(self, prompt, lora_id: int):
        """Longest registered prefix (same adapter) that is a PROPER
        prefix of ``prompt`` — the ``auto_prefix=True`` submit-time
        match. Proper because admission needs >= 1 suffix token (and in
        speculative mode the suffix supplies the pending token). Linear
        scan: prefixes are registered explicitly and few; the per-entry
        compare is O(prefix length) numpy equality."""
        best = None
        plen = len(prompt)
        for pid, entry in self._prefixes.items():
            toks, plid = entry[6], entry[5]
            n = len(toks)
            if (plid != lora_id or not 0 < n < plen
                    or (best is not None and n <= best[1])):
                continue
            if list(prompt[:n]) == list(toks):
                best = (pid, n)
        return best

    # -- automatic page cache (content-addressed pooled prompt pages) ---

    def _pc_chain(self, tokens, lora_id: int) -> List[bytes]:
        """Chain keys of the FULL ``page``-sized blocks of ``tokens``.

        Key i is a running sha1 over the adapter id and blocks 0..i, so a
        key hit implies the ENTIRE token prefix up to that block matches
        — and, because pooled KV rows are a deterministic function of the
        token prefix (prefill/extend at fixed absolute positions), that
        the cached pages hold exactly the rows a cold prefill would
        write. vLLM's hash-block automatic prefix caching, on this
        engine's page pool."""
        import hashlib

        h = hashlib.sha1(str(int(lora_id)).encode())
        arr = np.asarray(tokens, np.int32)
        keys = []
        for i in range(len(arr) // self._page):
            h.update(arr[i * self._page:(i + 1) * self._page].tobytes())
            keys.append(h.digest())
        return keys

    def _pc_evict(self, need: int) -> None:
        """Release up to ``need`` pages from refs-0 cache entries, oldest
        hit first (OrderedDict order; hits move_to_end)."""
        freed = 0
        for key in list(self._pcache):
            if freed >= need:
                break
            page, refs = self._pcache[key]
            if refs:
                continue
            del self._pcache[key]
            self._allocator.release([page])
            self.stats["page_cache_evicted"] += 1
            freed += 1

    def register_lora(self, adapters, lcfg) -> int:
        """Register a LoRA adapter for per-request serving.

        Requests submitted with ``lora_id=<returned id>`` decode through
        this adapter; slots wearing DIFFERENT adapters still batch into
        one fixed-shape decode chunk (the per-slot low-rank side-path,
        ``models/lora.py::lora_decode_ops``). The stacks are allocated at
        construction (``max_loras``), so registration writes rows and
        never recompiles. Admission prefills through dense weights merged
        from the stack row INSIDE the prefill jit (``_prefill_lora``) —
        transient, so registering N adapters costs N stack rows of HBM,
        never N model copies.
        """
        from ..models.lora import stack_lora

        if not self._max_loras:
            raise ValueError(
                "construct the engine with max_loras=N to serve adapters")
        if self._n_loras >= self._max_loras:
            raise ValueError(
                f"all {self._max_loras} adapter slots are registered")
        idx = self._n_loras + 1
        self._lora_stacks = stack_lora(self._lora_stacks, adapters, lcfg,
                                       idx)
        self._decode_params = dict(self._decode_params,
                                   _lora=self._lora_stacks)
        self._n_loras = idx
        return idx

    def submit(self, req: Request) -> int:
        """Queue a request; returns its assigned request_id.

        Prompts of ANY length up to the ctx budget are admitted: prompts
        longer than ``prefill_window`` are CHUNKED at admission — the
        first window prefills, the rest block-extends window-at-a-time
        through the prefix-extension forward (``_extend_prefix``), so no
        new shapes compile and ``prefill_window`` is a chunking detail,
        not a cap. (MoE engines keep the cap: the block-extend forward
        has no expert routing.)
        """
        plen = len(req.prompt)
        if plen == 0:
            raise ValueError("empty prompt")
        if self._auto_prefix and req.prefix_id is None:
            hit = self._match_prefix(req.prompt, req.lora_id)
            if hit is not None:
                pid, n = hit
                req = dataclasses.replace(
                    req, prefix_id=pid, prompt=list(req.prompt[n:]))
                plen = len(req.prompt)
        from ..models.moe import MoEGPTConfig as _MoE

        if plen > self.prefill_window and isinstance(self.cfg, _MoE):
            raise ValueError(
                f"prompt length {plen} exceeds prefill_window "
                f"{self.prefill_window} (chunked prefill needs the dense "
                "block-extend forward; MoE prompts are capped)")
        if req.max_new_tokens < 1:
            raise ValueError("max_new_tokens must be >= 1")
        pref_len = 0
        if req.prefix_id is not None:
            if req.prefix_id not in self._prefixes:
                raise ValueError(f"unknown prefix_id {req.prefix_id}")
            pref_len = self._prefixes[req.prefix_id][3]
        if req.lora_id and (not self._max_loras
                            or req.lora_id > self._n_loras):
            raise ValueError(f"unknown lora_id {req.lora_id} "
                             f"({self._n_loras} registered)")
        if req.prefix_id is not None:
            # a cached prefix KV bakes in the projections of the params
            # it was prefilled with — usable only by the SAME adapter
            pref_lora = self._prefixes[req.prefix_id][5]
            if pref_lora != req.lora_id:
                raise ValueError(
                    f"prefix {req.prefix_id} was prefilled with adapter "
                    f"{pref_lora}; request wears {req.lora_id} — register "
                    f"a per-adapter prefix (register_prefix(..., "
                    f"lora_id={req.lora_id}))")
        if self._ring:
            # ring slots have unbounded positions: only the PROMPT must
            # fit the bounded prefill; the decode budget is unlimited
            if pref_len + plen > self.cfg.ctx_len:
                raise ValueError(
                    f"prefix ({pref_len}) + prompt ({plen}) exceeds "
                    f"ctx_len {self.cfg.ctx_len} (the prefill is bounded "
                    f"even in ring mode)")
        else:
            reserved = self._reserved(req)
            if pref_len + plen + reserved > self.cfg.ctx_len:
                how = (f"max_new_tokens + 2(n_draft+1) speculative slack"
                       if self._spec else
                       f"max_new_tokens rounded up to the {self.chunk}-"
                       f"token chunk")
                raise ValueError(
                    f"prefix ({pref_len}) + prompt ({plen}) + reserved "
                    f"decode budget ({reserved} = {how}) exceeds ctx_len "
                    f"{self.cfg.ctx_len}")
            if self._paged:
                need = -(-(pref_len + plen + reserved) // self._page)
                if req.prefix_id is not None:
                    need -= len(self._prefixes[req.prefix_id][4])
                # pages an idle engine can hand out: everything except the
                # trash page and prefix-pinned shared pages
                cap = self._allocator.n_pages - 1 - self._shared_held
                if need > cap:
                    raise ValueError(
                        f"request needs {need} private pages but the pool "
                        f"can free at most {cap} (raise n_pages or lower "
                        f"max_new_tokens)")
        req = dataclasses.replace(req, request_id=next(self._ids))
        self._submit_ts[req.request_id] = time.perf_counter()
        self._queue.append(req)
        return req.request_id

    # -- engine loop --------------------------------------------------------

    @property
    def n_active(self) -> int:
        return sum(r is not None for r in self._slot_req)

    @property
    def pending(self) -> int:
        return len(self._queue)

    def _reserved(self, req: Request) -> int:
        """Decode-budget cache rows an admission must reserve: speculative
        rounds advance up to S = n_draft+1 rows past the budget gate and
        the block write needs S rows of headroom (2S slack); plain chunks
        round the budget up to the chunk size."""
        if self._spec:
            return req.max_new_tokens + 2 * (self._spec + 1)
        return -(-req.max_new_tokens // self.chunk) * self.chunk

    def _admit(self, slot: int, req: Request) -> bool:
        cfg, W = self.cfg, self.prefill_window
        plen = len(req.prompt)
        scatter_ids = table_ids = None
        pref_len, shared = 0, []
        if req.prefix_id is not None:
            pref_len, shared = self._prefixes[req.prefix_id][3:5]
        # automatic page cache: the longest run of cached full blocks of
        # the PREFILL token sequence (spec mode leaves the pending token
        # out) joins the table as shared pages — exactly the registered-
        # prefix mechanics, but keyed by content. Non-spec admissions cap
        # the run one block short of the prompt so >= 1 token remains to
        # produce the first sampling logits.
        pc_hits, pc_keys = [], None
        if (self._paged and self._page_cache and req.prefix_id is None):
            pf_len = plen - 1 if self._spec else plen
            pc_keys = self._pc_chain(req.prompt[:pf_len], req.lora_id)
            cap = (pf_len if self._spec else pf_len - 1) // self._page
            for key in pc_keys[:cap]:
                ent = self._pcache.get(key)
                if ent is None:
                    break
                pc_hits.append((key, ent))
        if self._paged:
            # admission control by memory: reserve every page the request
            # can touch (prompt + decode-budget reservation) MINUS the
            # prefix's shared full pages (or cached prompt pages), which
            # every admission reads in place; if the pool can't cover it
            # the request stays queued
            if pc_hits:
                shared = [ent[0] for _, ent in pc_hits]
            reserved = self._reserved(req)
            need = -(-(pref_len + plen + reserved) // self._page)
            npriv = need - len(shared)
            if npriv > self._allocator.n_free and self._page_cache:
                # refs-0 cached pages are reclaimable capacity: protect
                # this request's own hits, then evict LRU
                for _, ent in pc_hits:
                    ent[1] += 1
                self._pc_evict(npriv - self._allocator.n_free)
                for _, ent in pc_hits:
                    ent[1] -= 1
            if npriv > self._allocator.n_free:
                return False
            pages = self._allocator.alloc(npriv)
            self._slot_pages[slot] = pages  # retire frees ONLY these
            full = np.zeros((cfg.ctx_len // self._page,), np.int32)
            full[:need] = shared + pages  # tail entries stay 0 (trash)
            table_ids = jnp.asarray(full)
            scatter = full.copy()
            scatter[:len(shared)] = 0  # never rewrite shared pages
            scatter_ids = jnp.asarray(scatter)
            if pc_hits:
                # gather ids for the dense prefix view: hit pages only
                pc_gather = full.copy()
                pc_gather[len(pc_hits):] = 0
        # async: the prefills/extends and the slot scatter are dispatched,
        # never synced — the next decode chunk consumes them on-device.
        # Adapter requests run through dense weights merged from the stack
        # row inside each jit (transient — no per-adapter model copies);
        # prefix requests start from the cached prefix KV; prompts longer
        # than the window loop the SAME fixed-shape block-extend the
        # prefix path uses, W tokens at a time (chunked prefill).
        prompt = np.asarray(req.prompt, np.int32)
        if self._spec:
            # the last prompt token stays UNPROCESSED (the pending token
            # of the first speculative round, exactly as the single-stream
            # loop leaves prompt[-1] out of its prefill); admission logits
            # are never sampled from in spec mode
            pending_tok, prompt = int(prompt[-1]), prompt[:-1]
        if req.prefix_id is not None:
            pk, pv = self._prefixes[req.prefix_id][:2]
            pos, rest, logits = pref_len, prompt, None
        elif pc_hits:
            # cached prompt pages: gather them into a dense prefix view
            # and block-extend only the uncached tail (the registered-
            # prefix flow, content-addressed)
            from .paged import _gather_prefix_pages

            pk, pv = _gather_prefix_pages(self._cache,
                                          jnp.asarray(pc_gather))
            pos = len(pc_hits) * self._page
            rest, logits = prompt[pos:], None
        else:
            first = min(len(prompt), W)
            ids = np.zeros((1, W), np.int32)
            ids[0, :first] = prompt[:first]
            if req.lora_id:
                logits, cache = _prefill_lora(
                    self.params, self._lora_stacks, req.lora_id,
                    jnp.asarray(ids), first, cfg)
            else:
                logits, cache = self._prefill(self.params, jnp.asarray(ids),
                                              cfg, length=first)
            pk, pv = cache["k"], cache["v"]
            pos, rest = first, prompt[first:]
        for off in range(0, len(rest), W):
            chunk = rest[off:off + W]
            ids = np.zeros((1, W), np.int32)
            ids[0, :len(chunk)] = chunk
            if req.lora_id:
                # suffix K/V must come from the SAME projections as the
                # prefix's (adapter-merged when the request wears one)
                logits, pk, pv = _extend_prefix_lora(
                    self.params, self._lora_stacks, req.lora_id, pk, pv,
                    pos, jnp.asarray(ids), len(chunk), cfg, W)
            else:
                logits, pk, pv = _extend_prefix(
                    self.params, pk, pv, pos, jnp.asarray(ids), len(chunk),
                    cfg, W)
            pos += len(chunk)
        kv, total = (pk, pv), pos
        if logits is None:  # spec-mode prefix + 1-token prompt: nothing
            logits = jnp.zeros((1, cfg.vocab_size), jnp.float32)
        if self._paged:
            from .paged import _admit_slot_paged

            self._cache, self._logits = _admit_slot_paged(
                self._cache, self._logits, kv[0], kv[1], total, logits,
                slot, scatter_ids, table_ids, cfg)
        elif self._ring:
            self._cache, self._logits = _admit_slot_ring(
                self._cache, self._logits, kv[0], kv[1], total, logits,
                slot, cfg)
        else:
            self._cache, self._logits = _admit_slot(
                self._cache, self._logits, kv[0], kv[1], total, logits,
                slot)
        req_k = self.top_k if req.top_k is None else req.top_k
        if (self._temp[slot] != req.temperature
                or self._top_p[slot] != req.top_p
                or self._top_k[slot] != req_k):
            self._temp[slot] = req.temperature
            self._top_p[slot] = req.top_p
            self._top_k[slot] = req_k
            self._samp_dev = None
        self._slot_req[slot] = req
        self._admit_ts[req.request_id] = time.perf_counter()
        self._count[slot] = 0
        if self._spec:
            # hist = prefix tokens + FULL prompt (incl. the pending one);
            # drafting copies continuations of earlier n-gram occurrences
            hist = np.zeros((cfg.ctx_len,), np.int32)
            full_toks = np.concatenate(
                [np.asarray(self._prefixes[req.prefix_id][6], np.int32)
                 if req.prefix_id is not None else np.zeros(0, np.int32),
                 np.asarray(req.prompt, np.int32)])
            hist[:len(full_toks)] = full_toks
            self._cache = _set_slot_spec(self._cache, slot,
                                         jnp.asarray(hist), pending_tok)
            self._budget[slot] = req.max_new_tokens
            self._samp_dev = None  # budget vector rides with sampling
        if self._max_loras:
            # a reused slot must DROP its previous occupant's adapter
            self._cache = _set_slot_lora(self._cache, slot, req.lora_id)
        if self._page_cache and pc_keys is not None:
            # pin the hits for the slot's lifetime; record which PRIVATE
            # pages hold full prompt blocks (insert candidates at retire:
            # logical block j >= len(hits) lives in pages[j - len(hits)])
            for key, ent in pc_hits:
                ent[1] += 1
                self._pcache.move_to_end(key)
            ins = [(pc_keys[j], pages[j - len(pc_hits)])
                   for j in range(len(pc_hits), len(pc_keys))]
            self._slot_pc[slot] = ([k for k, _ in pc_hits], ins)
            self.stats["page_cache_hits"] += len(pc_hits)
        self._scanned[slot] = 0
        assert not self._slot_chunks[slot]
        self.stats["prefills"] += 1
        return True

    def _free_pages(self, slot: int) -> None:
        """Paged retire: return the slot's pages to the pool and point its
        table row at the trash page so idle decode can't touch them.

        Page-cache engines first unpin the admission's cache hits and
        TRANSFER the slot's full-prompt-block pages into the content
        cache (refs 0 — reclaimable, reusable) instead of releasing
        them; a duplicate key (a concurrent identical request retired
        first) releases normally."""
        if self._paged and self._slot_pages[slot]:
            from .paged import _reset_table_row

            self._cache = _reset_table_row(self._cache, slot)
            pages = self._slot_pages[slot]
            if self._page_cache and self._slot_pc[slot] is not None:
                hit_keys, ins = self._slot_pc[slot]
                self._slot_pc[slot] = None
                for k in hit_keys:
                    self._pcache[k][1] -= 1
                kept = set()
                for key, page in ins:
                    if key not in self._pcache:
                        self._pcache[key] = [page, 0]
                        kept.add(page)
                pages = [p for p in pages if p not in kept]
            self._allocator.release(pages)
            self._slot_pages[slot] = []

    # -- async token store ----------------------------------------------

    def _materialize(self, cid: int) -> np.ndarray:
        """Fetch one chunk's tokens to host (memoized; THE sync point)."""
        arr = self._np.get(cid)
        if arr is None:
            arr = np.asarray(self._store[cid])
            self._np[cid] = arr
            self._store[cid] = None  # device buffer no longer needed
            self.stats["syncs"] += 1
            self._since_sync = 0
        return arr

    def _ready(self, cid: int) -> bool:
        if cid in self._np:
            return True
        arr = self._store.get(cid)
        try:
            return bool(arr.is_ready())
        except AttributeError:  # pragma: no cover - older jax arrays
            return False

    def _chunk_rows(self, cid: int, slot: int) -> np.ndarray:
        """One chunk's EMITTED tokens for ``slot`` as a flat 1-D array.

        Plain chunks emit every sampled token ((B, chunk) rows). Spec
        chunks are (B, rounds, S) with a per-(slot, round) valid count —
        only the accepted prefix + resample of each round is real."""
        arr = self._materialize(cid)
        if not self._spec:
            return arr[slot]
        v = self._valids[cid][slot]  # (rounds,)
        rows = arr[slot]             # (rounds, S)
        if not v.sum():
            return np.zeros((0,), np.int32)
        return np.concatenate([rows[r, :n] for r, n in enumerate(v) if n])

    def _slot_tokens(self, slot: int) -> np.ndarray:
        cids = self._slot_chunks[slot]
        return np.concatenate([self._chunk_rows(c, slot) for c in cids]) \
            if cids else np.zeros((0,), np.int32)

    def _release_cids(self, cids: List[int]) -> None:
        for cid in cids:
            self._refs[cid] -= 1
            if self._refs[cid] == 0:
                del self._refs[cid]
                self._store.pop(cid, None)
                self._np.pop(cid, None)
                if self._spec:
                    self._valids.pop(cid, None)

    def _emit(self, req: Request, tokens: List[int], reason: str,
              finished_ts: float) -> None:
        self.completions.append(Completion(
            request_id=req.request_id,
            tokens=tokens,
            prompt_len=len(req.prompt),
            finish_reason=reason,
            submitted_at=self._submit_ts.pop(req.request_id),
            admitted_at=self._admit_ts.pop(req.request_id, 0.0),
            finished_at=finished_ts,
        ))
        self.stats["emitted_tokens"] += len(tokens)

    def _finish(self, slot: int, tokens: List[int], reason: str) -> None:
        """Eager finish (stop-token path): tokens already on host."""
        req = self._slot_req[slot]
        assert req is not None
        self._emit(req, tokens, reason, time.perf_counter())
        self._slot_req[slot] = None
        self._release_cids(self._slot_chunks[slot])
        self._slot_chunks[slot] = []
        self._free_pages(slot)

    def _retire(self, slot: int) -> None:
        """Lazy finish (length path): free the slot NOW — admission needs
        only host bookkeeping — and emit once the async copies land."""
        req = self._slot_req[slot]
        assert req is not None
        self._pending_done.append(
            (req, self._slot_chunks[slot], slot, time.perf_counter()))
        self._slot_req[slot] = None
        self._slot_chunks[slot] = []
        self._free_pages(slot)

    def _drain_pending(self, block: bool) -> None:
        still = []
        for ent in self._pending_done:
            req, cids, row, ts = ent
            if not block and not all(
                    self._ready(c)
                    and (not self._spec or c in self._valids)
                    for c in cids):
                still.append(ent)
                continue
            seq = np.concatenate([self._chunk_rows(c, row) for c in cids])
            self._emit(req, seq[:req.max_new_tokens].tolist(), "length", ts)
            self._release_cids(cids)
        self._pending_done = still

    def _step_spec(self, key) -> bool:
        """Advance every active slot by one SPECULATIVE chunk
        (``spec_rounds`` draft+verify rounds in one dispatch).

        Emitted lengths are data-dependent — the host needs each chunk's
        tiny (B, rounds) valid array to advance counts. Blocking on it
        per chunk costs a full ~40 ms tunnel round trip that the plain
        engine never pays (measured 4x engine slowdown DESPITE 22
        tok/round drafting), so valids copy ASYNC like tokens and drain
        lazily in dispatch order (``_drain_spec``): counts lag by the
        copies in flight, retirement happens a chunk or two late, and
        the device-side budget gate makes the lag safe — a finished
        slot's extra rounds emit zero valid tokens at its frozen
        position. A stop-token request still forces the eager per-chunk
        drain (its tokens must be SEEN to stop), exactly like the plain
        engine's eager path; the ``sync_every`` depth valve bounds
        wasted lag rounds.
        """
        from .spec import decode_chunk_spec

        toks, valid, self._cache = decode_chunk_spec(
            self._decode_params, self._cache, key, *self._samp_dev,
            self.cfg, self._spec_rounds, self._spec)
        try:
            toks.copy_to_host_async()
            valid.copy_to_host_async()
        except AttributeError:  # pragma: no cover - older jax arrays
            pass
        active = [s for s in range(self.n_slots)
                  if self._slot_req[s] is not None]
        cid = next(self._chunk_ids)
        self._store[cid] = toks
        self._refs[cid] = len(active)
        for s in active:
            self._slot_chunks[s].append(cid)
        self._spec_pending.append((cid, valid, active))
        self.stats["chunks"] += 1
        self.stats["spec_rounds"] = (self.stats.get("spec_rounds", 0)
                                     + self._spec_rounds)
        stopper = any(self._slot_req[s] is not None
                      and self._slot_req[s].stop_token >= 0
                      for s in range(self.n_slots))
        # purely lazy below the sync_every valve: a measured head_block
        # variant (force the oldest copy once ~4 chunks were in flight)
        # halved engine throughput on the chip — the host dispatches far
        # ahead of the device, so even a 4-chunk-old copy usually means
        # waiting out device compute + the ~40 ms tunnel round trip.
        # Wasted tail rounds are the cheaper currency; sync_every bounds
        # them.
        self._drain_spec(
            block=stopper or len(self._spec_pending) >= self.sync_every)
        return True

    def _drain_spec(self, block: bool) -> None:
        """Process pending (chunk, valid) pairs in dispatch order: advance
        per-slot counts, scan stop tokens, retire completed budgets.
        Without ``block``, stops at the first valid copy still in
        flight. ``_spec_lazy_min`` (test seam, default 0) keeps at least
        that many chunks undrained in non-block mode — CPU executes
        synchronously, so without it the lag paths that the TPU's truly
        async copies exercise would never run under pytest."""
        while self._spec_pending:
            cid, valid, active = self._spec_pending[0]
            if not block:
                if len(self._spec_pending) <= getattr(
                        self, "_spec_lazy_min", 0):
                    break
                try:
                    if not valid.is_ready():
                        break
                except AttributeError:  # pragma: no cover - older jax
                    pass
            v = np.asarray(valid)  # (B, rounds) int32
            self._spec_pending.pop(0)
            self._valids[cid] = v
            self.stats["decode_tokens"] += int(v.sum())
            for slot in active:
                self._count[slot] += int(v[slot].sum())
                req = self._slot_req[slot]
                if req is None:
                    continue  # slot already finished (stop-token path)
                budget = req.max_new_tokens
                if req.stop_token >= 0:
                    seq = self._slot_tokens(slot)
                    new = seq[self._scanned[slot]:min(self._count[slot],
                                                      budget)]
                    hits = np.nonzero(new == req.stop_token)[0]
                    if hits.size:
                        end = self._scanned[slot] + int(hits[0]) + 1
                        self._budget[slot] = 0
                        self._samp_dev = None
                        self._finish(slot, seq[:end].tolist(), "stop")
                        continue
                    self._scanned[slot] = min(self._count[slot], budget)
                if self._count[slot] >= budget:
                    self._budget[slot] = 0
                    self._samp_dev = None
                    self._retire(slot)  # tokens may still be in flight

    def step(self) -> bool:
        """Admit queued requests into free slots, then advance every active
        slot by one decode chunk. Returns False when fully idle.

        The host blocks only when it must: a slot whose LENGTH budget
        completed (known without looking at tokens), a stop-token request
        being active (its new tokens must be scanned every chunk), or the
        ``sync_every`` dispatch-depth safety valve.
        """
        if self._spec:
            # surface lag-retired slots before admission looks for room
            self._drain_spec(block=False)
        self._drain_pending(block=False)
        for slot in range(self.n_slots):
            if self._slot_req[slot] is None and self._queue:
                if self.schedule == "fifo":
                    # FIFO: a paged admit can fail on page pressure — the
                    # request stays at the head and later slots wait too
                    if not self._admit(slot, self._queue[0]):
                        break
                    self._queue.popleft()
                else:
                    # best-fit: admit the FIRST queued request that fits
                    # the current free pool; a blocked large request no
                    # longer stalls small ones behind it
                    for i, req in enumerate(self._queue):
                        if self._admit(slot, req):
                            del self._queue[i]
                            break
                    else:
                        break  # nothing fits until pages free up
        # retire/finish free pages immediately, so with every slot idle the
        # whole pool is free and submit()'s fits-the-pool check guarantees
        # the head request admits — an all-idle non-empty queue is a bug
        assert not (self.n_active == 0 and self._queue), \
            "queued request cannot be admitted with an idle engine"
        if self.n_active == 0:
            return False
        self._key, k = jax.random.split(self._key)
        if self._samp_dev is None:
            # jnp.array COPIES (jnp.asarray on the CPU backend aliases
            # the numpy buffer zero-copy!) — the engine mutates
            # _temp/_top_p/_top_k/_budget in place at admission and
            # retire, and with async dispatch an enqueued-but-unexecuted
            # chunk would otherwise read the RETROACTIVELY-mutated
            # vector (measured: a lag-retired slot's budget[s]=0 write
            # froze the NEXT occupant's in-flight chunks at 15/55
            # tokens, and the stale occupant's chunks ran ungated)
            self._samp_dev = (jnp.array(self._temp),
                              jnp.array(self._top_p),
                              jnp.array(self._top_k))
            if self._spec:
                self._samp_dev += (jnp.array(self._budget),)
        if self._spec:
            return self._step_spec(k)
        if self._paged:
            import functools

            from .paged import decode_chunk_paged

            _chunk = functools.partial(decode_chunk_paged,
                                       use_kernel=self._paged_kernel)
        elif self._ring:
            from ..models.stream import stream_chunk_slots as _chunk
        else:
            _chunk = decode_chunk_slots
        toks, self._logits, self._cache = _chunk(
            self._decode_params, self._cache, self._logits, k,
            *self._samp_dev, self.cfg, self.chunk)
        try:
            toks.copy_to_host_async()
        except AttributeError:  # pragma: no cover - older jax arrays
            pass
        active = [s for s in range(self.n_slots)
                  if self._slot_req[s] is not None]
        cid = next(self._chunk_ids)
        self._store[cid] = toks
        self._refs[cid] = len(active)
        for s in active:
            self._slot_chunks[s].append(cid)
            self._count[s] += self.chunk
        self.stats["chunks"] += 1
        self.stats["decode_tokens"] += self.n_slots * self.chunk
        self._since_sync += 1
        if self._since_sync >= self.sync_every:
            self._materialize(cid)

        for slot in active:
            req = self._slot_req[slot]
            budget = req.max_new_tokens
            if req.stop_token >= 0:
                # eager scan: a stop-token request pays the per-chunk sync
                seq = self._slot_tokens(slot)
                new = seq[self._scanned[slot]:min(self._count[slot], budget)]
                hits = np.nonzero(new == req.stop_token)[0]
                if hits.size:
                    end = self._scanned[slot] + int(hits[0]) + 1
                    self._finish(slot, seq[:end].tolist(), "stop")
                    continue
                self._scanned[slot] = min(self._count[slot], budget)
                if self._count[slot] >= budget:
                    self._finish(
                        slot, self._slot_tokens(slot)[:budget].tolist(),
                        "length")
            elif self._count[slot] >= budget:
                self._retire(slot)  # slot frees now; emission is lazy
        return True

    def run(self) -> List[Completion]:
        """Drain the queue and all in-flight slots; returns completions in
        finish order (also accumulated on ``self.completions``)."""
        start = len(self.completions)
        while self.step():
            pass
        if self._spec:
            self._drain_spec(block=True)
        self._drain_pending(block=True)
        return self.completions[start:]


def serve(params, cfg: GPTConfig, requests: Sequence[Request],
          n_slots: int = 8, chunk: int = 32, top_k: int = 0,
          prefill_window: Optional[int] = None, seed: int = 0,
          quant: str = "none") -> List[Completion]:
    """One-shot convenience: submit ``requests``, run to completion, return
    completions ordered by request_id."""
    eng = ServeEngine(params, cfg, n_slots=n_slots, chunk=chunk, top_k=top_k,
                      prefill_window=prefill_window, seed=seed, quant=quant)
    for r in requests:
        eng.submit(r)
    done = eng.run()
    return sorted(done, key=lambda c: c.request_id)
