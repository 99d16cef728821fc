"""char-GPT CLI: train on TinyShakespeare and/or run a sampling REPL.

Flag-for-flag parity with the reference entry point
(/root/reference/gpt.py:578-609). Run as ``python -m linalg_tpu.apps.gpt``.
"""

from __future__ import annotations

import argparse

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--repl", action="store_true")
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--ctx_len", type=int, default=256)
    ap.add_argument("--d_model", type=int, default=256)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--kv_heads", type=int, default=None,
                    help="grouped-query attention: number of K/V heads "
                         "(must divide --heads; 1 = multi-query). Shrinks "
                         "the KV cache and its decode HBM traffic by "
                         "heads/kv_heads; default = --heads (standard MHA)")
    ap.add_argument("--window", type=int, default=None,
                    help="sliding-window attention: each token attends to "
                         "the last N positions only (Mistral-style). "
                         "Bounds attention cost by N instead of ctx_len; "
                         "with --pos rope/alibi the sampler streams "
                         "unboundedly through a ring-buffer KV cache "
                         "(no context rollover). Default: full causal")
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--eval_every", type=int, default=200)
    ap.add_argument("--lr_model", type=float, default=3e-4)
    ap.add_argument("--lr_embed", type=float, default=3e-4,
                    help="lr for the (tied) token embedding matrix")
    ap.add_argument("--lr_head", type=float, default=3e-4,
                    help="lr for the output-head bias (weights are tied)")
    ap.add_argument("--pos", type=str, default="sinusoidal",
                    choices=("sinusoidal", "rope", "learned", "alibi"),
                    help="positional encoding for a fresh model")
    ap.add_argument("--ffn", type=str, default="relu",
                    choices=("relu", "gelu", "swiglu", "geglu"),
                    help="FFN nonlinearity for a fresh model: the "
                         "reference's relu MLP, gelu, or the gated "
                         "swiglu/geglu variants (reference README "
                         "roadmap items; extra Wg/bg gate projection)")
    ap.add_argument("--experts", type=int, default=0,
                    help="mixture-of-experts FFN: number of experts for a "
                         "fresh model (0 = dense FFN)")
    ap.add_argument("--router_top_k", type=int, default=1, choices=(1, 2),
                    help="experts per token: 1 = Switch, 2 = GShard top-2")
    ap.add_argument("--dispatch", type=str, default="einsum",
                    choices=("einsum", "gather"),
                    help="MoE token dispatch: dense one-hot einsums "
                         "(MXU/GSPMD-friendly, measured default) or int32 "
                         "slot-table gathers")
    ap.add_argument("--dtype", type=str, default="float32",
                    choices=("float32", "bfloat16"),
                    help="compute dtype for a fresh model (params stay f32; "
                         "bfloat16 halves HBM traffic on TPU)")
    ap.add_argument("--weight_decay", type=float, default=0.01)
    ap.add_argument("--ckpt_dir", type=str, default="checkpoints_np")
    ap.add_argument("--gen_tokens", type=int, default=200)
    ap.add_argument("--speculative", type=int, default=0, metavar="K",
                    help="draft K tokens/round via prompt-lookup "
                    "speculative decoding (exact sampling distribution; "
                    "dense GPT only). REPL: single-stream, falls back to "
                    "plain decode when the block does not fit ctx_len. "
                    "--serve: per-slot draft+verify composed with "
                    "continuous batching (serve/spec.py)")
    ap.add_argument("--draft_ckpt", type=str, default="",
                    help="REPL: checkpoint dir of a (smaller) DRAFT model "
                         "for draft-model speculative decoding; used with "
                         "--speculative K. The draft proposes greedily, "
                         "the target verifies — same vocabulary required. "
                         "Empty = prompt-lookup drafting (no extra model)")
    ap.add_argument("--quant", type=str, default="none",
                    choices=("none", "int8", "int8kv"),
                    help="REPL: decode with int8 weight-only quantized "
                         "matvecs (per-output-channel scales, bf16 "
                         "dequant-in-dot arithmetic; dense GPT only). "
                         "int8kv additionally stores the KV cache int8 "
                         "(per-row scales) — halves the cache traffic "
                         "that dominates long-context decode")
    ap.add_argument("--beam", type=int, default=0, metavar="B",
                    help="REPL: deterministic beam-search decoding with B "
                         "beams instead of sampling (ignores temperature/"
                         "top_k/top_p; needs prompt+gen_tokens <= ctx_len; "
                         "dense GPT only)")
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--top_k", type=int, default=0)
    ap.add_argument("--top_p", type=float, default=0.0,
                    help="nucleus sampling: keep the smallest probability "
                         "mass >= p (0 = off; composes with --top_k)")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--data", type=str, default=None,
                    help="path to a local corpus text file (optional)")
    ap.add_argument("--profile", type=str, default=None,
                    help="capture a jax.profiler trace of training into DIR")
    ap.add_argument("--log_file", type=str, default=None,
                    help="append training/eval metrics as JSON lines here "
                         "(written only at existing host-sync points — "
                         "adds no device round trips)")
    ap.add_argument("--dp", type=int, default=1,
                    help="data-parallel mesh axis (multi-device training)")
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel mesh axis (heads/FFN sharding; "
                         "with --experts it shards experts instead)")
    ap.add_argument("--sp", type=int, default=1,
                    help="sequence-parallel mesh axis (ring attention over "
                         "the context; for ctx lengths beyond one chip)")
    ap.add_argument("--ring", type=str, default="auto",
                    choices=("auto", "pallas", "xla"),
                    help="sp attention ring implementation: in-kernel DMA "
                         "Pallas ring or XLA ppermute (auto = Pallas on "
                         "TPU, XLA elsewhere)")
    ap.add_argument("--pp", type=int, default=1,
                    help="pipeline-parallel mesh axis (layer stack sharded "
                         "over stages, 1F1B microbatch schedule)")
    ap.add_argument("--fsdp", type=int, default=1,
                    help="fully-sharded data parallelism (ZeRO-3): batch "
                         "split like --dp, but parameter and optimizer "
                         "storage sharded 1/N per device (GSPMD gathers "
                         "weights per layer inside the step)")
    ap.add_argument("--clip_norm", type=float, default=0.0,
                    help="clip gradients to this global L2 norm before "
                         "AdamW (0 = off, the reference's behavior)")
    ap.add_argument("--grad_accum", type=int, default=1,
                    help="split each batch into N sequential microbatches "
                         "inside the step; one optimizer update on the "
                         "averaged grads (1/N activation memory)")
    ap.add_argument("--microbatches", type=int, default=0,
                    help="pipeline microbatch count (0 = auto: 2*pp when "
                         "the batch divides, else pp)")
    ap.add_argument("--tokenizer", type=str, default="char",
                    choices=("char", "bpe"),
                    help="tokenizer for a fresh model: char (reference "
                         "default) or byte-level BPE")
    ap.add_argument("--vocab_size", type=int, default=512,
                    help="BPE vocabulary size (used with --tokenizer bpe; "
                         "char vocab is always the corpus character set)")
    ap.add_argument("--serve", action="store_true",
                    help="batch-serve mode: run every prompt in --prompts "
                         "through the continuous-batching engine "
                         "(serve.ServeEngine) and print/write completions")
    ap.add_argument("--prompts", type=str, default="-",
                    help="serve mode: file with one prompt per line "
                         "('-' = stdin)")
    ap.add_argument("--n_slots", type=int, default=8,
                    help="serve mode: concurrent decode slots in the engine")
    ap.add_argument("--chunk", type=int, default=32,
                    help="serve mode: decode-chunk length (tokens sampled "
                         "per device dispatch)")
    ap.add_argument("--out", type=str, default="",
                    help="serve mode: write completions as JSON lines to "
                         "this file instead of stdout")
    ap.add_argument("--page_cache", action="store_true",
                    help="serve mode (with --paged): automatic prefix "
                         "caching — retired requests leave their full "
                         "prompt pages in the pool under content-"
                         "addressed keys; admissions reuse the longest "
                         "cached block run (refcounted, LRU-evicted "
                         "under page pressure)")
    ap.add_argument("--auto_prefix", action="store_true",
                    help="serve mode: submit full prompts and let the "
                         "engine transparently reuse the longest "
                         "registered prefix (ServeEngine(auto_prefix"
                         "=True)); with --prefix_file, prompts are "
                         "submitted as prefix+line with no explicit "
                         "prefix_id")
    ap.add_argument("--prefix_file", type=str, default="",
                    help="serve mode: file whose text is a shared prompt "
                         "PREFIX (e.g. a system prompt) prepended to every "
                         "prompt; its KV is prefilled once and reused per "
                         "request (ServeEngine.register_prefix)")
    ap.add_argument("--lora_rank", type=int, default=0,
                    help="train mode: LoRA-finetune rank-N adapters on a "
                         "frozen base checkpoint (0 = full training); "
                         "repl/serve auto-merge adapters from --lora_dir")
    ap.add_argument("--lora_alpha", type=float, default=16.0,
                    help="LoRA delta scale = alpha/rank (PEFT convention)")
    ap.add_argument("--lora_targets", type=str, default="attn",
                    choices=("attn", "all"),
                    help="which weights get adapters: attention "
                         "projections, or + FFN matmuls")
    ap.add_argument("--lora_dir", type=str, default="",
                    help="adapter checkpoint dir (default "
                         "<ckpt_dir>/lora); repl/serve merge adapters "
                         "from here when present")
    ap.add_argument("--paged", action="store_true",
                    help="serve mode: paged KV cache (vLLM-style page pool "
                         "+ per-slot tables; admission control by memory, "
                         "prefix pages shared across slots)")
    ap.add_argument("--page", type=int, default=64,
                    help="paged mode: rows per KV page (must divide "
                         "ctx_len)")
    ap.add_argument("--n_pages", type=int, default=0,
                    help="paged mode: pool size in pages (0 = dense-"
                         "equivalent n_slots*ctx_len/page + trash page)")
    ap.add_argument("--schedule", type=str, default="fifo",
                    choices=("fifo", "best-fit"),
                    help="serve admission under page pressure: strict "
                         "arrival order (no starvation) or first-fit "
                         "past a blocked large request (utilization)")
    ap.add_argument("--kv8", action="store_true",
                    help="serve: store the paged KV pool int8 with "
                         "per-row scales (requires --paged; pool bytes "
                         "~halve vs bf16, so the same HBM holds ~2x the "
                         "pages; attention reads via the gather path)")
    ap.add_argument("--paged_attn", type=str, default="auto",
                    choices=("auto", "kernel", "gather"),
                    help="paged mode attention read: Pallas in-place page "
                         "kernel vs XLA table-gather (auto = kernel on "
                         "TPU from ctx 2048 at d_head %% 128 == 0)")
    return ap


def _decode_text(tok, itos, toks) -> str:
    """Token ids -> text through whichever tokenizer the checkpoint uses."""
    if hasattr(tok, "token_bytes"):  # byte-level BPE
        return b"".join(
            tok.token_bytes(int(t)) for t in toks
        ).decode("utf-8", "replace")
    return "".join(itos[int(t)] for t in toks)


def _maybe_lora(params, args):
    """Merge LoRA adapters into the loaded base params when ``--lora_dir``
    (or its <ckpt_dir>/lora default) holds an adapter checkpoint. Merging
    at load time means every inference path — REPL, serving, beam,
    speculative, quantized — runs the adapted model with ZERO runtime
    overhead."""
    import pathlib

    from ..models.lora import load_lora, lora_merge

    lora_dir = getattr(args, "lora_dir", "") or str(
        pathlib.Path(args.ckpt_dir) / "lora")
    try:
        adapters, lcfg = load_lora(lora_dir)
    except Exception:
        if getattr(args, "lora_dir", ""):
            print(f"(no LoRA adapters at {lora_dir}; using the base model)")
        return params
    print(f"merged LoRA adapters from {lora_dir} "
          f"(rank {lcfg.rank}, targets {lcfg.targets})")
    return lora_merge(params, adapters, lcfg)


def serve_cli(args) -> None:
    """Serve a batch of prompts through the continuous-batching engine.

    The CLI surface the reference never had (its only inference path is the
    one-stream REPL, /root/reference/gpt.py:549-575): prompts stream through
    ``serve.ServeEngine``'s fixed-shape slot decode concurrently, each with
    the CLI's sampling params, and completions come back in request order.
    Prompts longer than the ctx budget keep their LAST admissible tokens —
    the reference's context-truncation rule (gpt.py:525-527); within the
    budget, any length admits (chunked prefill; MoE keeps the window cap).
    """
    import sys
    import time as _time

    from ..models.moe import MoEGPTConfig
    from ..serve.engine import Request, ServeEngine
    from ..train.checkpoint import load_ckpt, load_tokenizer

    params, cfg, stoi, itos = load_ckpt(args.ckpt_dir)
    params = _maybe_lora(params, args)
    tok = load_tokenizer(args.ckpt_dir)
    quant = getattr(args, "quant", "none")
    if quant != "none" and isinstance(cfg, MoEGPTConfig):
        print("(--quant supports the dense GPT only; serving full "
              "precision)")
        quant = "none"

    if args.prompts == "-":
        lines = [ln.rstrip("\n") for ln in sys.stdin]
    else:
        with open(args.prompts, encoding="utf-8") as f:
            lines = [ln.rstrip("\n") for ln in f]
    lines = [ln for ln in lines if ln.strip()]
    if not lines:
        print("serve: no prompts")
        return

    mesh = None
    if getattr(args, "tp", 1) > 1:
        # tensor-parallel serving over the first tp devices (ICI mesh);
        # params head-sharded, KV cache tp-local, one psum per layer
        import jax as _jax
        import numpy as _np
        from jax.sharding import Mesh

        devs = _jax.devices()
        if len(devs) < args.tp:
            raise SystemExit(
                f"--tp {args.tp} needs {args.tp} devices; have {len(devs)}")
        mesh = Mesh(_np.asarray(devs[:args.tp]).reshape(1, args.tp),
                    ("dp", "tp"))
    paged = bool(getattr(args, "paged", False))
    ring = cfg.window is not None and cfg.pos in ("rope", "alibi")
    if paged and (mesh is not None or ring
                  or isinstance(cfg, MoEGPTConfig)):
        print("(--paged supports the dense GPT outside ring/tp mode; "
              "serving with the slot cache)")
        paged = False
    kv8 = paged and bool(getattr(args, "kv8", False))
    spec = int(getattr(args, "speculative", 0) or 0)
    # (--lora_dir adapters were merged into params at load, so they do
    # NOT constrain speculation — only the engine-level exclusions do)
    if spec and (quant != "none" or mesh is not None or ring
                 or isinstance(cfg, MoEGPTConfig) or kv8
                 or (paged and getattr(args, "paged_attn", "auto")
                     == "kernel")):
        print("(--speculative serving supports the full-precision dense "
              "slot/paged(gather) engine; serving without speculation)")
        spec = 0
    eng = ServeEngine(params, cfg, n_slots=args.n_slots, chunk=args.chunk,
                      top_k=args.top_k, seed=args.seed, quant=quant,
                      mesh=mesh, paged=paged, page=args.page,
                      n_pages=(args.n_pages or None),
                      paged_attn=getattr(args, "paged_attn", "auto"),
                      speculative=spec, kv8=kv8,
                      schedule=getattr(args, "schedule", "fifo"),
                      auto_prefix=getattr(args, "auto_prefix", False),
                      page_cache=getattr(args, "page_cache", False))
    # the engine reserves ceil(gen/chunk)*chunk cache rows per request
    # (speculative: gen + 2*(draft block) rows); cap gen so one prompt
    # token always fits, then truncate each prompt to leave the full
    # reserved budget (the reference truncates context to make room for
    # generation the same way, gpt.py:525-527)
    if spec:
        gen_max = cfg.ctx_len - 1 - 2 * (spec + 1)
        gen = min(args.gen_tokens, max(gen_max, 1))
        reserved = gen + 2 * (spec + 1)
    else:
        gen_max = (cfg.ctx_len - 1) // args.chunk * args.chunk
        gen = min(args.gen_tokens, max(gen_max, 1))
        reserved = -(-gen // args.chunk) * args.chunk
    if gen < args.gen_tokens:
        print(f"(gen_tokens capped to {gen}: the decode budget "
              f"reservation must fit ctx_len {cfg.ctx_len})")
    pid, pref_len = None, 0
    if getattr(args, "prefix_file", ""):
        with open(args.prefix_file, encoding="utf-8") as f:
            pref_ids = list(tok.encode(f.read().rstrip("\n")))
        # the prefix must leave room for >=1 prompt token + the decode
        # budget; tail-truncate like prompts (reference gpt.py:525-527)
        pref_cap = min(cfg.ctx_len - args.chunk - 1,
                       cfg.ctx_len - reserved - 1)
        if len(pref_ids) > pref_cap:
            print(f"(prefix truncated to its last {pref_cap} tokens)")
            pref_ids = pref_ids[-pref_cap:]
        if isinstance(cfg, MoEGPTConfig):
            print("(--prefix_file supports the dense GPT only; prefix "
                  "prepended per-prompt instead)")
            pref_raw = pref_ids
        elif pref_ids:
            pid, pref_len = eng.register_prefix(pref_ids), len(pref_ids)
            pref_raw = None
        else:
            pref_raw = None
    else:
        pref_raw = None
    # chunked prefill admits prompts past the window for the dense GPT;
    # MoE keeps the window cap (no block-extend routing)
    plen_max = cfg.ctx_len - reserved - pref_len
    if isinstance(cfg, MoEGPTConfig):
        plen_max = min(eng.prefill_window, plen_max)
    prompts = []
    for ln in lines:
        ids = tok.encode(ln)
        if not len(ids):
            prompts.append(None)  # nothing encodable; emit empty completion
            continue
        if pref_raw is not None:  # MoE fallback: plain per-prompt prepend
            ids = pref_raw + list(ids)
        ids = list(ids)[-plen_max:]  # reference-style tail truncation
        prompts.append(ids)

    t0 = _time.perf_counter()
    rid_to_line = {}
    for i, ids in enumerate(prompts):
        if ids is None:
            continue
        auto = getattr(args, "auto_prefix", False)
        if auto and pid is not None:
            # exercise the submit-time matcher: full prompt, no id —
            # the engine rewrites it to (prefix_id, suffix) itself
            ids, use_pid = list(pref_ids) + list(ids), None
        else:
            use_pid = pid
        rid = eng.submit(Request(
            prompt=ids, max_new_tokens=gen,
            temperature=args.temperature, top_p=args.top_p,
            top_k=args.top_k if args.top_k > 0 else None,
            prefix_id=use_pid))
        rid_to_line[rid] = i
    done = {rid_to_line[c.request_id]: c for c in eng.run()}
    wall = _time.perf_counter() - t0

    out_f = open(args.out, "w", encoding="utf-8") if args.out else None
    try:
        for i, ln in enumerate(lines):
            c = done.get(i)
            text = _decode_text(tok, itos, c.tokens) if c else ""
            reason = c.finish_reason if c else "empty"
            if out_f is not None:
                import json

                out_f.write(json.dumps({
                    "id": i, "prompt": ln, "text": text,
                    "finish_reason": reason,
                    "new_tokens": len(c.tokens) if c else 0,
                }) + "\n")
            else:
                print(f"--- [{i}] {ln!r}")
                print(text)
    finally:
        if out_f is not None:
            out_f.close()
    n_tok = sum(len(c.tokens) for c in done.values())
    print(f"[serve: {len(done)} completions, {n_tok} tokens in {wall:.2f}s "
          f"= {n_tok / max(wall, 1e-9):.0f} tok/s useful; "
          f"slots={args.n_slots} chunk={args.chunk} "
          f"prefills={eng.stats['prefills']}]")
    if spec:
        rounds = max(eng.stats.get("spec_rounds", 0), 1)
        print(f"[speculative K={spec}: {rounds} verify rounds, "
              f"{eng.stats['emitted_tokens'] / rounds:.2f} tok/round "
              f"(ceiling {spec + 1})]")
    if getattr(args, "page_cache", False):
        print(f"[page cache: {eng.stats['page_cache_hits']} page hits, "
              f"{eng.stats['page_cache_evicted']} evicted]")
    if done:
        import numpy as _np2

        lat = _np2.array([c.latency_s for c in done.values()])
        qws = _np2.array([c.queue_s for c in done.values()])
        print(f"[latency p50/p95: {_np2.percentile(lat, 50):.3f}/"
              f"{_np2.percentile(lat, 95):.3f}s  queue-wait p50/p95: "
              f"{_np2.percentile(qws, 50):.3f}/"
              f"{_np2.percentile(qws, 95):.3f}s]")


def repl(args) -> None:
    from ..train.checkpoint import load_ckpt, load_tokenizer
    from ..train.trainer import sample

    params, cfg, stoi, itos = load_ckpt(args.ckpt_dir)
    params = _maybe_lora(params, args)
    tok = load_tokenizer(args.ckpt_dir)  # char or BPE, from the sidecar
    draft = None
    if getattr(args, "draft_ckpt", ""):
        dparams, dcfg, _, _ = load_ckpt(args.draft_ckpt)
        if dcfg.vocab_size != cfg.vocab_size:
            print(f"(--draft_ckpt vocab {dcfg.vocab_size} != target "
                  f"{cfg.vocab_size}; ignoring the draft model)")
        elif dcfg.ctx_len < cfg.ctx_len:
            print(f"(--draft_ckpt ctx_len {dcfg.ctx_len} < target "
                  f"{cfg.ctx_len}; ignoring the draft model)")
        else:
            draft = (dparams, dcfg)
    print("\nREPL — type a prompt, Ctrl+C to exit.\n")
    while True:
        try:
            s = input("> ")
        except (KeyboardInterrupt, EOFError):
            print("\nbye")
            break
        if not s.strip():
            continue
        ctx = np.asarray(tok.encode(s), dtype=np.int32)
        if ctx.size == 0:
            print("(no known characters in prompt)")
            continue
        from ..models.moe import MoEGPTConfig

        beam_ok = (args.beam > 0 and not isinstance(cfg, MoEGPTConfig)
                   and ctx.size + args.gen_tokens <= cfg.ctx_len)
        if args.beam > 0 and not beam_ok:
            print("(beam search needs prompt+gen_tokens <= ctx_len and a "
                  "dense GPT; using plain decode)")
        if beam_ok:
            from ..models.beam import gpt_generate_beam

            toks, score = gpt_generate_beam(params, cfg, ctx,
                                            args.gen_tokens, beam=args.beam)
            print(_decode_text(tok, itos, toks))
            print(f"[beam={args.beam}: log-prob {score:.2f}, "
                  f"{score / max(len(toks), 1):.3f}/token]")
            continue
        spec_ok = (args.speculative > 0
                   and not isinstance(cfg, MoEGPTConfig)
                   and ctx.size + args.gen_tokens + args.speculative + 1
                   <= cfg.ctx_len)
        if args.speculative > 0 and not spec_ok:
            print("(speculative decode needs prompt+gen_tokens+K+1 <= "
                  "ctx_len and a dense GPT; using plain decode)")
        if spec_ok:
            if draft is not None:
                from ..models.speculative import \
                    gpt_generate_speculative_draft

                toks, rounds = gpt_generate_speculative_draft(
                    params, cfg, draft[0], draft[1], ctx, args.gen_tokens,
                    n_draft=args.speculative,
                    temperature=args.temperature,
                    top_k=args.top_k, top_p=args.top_p, seed=args.seed)
            else:
                from ..models.speculative import gpt_generate_speculative

                toks, rounds = gpt_generate_speculative(
                    params, cfg, ctx, args.gen_tokens,
                    n_draft=args.speculative, temperature=args.temperature,
                    top_k=args.top_k, top_p=args.top_p, seed=args.seed)
            print(_decode_text(tok, itos, toks))
            print(f"[speculative: {len(toks)} tokens in {rounds} rounds, "
                  f"{len(toks) / max(rounds, 1):.2f} tok/round]")
            continue
        quant = getattr(args, "quant", "none")
        if quant != "none" and isinstance(cfg, MoEGPTConfig):
            print("(--quant supports the dense GPT only; using full "
                  "precision)")
            quant = "none"
        for ch in sample(
            params, cfg, ctx, tok,
            steps=args.gen_tokens,
            temperature=args.temperature,
            top_k=args.top_k,
            top_p=args.top_p,
            seed=args.seed,
            chunk=min(max(args.gen_tokens, 1), 256),
            quant=quant,
        ):
            print(ch, end="", flush=True)
        print()


def main() -> None:
    args = build_parser().parse_args()
    if args.train:
        from ..train.trainer import train

        train(args)
    if args.serve:
        serve_cli(args)
    if args.repl:
        repl(args)
    if not args.train and not args.repl and not args.serve:
        print("Nothing to do. Pass --train, --repl, and/or --serve.")


if __name__ == "__main__":
    main()
