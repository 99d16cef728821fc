#!/usr/bin/env python
"""A/B the decode KV-cache WRITE lowering: row scatter vs vmapped DUS.

Every decode step writes one (B, hk, 1, d) token into the cache at a
per-slot position. Two lowerings of that write:

- "dus"  — the original forms: slot mode's batch-vmapped
  ``dynamic_update_slice`` and paged mode's (page, row) double-index
  scatter (``LINALG_TPU_KV_WRITE=dus`` selects these).
- "flat" — the buffer viewed as (rows, d) and the write as ONE
  single-leading-index row scatter (the committed default;
  nn/cache.py::fkv_write_slots, serve/paged.py::write_paged).

Times ONE compiled 32-token decode chunk per (variant, layout) with a
half-full ctx-4096 cache, INTERLEAVED in one process (jax.clear_caches()
between variants so the env gate is re-read at trace time) — chip clock
drift hits both variants equally. Usage:

    python tools/ab_kv_write.py [--reps 5] [--passes 2]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_inputs(cfg, page, B):
    import jax
    import jax.numpy as jnp

    from linalg_tpu.models.gpt import init_gpt_params
    from linalg_tpu.serve.paged import init_paged_cache

    params = init_gpt_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    Pmax = cfg.ctx_len // page
    n_pages = 1 + B * Pmax
    logits = jnp.asarray(rng.normal(size=(B, cfg.vocab_size)), jnp.float32)
    key = jax.random.PRNGKey(0)
    temp = jnp.ones((B,), jnp.float32)
    top_p = jnp.zeros((B,), jnp.float32)
    top_k = jnp.ones((B,), jnp.int32)
    dt = cfg.compute_dtype
    shape = (cfg.n_layers, B, cfg.kv_heads, cfg.ctx_len, cfg.d_head)
    slot_cache = {"k": jnp.asarray(rng.normal(size=shape), dt),
                  "v": jnp.asarray(rng.normal(size=shape), dt),
                  "pos": jnp.full((B,), cfg.ctx_len // 2, jnp.int32)}
    pc = init_paged_cache(cfg, B, n_pages, page)
    pc = dict(
        pc,
        pool_k=jnp.asarray(rng.normal(size=pc["pool_k"].shape), dt),
        pool_v=jnp.asarray(rng.normal(size=pc["pool_v"].shape), dt),
        table=jnp.asarray(
            rng.permutation(np.arange(1, 1 + B * Pmax)).reshape(B, Pmax),
            jnp.int32),
        pos=jnp.full((B,), cfg.ctx_len // 2, jnp.int32))
    return params, slot_cache, pc, logits, key, temp, top_p, top_k


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--chunk", type=int, default=32)
    args = ap.parse_args()

    import jax

    from linalg_tpu.models.gpt import GPTConfig

    cfg = GPTConfig(vocab_size=65, d_model=512, n_heads=4, n_kv_heads=2,
                    n_layers=8, ctx_len=4096, dtype="bfloat16")
    page, B = 256, 8
    (params, slot_cache, pc, logits, key,
     temp, top_p, top_k) = make_inputs(cfg, page, B)

    def variants():
        from linalg_tpu.serve.engine import decode_chunk_slots
        from linalg_tpu.serve.paged import decode_chunk_paged

        return {
            "slot": lambda: decode_chunk_slots(
                params, slot_cache, logits, key, temp, top_p, top_k, cfg,
                args.chunk)[0],
            "gather": lambda: decode_chunk_paged(
                params, pc, logits, key, temp, top_p, top_k, cfg,
                args.chunk, use_kernel=False)[0],
            "kernel": lambda: decode_chunk_paged(
                params, pc, logits, key, temp, top_p, top_k, cfg,
                args.chunk, use_kernel=True)[0],
        }

    results = {}  # (mode, name) -> list of ms
    for p in range(args.passes):
        for mode in ("dus", "flat"):
            os.environ["LINALG_TPU_KV_WRITE"] = mode
            jax.clear_caches()
            for name, fn in variants().items():
                np.asarray(fn())  # compile + sync
                ts = []
                for _ in range(args.reps):
                    t0 = time.perf_counter()
                    np.asarray(fn())
                    ts.append(time.perf_counter() - t0)
                ms = float(np.median(ts)) * 1e3
                results.setdefault((mode, name), []).append(ms)
                print(f"  pass{p} [{mode}/{name}] {ms:.1f} ms", flush=True)
    os.environ.pop("LINALG_TPU_KV_WRITE", None)

    print(f"\nd{cfg.d_model}/L{cfg.n_layers} hk{cfg.kv_heads} "
          f"d_head{cfg.d_head} ctx{cfg.ctx_len} page{page} B{B} "
          f"chunk{args.chunk} (median over passes):")
    for name in ("slot", "gather", "kernel"):
        dus = float(np.median(results[("dus", name)]))
        flat = float(np.median(results[("flat", name)]))
        print(f"  {name:7s} dus {dus:7.1f} ms   flat {flat:7.1f} ms   "
              f"dus/flat {dus / flat:.3f}x", flush=True)


if __name__ == "__main__":
    main()
