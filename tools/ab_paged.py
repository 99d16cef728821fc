#!/usr/bin/env python
"""A/B the paged-KV decode chunk: slot layout vs table-gather vs kernels.

Times ONE compiled decode chunk (32 tokens, all slots) per variant with a
half-full cache — prefill/admission excluded, so the numbers isolate what
the paged indirection costs the decode hot loop:

- slot:   dense (L, B, hk, ctx, d) cache, the engine's default layout
- gather: paged pool + XLA table-gather attention (materializes the
          gathered KV per step: read + write + re-read)
- kernel: paged pool + Pallas attention reading pages in place
          (the deep-pipelined DMA kernel — d_head >= 128 natively,
          narrow heads via 128-lane row folding — with the grid kernel
          as fallback; decode_chunk_paged picks exactly as the engine
          does)

Representative chip numbers live in BASELINE.md (round 4). Usage:
    python tools/ab_paged.py [--ctx 4096] [--page 256] [--long]
"""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def run(cfg, page, B, chunk=32, reps=5):
    import jax
    import jax.numpy as jnp

    from linalg_tpu.models.gpt import init_gpt_params
    from linalg_tpu.serve.engine import decode_chunk_slots
    from linalg_tpu.serve.paged import decode_chunk_paged, init_paged_cache

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

    variants = {
        "slot": lambda: decode_chunk_slots(
            params, slot_cache, logits, key, temp, top_p, top_k, cfg,
            chunk)[0],
        "gather": lambda: decode_chunk_paged(
            params, pc, logits, key, temp, top_p, top_k, cfg, chunk,
            use_kernel=False)[0],
        "kernel": lambda: decode_chunk_paged(
            params, pc, logits, key, temp, top_p, top_k, cfg, chunk,
            use_kernel=True)[0],
    }
    rows = {}
    for name, fn in variants.items():
        print(f"  [{name}] compiling...", flush=True)
        np.asarray(fn())  # compile + sync
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn())
            ts.append(time.perf_counter() - t0)
        rows[name] = float(np.median(ts)) * 1e3
        print(f"  [{name}] {rows[name]:.1f} ms", flush=True)
    print(f"d{cfg.d_model}/L{cfg.n_layers} H{cfg.n_heads}/hk{cfg.kv_heads} "
          f"d_head{cfg.d_head} ctx{cfg.ctx_len} page{page} B{B} "
          f"chunk{chunk}: "
          + "  ".join(f"{k} {v:.1f}ms" for k, v in rows.items())
          + f"  (kernel/slot {rows['slot'] / rows['kernel']:.2f}x, "
          f"gather/slot {rows['slot'] / rows['gather']:.2f}x)",
          flush=True)


def main():
    from linalg_tpu.models.gpt import GPTConfig

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--long", action="store_true",
                    help="also run the d_head-64 long-context config")
    args = ap.parse_args()
    # production GQA shape: d_head 128 routes to the DMA kernel
    run(GPTConfig(vocab_size=65, d_model=512, n_heads=4, n_kv_heads=2,
                  n_layers=8, ctx_len=4096, dtype="bfloat16"),
        page=256, B=8)
    if args.long:
        # d_head 64: the DMA kernel folds 2 KV rows per 128-lane DMA row
        run(GPTConfig(vocab_size=65, d_model=512, n_heads=8, n_kv_heads=2,
                      n_layers=8, ctx_len=4096, dtype="bfloat16"),
            page=256, B=8)


if __name__ == "__main__":
    main()
