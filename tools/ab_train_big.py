#!/usr/bin/env python
"""A/B the compute-bound train config (bench.py --only train_big).

One process, interleaved over batch sizes (and optionally remat), so chip
clock drift hits every variant equally. Reports step ms / tok/s / MFU per
B at d1024/8L/ctx1024 bf16 against the 197 TFLOP/s v5e bf16 peak —
picks the config bench_train_big should publish.

Measured (chip, three sessions, stable to ±0.7 ms): B16 84.2 ms /
B24 124.7 / B32 172.7 — 194.8k / 197.2k / 189.8k tok/s; B48 dies
ResourceExhausted (model + moments + activations exceed the v5e HBM).
B24 is the knee and the config bench_train_big publishes.

Usage:
    python tools/ab_train_big.py [--batches 16,24,32] [--steps 40]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batches", type=str, default="16,24,32")
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    import jax
    import jax.numpy as jnp

    from bench import _gpt_step_flops, _measure_step_loop
    from linalg_tpu.models.gpt import GPTConfig, init_gpt_params
    from linalg_tpu.train.optim import adamw_init
    from linalg_tpu.train.trainer import make_device_train_step

    cfg = GPTConfig(vocab_size=65, d_model=1024, n_heads=8, n_layers=8,
                    ctx_len=1024, dtype="bfloat16")
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.integers(0, 65, size=(400_000,), dtype=np.int32))
    peak = 197.0

    # one config resident at a time: four (params + moments + activation)
    # sets of this ~100M-param model do NOT fit the v5e's HBM together
    # (measured ResourceExhausted); per-B passes run back-to-back instead
    # of interleaved, so chip clock drift between Bs is the error bar
    results = {B: [] for B in batches}
    for B in batches:
        step = make_device_train_step(cfg, B, base_lr=3e-4, min_lr=3e-5,
                                      warmup=200, max_steps=10000,
                                      weight_decay=0.01)
        for p in range(args.passes):
            # fresh state per pass: the step donates its buffers
            params = init_gpt_params(cfg, seed=0)
            opt_state = adamw_init(params)
            key = jax.random.PRNGKey(p)
            dt = _measure_step_loop(step, params, opt_state, data, key,
                                    steps=args.steps, window=20,
                                    warmup=(24 if p == 0 else 8))
            results[B].append(dt)
            print(f"  pass {p} B{B}: {dt * 1e3:.1f} ms", flush=True)
            del params, opt_state
        del step

    print()
    for B in batches:
        dt = float(np.median(results[B]))
        toks = B * cfg.ctx_len / dt
        tfs = _gpt_step_flops(cfg, B) / dt / 1e12
        print(f"B{B:3d}: {dt * 1e3:7.1f} ms  {toks / 1e3:6.0f}k tok/s  "
              f"{tfs:6.1f} TFLOP/s  MFU {100 * tfs / peak:5.1f}%",
              flush=True)


if __name__ == "__main__":
    main()
