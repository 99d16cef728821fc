"""Minimal repro: deep async dispatch queues degrade ~100x on this runtime.

Context (CLAUDE.md "environment rules"): enqueueing more than ~20 jitted
steps without a blocking readback makes per-step wall time collapse from
~sub-ms to ~100x worse through the axon TPU tunnel. The trainer works
around it by syncing (reading the loss) every 20 steps; this script is the
isolated demonstration for an upstream report.

Run on the TPU backend:  python docs/repro_dispatch_queue.py

Expected shape of the output (v5e via axon, 2026-08):

    queue depth   1: ~40 ms/step   (round-trip bound: 1 sync per step)
    queue depth  10: ~4 ms/step    (round trip amortized)
    queue depth  20: ~2 ms/step    (sweet spot)
    queue depth 100: ~10-100x the depth-20 number  <-- the pathology

The kernel is a fixed matmul chain, so per-step device work is constant;
only the number of outstanding dispatches between `block_until_ready`
calls changes.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2048, 2048)),
                    jnp.float32)

    @jax.jit
    def step(x):
        for _ in range(4):
            x = x @ x * 1e-3
        return x

    jax.block_until_ready(step(x))  # compile
    total = 200
    for depth in (1, 10, 20, 50, 100, 200):
        y = x
        t0 = time.time()
        for i in range(total):
            y = step(y)
            if (i + 1) % depth == 0:
                jax.block_until_ready(y)
        jax.block_until_ready(y)
        dt = (time.time() - t0) / total * 1000
        print(f"queue depth {depth:4d}: {dt:8.2f} ms/step")


if __name__ == "__main__":
    main()
