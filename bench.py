#!/usr/bin/env python
"""Headline benchmark: 4096^2 float32 Householder QR vs jax.lax.linalg.qr.

Prints ONE JSON line:
  {"metric": ..., "value": <our GFLOP/s>, "unit": "GFLOP/s",
   "vs_baseline": <t_xla / t_ours>}

vs_baseline > 1/1.2 = 0.833 meets the BASELINE.json target ("within 1.2x of
jax.lax.linalg.qr"); > 1.0 means we BEAT XLA's QR outright.

Timing methodology: the host<->device round-trip on this runtime is ~40 ms,
dwarfing the kernel, so each candidate runs REPS times in a dependency chain
inside one jit; the null chain's time is subtracted and the remainder divided
by REPS. Accuracy gate: ||A - QR||_F / ||A||_F must be <= 1e-6.
"""

import json
import time

import numpy as np

N = 4096
REPS = 8
TRIALS = 7


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from linalg_tpu.ops.qr import householder_qr

    rng = np.random.default_rng(0)
    A = rng.standard_normal((N, N)).astype(np.float32)
    Aj = jnp.asarray(A)
    jax.block_until_ready(Aj)

    def chain_of(qr_fn):
        @jax.jit
        def chain(x):
            def body(i, acc):
                Q, _R = qr_fn(acc)
                return x + 1e-9 * Q
            return lax.fori_loop(0, REPS, body, x)
        return chain

    @jax.jit
    def null_chain(x):
        return lax.fori_loop(0, REPS, lambda i, acc: x + 1e-9 * acc, x)

    def once(f):
        t0 = time.perf_counter()
        r = f(Aj)
        _ = float(jnp.sum(r[0]))  # force full execution
        return time.perf_counter() - t0

    ours_chain = chain_of(householder_qr)
    ref_chain = chain_of(jnp.linalg.qr)
    # warm up all three compilations
    for f in (null_chain, ours_chain, ref_chain):
        jax.block_until_ready(f(Aj))
    # interleave trials so clock/thermal drift hits both candidates equally
    t_n, t_o, t_r = [], [], []
    for _ in range(TRIALS):
        t_n.append(once(null_chain))
        t_o.append(once(ours_chain))
        t_r.append(once(ref_chain))
    t_null = float(np.median(t_n))
    t_ours = max(1e-9, (float(np.median(t_o)) - t_null) / REPS)
    t_ref = max(1e-9, (float(np.median(t_r)) - t_null) / REPS)

    # accuracy gate
    Q, R = householder_qr(Aj)
    rel = float(
        np.linalg.norm(np.asarray(Q) @ np.asarray(R) - A) / np.linalg.norm(A)
    )
    flops = 2.0 * N**3  # factorization+Q-formation convention, both sides equal
    result = {
        "metric": f"householder_qr {N}x{N} f32 GFLOP/s (rel_resid {rel:.2e}, "
                  f"ours {t_ours*1e3:.2f} ms vs jax.lax.linalg.qr {t_ref*1e3:.2f} ms)",
        "value": round(flops / t_ours / 1e9, 1),
        "unit": "GFLOP/s",
        "vs_baseline": round(t_ref / t_ours, 3),
    }
    if rel > 1e-6:
        result["metric"] += " ACCURACY_FAIL"
        result["vs_baseline"] = 0.0
    print(json.dumps(result))


if __name__ == "__main__":
    main()
