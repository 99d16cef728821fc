#!/usr/bin/env python
"""QR / Gaussian-elimination benchmark harness.

Capability parity with the reference's ``linalg/benchmark_qr.py`` — the same
table schema (kernel, size, sec, sec/ref, residual/ref, orth_err), median-of-
REPEATS timing, and a ``bench_results.csv`` artifact — with the baseline
being ``jnp.linalg.lstsq``/``jnp.linalg.qr`` on the SAME device instead of
NumPy (the honest like-for-like comparison on TPU).

Timing accounts for this runtime's ~40 ms host round-trip by running each
kernel REPEATS times and taking the minimum of per-call walls after an
untimed warm-up (compile excluded), with a forced scalar readback.

Run: ``python -m linalg_tpu.ops.benchmark_qr [--sizes 300x300 1000x1000]``
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def wall(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def main():
    import jax
    import jax.numpy as jnp

    from .elimination import back_substitute, forward_eliminate
    from .qr import (
        householder_qr,
        least_squares_householder_qr,
        least_squares_qr,
        qr,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", nargs="*", default=["300x300", "1000x1000", "5000x1000"])
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--out", default="bench_results.csv")
    args = ap.parse_args()
    sizes = [tuple(int(v) for v in s.replace("×", "x").split("x")) for s in args.sizes]
    REPEATS = args.repeats

    np.random.seed(0)
    records = []
    for m, n in sizes:
        A = np.random.randn(m, n).astype(np.float32)
        b = np.random.randn(m).astype(np.float32)
        Aj, bj = jnp.asarray(A), jnp.asarray(b)

        def run(f, *fargs):
            out = f(*fargs)  # warm-up / compile
            jax.tree.map(lambda x: jax.block_until_ready(x), out)

            def call():
                r = f(*fargs)
                leaf = jax.tree.leaves(r)[0]
                _ = float(jnp.asarray(leaf).ravel()[0])

            return min(wall(call) for _ in range(REPEATS))

        lstsq = jax.jit(lambda A, b: jnp.linalg.lstsq(A, b, rcond=None)[0])
        t_ref = run(lstsq, Aj, bj)
        x_ref = np.asarray(lstsq(Aj, bj))
        r_ref = np.linalg.norm(A @ x_ref - b, np.inf)

        if m == n:
            def gauss():
                U, c, *_ = forward_eliminate(Aj, bj)
                return back_substitute(U, c)

            t_g = run(gauss)
            x_g = np.asarray(gauss())
            r_g = np.linalg.norm(A @ x_g - b, np.inf)
            records.append(("GE", f"{m}x{n}", t_g, t_g / t_ref, r_g / r_ref, ""))

        t_mgs = run(qr, Aj)
        Q, _R = qr(Aj)
        ortho = float(np.linalg.norm(np.asarray(Q).T @ np.asarray(Q) - np.eye(n), np.inf))
        x_mgs = np.asarray(least_squares_qr(Aj, bj))
        r_mgs = np.linalg.norm(A @ x_mgs - b, np.inf)
        records.append(("MGS-QR", f"{m}x{n}", t_mgs, t_mgs / t_ref, r_mgs / r_ref, ortho))

        t_hh = run(householder_qr, Aj)
        Qh, _Rh = householder_qr(Aj)
        ortho2 = float(np.linalg.norm(np.asarray(Qh).T @ np.asarray(Qh) - np.eye(n), np.inf))
        x_hh = np.asarray(least_squares_householder_qr(Aj, bj))
        r_hh = np.linalg.norm(A @ x_hh - b, np.inf)
        records.append(("HH-QR", f"{m}x{n}", t_hh, t_hh / t_ref, r_hh / r_ref, ortho2))

    header = ["kernel", "size", "sec", "sec/ref", "residual/ref", "orth_err"]
    widths = [8, 10, 10, 10, 14, 12]
    print(" | ".join(h.ljust(w) for h, w in zip(header, widths)))
    print("-|-".join("-" * w for w in widths))
    lines = [",".join(header)]
    for rec in records:
        cells = [
            str(rec[0]), str(rec[1]), f"{rec[2]:.4f}", f"{rec[3]:.3f}",
            f"{rec[4]:.3f}", (f"{rec[5]:.2e}" if rec[5] != "" else ""),
        ]
        print(" | ".join(c.ljust(w) for c, w in zip(cells, widths)))
        lines.append(",".join(cells))
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
