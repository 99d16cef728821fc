"""Walkthrough 04 — positional encodings: sinusoidal, learned, RoPE.

Runnable equivalent of the reference's 04_positional.ipynb, including the
RoPE relative-position property and the KV-cache decode offset.
Run: ``python docs/examples/04_positional.py``.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))  # repo root, so the walkthrough runs standalone
_os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax as _jax

_jax.config.update("jax_platforms", "cpu")  # axon sitecustomize overrides env
_jax.config.update("jax_enable_x64", True)  # reference f64 tolerances

import numpy as np

from linalg_tpu.nn import (
    LearnedPositionalEmbedding,
    RotaryPositionalEmbedding,
    get_positional_encoding,
    sinusoidal_encoding,
)


def main():
    print("== sinusoidal table ==")
    pe = np.asarray(sinusoidal_encoding(8, 6))
    print(pe.round(3))
    # PE[pos, 0] = sin(pos): check
    assert np.allclose(pe[:, 0], np.sin(np.arange(8)), atol=1e-6)

    print("\n== learned positions: gradient accumulation ==")
    lpe = LearnedPositionalEmbedding(max_len=8, d_model=4, seed=0)
    _ = lpe.forward(5)
    lpe.backward(np.ones((3, 5, 4)))  # batch of 3 -> grads sum to 3
    print("gradW rows 0-5 mean:", np.asarray(lpe.gradW[:5]).mean())
    lpe.step(lr=0.1)

    print("\n== RoPE: relative-position property ==")
    rope = RotaryPositionalEmbedding(d_head=8, max_len=64)
    rng = np.random.default_rng(0)
    q = rng.standard_normal((1, 1, 1, 8)).astype(np.float32)
    k = rng.standard_normal((1, 1, 1, 8)).astype(np.float32)

    def score(i, j):
        qi, _ = rope.forward(q, q, offset=i)
        kj, _ = rope.forward(k, k, offset=j)
        return float(np.sum(np.asarray(qi) * np.asarray(kj)))

    print(f"<q@3, k@1> = {score(3, 1):.6f}")
    print(f"<q@7, k@5> = {score(7, 5):.6f}  (same gap -> same score)")
    assert abs(score(3, 1) - score(7, 5)) < 1e-4

    print("\n== RoPE offset = KV-cache decode consistency ==")
    q4 = rng.standard_normal((1, 2, 4, 8)).astype(np.float32)
    full, _ = rope.forward(q4, q4, offset=0)
    tail, _ = rope.forward(q4[:, :, 2:], q4[:, :, 2:], offset=2)
    assert np.allclose(np.asarray(full)[:, :, 2:], np.asarray(tail), atol=1e-6)
    print("incremental rotation matches full-sequence rotation")

    print("\n== factory ==")
    print(type(get_positional_encoding("rope", 16, 8)).__name__)
    print("\nall checks passed")


if __name__ == "__main__":
    main()
