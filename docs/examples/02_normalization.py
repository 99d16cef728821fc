"""Walkthrough 02 — LayerNorm/RMSNorm and their closed-form backwards.

Runnable equivalent of the reference's 02_normalization.ipynb (its Part 4
"Verify Against Implementation" finite-difference check, done properly
against autodiff). Run: ``python docs/examples/02_normalization.py``.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))  # repo root, so the walkthrough runs standalone
_os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax as _jax

_jax.config.update("jax_platforms", "cpu")  # axon sitecustomize overrides env
_jax.config.update("jax_enable_x64", True)  # reference f64 tolerances

import jax
import jax.numpy as jnp
import numpy as np

from linalg_tpu.nn import LayerNorm, RMSNorm, layer_norm, rms_norm


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 8)))
    gamma = jnp.asarray(rng.standard_normal(8))
    beta = jnp.asarray(rng.standard_normal(8))

    print("== LayerNorm normalizes ==")
    y = layer_norm(x, jnp.ones(8), jnp.zeros(8))
    print(f"row means ~0: {float(jnp.abs(jnp.mean(y, -1)).max()):.2e}")
    print(f"row stds  ~1: {np.asarray(jnp.std(y, axis=-1)).round(4)}")

    print("\n== closed-form dx vs jax.grad of a plain implementation ==")

    def plain_ln(x, g, b):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return ((x - mu) / jnp.sqrt(var + 1e-5)) * g + b

    loss = lambda f: (lambda x, g, b: jnp.sum(jnp.sin(f(x, g, b))))
    ours = jax.grad(loss(lambda x, g, b: layer_norm(x, g, b)), argnums=(0, 1, 2))(x, gamma, beta)
    ref = jax.grad(loss(plain_ln), argnums=(0, 1, 2))(x, gamma, beta)
    for name, a, b2 in zip(("dx", "dgamma", "dbeta"), ours, ref):
        err = float(jnp.abs(a - b2).max())
        print(f"{name}: max diff {err:.2e}")
        assert err < 1e-9

    print("\n== RMSNorm (no centering) ==")
    yr = rms_norm(x, jnp.ones(8))
    print(f"rms(y) ~1: {np.asarray(jnp.sqrt(jnp.mean(yr**2, -1))).round(4)}")

    print("\n== stateful component contract ==")
    ln = LayerNorm(8)
    out = ln.forward(np.asarray(x, np.float32))
    dx = ln.backward(np.ones_like(np.asarray(out)))
    print("grads stashed:", {k: v.shape for k, v in ln.grads.items()})
    ln.step(lr=0.1)
    rn = RMSNorm(8)
    rn.forward(np.asarray(x, np.float32))
    print("\nall checks passed")


if __name__ == "__main__":
    main()
