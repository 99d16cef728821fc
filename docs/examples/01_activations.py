"""Walkthrough 01 — activations and their hand-derived gradients.

Runnable equivalent of the reference's 01_activations.ipynb: evaluate
ReLU/GELU, compare the explicit derivative functions against finite
differences and against jax.grad (which executes the same closed forms via
custom_vjp). Run: ``python docs/examples/01_activations.py``.
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

from linalg_tpu.nn import gelu, gelu_backward, get_activation, relu, relu_backward


def finite_diff(f, x, h=1e-5):
    return (np.asarray(f(x + h)) - np.asarray(f(x - h))) / (2 * h)


def main():
    x = jnp.linspace(-3, 3, 121, dtype=jnp.float64)

    print("== forward values ==")
    print(f"relu(-1.5)={float(relu(-1.5)):.3f}  relu(2.0)={float(relu(2.0)):.3f}")
    print(f"gelu(-1.5)={float(gelu(-1.5)):.4f}  gelu(2.0)={float(gelu(2.0)):.4f}")

    print("\n== derivative vs finite differences ==")
    fd = finite_diff(gelu, x)
    an = np.asarray(gelu_backward(x))
    print(f"gelu: max |analytic - FD| = {np.abs(an - fd).max():.2e}")
    assert np.abs(an - fd).max() < 1e-9

    print("\n== derivative vs jax.grad (custom_vjp executes the closed form) ==")
    g = jax.vmap(jax.grad(gelu))(x)
    print(f"gelu: max |analytic - jax.grad| = {float(jnp.abs(an - g).max()):.2e}")
    mask = np.asarray(relu_backward(x))
    g_relu = jax.vmap(jax.grad(relu))(x)
    assert np.allclose(mask, np.asarray(g_relu))

    print("\n== registry ==")
    f, b = get_activation("relu")
    print("get_activation('relu') ->", f.__name__ if hasattr(f, "__name__") else f, b.__name__)
    print("\nall checks passed")


if __name__ == "__main__":
    main()
