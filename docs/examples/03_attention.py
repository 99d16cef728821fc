"""Walkthrough 03 — attention: masks, the softmax-Jacobian backward, MHA.

Runnable equivalent of the reference's 03_attention.ipynb ("Numerical
Gradient Verification" and "Verify Multi-Head Attention Gradients").
Run: ``python docs/examples/03_attention.py``.
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

from linalg_tpu.nn import (
    MultiHeadAttention,
    ScaledDotProductAttention,
    causal_mask,
    sdpa,
)


def main():
    rng = np.random.default_rng(0)
    B, h, T, d = 2, 2, 5, 4
    Q, K, V = (jnp.asarray(rng.standard_normal((B, h, T, d))) for _ in range(3))

    print("== causal mask blocks the future ==")
    m = np.asarray(causal_mask(4))[0, 0]
    print(m)

    print("\n== hand-written backward vs jax.grad ==")
    att = ScaledDotProductAttention()
    O, cache = att.forward(Q, K, V)
    dO = jnp.ones_like(O)
    dQ, dK, dV = att.backward(dO, cache)
    gQ, gK, gV = jax.grad(
        lambda q, k, v: jnp.sum(sdpa(q, k, v)), argnums=(0, 1, 2)
    )(Q, K, V)
    for name, a, b in (("dQ", dQ, gQ), ("dK", dK, gK), ("dV", dV, gV)):
        err = float(jnp.abs(a - b).max())
        print(f"{name}: max diff vs autodiff {err:.2e}")
        assert err < 1e-9

    print("\n== numerical (finite difference) check of dQ[0,0,0,0] ==")
    f = lambda q: float(jnp.sum(sdpa(q, K, V)))
    h_ = 1e-6
    Qp = Q.at[0, 0, 0, 0].add(h_)
    Qm = Q.at[0, 0, 0, 0].add(-h_)
    fd = (f(Qp) - f(Qm)) / (2 * h_)
    print(f"finite-diff {fd:.6f} vs closed-form {float(dQ[0,0,0,0]):.6f}")
    assert abs(fd - float(dQ[0, 0, 0, 0])) < 1e-4

    print("\n== multi-head attention: self and cross ==")
    mha = MultiHeadAttention(d_model=16, n_heads=4, seed=0)
    x = rng.standard_normal((2, 6, 16)).astype(np.float32)
    y = mha.forward(x, mask=causal_mask(6))
    dX, dKV = mha.backward(np.ones_like(np.asarray(y)))
    print(f"self-attn: dX {np.asarray(dX).shape}, dKV is {dKV}")
    kv = rng.standard_normal((2, 9, 16)).astype(np.float32)
    y = mha.forward(x, KV=kv)
    dX, dKV = mha.backward(np.ones_like(np.asarray(y)))
    print(f"cross-attn: dX {np.asarray(dX).shape}, dKV {np.asarray(dKV).shape}")
    print("\nall checks passed")


if __name__ == "__main__":
    main()
