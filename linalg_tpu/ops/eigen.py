"""Eigen methods: power iteration and eigendecomposition-based matrix powers.

Capability parity with the reference's ``linalg/eigen.py``
(/root/reference/linalg/eigen.py:12-139): same signatures, convergence
criteria, fallbacks and return conventions.

TPU-first design:

- ``power_iteration`` is a jitted ``lax.while_loop`` — the matvec, Rayleigh
  quotient and residual check all stay on device; the history-returning
  variant is a fixed-length ``lax.scan`` with a convergence freeze, so the
  whole trajectory is one compiled computation.
- ``matrix_power_eig`` needs a *nonsymmetric* eigendecomposition, which XLA
  does not provide on TPU; the eigensolve is pinned to the CPU backend (the
  reference likewise delegates it to LAPACK, eigen.py:115) while the
  conditioning check, powers and reconstruction run in jnp. The
  ill-conditioned fallback is a hand-rolled binary-exponentiation
  ``matrix_power`` that runs fully on device.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["power_iteration", "matrix_power_eig", "matrix_power_binary"]


@partial(jax.jit, static_argnames=("max_iter",))
def _power_core(A, v0, tol, max_iter: int):
    def cond(carry):
        it, _v, _lam, _resid, done = carry
        return (it < max_iter) & (~done)

    def body(carry):
        it, v, lam, _resid, _done = carry
        w = A @ v
        norm_w = jnp.linalg.norm(w)
        vanished = norm_w < tol  # A maps v to ~0: singular direction
        v_new = w / jnp.where(vanished, 1.0, norm_w)
        lam_new = v_new @ (A @ v_new)  # Rayleigh quotient
        resid = jnp.linalg.norm(A @ v_new - lam_new * v_new)
        done = vanished | (resid < tol)
        lam_out = jnp.where(vanished, 0.0, lam_new)
        v_out = jnp.where(vanished, v, v_new)
        return it + 1, v_out, lam_out, resid, done

    init = (jnp.int32(0), v0, jnp.zeros((), A.dtype), jnp.array(jnp.inf, A.dtype), jnp.bool_(False))
    it, v, lam, resid, _done = lax.while_loop(cond, body, init)
    return it, v, lam, resid


@partial(jax.jit, static_argnames=("max_iter",))
def _power_core_history(A, v0, tol, max_iter: int):
    def step(carry, _):
        v, lam, active = carry
        w = A @ v
        norm_w = jnp.linalg.norm(w)
        vanished = norm_w < tol
        v_new = w / jnp.where(vanished, 1.0, norm_w)
        lam_new = v_new @ (A @ v_new)
        resid = jnp.linalg.norm(A @ v_new - lam_new * v_new)
        appended = active & (~vanished)
        lam_out = jnp.where(active, jnp.where(vanished, 0.0, lam_new), lam)
        v_out = jnp.where(active & (~vanished), v_new, v)
        ran = active
        active = active & (~vanished) & (resid >= tol)
        return (v_out, lam_out, active), (resid, appended, ran)

    (v, lam, _), (resids, appended, ran) = lax.scan(
        step, (v0, jnp.zeros((), A.dtype), jnp.bool_(True)), None, length=max_iter
    )
    return v, lam, resids, appended, ran


def power_iteration(
    A,
    max_iter: int = 2000,
    tol: float = 1e-10,
    v0: Optional[np.ndarray] = None,
    return_history: bool = False,
):
    """Dominant eigenpair via power iteration (reference eigen.py:12-79).

    Stops when ``||Av - lam v||_2 < tol`` or after ``max_iter`` iterations.
    Returns ``(lam, v)``, or ``(lam, v, iters, hist)`` with
    ``return_history=True``.
    """
    A = jnp.asarray(A)
    if not jnp.issubdtype(A.dtype, jnp.floating):
        A = A.astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    if A.ndim != 2 or A.shape[0] != A.shape[1]:
        raise ValueError("Power iteration requires a square matrix.")
    n = A.shape[0]

    if v0 is None:
        # deterministic default start vector (the reference draws from the
        # global np.random state, eigen.py:34-36 — a nondeterminism we fix)
        v = np.random.default_rng(0).standard_normal(n)
    else:
        v = np.asarray(v0, dtype=float).copy()
        if v.shape != (n,):
            raise ValueError("v0 must be shape (n,).")
    v = jnp.asarray(v, dtype=A.dtype)
    v = v / jnp.linalg.norm(v)
    tol_a = jnp.asarray(tol, dtype=A.dtype)

    if not return_history:
        it, v, lam, _resid = _power_core(A, v, tol_a, int(max_iter))
        return float(lam), v

    v, lam, resids, appended, ran = _power_core_history(A, v, tol_a, int(max_iter))
    appended = np.asarray(appended)
    hist = np.asarray(resids)[appended]
    n_ran = int(np.asarray(ran).sum())
    iters = max(0, n_ran - 1)
    return float(lam), v, iters, hist


def matrix_power_binary(A, k: int):
    """A^k for k >= 0 by repeated squaring — fully on-device fallback."""
    A = jnp.asarray(A)
    n = A.shape[0]
    result = jnp.eye(n, dtype=A.dtype)
    base = A
    kk = int(k)
    while kk > 0:
        if kk & 1:
            result = result @ base
        base = base @ base
        kk >>= 1
    return result


def _eig_on_cpu(A):
    """Nonsymmetric eigendecomposition; XLA has no TPU kernel for it."""
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            return jnp.linalg.eig(jnp.asarray(np.asarray(A)))
    except Exception:  # backend without CPU eig support — host LAPACK
        w, V = np.linalg.eig(np.asarray(A))
        return jnp.asarray(w), jnp.asarray(V)


def matrix_power_eig(A, k: int, *, tol=1e-10, cond_thresh=1e12):
    """A^k via eigendecomposition ``V diag(w)^k V^{-1}`` when well-conditioned.

    Reference semantics (eigen.py:82-139): k=0 -> identity; k<0 -> invert
    then recurse; cond(V) > cond_thresh or non-finite -> fall back to a plain
    matrix power (binary exponentiation here, ``np.linalg.matrix_power``
    there); tiny imaginary parts of the reconstruction are dropped for real
    inputs.
    """
    A = jnp.asarray(A)
    if A.ndim != 2 or A.shape[0] != A.shape[1]:
        raise ValueError("matrix_power_eig only defined for square matrices.")
    n = A.shape[0]
    k = int(k)
    if k == 0:
        return jnp.eye(n, dtype=A.dtype)
    if k < 0:
        A_inv = jnp.linalg.inv(A)
        return matrix_power_eig(A_inv, -k, tol=tol, cond_thresh=cond_thresh)

    eigvals, V = _eig_on_cpu(A)
    try:
        condV = float(np.linalg.cond(np.asarray(V)))
    except np.linalg.LinAlgError:
        return matrix_power_binary(A, k)
    if not np.isfinite(condV) or condV > cond_thresh:
        return matrix_power_binary(A, k)

    w = np.asarray(eigvals)
    Vh = np.asarray(V)
    Dk = w**k
    X = np.linalg.solve(Vh, np.eye(n, dtype=Vh.dtype))
    Ak = (Vh * Dk[None, :]) @ X
    A_host = np.asarray(A)
    if not np.iscomplexobj(A_host) and np.iscomplexobj(Ak):
        # Imag parts of the reconstruction are conjugate-pair roundoff for a
        # real input; the drop threshold must scale with the working
        # precision (tol=1e-10 is float64-centric).
        eps = float(np.finfo(A_host.dtype).eps)
        drop = max(float(tol), np.sqrt(eps) * max(1.0, float(np.abs(Ak.real).max())))
        if np.max(np.abs(Ak.imag)) < drop:
            Ak = Ak.real.astype(A_host.dtype)
        else:
            # Genuinely complex result: return a host array (complex dtypes
            # are not supported on every TPU runtime).
            return Ak
    return jnp.asarray(Ak)
