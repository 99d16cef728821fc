"""Pure functional NN ops with hand-derived backward passes.

The reference project's core value is that every backward pass is written out
by hand (/root/reference/ai_comps/activations.py:54-69,
normalization.py:47-68/130-147, attention.py:68-89). The TPU-native
expression of that is ``jax.custom_vjp``: the forward stores exactly the
residuals the reference caches, and the backward implements the same closed
forms — which then *are* the gradients ``jax.grad`` returns, verifiable
against JAX autodiff of a plain re-implementation (tests/test_nn_grads.py).

All ops are shape-polymorphic over leading axes and jit/vmap-compatible.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

__all__ = [
    "relu",
    "relu_backward",
    "gelu",
    "gelu_backward",
    "silu",
    "silu_backward",
    "swiglu",
    "swiglu_backward",
    "geglu",
    "geglu_backward",
    "softmax_last",
    "causal_mask",
    "layer_norm",
    "rms_norm",
    "sdpa",
    "rope_rotate",
    "rope_tables",
    "sinusoidal_encoding",
    "he_init",
]

_SQRT_2_OVER_PI = math.sqrt(2.0 / math.pi)
_GELU_C = 0.044715


# ---------------------------------------------------------------------------
# activations
# ---------------------------------------------------------------------------


def relu_backward(x):
    """d/dx ReLU — the explicit mask (reference activations.py:23-33)."""
    x = jnp.asarray(x)
    return (x > 0.0).astype(x.dtype)


@jax.custom_vjp
def relu(x):
    """max(0, x), with the hand-written mask as its custom gradient."""
    return jnp.maximum(0.0, x)


def _relu_fwd(x):
    return jnp.maximum(0.0, x), x


def _relu_bwd(x, g):
    return (g * relu_backward(x),)


relu.defvjp(_relu_fwd, _relu_bwd)


def gelu_backward(x):
    """d/dx of tanh-approximation GELU (reference activations.py:54-69)."""
    x = jnp.asarray(x)
    inner = _SQRT_2_OVER_PI * (x + _GELU_C * x**3)
    t = jnp.tanh(inner)
    sech2 = 1.0 - t**2
    inner_deriv = _SQRT_2_OVER_PI * (1.0 + 3.0 * _GELU_C * x**2)
    return 0.5 * (1.0 + t) + 0.5 * x * sech2 * inner_deriv


@jax.custom_vjp
def gelu(x):
    """Tanh-approximation GELU with the hand-derived custom gradient."""
    return 0.5 * x * (1.0 + jnp.tanh(_SQRT_2_OVER_PI * (x + _GELU_C * x**3)))


def _gelu_fwd(x):
    y = 0.5 * x * (1.0 + jnp.tanh(_SQRT_2_OVER_PI * (x + _GELU_C * x**3)))
    return y, x


def _gelu_bwd(x, g):
    return (g * gelu_backward(x),)


gelu.defvjp(_gelu_fwd, _gelu_bwd)


def silu_backward(x):
    """d/dx SiLU = sigma(x) * (1 + x * (1 - sigma(x))) — product rule on
    x * sigma(x) with sigma' = sigma(1-sigma), written out by hand."""
    x = jnp.asarray(x)
    s = jax.nn.sigmoid(x)
    return s * (1.0 + x * (1.0 - s))


@jax.custom_vjp
def silu(x):
    """SiLU/Swish ``x * sigmoid(x)`` (Ramachandran et al. 2017) with the
    hand-derived derivative as its custom gradient — the gate activation
    of SwiGLU (reference README.md:61,71 roadmap item, never built
    there)."""
    return x * jax.nn.sigmoid(x)


def _silu_fwd(x):
    return x * jax.nn.sigmoid(x), x


def _silu_bwd(x, g):
    return (g * silu_backward(x),)


silu.defvjp(_silu_fwd, _silu_bwd)


def swiglu_backward(a, g):
    """Hand-derived gradients of ``swiglu(a, g) = silu(a) * g`` w.r.t. the
    upstream cotangent: returns the pair of elementwise factors
    ``(d/da, d/dg) = (g * silu'(a), silu(a))`` (product rule; multiply
    each by the incoming gradient)."""
    a = jnp.asarray(a)
    s = jax.nn.sigmoid(a)
    return g * (s * (1.0 + a * (1.0 - s))), a * s


@jax.custom_vjp
def swiglu(a, g):
    """Gated SiLU unit ``silu(a) * g`` (Shazeer 2020, "GLU Variants
    Improve Transformer"): ``a`` is the activation branch (x @ W1 + b1),
    ``g`` the linear gate branch (x @ Wg + bg). The custom backward is the
    hand-written product rule (``swiglu_backward``), gradient-checked
    against jax.grad and a torch oracle."""
    return (a * jax.nn.sigmoid(a)) * g


def _swiglu_fwd(a, g):
    return (a * jax.nn.sigmoid(a)) * g, (a, g)


def _swiglu_bwd(res, dy):
    a, g = res
    da_f, dg_f = swiglu_backward(a, g)
    return dy * da_f, dy * dg_f


swiglu.defvjp(_swiglu_fwd, _swiglu_bwd)


def geglu_backward(a, g):
    """Hand-derived gradients of ``geglu(a, g) = gelu(a) * g``: the pair
    ``(d/da, d/dg) = (g * gelu'(a), gelu(a))`` with the tanh-approximation
    gelu derivative (``gelu_backward``)."""
    a = jnp.asarray(a)
    ge = 0.5 * a * (1.0 + jnp.tanh(_SQRT_2_OVER_PI * (a + _GELU_C * a**3)))
    return g * gelu_backward(a), ge


@jax.custom_vjp
def geglu(a, g):
    """Gated GELU unit ``gelu(a) * g`` (Shazeer 2020) with the hand-written
    product-rule backward, using the same tanh-approximation GELU as
    ``gelu``."""
    return 0.5 * a * (1.0 + jnp.tanh(
        _SQRT_2_OVER_PI * (a + _GELU_C * a**3))) * g


def _geglu_fwd(a, g):
    y = 0.5 * a * (1.0 + jnp.tanh(
        _SQRT_2_OVER_PI * (a + _GELU_C * a**3))) * g
    return y, (a, g)


def _geglu_bwd(res, dy):
    a, g = res
    da_f, dg_f = geglu_backward(a, g)
    return dy * da_f, dy * dg_f


geglu.defvjp(_geglu_fwd, _geglu_bwd)


# ---------------------------------------------------------------------------
# softmax / masks
# ---------------------------------------------------------------------------


def softmax_last(x, eps: float = 1e-12):
    """Stabilized softmax along the last axis (reference attention.py:12-24)."""
    x = jnp.asarray(x)
    z = x - jax.lax.stop_gradient(jnp.max(x, axis=-1, keepdims=True))
    e = jnp.exp(z)
    return e / (jnp.sum(e, axis=-1, keepdims=True) + eps)


def causal_mask(seq_len: int, fill: float = -1e9, dtype=jnp.float32):
    """Additive future-blocking mask of shape (1, 1, T, T)."""
    i = jnp.arange(seq_len)
    m = (i[:, None] < i[None, :]).astype(dtype) * fill
    return m[None, None, :, :]


# ---------------------------------------------------------------------------
# normalization
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def layer_norm(x, gamma, beta, eps: float = 1e-5):
    """y = gamma * (x - mean) / sqrt(var + eps) + beta over the last axis."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    xhat = (x - mu) / jnp.sqrt(var + eps)
    return xhat * gamma + beta


def _ln_fwd(x, gamma, beta, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    sigma = jnp.sqrt(var + eps)
    xhat = (x - mu) / sigma
    return xhat * gamma + beta, (xhat, sigma, gamma)


def _ln_bwd(eps, res, dy):
    # Closed form (reference normalization.py:57-68):
    # dx = (ghat - mean(ghat) - xhat * mean(ghat * xhat)) / sigma
    xhat, sigma, gamma = res
    ghat = dy * gamma
    m1 = jnp.mean(ghat, axis=-1, keepdims=True)
    m2 = jnp.mean(ghat * xhat, axis=-1, keepdims=True)
    dx = (ghat - m1 - xhat * m2) / sigma
    sum_axes = tuple(range(dy.ndim - 1))
    dgamma = jnp.sum(dy * xhat, axis=sum_axes)
    dbeta = jnp.sum(dy, axis=sum_axes)
    return dx, dgamma, dbeta


layer_norm.defvjp(_ln_fwd, _ln_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def rms_norm(x, gamma, eps: float = 1e-6):
    """y = gamma * x / sqrt(mean(x^2) + eps) — no centering."""
    rms = jnp.sqrt(jnp.mean(x**2, axis=-1, keepdims=True) + eps)
    return (x / rms) * gamma


def _rms_fwd(x, gamma, eps):
    rms = jnp.sqrt(jnp.mean(x**2, axis=-1, keepdims=True) + eps)
    xnorm = x / rms
    return xnorm * gamma, (xnorm, rms, gamma)


def _rms_bwd(eps, res, dy):
    # Closed form: dx = (g - xnorm * mean(g * xnorm)) / rms, g = dy * gamma.
    # NOTE: the reference's code (normalization.py:144-147) drops the final
    # /rms on the correction term — its own derivation comment ("mean(g * x
    # / rms^3)") has it right. We implement the correct form; the gradient
    # check against jax.grad (tests/test_nn_grads.py) pins it down.
    xnorm, rms, gamma = res
    g = dy * gamma
    dx = (g - xnorm * jnp.mean(g * xnorm, axis=-1, keepdims=True)) / rms
    sum_axes = tuple(range(dy.ndim - 1))
    dgamma = jnp.sum(dy * xnorm, axis=sum_axes)
    return dx, dgamma


rms_norm.defvjp(_rms_fwd, _rms_bwd)


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------


def _sdpa_fwd_math(Q, K, V, mask):
    d = Q.shape[-1]
    scale = 1.0 / math.sqrt(d)
    S = scale * jnp.einsum("...td,...sd->...ts", Q, K)
    if mask is not None:
        S = S + mask
    P = softmax_last(S)
    O = jnp.einsum("...ts,...sd->...td", P, V)
    return O, P


@jax.custom_vjp
def sdpa(Q, K, V, mask=None):
    """Scaled dot-product attention O = softmax(QK^T/sqrt(d) + mask) V.

    Shapes: Q (..., T, d), K/V (..., T_kv, d), additive mask broadcastable
    to (..., T, T_kv). The backward is the reference's hand-derived form
    including the softmax Jacobian trick dS = (dP - rowsum(dP*P)) * P
    (attention.py:68-89).
    """
    O, _ = _sdpa_fwd_math(Q, K, V, mask)
    return O


def _sdpa_vjp_fwd(Q, K, V, mask):
    O, P = _sdpa_fwd_math(Q, K, V, mask)
    return O, (Q, K, V, P)


def _sdpa_vjp_bwd(res, dO):
    Q, K, V, P = res
    d = Q.shape[-1]
    scale = 1.0 / math.sqrt(d)
    dV = jnp.einsum("...ts,...td->...sd", P, dO)
    dP = jnp.einsum("...td,...sd->...ts", dO, V)
    rowdot = jnp.sum(dP * P, axis=-1, keepdims=True)
    dS = (dP - rowdot) * P
    dQ = jnp.einsum("...ts,...sd->...td", dS, K) * scale
    dK = jnp.einsum("...ts,...td->...sd", dS, Q) * scale
    return dQ, dK, dV, None


sdpa.defvjp(_sdpa_vjp_fwd, _sdpa_vjp_bwd)


# ---------------------------------------------------------------------------
# positional
# ---------------------------------------------------------------------------


def sinusoidal_encoding(max_len: int, d_model: int, dtype=jnp.float32):
    """Vaswani sin/cos table of shape (max_len, d_model)."""
    pos = jnp.arange(max_len)[:, None].astype(jnp.float32)
    i = jnp.arange(d_model)[None, :]
    angle = pos / (10000 ** (2 * (i // 2) / d_model)).astype(jnp.float32)
    pe = jnp.where(i % 2 == 0, jnp.sin(angle), jnp.cos(angle))
    return pe.astype(dtype)


def rope_tables(d_head: int, positions, base: float = 10000.0,
                dtype=jnp.float32):
    """cos/sin tables of shape (T, d_head/2) for the given positions (T,).

    ``positions`` may be a traced array (e.g. the live KV-cache length during
    incremental decode), matching the reference RoPE's ``offset`` semantics
    (/root/reference/ai_comps/positional.py:121-135) without a precomputed
    cache bound.
    """
    inv_freq = 1.0 / (
        base ** (jnp.arange(0, d_head, 2, dtype=jnp.float32) / d_head)
    )
    angles = jnp.asarray(positions, jnp.float32)[..., None] * inv_freq
    return jnp.cos(angles).astype(dtype), jnp.sin(angles).astype(dtype)


def rope_rotate(x, cos, sin):
    """Rotate interleaved even/odd feature pairs of x (..., T, d) by cos/sin
    tables of shape (T, d/2). Differentiable (plain jnp ops)."""
    x_even = x[..., 0::2]
    x_odd = x[..., 1::2]
    rot_even = x_even * cos - x_odd * sin
    rot_odd = x_even * sin + x_odd * cos
    return jnp.stack([rot_even, rot_odd], axis=-1).reshape(x.shape)


def he_init(fan_in: int, fan_out: int, rng) -> jnp.ndarray:
    """Kaiming/He init for ReLU layers; rng is a numpy Generator (host-side
    init, matching the reference's seeding behavior, attention.py:92-95)."""
    std = math.sqrt(2.0 / fan_in)
    return jnp.asarray(
        rng.normal(0.0, std, size=(fan_in, fan_out)), dtype=jnp.float32
    )
