"""LayerNorm / RMSNorm with the reference's stateful component contract.

Reference: /root/reference/ai_comps/normalization.py:11-187. The contract is
``forward(x) -> y``, ``backward(dy) -> dx`` (parameter grads stashed in
``.grads``), ``step(lr, weight_decay)`` (SGD). Here the stateful classes are
thin wrappers over the ``custom_vjp`` functional ops in ``nn.functional`` —
the hand-derived closed-form backwards are the single source of truth, and
``jax.vjp`` supplies the pullback that ``backward`` replays.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .functional import layer_norm, rms_norm

__all__ = ["LayerNorm", "RMSNorm", "get_norm"]


class LayerNorm:
    """y = gamma * (x - mean) / std + beta over the last axis."""

    def __init__(self, d_model: int = 512) -> None:
        self.d_model = d_model
        self.gamma = jnp.ones(d_model, dtype=jnp.float32)
        self.beta = jnp.zeros(d_model, dtype=jnp.float32)
        self._grads: Dict[str, jnp.ndarray] = {
            "gamma": jnp.zeros(d_model, dtype=jnp.float32),
            "beta": jnp.zeros(d_model, dtype=jnp.float32),
        }
        self._pull = None

    def __call__(self, params, x, eps: float = 1e-5):
        """Pure functional apply: params is {'gamma','beta'}."""
        return layer_norm(x, params["gamma"], params["beta"], eps)

    def init(self):
        return {"gamma": self.gamma, "beta": self.beta}

    def forward(self, x, eps: float = 1e-5):
        x = jnp.asarray(x)
        y, self._pull = jax.vjp(
            lambda g, b, xx: layer_norm(xx, g, b, eps), self.gamma, self.beta, x
        )
        return y

    def backward(self, dy):
        dgamma, dbeta, dx = self._pull(jnp.asarray(dy, dtype=jnp.float32))
        self._grads["gamma"] = dgamma
        self._grads["beta"] = dbeta
        return dx

    def step(self, lr: float = 1e-3, weight_decay: float = 0.0) -> None:
        g = self._grads["gamma"]
        if weight_decay != 0.0:
            g = g + weight_decay * self.gamma
        self.gamma = self.gamma - lr * g
        self.beta = self.beta - lr * self._grads["beta"]
        self._grads["gamma"] = jnp.zeros_like(self.gamma)
        self._grads["beta"] = jnp.zeros_like(self.beta)

    @property
    def grads(self) -> Dict[str, jnp.ndarray]:
        return self._grads


class RMSNorm:
    """y = gamma * x / rms(x). No mean centering."""

    def __init__(self, d_model: int = 512, eps: float = 1e-6) -> None:
        self.d_model = d_model
        self.eps = eps
        self.gamma = jnp.ones(d_model, dtype=jnp.float32)
        self._grads: Dict[str, jnp.ndarray] = {
            "gamma": jnp.zeros(d_model, dtype=jnp.float32),
        }
        self._pull = None

    def __call__(self, params, x):
        return rms_norm(x, params["gamma"], self.eps)

    def init(self):
        return {"gamma": self.gamma}

    def forward(self, x):
        x = jnp.asarray(x)
        y, self._pull = jax.vjp(
            lambda g, xx: rms_norm(xx, g, self.eps), self.gamma, x
        )
        return y

    def backward(self, dy):
        dgamma, dx = self._pull(jnp.asarray(dy, dtype=jnp.float32))
        self._grads["gamma"] = dgamma
        return dx

    def step(self, lr: float = 1e-3, weight_decay: float = 0.0) -> None:
        g = self._grads["gamma"]
        if weight_decay != 0.0:
            g = g + weight_decay * self.gamma
        self.gamma = self.gamma - lr * g
        self._grads["gamma"] = jnp.zeros_like(self.gamma)

    @property
    def grads(self) -> Dict[str, jnp.ndarray]:
        return self._grads


def get_norm(name: str, d_model: int, **kwargs):
    """Factory: 'layernorm' | 'rmsnorm' (reference normalization.py:169-187)."""
    norms = {"layernorm": LayerNorm, "rmsnorm": RMSNorm}
    if name not in norms:
        raise KeyError(f"Unknown norm: {name}. Available: {list(norms.keys())}")
    return norms[name](d_model, **kwargs)
