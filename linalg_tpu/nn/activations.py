"""Activation registry (reference ai_comps/activations.py:73-94 parity)."""

from __future__ import annotations

from .functional import gelu, gelu_backward, relu, relu_backward

__all__ = ["relu", "relu_backward", "gelu", "gelu_backward", "ACTIVATIONS", "get_activation"]

ACTIVATIONS = {
    "relu": (relu, relu_backward),
    "gelu": (gelu, gelu_backward),
}


def get_activation(name: str):
    """Return (forward_fn, backward_fn) by name; KeyError on unknown."""
    if name not in ACTIVATIONS:
        raise KeyError(
            f"Unknown activation: {name}. Available: {list(ACTIVATIONS.keys())}"
        )
    return ACTIVATIONS[name]
