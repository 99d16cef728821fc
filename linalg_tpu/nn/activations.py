"""Activation registry (reference ai_comps/activations.py:73-94 parity).

Beyond the reference's relu/gelu pairs, the registry carries silu and the
GATED units swiglu/geglu (reference README.md:61,71 roadmap items, never
built there). Gated entries are TWO-argument: forward ``f(a, g)`` over the
activation branch ``a`` and linear gate ``g``; backward ``b(a, g)`` returns
the pair of elementwise cotangent factors ``(d/da, d/dg)``.
"""

from __future__ import annotations

from .functional import (
    geglu,
    geglu_backward,
    gelu,
    gelu_backward,
    relu,
    relu_backward,
    silu,
    silu_backward,
    swiglu,
    swiglu_backward,
)

__all__ = ["relu", "relu_backward", "gelu", "gelu_backward",
           "silu", "silu_backward", "swiglu", "swiglu_backward",
           "geglu", "geglu_backward", "ACTIVATIONS", "GATED_ACTIVATIONS",
           "get_activation"]

ACTIVATIONS = {
    "relu": (relu, relu_backward),
    "gelu": (gelu, gelu_backward),
    "silu": (silu, silu_backward),
}

# gated (two-branch) units: FFN(x) = f(x @ W1 + b1, x @ Wg + bg) @ W2 + b2
GATED_ACTIVATIONS = {
    "swiglu": (swiglu, swiglu_backward),
    "geglu": (geglu, geglu_backward),
}


def get_activation(name: str):
    """Return (forward_fn, backward_fn) by name; KeyError on unknown.
    Gated names (see ``GATED_ACTIVATIONS``) return two-argument pairs."""
    if name in ACTIVATIONS:
        return ACTIVATIONS[name]
    if name in GATED_ACTIVATIONS:
        return GATED_ACTIVATIONS[name]
    raise KeyError(
        f"Unknown activation: {name}. Available: "
        f"{list(ACTIVATIONS) + list(GATED_ACTIVATIONS)}"
    )
