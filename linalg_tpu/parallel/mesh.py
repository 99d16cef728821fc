"""Device mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh", "pick_dp_tp"]


def pick_dp_tp(n_devices: int, n_heads: int) -> Tuple[int, int]:
    """Choose (dp, tp): the largest tp that divides both n_devices and
    n_heads, remainder to data parallelism."""
    tp = 1
    for cand in range(1, n_devices + 1):
        if n_devices % cand == 0 and n_heads % cand == 0:
            tp = cand
    return n_devices // tp, tp


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("dp", "tp"),
    devices=None,
) -> Mesh:
    """Build a Mesh over the available devices.

    ``shape`` defaults to all devices on the first axis (pure data
    parallelism). Axis order: ('dp', 'tp') unless overridden.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    n = int(np.prod(shape))
    assert n <= len(devices), (
        f"mesh shape {tuple(shape)} needs {n} devices, "
        f"have {len(devices)}"
    )
    arr = np.asarray(devices[:n]).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))
