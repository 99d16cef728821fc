"""Ring attention: sequence-parallel attention over an 'sp' mesh axis.

Context parallelism the TPU-native way (SURVEY §5 long-context seam): the
sequence axis is sharded over the mesh, every device keeps its query chunk,
and K/V chunks rotate around the ring via ``lax.ppermute`` over ICI while an
online-softmax accumulator (running max m, normalizer l, output acc) absorbs
one chunk per step — attention over the FULL sequence with per-device
memory O(T / sp) and no (T, T) materialization anywhere.

Gradients flow through ``jax.grad`` (ppermute's transpose is the inverse
rotation), so the ring composes with the training step unchanged.

Reference has no parallelism at all (SURVEY §2.5); this is the idiomatic
TPU expression of its attention capability at scale.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

__all__ = ["make_ring_attention", "ring_attention_local"]

_NEG = -1e30


def ring_attention_local(q, k, v, *, axis: str, causal: bool = True,
                         slopes=None, window=None):
    """Per-device body: q/k/v are LOCAL chunks (B, h, Tl, d) of a sequence
    sharded over mesh axis ``axis``. Must run inside shard_map/pjit with
    that axis in scope.

    ``slopes`` (h,) adds the ALiBi per-head distance bias
    ``slope_h * (col - row)`` to the scores — global row/col positions are
    already in hand for the causal mask, so the bias costs one fused
    multiply-add per chunk and no extra communication.

    ``window`` (sliding-window attention) bans keys more than window-1
    behind each query. The rotation schedule is unchanged — every chunk
    still makes the full loop (a static ring; chunks wholly behind the
    band just contribute nothing), so the win is model semantics, not
    comm volume.
    """
    sp = lax.axis_size(axis)
    idx = lax.axis_index(axis)
    B, h, Tl, d = q.shape
    scale = 1.0 / math.sqrt(d)
    rows = (idx * Tl + jnp.arange(Tl))[:, None]  # global q positions
    if slopes is not None:
        sl = jnp.asarray(slopes, jnp.float32)[None, :, None, None]

    m = jnp.full((B, h, Tl, 1), _NEG, jnp.float32)
    l = jnp.zeros((B, h, Tl, 1), jnp.float32)
    acc = jnp.zeros((B, h, Tl, d), jnp.float32)
    perm = [(j, (j + 1) % sp) for j in range(sp)]

    k_cur, v_cur = k, v
    for s in range(sp):
        src = (idx - s) % sp  # origin device of the chunk we now hold
        cols = (src * Tl + jnp.arange(Tl))[None, :]
        sc = scale * jnp.einsum("bhtd,bhsd->bhts", q, k_cur)
        if slopes is not None:
            sc = sc + sl * (cols - rows).astype(jnp.float32)[None, None]
        if causal:
            sc = jnp.where(cols <= rows, sc, _NEG)
        if window is not None:
            sc = jnp.where(cols > rows - window, sc, _NEG)
        m_new = jnp.maximum(m, jnp.max(sc, axis=-1, keepdims=True))
        p = jnp.exp(sc - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum("bhts,bhsd->bhtd", p, v_cur)
        m = m_new
        if s != sp - 1:  # last chunk needs no further rotation
            k_cur = lax.ppermute(k_cur, axis, perm)
            v_cur = lax.ppermute(v_cur, axis, perm)

    denom = jnp.where(l == 0, 1.0, l)
    return (acc / denom).astype(q.dtype)


def make_ring_attention(mesh, *, axis: str = "sp", causal: bool = True,
                        batch_axis: str | None = None, slopes=None,
                        window=None):
    """shard_map-wrapped ring attention over ``mesh``.

    Returns attn(q, k, v) for GLOBAL (B, h, T, d) arrays with T sharded on
    ``axis`` (and optionally B on ``batch_axis``). T must divide by the
    axis size. ``slopes`` (h,) enables the ALiBi per-head distance bias;
    ``window`` the sliding-window band.
    """
    spec = P(batch_axis, None, axis, None)
    if slopes is not None:
        slopes = tuple(float(s) for s in slopes)
    body = partial(ring_attention_local, axis=axis, causal=causal,
                   slopes=slopes, window=window)
    return jax.shard_map(
        lambda q, k, v: body(q, k, v),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
