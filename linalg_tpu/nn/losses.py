"""Fused softmax cross-entropy: chunked over the vocabulary, custom_vjp.

The reference computes the fused loss+gradient over full logits
(``OutputHead.loss_and_dlogits``, /root/reference/ai_comps/
transformer.py:876-893, dZ = (P - onehot)/N). At its vocab (65) that is
cheap, but with the BPE tokenizer the head can be tens of thousands of
tokens wide — at the published batch (16384 tokens) a 50k vocab means a
3.3 GB f32 logits tensor that autodiff would materialize AND save.

``chunked_softmax_ce(h, W, b, y)`` computes mean CE of
``logits = h @ W^T + b`` WITHOUT ever materializing (N, V):

- forward: one ``lax.scan`` over vocabulary chunks with an online
  (max, sumexp) reduction — the same streaming-softmax recurrence the
  flash kernels use, applied over the vocab axis — plus gold-logit
  gathering for labels that land in the chunk.
- backward: a second scan recomputes each chunk's logits and applies the
  reference's closed form dlogits = (softmax - onehot)/N to accumulate
  dh, dW, db chunk by chunk. Residuals are just (h, W, b, y) and the
  (N,) streaming stats.

Peak memory is O(N * chunk) instead of O(N * V).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["chunked_softmax_ce", "DEFAULT_CHUNK"]

DEFAULT_CHUNK = 4096
_NEG = jnp.float32(-1e30)  # padded-vocab logit: exp() == 0, finite max


def _pad_vocab(W, b, chunk: int):
    V = W.shape[0]
    Vp = -(-V // chunk) * chunk
    if Vp != V:
        W = jnp.concatenate(
            [W, jnp.zeros((Vp - V, W.shape[1]), W.dtype)], axis=0)
        b = jnp.concatenate([b, jnp.full((Vp - V,), _NEG, b.dtype)], axis=0)
    return W, b, Vp


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def chunked_softmax_ce(h, W, b, y, chunk: int = DEFAULT_CHUNK):
    """Mean softmax CE of ``h @ W^T + b`` against labels ``y``.

    h (..., D) float; W (V, D); b (V,); y (...) int32. Returns a scalar
    (f32). Differentiable in h, W, b.
    """
    loss, _ = _ce_fwd_scan(h, W, b, y, chunk)
    return loss


def _ce_fwd_scan(h, W, b, y, chunk: int):
    D = h.shape[-1]
    h2 = h.reshape(-1, D).astype(jnp.float32)
    yf = y.reshape(-1)
    N = h2.shape[0]
    Wp, bp, Vp = _pad_vocab(W, b, chunk)
    Wc = Wp.reshape(Vp // chunk, chunk, D)
    bc = bp.reshape(Vp // chunk, chunk)
    bases = jnp.arange(Vp // chunk, dtype=jnp.int32) * chunk

    def step(carry, xs):
        m, s, gold = carry
        Wk, bk, base = xs
        logits = (h2 @ Wk.astype(jnp.float32).T
                  + bk.astype(jnp.float32)[None, :])  # (N, chunk)
        mc = jnp.max(logits, axis=1)
        m_new = jnp.maximum(m, mc)
        s = s * jnp.exp(m - m_new) + jnp.sum(
            jnp.exp(logits - m_new[:, None]), axis=1)
        hit = jnp.logical_and(yf >= base, yf < base + chunk)
        idx = jnp.clip(yf - base, 0, chunk - 1)
        gold = gold + jnp.where(
            hit, jnp.take_along_axis(logits, idx[:, None], axis=1)[:, 0],
            0.0)
        return (m_new, s, gold), None

    init = (jnp.full((N,), _NEG), jnp.zeros((N,), jnp.float32),
            jnp.zeros((N,), jnp.float32))
    (m, s, gold), _ = lax.scan(step, init, (Wc, bc, bases))
    logz = jnp.log(s) + m
    return jnp.mean(logz - gold), (m, s)


def _ce_vjp_fwd(h, W, b, y, chunk: int):
    loss, (m, s) = _ce_fwd_scan(h, W, b, y, chunk)
    return loss, (h, W, b, y, m, s)


def _ce_vjp_bwd(chunk: int, res, g):
    h, W, b, y, m, s = res
    D = h.shape[-1]
    V = W.shape[0]
    h2 = h.reshape(-1, D).astype(jnp.float32)
    yf = y.reshape(-1)
    N = h2.shape[0]
    Wp, bp, Vp = _pad_vocab(W, b, chunk)
    Wc = Wp.reshape(Vp // chunk, chunk, D)
    bc = bp.reshape(Vp // chunk, chunk)
    bases = jnp.arange(Vp // chunk, dtype=jnp.int32) * chunk
    logz = jnp.log(s) + m  # (N,)
    scale = g / N  # d(mean)/d(sum) times upstream cotangent

    def step(dh, xs):
        Wk, bk, base = xs
        W32 = Wk.astype(jnp.float32)
        logits = h2 @ W32.T + bk.astype(jnp.float32)[None, :]
        p = jnp.exp(logits - logz[:, None])  # softmax over the full vocab
        hit = jnp.logical_and(yf >= base, yf < base + chunk)
        idx = jnp.clip(yf - base, 0, chunk - 1)
        onehot = jnp.where(
            hit[:, None],
            (jnp.arange(chunk, dtype=jnp.int32)[None, :] == idx[:, None])
            .astype(jnp.float32),
            0.0,
        )
        dl = (p - onehot) * scale  # (N, chunk): reference dZ=(P-onehot)/N
        dh = dh + dl @ W32
        dWk = jax.lax.dot_general(dl, h2, (((0,), (0,)), ((), ())))
        dbk = jnp.sum(dl, axis=0)
        return dh, (dWk, dbk)

    dh2, (dWs, dbs) = lax.scan(
        step, jnp.zeros_like(h2), (Wc, bc, bases))
    dW = dWs.reshape(Vp, D)[:V].astype(W.dtype)
    db = dbs.reshape(Vp)[:V].astype(b.dtype)
    return dh2.reshape(h.shape).astype(h.dtype), dW, db, None


chunked_softmax_ce.defvjp(_ce_vjp_fwd, _ce_vjp_bwd)
