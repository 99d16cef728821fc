"""Functional encoder-decoder seq2seq — the jit-compiled TPU training path.

Same architecture as ``models/transformer.py`` (pre-LN blocks, cross
attention with summed dMemory semantics — which jax.grad reproduces exactly
through the custom_vjp components), but expressed as a param pytree with
``lax.scan`` over stacked layers so the whole reversal-task training step
(reference transformer.py:933-1000) compiles to one XLA computation.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..nn.functional import causal_mask, layer_norm, relu, sdpa, sinusoidal_encoding

__all__ = [
    "Seq2SeqConfig",
    "init_seq2seq_params",
    "seq2seq_apply",
    "seq2seq_loss",
    "make_reverse_batch",
]

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class Seq2SeqConfig:
    vocab_size: int
    d_model: int = 64
    n_heads: int = 4
    n_enc_layers: int = 2
    n_dec_layers: int = 2
    d_ff: int = 256
    max_len: int = 64


def _he(rng, fan_in, shape):
    return jnp.asarray(
        rng.normal(0.0, math.sqrt(2.0 / fan_in), size=shape), jnp.float32
    )


def _stack_block(rng, L, D, F, cross: bool):
    blk = {
        "ln1_g": jnp.ones((L, D), jnp.float32),
        "ln1_b": jnp.zeros((L, D), jnp.float32),
        "sa_Wq": _he(rng, D, (L, D, D)),
        "sa_Wk": _he(rng, D, (L, D, D)),
        "sa_Wv": _he(rng, D, (L, D, D)),
        "sa_Wo": _he(rng, D, (L, D, D)),
        "lnf_g": jnp.ones((L, D), jnp.float32),
        "lnf_b": jnp.zeros((L, D), jnp.float32),
        "W1": _he(rng, D, (L, D, F)),
        "b1": jnp.zeros((L, F), jnp.float32),
        "W2": _he(rng, F, (L, F, D)),
        "b2": jnp.zeros((L, D), jnp.float32),
    }
    if cross:
        blk.update({
            "ln2_g": jnp.ones((L, D), jnp.float32),
            "ln2_b": jnp.zeros((L, D), jnp.float32),
            "ca_Wq": _he(rng, D, (L, D, D)),
            "ca_Wk": _he(rng, D, (L, D, D)),
            "ca_Wv": _he(rng, D, (L, D, D)),
            "ca_Wo": _he(rng, D, (L, D, D)),
        })
    return blk


def init_seq2seq_params(cfg: Seq2SeqConfig, seed: int = 0) -> Params:
    rng = np.random.default_rng(seed)
    D, F, V = cfg.d_model, cfg.d_ff, cfg.vocab_size
    std = math.sqrt(2.0 / (D + V))
    return {
        "src_emb": jnp.asarray(rng.normal(0.0, 0.02, (V, D)), jnp.float32),
        "tgt_emb": jnp.asarray(rng.normal(0.0, 0.02, (V, D)), jnp.float32),
        "head_W": jnp.asarray(rng.normal(0.0, std, (D, V)), jnp.float32),
        "head_b": jnp.zeros((V,), jnp.float32),
        "encoder": _stack_block(rng, cfg.n_enc_layers, D, F, cross=False),
        "decoder": _stack_block(rng, cfg.n_dec_layers, D, F, cross=True),
    }


def _heads(x, h):
    B, T, D = x.shape
    return x.reshape(B, T, h, D // h).transpose(0, 2, 1, 3)


def _unheads(x):
    B, h, T, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, T, h * d)


def _attn(lp, prefix, x_q, x_kv, mask, h):
    q = _heads(x_q @ lp[f"{prefix}_Wq"], h)
    k = _heads(x_kv @ lp[f"{prefix}_Wk"], h)
    v = _heads(x_kv @ lp[f"{prefix}_Wv"], h)
    return _unheads(sdpa(q, k, v, mask)) @ lp[f"{prefix}_Wo"]


def _ffn(lp, x):
    return relu(x @ lp["W1"] + lp["b1"]) @ lp["W2"] + lp["b2"]


def seq2seq_apply(params: Params, src_ids, tgt_ids, cfg: Seq2SeqConfig):
    """(src (B,Ts), tgt_in (B,Tt)) -> logits (B, Tt, V)."""
    h = cfg.n_heads
    Ts, Tt = src_ids.shape[-1], tgt_ids.shape[-1]
    pe = sinusoidal_encoding(cfg.max_len, cfg.d_model)
    src = params["src_emb"][src_ids] + pe[:Ts][None]
    tgt = params["tgt_emb"][tgt_ids] + pe[:Tt][None]
    tgt_mask = causal_mask(Tt, dtype=src.dtype)

    def enc_body(carry, lp):
        x = carry
        xn = layer_norm(x, lp["ln1_g"], lp["ln1_b"])
        x = x + _attn(lp, "sa", xn, xn, None, h)
        xf = layer_norm(x, lp["lnf_g"], lp["lnf_b"])
        return x + _ffn(lp, xf), None

    memory, _ = lax.scan(enc_body, src, params["encoder"])

    def dec_body(carry, lp):
        x = carry
        xn = layer_norm(x, lp["ln1_g"], lp["ln1_b"])
        x = x + _attn(lp, "sa", xn, xn, tgt_mask, h)
        xc = layer_norm(x, lp["ln2_g"], lp["ln2_b"])
        x = x + _attn(lp, "ca", xc, memory, None, h)
        xf = layer_norm(x, lp["lnf_g"], lp["lnf_b"])
        return x + _ffn(lp, xf), None

    out, _ = lax.scan(dec_body, tgt, params["decoder"])
    return out @ params["head_W"] + params["head_b"]


def seq2seq_loss(params: Params, src_ids, tgt_in, tgt_out, cfg: Seq2SeqConfig):
    logits = seq2seq_apply(params, src_ids, tgt_in, cfg)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, tgt_out[..., None], axis=-1)[..., 0]
    return jnp.mean(logz - gold)


def make_reverse_batch(B: int, T: int, V: int, bos_id: int = 0, rng=None):
    """Reversal-task batch (reference transformer.py:923-930): src random
    ints (excluding BOS), tgt = reversed src with BOS-shifted teacher forcing."""
    rng = np.random.default_rng() if rng is None else rng
    src = rng.integers(1, V, size=(B, T), dtype=np.int32)
    rev = np.flip(src, axis=1)
    tgt_out = rev.copy()
    tgt_in = np.concatenate(
        [np.full((B, 1), bos_id, dtype=np.int32), rev[:, :-1]], axis=1
    )
    return src, tgt_in, tgt_out
