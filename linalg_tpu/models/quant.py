"""Int8 weight-only quantized decode (production-serving extension).

Every generated token re-reads all matmul weights from HBM (they are
loop-invariant in the decode scan but far too big for VMEM). Storing them
int8 halves the bytes vs bfloat16. Two arithmetic modes over the same int8
storage:

- ``mode="deq"`` (default): bf16 ``lax.dot_general`` with the int8 weights
  converted in-register as the operand load (the convert fuses; HBM still
  reads int8) and the per-OUTPUT-CHANNEL scale applied to the output row —
  valid because per-channel scales commute with the contraction.
- ``mode="int8"``: int8 x int8 -> int32 on the MXU with per-TOKEN dynamic
  activation scales (max-abs over the feature axis / 127, computed inside
  the scan).

Weight scales are symmetric per-output-channel (max-abs over the reduction
axis / 127 — each output feature's error is bounded by its own channel
magnitude).

Measured on the v5e (interleaved A/B, 3x128-token chains, median): "deq"
beats "int8" at every size tested — the activation quantize/rescale chain
costs more than int8-MXU throughput recovers on (B, 1, D) matvecs — and
the bf16-vs-int8 verdict is size-dependent: at the published d512/4L
config decode is fusion-LAUNCH-bound (~3 us/fusion floor across ~40
fusions/token), so quant LOSES (6.3k vs 7.8k tok/s); at d1024/8L
(~100M params) weight traffic dominates and deq wins 1.14x (2858 vs 2506
tok/s), with the win growing with model size. ``bench.py --only quant``
re-measures both rows.

Scope: the DECODE path only. Prefill and training stay in the configured
compute dtype (prefill is MXU-compute-bound where bf16 is already native,
and training gradients want the f32 masters), which is the standard
quality/throughput split for serving. The KV cache also stays in the
compute dtype — its per-token traffic is small at these context lengths.

Relation to the reference: the reference's sampler has no quantization (or
KV cache — it recomputes a full forward per token, gpt.py:518-546); this is
a beyond-parity serving feature, pinned against the full-precision decode
by tests/test_quant.py.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import lax

from ..nn.functional import sinusoidal_encoding
from .gpt import GPTConfig, Params, _decode_chunk_core
from ..nn.cache import fkv_write

__all__ = ["quantize_weight", "quantize_gpt_params", "quantize_kv_cache",
           "gpt_decode_chunk_q"]


def quantize_weight(w, axis: int = -2):
    """Symmetric per-output-channel int8 quantization.

    ``axis`` is the REDUCTION axis of the matmul the weight feeds (each
    slice along the other axes is one output channel). Returns
    ``(w_q int8, scale f32)`` with ``scale`` shaped like ``w`` minus
    ``axis``; dequantization is ``w_q * scale`` broadcast over ``axis``.
    """
    w = jnp.asarray(w, jnp.float32)
    s = jnp.max(jnp.abs(w), axis=axis, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return q, jnp.squeeze(s, axis=axis)


def _act_quantize(x):
    """Per-row (per-token) dynamic int8 activation quantization."""
    x = x.astype(jnp.float32)
    sx = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
    sx = jnp.maximum(sx, 1e-12)
    xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def _qdot(x, w_q, w_s):
    """x (..., K) @ w_q (K, N) int8 with per-channel scales w_s (N,).

    int8 x int8 -> int32 on the MXU, rescaled to f32: the weight bytes read
    from HBM are exactly the int8s — no dequantized copy is ever
    materialized.
    """
    xq, sx = _act_quantize(x)
    acc = lax.dot_general(xq, w_q, (((x.ndim - 1,), (0,)), ((), ())),
                          preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * sx * w_s


def _ddot(x, w_q, w_s):
    """Dequant-in-dot twin of ``_qdot``: bf16 dot over int8 weights.

    Per-output-channel scales commute with the contraction —
    ``x @ (q * s) == (x @ q) * s`` — so the int8 weights are converted to
    bf16 in-register as the dot's operand load (XLA fuses the convert; the
    HBM bytes read are still the int8s) and the scale is applied once to
    the (tiny) output row. Unlike ``_qdot`` this keeps activations in
    bf16: no per-token max/round/clip chain, at the cost of bf16 instead
    of int8 MXU throughput — irrelevant for decode matvecs, which are
    HBM-traffic-bound, not FLOPs-bound.
    """
    acc = lax.dot_general(x.astype(jnp.bfloat16), w_q.astype(jnp.bfloat16),
                          (((x.ndim - 1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
    return acc * w_s


def quantize_gpt_params(params: Params, cfg: GPTConfig) -> Dict[str, Any]:
    """Quantize every decode matmul weight to int8 (+ f32 channel scales).

    LayerNorm gains/biases, matmul biases, and the learned position table
    stay f32 (tiny, accuracy-critical). The QKV projections are concatenated
    BEFORE quantization so the decode scan runs one fused (D, 3D) matvec,
    mirroring ``_dt_decode_ops``; scales are per-column so concatenation
    does not mix channels.
    """
    L = params["layers"]
    W3 = jnp.concatenate([L["Wq"], L["Wk"], L["Wv"]], axis=-1)  # (Ly, D, 3D)
    W3_q, W3_s = quantize_weight(W3)
    Wo_q, Wo_s = quantize_weight(L["Wo"])
    # gated FFN (swiglu/geglu): fuse the up + gate branches into one
    # (D, 2F) matvec before quantizing (per-column scales — concatenation
    # does not mix channels), mirroring _dt_decode_ops' W1g hoisting
    if "Wg" in L:
        W1_q, W1_s = quantize_weight(
            jnp.concatenate([L["W1"], L["Wg"]], axis=-1))
    else:
        W1_q, W1_s = quantize_weight(L["W1"])
    W2_q, W2_s = quantize_weight(L["W2"])
    # tok_W (V, D) serves the embedding gather (reduction-free: per-row
    # dequant) and the tied head matvec (reduction over D): per-row scales
    tok_q, tok_s = quantize_weight(params["tok_W"], axis=-1)
    b1 = (jnp.concatenate([L["b1"], L["bg"]], axis=-1) if "Wg" in L
          else L["b1"])
    out = {
        "layers": {
            "ln1_g": L["ln1_g"], "ln1_b": L["ln1_b"],
            "ln2_g": L["ln2_g"], "ln2_b": L["ln2_b"],
            "b1": b1, "b2": L["b2"],
            "W3_q": W3_q, "W3_s": W3_s,
            "Wo_q": Wo_q, "Wo_s": Wo_s,
            "W1_q": W1_q, "W1_s": W1_s,
            "W2_q": W2_q, "W2_s": W2_s,
        },
        "tok_W_q": tok_q,
        "tok_W_s": tok_s,
        "head_b": params["head_b"],
    }
    if "pos_W" in params:
        out["pos_W"] = params["pos_W"]
    return out


def _q_decode_ops(qparams: Dict[str, Any], cfg: GPTConfig,
                  mode: str = "deq") -> Dict[str, Any]:
    """Int8 decode ops for ``models.gpt._decode_chunk_core`` (the
    weight-only-quantized twin of ``_dt_decode_ops``).

    ``mode`` picks the matvec arithmetic over the same int8 storage:
    ``"int8"`` = int8 x int8 -> int32 with dynamic per-token activation
    scales; ``"deq"`` = bf16 dot with in-register weight dequantization
    (see ``_qdot`` / ``_ddot``). Same HBM weight bytes either way.
    """
    if mode not in ("int8", "deq"):
        raise ValueError(f"unknown quant decode mode: {mode!r}")
    qdot = _qdot if mode == "int8" else _ddot
    dt = cfg.compute_dtype
    ql = qparams["layers"]
    tok_q = qparams["tok_W_q"]
    tok_s = qparams["tok_W_s"]
    head_b = jnp.asarray(qparams["head_b"], jnp.float32)
    lws = {
        "ln1_g": ql["ln1_g"].astype(dt), "ln1_b": ql["ln1_b"].astype(dt),
        "ln2_g": ql["ln2_g"].astype(dt), "ln2_b": ql["ln2_b"].astype(dt),
        "b1": ql["b1"].astype(dt), "b2": ql["b2"].astype(dt),
        "W3_q": ql["W3_q"], "W3_s": ql["W3_s"],
        "Wo_q": ql["Wo_q"], "Wo_s": ql["Wo_s"],
        "W1_q": ql["W1_q"], "W1_s": ql["W1_s"],
        "W2_q": ql["W2_q"], "W2_s": ql["W2_s"],
    }
    pe = None
    if cfg.pos not in ("rope", "alibi"):
        pe = (qparams["pos_W"] if cfg.pos == "learned"
              else sinusoidal_encoding(cfg.ctx_len, cfg.d_model)).astype(dt)

    from ..nn.functional import geglu, gelu, layer_norm, relu, swiglu

    if cfg.gated_ffn:
        F = cfg.dff
        gate_fn = swiglu if cfg.ffn == "swiglu" else geglu

        def ffn(lw, x2):
            # W1_q holds the fused (D, 2F) up+gate matvec (see
            # quantize_gpt_params); split, gate, down-project
            ug = qdot(x2, lw["W1_q"], lw["W1_s"]).astype(dt) + lw["b1"]
            h = gate_fn(ug[..., :F], ug[..., F:])
            return qdot(h, lw["W2_q"], lw["W2_s"]).astype(dt) + lw["b2"]
    else:
        act = gelu if cfg.ffn == "gelu" else relu

        def ffn(lw, x2):
            return (qdot(
                act(qdot(x2, lw["W1_q"], lw["W1_s"]).astype(dt) + lw["b1"]),
                lw["W2_q"], lw["W2_s"]).astype(dt) + lw["b2"])

    def embed(token):
        # one-row dequant: reads D int8 + 1 scale per token
        row = tok_q[token].astype(jnp.float32) * tok_s[token][:, None]
        return row[:, None, :]

    def head(h):
        if mode == "deq":
            acc = lax.dot_general(
                h.astype(jnp.bfloat16), tok_q.astype(jnp.bfloat16),
                (((h.ndim - 1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return acc * tok_s + head_b  # f32 logits
        xq, sx = _act_quantize(h)  # (..., D)
        acc = lax.dot_general(xq, tok_q, (((h.ndim - 1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * sx * tok_s + head_b  # f32 logits

    return {
        "lws": lws,
        "embed": embed,
        "pe": (None if pe is None else
               lambda rel: pe[jnp.minimum(rel, cfg.ctx_len - 1)][:, None, :]),
        "ln1": lambda lw, x: layer_norm(x, lw["ln1_g"], lw["ln1_b"]),
        "qkv": lambda lw, xn: qdot(xn, lw["W3_q"], lw["W3_s"]).astype(dt),
        "out": lambda lw, y: qdot(y, lw["Wo_q"], lw["Wo_s"]).astype(dt),
        "ln2": lambda lw, x: layer_norm(x, lw["ln2_g"], lw["ln2_b"]),
        "ffn": ffn,
        "head": head,
    }


@partial(jax.jit,
         static_argnames=("cfg", "n_tokens", "top_k", "mode", "kv8"))
def gpt_decode_chunk_q(qparams, cache, logits, key, cfg: GPTConfig,
                       n_tokens: int, temperature=1.0, top_k: int = 0,
                       top_p=0.0, mode: str = "deq", kv8: bool = False):
    """Int8 weight-only twin of ``gpt_decode_chunk``: same cache contract
    (take the cache from the full-precision ``gpt_prefill``), same sampling
    semantics; only the per-token matvecs read int8 weights.

    ``kv8=True`` additionally reads/writes the KV cache int8 — pass the
    cache through ``quantize_kv_cache`` first. Halves the per-token cache
    traffic, which dominates at long contexts.
    """
    ops = _q_decode_ops(qparams, cfg, mode)
    write = fkv_write
    if kv8:
        ops = dict(ops, attn=_kv8_attn(cfg.compute_dtype))
        write = _kv8_write(fkv_write)
    start = cache.get("start", jnp.zeros((), jnp.int32))
    toks, logits, K, V, pos = _decode_chunk_core(
        cfg, ops, logits, cache["k"], cache["v"], cache["length"], start,
        key, n_tokens, temperature, top_k, top_p, write)
    return toks, logits, dict(cache, k=K, v=V, length=pos)


# -- int8 KV cache ----------------------------------------------------------
#
# At long contexts the decode token's traffic is KV-dominated, not
# weight-dominated: per token it reads L*2*ctx*D cache bytes vs one pass
# over the weights. Storing K/V int8 with a PER-WRITTEN-ROW scale (one
# scale per (layer, batch, head, position) over d_head — each cached row
# is quantized once, at write time, against its own magnitude) halves
# that traffic; the dequantize (int8 -> f32 * scale) fuses into the
# attention dot's operand read exactly like ``_ddot`` does for weights.

def _kv_row_quantize(x):
    """(B, h, S, d) rows -> (int8 rows, per-row f32 scales (B, h, S, 1))."""
    x = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
    return q, s


def quantize_kv_cache(cache):
    """Convert a full-precision decode cache {k, v: (L, B, h, ctx, d), ...}
    (from ``gpt_prefill``) to the int8 form {k, v: {q, s}, ...} consumed by
    ``gpt_decode_chunk_q(..., kv8=True)``. Slots past ``length`` hold
    garbage in both forms (masked by the live mask; overwritten as decode
    advances)."""
    kq, ks = _kv_row_quantize(cache["k"])
    vq, vs = _kv_row_quantize(cache["v"])
    return dict(cache, k={"q": kq, "s": ks}, v={"q": vq, "s": vs})


def _kv8_write(write_fn):
    """Lift a plain-array cache writer to the {q, s} representation."""

    def write(kd, vd, pos, k, v):
        kq, ks = _kv_row_quantize(k)
        vq, vs = _kv_row_quantize(v)
        q_k, q_v = write_fn(kd["q"], vd["q"], pos, kq, vq)
        s_k, s_v = write_fn(kd["s"], vd["s"], pos,
                            ks.astype(kd["s"].dtype),
                            vs.astype(vd["s"].dtype))
        return dict(kd, q=q_k, s=s_k), dict(vd, q=q_v, s=s_v)

    return write


def _kv8_attn(dt):
    """Attention over {q, s} caches: dequant fused into the operand read.
    Routes through the grouped decode attention so GQA caches (kv_heads <
    n_heads) are read at their grouped size."""
    from .gpt import _gqa_decode_attn

    def attn(q, kd, vd, mask):
        k = (kd["q"].astype(jnp.float32) * kd["s"]).astype(dt)
        v = (vd["q"].astype(jnp.float32) * vd["s"]).astype(dt)
        return _gqa_decode_attn(q, k, v, mask)

    return attn
