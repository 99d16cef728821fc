"""Decoder-only char-GPT: functional, jit-first, KV-cached decode.

Capability parity with the reference's ``gpt.py`` model stack
(/root/reference/gpt.py:154-215): pre-LN DecoderOnlyLayers (masked
self-attention + ReLU FFN, residuals), sinusoidal positions added at the
embedding, weight-tied output head (``head.W = tok.W^T``, gpt.py:362-364),
fused softmax-CE loss with ``dZ=(P-onehot)/N`` semantics.

TPU-first design:

- Parameters are a pytree with layers STACKED on a leading axis; the forward
  is a ``lax.scan`` over layers — one compiled layer body regardless of
  depth, MXU-shaped matmuls throughout.
- Gradients come from ``jax.grad`` flowing through the hand-derived
  ``custom_vjp`` closed forms of layer_norm/relu/sdpa (nn.functional) — the
  reference's manual backprop, as the actual autodiff rule.
- Decode uses the functional KV cache (fixed shapes, traced length): one
  compiled step serves every position — the capability the reference built
  but never wired in (its sampler recomputes the full forward per token,
  gpt.py:522-546).
"""

from __future__ import annotations

import dataclasses
import logging
import math
from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..nn.cache import fkv_advance, fkv_write
from ..nn.positional import alibi_slopes
from ..nn.functional import (
    causal_mask,
    geglu,
    gelu,
    layer_norm,
    relu,
    rope_rotate,
    rope_tables,
    sdpa,
    sinusoidal_encoding,
    swiglu,
)

__all__ = [
    "GPTConfig",
    "init_gpt_params",
    "gpt_apply",
    "gpt_loss",
    "gpt_prefill",
    "gpt_prefill_batched",
    "gpt_generate",
    "gpt_decode_step",
    "sample_token",
]

Params = Dict[str, Any]

_logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class GPTConfig:
    vocab_size: int
    d_model: int = 256
    n_heads: int = 4
    n_layers: int = 4
    d_ff: Optional[int] = None
    ctx_len: int = 256
    pos: str = "sinusoidal"  # "sinusoidal" | "rope" | "learned" | "alibi"
    dtype: str = "float32"  # compute dtype: "float32" or "bfloat16"
    # Grouped-query attention (Ainslie et al. 2023): K/V are projected to
    # n_kv_heads <= n_heads heads and each KV head serves a GROUP of
    # n_heads/n_kv_heads query heads. None = n_heads (standard MHA);
    # 1 = multi-query attention. Shrinks the KV cache (and its decode
    # HBM traffic — the long-context serving bottleneck) by the group
    # factor; training compute is unchanged.
    n_kv_heads: Optional[int] = None
    # Sliding-window attention (Mistral-style): each token attends to the
    # last ``window`` positions (itself included). None = full causal.
    # Bounds attention cost/KV state by the window instead of ctx_len;
    # with rope/alibi it enables UNBOUNDED streaming decode through a
    # ring-buffer cache (``gpt_stream_decode``) — no context rollover.
    window: Optional[int] = None
    # FFN nonlinearity: "relu" (reference transformer.py:148-154), "gelu",
    # or the GATED units "swiglu"/"geglu" (reference README.md:61,71
    # roadmap items, never built there). Gated configs carry an extra
    # (L, D, F) gate projection Wg/bg — at the default d_ff = 4*d_model
    # that is +1/3 FFN params (LLaMA-style 2/3 scaling is available via
    # d_ff if parameter parity matters).
    ffn: str = "relu"

    def __post_init__(self):
        if self.pos not in ("sinusoidal", "rope", "learned", "alibi"):
            raise ValueError(f"Unknown positional encoding: {self.pos!r}")
        if self.pos == "rope" and (self.d_model // self.n_heads) % 2 != 0:
            raise ValueError("RoPE requires an even head dimension")
        if self.dtype not in ("float32", "bfloat16"):
            raise ValueError(f"Unknown compute dtype: {self.dtype!r}")
        if self.n_kv_heads is not None and (
                self.n_kv_heads < 1
                or self.n_heads % self.n_kv_heads != 0):
            raise ValueError(
                "n_kv_heads must divide n_heads (each KV head serves an "
                "equal group of query heads)")
        if self.window is not None and self.window < 1:
            raise ValueError("window must be >= 1 (tokens always see "
                             "at least themselves)")
        if self.ffn not in ("relu", "gelu", "swiglu", "geglu"):
            raise ValueError(f"Unknown ffn: {self.ffn!r} (expected relu, "
                             "gelu, swiglu or geglu)")

    @property
    def dff(self) -> int:
        return self.d_ff if self.d_ff is not None else 4 * self.d_model

    @property
    def d_head(self) -> int:
        return self.d_model // self.n_heads

    @property
    def kv_heads(self) -> int:
        """Number of K/V heads (== n_heads unless GQA/MQA is on)."""
        return self.n_kv_heads if self.n_kv_heads is not None else self.n_heads

    @property
    def gated_ffn(self) -> bool:
        """True for the two-branch FFN variants (extra Wg/bg per layer)."""
        return self.ffn in ("swiglu", "geglu")

    @property
    def compute_dtype(self):
        """Mixed precision: params stay f32 masters (AdamW in f32); the
        forward/backward run in this dtype. bf16 halves the HBM traffic of
        weights/activations/residuals — the step is bandwidth-bound — and
        feeds the MXU its native input width."""
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


def init_gpt_params(cfg: GPTConfig, seed: int = 123) -> Params:
    """He-init attention/FFN weights, N(0, 0.02) embeddings, zero biases."""
    rng = np.random.default_rng(seed)
    D, F, L, V = cfg.d_model, cfg.dff, cfg.n_layers, cfg.vocab_size

    def he(fan_in, shape):
        return jnp.asarray(
            rng.normal(0.0, math.sqrt(2.0 / fan_in), size=shape), jnp.float32
        )

    KD = cfg.kv_heads * cfg.d_head  # K/V projection width (== D for MHA)
    layers = {
        "ln1_g": jnp.ones((L, D), jnp.float32),
        "ln1_b": jnp.zeros((L, D), jnp.float32),
        "Wq": he(D, (L, D, D)),
        "Wk": he(D, (L, D, KD)),
        "Wv": he(D, (L, D, KD)),
        "Wo": he(D, (L, D, D)),
        "ln2_g": jnp.ones((L, D), jnp.float32),
        "ln2_b": jnp.zeros((L, D), jnp.float32),
        "W1": he(D, (L, D, F)),
        "b1": jnp.zeros((L, F), jnp.float32),
        "W2": he(F, (L, F, D)),
        "b2": jnp.zeros((L, D), jnp.float32),
    }
    if cfg.gated_ffn:  # linear gate branch of swiglu/geglu
        layers["Wg"] = he(D, (L, D, F))
        layers["bg"] = jnp.zeros((L, F), jnp.float32)
    out = {
        "tok_W": jnp.asarray(rng.normal(0.0, 0.02, size=(V, D)), jnp.float32),
        "head_b": jnp.zeros((V,), jnp.float32),
        "layers": layers,
    }
    if cfg.pos == "learned":
        # GPT-2-style trainable position table (the L2 component
        # nn/positional.py::LearnedPositionalEmbedding as model params —
        # reference positional.py:36-89, built there but never wired)
        out["pos_W"] = jnp.asarray(
            rng.normal(0.0, 0.02, size=(cfg.ctx_len, D)), jnp.float32)
    return out


def _heads(x, h: int):
    B, T, D = x.shape
    return x.reshape(B, T, h, D // h).transpose(0, 2, 1, 3)


def _unheads(x):
    B, h, T, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, T, h * d)


def _gqa_expand(kv, n_heads: int):
    """Tile grouped K/V heads (B, hk, T, d) up to (B, n_heads, T, d).

    Used on the PARALLEL (training/prefill) paths so every attention
    backend (sdpa, flash, rings) sees equal head counts; the gradient of
    the repeat sums each group's dK/dV back into its shared head — exactly
    the GQA backward. The decode hot loop instead reads the grouped cache
    directly (``_gqa_decode_attn``) so cache HBM traffic stays hk/H-sized.
    """
    hk = kv.shape[1]
    if hk == n_heads:
        return kv
    return jnp.repeat(kv, n_heads // hk, axis=1)


def _gqa_decode_attn(q, k, v, mask):
    """Single-position attention against a GROUPED KV cache.

    q is (B, H, 1, d); k/v are (B, hk, S, d) with hk dividing H — the
    cache is read once at its grouped size (the whole point of GQA: the
    per-token HBM traffic shrinks by H/hk). ``mask`` is (B, 1|H, 1, S)
    additive. Plain einsums (no custom_vjp): decode never differentiates.
    """
    B, H, Tq, d = q.shape
    hk, S = k.shape[1], k.shape[2]
    if hk == H:
        return sdpa(q, k, v, mask)
    g = H // hk
    qg = q.reshape(B, hk, g * Tq, d)
    sc = jnp.einsum("bkgd,bksd->bkgs", qg, k) / math.sqrt(d)
    m = jnp.broadcast_to(mask, (B, H, Tq, S)).reshape(B, hk, g * Tq, S)
    p = jax.nn.softmax((sc + m).astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bkgs,bksd->bkgd", p, v)
    return out.reshape(B, H, Tq, d)


def _ffn_dense(lp, x, ffn: str = "relu"):
    """Position-wise FFN over one layer's weights, all variants.

    relu/gelu: the reference's 2-matmul MLP (transformer.py:148-154 with
    the activation swapped). swiglu/geglu: the gated two-branch form
    ``f(x @ W1 + b1, x @ Wg + bg) @ W2 + b2`` (Shazeer 2020) using the
    custom_vjp gated units of ``nn.functional`` — the hand-derived
    product-rule backward IS the gradient jax.grad returns.
    """
    u = x @ lp["W1"] + lp["b1"]
    if ffn in ("swiglu", "geglu"):
        gate_fn = swiglu if ffn == "swiglu" else geglu
        h = gate_fn(u, x @ lp["Wg"] + lp["bg"])
    else:
        h = gelu(u) if ffn == "gelu" else relu(u)
    return h @ lp["W2"] + lp["b2"]


def _layer(h_in, lp, mask, n_heads: int, attn_fn: Callable, rope=None,
           fused: bool = False, attn_btd: Optional[Callable] = None,
           n_kv: Optional[int] = None, ffn: str = "relu"):
    """One pre-LN decoder block (reference gpt.py:161-169).

    ``rope`` is an optional (cos, sin) pair of (T, d_head/2) tables; when
    given, Q/K are rotated per position (RoPE replaces the additive PE).

    ``fused=True`` routes the LN+QKV projections and the LN+FFN through
    the fused Pallas kernels (``nn.fused_layer``): the normalized
    activations and the (N, 4D) FFN hidden never round-trip HBM, and the
    custom backward recomputes them instead of saving residuals.

    ``attn_btd``, when set, is a fused (B, T, H*d)-layout attention
    (``nn.flash_btd``): the head split/merge relayouts disappear and the
    raw QKV projection outputs feed the kernel directly.

    ``n_kv`` (grouped-query attention) projects K/V into that many heads
    and tiles them up to ``n_heads`` for the attention backend; the
    RETURNED (k, v) — the prefill cache — stay at their grouped size.
    """
    n_kv = n_heads if n_kv is None else n_kv
    if attn_btd is not None and rope is None:
        xn = layer_norm(h_in, lp["ln1_g"], lp["ln1_b"])
        a = attn_btd(xn @ lp["Wq"], xn @ lp["Wk"], xn @ lp["Wv"]) @ lp["Wo"]
        h1 = h_in + a
        x2 = layer_norm(h1, lp["ln2_g"], lp["ln2_b"])
        f = _ffn_dense(lp, x2, ffn)
        return h1 + f, (None, None)
    if fused:
        from ..nn.fused_layer import ln_ffn, ln_qkv

        qf, kf, vf = ln_qkv(h_in, lp["ln1_g"], lp["ln1_b"],
                            lp["Wq"], lp["Wk"], lp["Wv"])
        q, k, v = _heads(qf, n_heads), _heads(kf, n_kv), _heads(vf, n_kv)
    else:
        xn = layer_norm(h_in, lp["ln1_g"], lp["ln1_b"])
        q = _heads(xn @ lp["Wq"], n_heads)
        k = _heads(xn @ lp["Wk"], n_kv)
        v = _heads(xn @ lp["Wv"], n_kv)
    if rope is not None:
        cos, sin = rope
        q = rope_rotate(q, cos, sin)
        k = rope_rotate(k, cos, sin)
    if getattr(attn_fn, "gqa_native", False):
        # the streaming kernel maps grouped KV heads to their query
        # groups in-kernel — never materialize the expanded K/V in HBM
        a = _unheads(attn_fn(q, k, v, mask)) @ lp["Wo"]
    else:
        a = _unheads(attn_fn(q, _gqa_expand(k, n_heads),
                             _gqa_expand(v, n_heads), mask)) @ lp["Wo"]
    h1 = h_in + a
    if fused:  # _pick_fused gates this path to ffn="relu"
        f = ln_ffn(h1, lp["ln2_g"], lp["ln2_b"],
                   lp["W1"], lp["b1"], lp["W2"], lp["b2"])
    else:
        x2 = layer_norm(h1, lp["ln2_g"], lp["ln2_b"])
        f = _ffn_dense(lp, x2, ffn)
    return h1 + f, (k, v)


def _pick_fused(B: int, T: int, cfg: "GPTConfig") -> bool:
    """Gate for the fused LN+QKV / LN+FFN Pallas kernels (opt-in).

    Measured A/B at the published config on the real chip (v5e,
    B=64 T=256 d512/4L, steady state): fused 22.4 vs unfused 18.2 ms/step
    f32, 16.8 vs 13.0 bf16 — XLA's own LN+matmul fusion plus its
    transpose-free backward beats the recompute-backward kernels here, so
    they stay OFF unless LINALG_TPU_FUSED_LN=1 (they win only when the
    activation row count makes LN residual traffic dominate, and the
    correctness suite keeps them honest for that regime)."""
    import os

    if cfg.kv_heads != cfg.n_heads:
        return False  # the fused QKV kernel assumes equal-width projections
    if cfg.window is not None:
        return False  # downstream attention must see the window mask
    if cfg.ffn != "relu":
        return False  # ln_ffn bakes in the relu MLP (no gate branch)
    if os.environ.get("LINALG_TPU_FUSED_LN", "") != "1":
        return False
    try:
        from ..nn.fused_layer import fused_supported
    except ImportError:  # pragma: no cover - environment-dependent
        return False
    return (jax.default_backend() == "tpu"
            and fused_supported(B * T, cfg.d_model,
                                cfg.d_ff or 4 * cfg.d_model))


# Measured btd-vs-rematted-sdpa crossover (tools/ab_btd.py, v5e, trainer
# cadence, T=256 H=4 d128): the kernel pays per-program overhead but
# removes ALL (B, H, T, T) HBM score traffic + head relayouts, so it wins
# once that traffic is large enough.  B=64: 13.4 vs 13.0 ms bf16 (loses);
# B=128: 25.0 vs 26.3 bf16 / 38.9 vs 41.1 f32 (wins); B=256: 51.3 vs 61.9
# bf16 (-17%) / 86.0 vs 89.1 f32.  Gate on the score-tensor element count.
_BTD_MIN_SCORE_ELEMS = 32 * 1024 * 1024  # ~B>=128 at the published config


def _pick_attn_btd(B: int, T: int, cfg: "GPTConfig"):
    """Fused (B, T, H*d)-layout attention for the short-context hot path.

    Eliminates the head relayouts AND the (B, H, T, T) HBM score traffic
    below the flash crossover (T < 512). Auto-enabled when the per-layer
    score tensor is big enough to pay for the kernel's per-program
    overhead (see the measured crossover above); ``LINALG_TPU_BTD_ATTN``
    =0/1 force it off/on for A/B runs. Correctness is pinned by
    tests/test_flash_btd.py in both regimes.
    """
    import os

    force = os.environ.get("LINALG_TPU_BTD_ATTN", "")
    if force == "0":
        return None
    if force != "1" and B * cfg.n_heads * T * T < _BTD_MIN_SCORE_ELEMS:
        return None
    if jax.default_backend() != "tpu" or cfg.pos == "rope":
        return None
    if not (T < 512 and T % 256 == 0):
        return None
    try:
        from ..nn.flash_btd import attention_btd, btd_supported
    except ImportError as e:  # pragma: no cover - environment-dependent
        _logger.warning("flash_btd unavailable (%s)", e)
        return None
    if not btd_supported(B, T, cfg.d_model, cfg.n_heads):
        return None
    return lambda q, k, v: attention_btd(q, k, v, cfg.n_heads, True)


# Rematted einsum sdpa: recompute the (B, H, T, T) probabilities in the
# backward instead of saving them across the layer scan (measured win at
# the published config, see _pick_attn). Shared by the short-context pick
# and the ALiBi path (the fused kernels don't thread an additive bias).
_REMAT_SDPA = jax.checkpoint(lambda q, k, v, mask: sdpa(q, k, v, mask))


def _pick_attn_cfg(cfg: "GPTConfig", T: int):
    """Config-aware attention pick: ALiBi forces the rematted sdpa (no
    kernel threads the per-head additive bias). Sliding-window uses the
    BANDED streaming kernel on TPU at long T — ``flash_attention_stream``
    skips block pairs behind the band at grid-build time, so windowed
    attention costs O(T*window) instead of the O(T^2) a masked sdpa
    would pay — and the rematted sdpa (whose mask carries the band)
    below the T=512 kernel crossover or off-TPU."""
    if cfg.pos == "alibi":
        return _REMAT_SDPA
    if cfg.window is not None:
        if T < 512 or jax.default_backend() != "tpu":
            return _REMAT_SDPA
        try:
            from ..nn.flash_stream import flash_attention_stream
        except ImportError as e:  # pragma: no cover
            _logger.warning("Pallas stream kernel unavailable (%s); "
                            "windowed attention falling to sdpa", e)
            return _REMAT_SDPA
        w = cfg.window
        Tp = ((T + 255) // 256) * 256
        if Tp == T:
            banded = lambda q, k, v, mask: flash_attention_stream(
                q, k, v, True, w)
        else:
            def banded(q, k, v, mask):
                pad = ((0, 0), (0, 0), (0, Tp - T), (0, 0))
                out = flash_attention_stream(
                    jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad),
                    True, w)
                return out[..., :T, :]

        banded.gqa_native = True  # stream reads grouped K/V directly
        return banded
    return _pick_attn(T, cfg.d_head)


def _pick_attn(T: int, d_head: int):
    """Fused Pallas attention on TPU when the tile fits VMEM, else sdpa.

    Below T=512 the einsum sdpa wins outright (measured fwd+bwd at the
    published config, bf16: sdpa 12.4 ms vs flash 14.0 ms at T=256 — the
    O(T^2) memory the flash kernel exists to avoid is still small, and
    XLA's fused softmax has less launch overhead); the crossover is
    between 256 and 512 (T=512: flash 14.7 vs sdpa 15.9).

    Ragged T: the kernels need T % 256 == 0, so any other length is
    right-padded to the next 256 multiple and the output sliced back.
    Right-padding is exact under the causal mask — real query rows i < T
    only attend to keys j <= i < T, so padded keys never contribute, and
    padded query rows' (finite) garbage is sliced off. Without this,
    e.g. T=8191 silently fell to sdpa and its ~2 GB score tensor.
    """
    if jax.default_backend() != "tpu":
        return sdpa
    if T < 512 or d_head < 8:
        # Short context: einsum sdpa, but REMATTED — the custom_vjp saves
        # the (B, H, T, T) probability tensor per layer (67 MB f32 at the
        # published config), and stacking it across the scan costs more
        # HBM than recomputing softmax in the backward. Measured at the
        # published config (chained trainer step): f32 18.2 -> 16.1
        # ms/step; bf16 unchanged (12.9 vs 13.0 — the bf16 residual is
        # half the bytes and XLA hides it). qkv-concat and (B,T,H,d)
        # layout variants were also measured and LOSE (19.0 / 16.0+ ms).
        return _REMAT_SDPA
    try:
        from ..nn.flash import FLASH_MAX_T, flash_attention
        from ..nn.flash_long import flash_attention_long
        from ..nn.flash_stream import flash_attention_stream
    except ImportError as e:  # pragma: no cover - environment-dependent
        # a broken Pallas install must be VISIBLE, not a silent 10-100x
        # slowdown (and OOM at long T) on the sdpa path
        _logger.warning("Pallas flash kernels unavailable (%s); "
                        "falling back to sdpa", e)
        return sdpa
    Tp = ((T + 255) // 256) * 256
    if Tp <= FLASH_MAX_T:
        fn = flash_attention
    elif Tp <= 4096:
        # flash_long wins below ~4k (0.86 vs 1.71 ms fwd+bwd at T=4096);
        # at 8192 the streaming kernel is faster (4.5 vs 5.8 ms f+b)
        # and compiles in seconds where flash_long takes ~4 minutes,
        # so stream takes over beyond 4096.
        fn = flash_attention_long
    else:
        fn = flash_attention_stream
    if Tp == T:
        wrapped = lambda q, k, v, mask: fn(q, k, v, True)
    else:
        wrapped = _padded_attn(fn, T, Tp)
    # the streaming kernel consumes grouped K/V directly (GQA-native);
    # flash/flash_long need the expanded heads
    wrapped.gqa_native = fn is flash_attention_stream
    return wrapped


def _padded_attn(fn, T: int, Tp: int):
    """Wrap a causal T%256==0 attention kernel to serve ragged T < Tp."""

    def padded(q, k, v, mask):
        pad = ((0, 0), (0, 0), (0, Tp - T), (0, 0))
        out = fn(jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad), True)
        return out[..., :T, :]

    return padded


def _embed(params: Params, x_ids, cfg: GPTConfig, T: int):
    """Token embedding plus positions: (h, rope_tables-or-None).

    Sinusoidal PE is added to the embedding (reference gpt.py:362-364);
    RoPE instead returns per-position Q/K rotation tables for the layers.
    """
    if cfg.pos == "rope":
        return params["tok_W"][x_ids], rope_tables(cfg.d_head, jnp.arange(T))
    if cfg.pos == "alibi":
        # position enters ONLY through the per-head score bias
        return params["tok_W"][x_ids], None
    if cfg.pos == "learned":
        pe = params["pos_W"][:T]
    else:
        pe = sinusoidal_encoding(cfg.ctx_len, cfg.d_model)[:T]
    return params["tok_W"][x_ids] + pe[None], None


def _trunk_mask(cfg: "GPTConfig", T: int, dt) -> jnp.ndarray:
    """Additive attention mask for the parallel (training/prefill) paths.

    Causal (T, T) by default; ``pos="alibi"`` folds the per-head distance
    bias ``slope_h * (j - i)`` in, giving (H, T, T) — sdpa broadcasts it
    against (B, H, T, T) scores. The bias is purely relative, so it is
    also correct for left-padded batched prefill (a shared shift cancels
    in j - i); pad positions stay at -1e9. ``cfg.window`` additionally
    bans keys further than window-1 behind the query (sliding-window
    attention).
    """
    m = causal_mask(T, dtype=dt)  # (1, 1, T, T)
    if cfg.window is not None:
        i = jnp.arange(T)
        far = (i[:, None] - i[None, :]) >= cfg.window  # query i, key j
        m = jnp.where(far[None, None], jnp.asarray(-1e9, dt), m)
    if cfg.pos == "alibi":
        sl = alibi_slopes(cfg.n_heads)
        i = jnp.arange(T)
        bias = sl[:, None, None] * (i[None, None, :] - i[None, :, None])
        m = m + bias.astype(dt)[None]  # (1, H, T, T)
    return m


def _alibi_decode_bias(cfg: "GPTConfig", t_ids, pos, dt):
    """(H, 1, ctx) additive bias for one cached decode position, or 0.

    The query sits at cache slot ``pos``; key slot j contributes
    ``slope_h * (j - pos)``. Slots beyond the live length are already at
    -1e9 in the decode mask, so the (positive-bias) j > pos region is
    inert.
    """
    if cfg.pos != "alibi":
        return jnp.zeros((), dt)
    sl = alibi_slopes(cfg.n_heads)
    return (sl[:, None, None]
            * (t_ids - pos)[None, None, :].astype(jnp.float32)).astype(dt)


def _gpt_trunk(params: Params, x_ids, cfg: GPTConfig,
               attn_fn: Optional[Callable] = None) -> jnp.ndarray:
    """Embedding + layer stack: token ids (B, T) -> final hidden (B, T, D)
    in the compute dtype (everything except the tied head)."""
    T = x_ids.shape[-1]
    gqa = cfg.kv_heads != cfg.n_heads
    attn_btd = None
    if attn_fn is None:
        if cfg.pos != "alibi" and not gqa and cfg.window is None:
            # the (B, T, H*d)-layout kernel consumes the raw QKV
            # projections (no head split), so it can't group K/V heads
            # and bakes in a pure causal mask (no window band)
            attn_btd = _pick_attn_btd(x_ids.shape[0], T, cfg)
        attn_fn = _pick_attn_cfg(cfg, T)
    h, rope = _embed(params, x_ids, cfg, T)

    dt = cfg.compute_dtype
    h = h.astype(dt)
    if rope is not None:
        rope = (rope[0].astype(dt), rope[1].astype(dt))
    mask = _trunk_mask(cfg, T, dt)
    layers = jax.tree.map(lambda w: w.astype(dt), params["layers"])
    fused = (not gqa) and _pick_fused(x_ids.shape[0], T, cfg)

    def body(carry, lp):
        out, _ = _layer(carry, lp, mask, cfg.n_heads, attn_fn, rope, fused,
                        attn_btd, n_kv=cfg.kv_heads, ffn=cfg.ffn)
        return out, None

    # NOTE: jax.checkpoint(body) here saves ~5% step time (the step is
    # HBM-bandwidth-bound: ~6 GB accessed vs 314 GFLOP at the published
    # config) but blows the train-step compile from ~6 s to ~250 s on this
    # runtime (remat of a scan body containing a Pallas custom_vjp), so it
    # is deliberately NOT applied.
    h, _ = lax.scan(body, h, layers)
    return h


def gpt_apply(params: Params, x_ids, cfg: GPTConfig,
              attn_fn: Optional[Callable] = None) -> jnp.ndarray:
    """Forward pass: token ids (B, T) -> logits (B, T, V). Weight-tied head.

    ``attn_fn`` defaults to the fused Pallas flash kernel on TPU (causal) and
    the einsum sdpa elsewhere; pass ``sdpa`` explicitly to force the naive
    path.
    """
    h = _gpt_trunk(params, x_ids, cfg, attn_fn)
    dt = cfg.compute_dtype
    logits = h @ params["tok_W"].T.astype(dt) + params["head_b"].astype(dt)
    return logits.astype(jnp.float32)  # CE runs in f32 for stability


# Vocabularies at least this wide take the chunked-CE path: the full
# (B*T, V) logits tensor (which autodiff would also SAVE for backward)
# stops fitting comfortably once BPE vocabs reach the tens of thousands.
CE_CHUNK_THRESHOLD = 8192


def gpt_loss(params: Params, x_ids, y_ids, cfg: GPTConfig,
             attn_fn: Optional[Callable] = None) -> jnp.ndarray:
    """Mean softmax cross-entropy over all positions (reference
    transformer.py:876-893 fused loss semantics).

    Small vocabularies use plain logits + logsumexp (XLA fuses this well
    at V=65); wide ones (>= CE_CHUNK_THRESHOLD, e.g. large BPE vocabs)
    stream the tied head through the chunked fused CE so the (B*T, V)
    logits tensor is never materialized (``nn.losses``).
    """
    if cfg.vocab_size >= CE_CHUNK_THRESHOLD:
        from ..nn.losses import chunked_softmax_ce

        h = _gpt_trunk(params, x_ids, cfg, attn_fn)
        return chunked_softmax_ce(h, params["tok_W"], params["head_b"],
                                  y_ids)
    logits = gpt_apply(params, x_ids, cfg, attn_fn)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, y_ids[..., None], axis=-1)[..., 0]
    return jnp.mean(logz - gold)


# ---------------------------------------------------------------------------
# KV-cached decode
# ---------------------------------------------------------------------------


def init_decode_cache(cfg: GPTConfig, batch: int = 1) -> Dict[str, jnp.ndarray]:
    from ..nn.cache import fkv_init

    return fkv_init(cfg.n_layers, batch, cfg.kv_heads, cfg.ctx_len,
                    cfg.d_head, dtype=cfg.compute_dtype)


@partial(jax.jit, static_argnames=("cfg",))
def gpt_prefill(params: Params, x_ids, cfg: GPTConfig, length=None):
    """Run the full prompt, returning (last-position logits, filled cache).

    x_ids is (B, T) with T <= ctx_len; cache K/V buffers are ctx_len-sized.

    ``length`` (dynamic, optional) is the true prompt length when x_ids is
    right-padded to a fixed T: every distinct T is a separate XLA compile,
    so the sampler pads all prompts to one shape and passes the real length
    here.  Causality makes the pad positions inert — no real position
    attends to a pad (pads sit to the right), the returned logits are read
    at position ``length-1``, and decode overwrites pad K/V slots in order
    before the length-mask would ever expose them.
    """
    B, T = x_ids.shape
    h, rope = _embed(params, x_ids, cfg, T)
    # mixed precision mirrors gpt_apply: bf16 weights/activations (and a
    # bf16 KV cache — decode traffic halves), f32 logits
    dt = cfg.compute_dtype
    h = h.astype(dt)
    if rope is not None:
        rope = (rope[0].astype(dt), rope[1].astype(dt))
    mask = _trunk_mask(cfg, T, dt)
    layers = jax.tree.map(lambda w: w.astype(dt), params["layers"])

    def body(carry, lp):
        out, (k, v) = _layer(carry, lp, mask, cfg.n_heads, sdpa, rope,
                             n_kv=cfg.kv_heads, ffn=cfg.ffn)
        return out, (k, v)

    h, (K, V) = lax.scan(body, h, layers)
    if length is None:
        last = h[:, -1]
        n = jnp.asarray(T, jnp.int32)
    else:
        n = jnp.asarray(length, jnp.int32)
        last = h[jnp.arange(B), n - 1]
    logits = (last @ params["tok_W"].T.astype(dt)
              + params["head_b"].astype(dt)).astype(jnp.float32)

    pad = cfg.ctx_len - T
    K = jnp.pad(K, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
    V = jnp.pad(V, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
    cache = {"k": K, "v": V, "length": n}
    return logits, cache


@partial(jax.jit, static_argnames=("cfg",))
def gpt_prefill_batched(params: Params, x_ids, start, cfg: GPTConfig):
    """Batched serving prefill: LEFT-padded prompts, per-sequence starts.

    x_ids is (B, W) with each prompt right-aligned (content in
    [start[b], W)); left-padding aligns every sequence's END, so the whole
    batch shares ONE decode position — the fixed-shape cache keeps its
    scalar length and each decode step serves all B sequences at once.
    The per-sequence ``start`` rides in the cache and masks the pad slots
    out of every subsequent attention.
    """
    B, W = x_ids.shape
    dt = cfg.compute_dtype
    start = jnp.asarray(start, jnp.int32)
    cols = jnp.arange(W)
    # left-padding shifts the window: sequence b's token at column t sits
    # at LOGICAL position t - start[b] — index every positional encoding
    # with that (clipped at 0 for the masked pad columns)
    pos_idx = jnp.maximum(cols[None, :] - start[:, None], 0)  # (B, W)
    rope = None
    if cfg.pos == "rope":
        h = params["tok_W"][x_ids]
        c, s_ = rope_tables(cfg.d_head, pos_idx)  # (B, W, d/2)
        rope = (c[:, None].astype(dt), s_[:, None].astype(dt))
    elif cfg.pos == "alibi":
        h = params["tok_W"][x_ids]
    else:
        pe = (params["pos_W"] if cfg.pos == "learned"
              else sinusoidal_encoding(cfg.ctx_len, cfg.d_model))
        h = params["tok_W"][x_ids] + pe[pos_idx]
    h = h.astype(dt)
    live = (cols[None, :, None] >= cols[None, None, :]) & (
        cols[None, None, :] >= start[:, None, None])  # causal & >= start
    if cfg.window is not None:
        # columns share the left-pad shift, so the band is column-relative
        live &= (cols[None, :, None] - cols[None, None, :]) < cfg.window
    mask = jnp.where(live, 0.0, -1e9).astype(dt)[:, None]  # (B, 1, W, W)
    if cfg.pos == "alibi":
        # relative bias: the shared left-pad shift cancels in (j - i)
        sl = alibi_slopes(cfg.n_heads)
        bias = sl[:, None, None] * (
            cols[None, None, :] - cols[None, :, None]).astype(jnp.float32)
        mask = mask + bias.astype(dt)[None]  # (B, H, W, W)
    layers = jax.tree.map(lambda w: w.astype(dt), params["layers"])

    def body(carry, lp):
        out, (k, v) = _layer(carry, lp, mask, cfg.n_heads, sdpa, rope,
                             n_kv=cfg.kv_heads, ffn=cfg.ffn)
        return out, (k, v)

    h, (K, V) = lax.scan(body, h, layers)
    logits = (h[:, -1] @ params["tok_W"].T.astype(dt)
              + params["head_b"].astype(dt)).astype(jnp.float32)
    pad = cfg.ctx_len - W
    K = jnp.pad(K, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
    V = jnp.pad(V, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
    cache = {"k": K, "v": V, "length": jnp.asarray(W, jnp.int32),
             "start": start}
    return logits, cache


def gpt_generate(params: Params, cfg: GPTConfig, prompts, n_tokens: int,
                 temperature: float = 1.0, top_k: int = 0,
                 top_p: float = 0.0, seed: int = 0):
    """Batched generation (the serving entry point): ragged prompts in,
    (B, n_tokens) sampled ids out, ONE model pass per decode chunk for the
    whole batch.

    ``prompts`` is a list/array of token-id sequences of any lengths; they
    are left-padded to one fixed window (aligned ends — every XLA shape
    compiles once regardless of batch composition) and decoded together.
    """
    import numpy as _np

    prompts = [
        _np.asarray(p, dtype=_np.int32).ravel()[-(cfg.ctx_len - n_tokens):]
        for p in prompts
    ]
    if n_tokens >= cfg.ctx_len:
        raise ValueError("n_tokens must be < ctx_len (cache capacity)")
    B = len(prompts)
    W = cfg.ctx_len - n_tokens
    buf = _np.zeros((B, W), dtype=_np.int32)
    start = _np.empty((B,), dtype=_np.int32)
    for b, p in enumerate(prompts):
        if len(p) == 0:
            raise ValueError(f"prompt {b} is empty")
        start[b] = W - len(p)
        buf[b, start[b]:] = p
    from .moe import MoEGPTConfig

    if isinstance(cfg, MoEGPTConfig):
        from .moe import moe_decode_chunk as decode_chunk
        from .moe import moe_prefill_batched as prefill_batched
    else:
        decode_chunk, prefill_batched = gpt_decode_chunk, gpt_prefill_batched
    logits, cache = prefill_batched(params, jnp.asarray(buf),
                                    jnp.asarray(start), cfg)
    toks, _, _ = decode_chunk(params, cache, logits,
                              jax.random.PRNGKey(seed), cfg, n_tokens,
                              temperature, top_k, top_p)
    return toks  # (B, n_tokens)


@partial(jax.jit, static_argnames=("cfg",))
def gpt_decode_step(params: Params, cache, token, cfg: GPTConfig):
    """One incremental decode step: token (B,) -> (logits (B, V), cache').

    Attention reads the fixed-shape cache masked beyond the live length —
    O(T) per token instead of the reference sampler's O(T^2 L) full forward.
    """
    B = token.shape[0]
    pos = cache["length"]
    dt = cfg.compute_dtype
    # batched left-padded caches carry a per-sequence ``start``: cache
    # slots before it are pad garbage (masked out below), and the token's
    # LOGICAL position is pos - start[b] for every positional encoding
    start = cache.get("start", jnp.zeros((), jnp.int32))
    rel = jnp.atleast_1d(pos - start)  # (1,) unbatched, (B,) batched
    if cfg.pos == "rope":
        h = params["tok_W"][token][:, None, :]
        c, s_ = rope_tables(cfg.d_head, rel[:, None])  # (1|B, 1, d/2)
        rope = (c[:, None].astype(dt), s_[:, None].astype(dt))
    elif cfg.pos == "alibi":
        h = params["tok_W"][token][:, None, :]
        rope = None
    else:
        pe = (params["pos_W"] if cfg.pos == "learned"
              else sinusoidal_encoding(cfg.ctx_len, cfg.d_model))
        h = params["tok_W"][token][:, None, :] + pe[rel][:, None, :]
        rope = None
    h = h.astype(dt)
    layers = jax.tree.map(lambda w: w.astype(dt), params["layers"])

    t_ids = jnp.arange(cfg.ctx_len)
    # position p attends to cache slots <= pos (itself included at slot pos)
    live = (t_ids[None, :] <= pos) & (
        t_ids[None, :] >= jnp.atleast_1d(start)[:, None])
    if cfg.window is not None:
        live &= t_ids[None, :] > pos - cfg.window
    attn_mask = (jnp.where(live, 0.0, -1e9).astype(dt)[:, None, None, :]
                 + _alibi_decode_bias(cfg, t_ids, pos, dt))

    def body(carry, xs):
        h_in = carry
        lp, k_l, v_l = xs
        xn = layer_norm(h_in, lp["ln1_g"], lp["ln1_b"])
        q = _heads(xn @ lp["Wq"], cfg.n_heads)
        k = _heads(xn @ lp["Wk"], cfg.kv_heads)
        v = _heads(xn @ lp["Wv"], cfg.kv_heads)
        if rope is not None:
            cos, sin = rope
            q = rope_rotate(q, cos, sin)
            k = rope_rotate(k, cos, sin)  # cached keys are stored rotated
        k_l, v_l = fkv_write(k_l, v_l, pos, k, v)
        a = _unheads(_gqa_decode_attn(q, k_l, v_l, attn_mask)) @ lp["Wo"]
        h1 = h_in + a
        f = _ffn_dense(lp, layer_norm(h1, lp["ln2_g"], lp["ln2_b"]),
                       cfg.ffn)
        return h1 + f, (k_l, v_l)

    h, (K, V) = lax.scan(body, h, (layers, cache["k"], cache["v"]))
    logits = (h[:, -1] @ params["tok_W"].T.astype(dt)
              + params["head_b"].astype(dt)).astype(jnp.float32)
    new_cache = fkv_advance(dict(cache, k=K, v=V, length=pos), 1)
    return logits, new_cache


def filter_logits(logits, temperature=1.0, top_k=0, top_p=0.0):
    """Temperature/top-k/top-p transform shared by ``sample_token`` and the
    speculative verifier (which needs the full TARGET distribution, not
    just a sample, for its accept/resample step).

    ``top_k`` is either a static python int (one lowered ``lax.top_k``
    shape) or a traced per-row vector — the serve engine passes (B, 1)
    per-slot k's. The vector path reads the k-th largest value off a full
    descending sort, which costs nothing extra here: the top-p branch
    below already pays a full-V sort unconditionally. k <= 0 disables
    filtering for that row.
    """
    z = logits / jnp.maximum(1e-6, temperature)
    if isinstance(top_k, (int, np.integer)):
        if top_k > 0:
            kth = lax.top_k(z, top_k)[0][..., -1:]
            z = jnp.where(z < kth, -1e9, z)
    else:
        k = jnp.asarray(top_k, jnp.int32)
        k = k.reshape(k.shape + (1,) * (z.ndim - k.ndim))  # (B,) -> (B, 1)
        zs = lax.top_k(z, z.shape[-1])[0]  # descending
        kth = jnp.take_along_axis(
            zs, jnp.clip(k, 1, z.shape[-1]) - 1, axis=-1)
        z = jnp.where((k > 0) & (z < kth), -1e9, z)
    V = z.shape[-1]
    p_eff = jnp.where((top_p > 0.0) & (top_p < 1.0), top_p, 1.0)
    probs = jax.nn.softmax(z, axis=-1)
    sp = lax.top_k(probs, V)[0]  # sorted descending
    csum = jnp.cumsum(sp, axis=-1)
    # keep tokens whose EXCLUSIVE cumulative mass is < p (the minimal set
    # whose inclusive mass reaches p); threshold = smallest kept prob
    keep = (csum - sp) < p_eff
    thr = jnp.min(jnp.where(keep, sp, jnp.inf), axis=-1, keepdims=True)
    return jnp.where(probs >= thr, z, -1e9)


def sample_token(key, logits, temperature=1.0, top_k: int = 0, top_p=0.0):
    """Temperature + top-k categorical sampling (reference gpt.py:535-541),
    plus nucleus (top-p) sampling: keep the smallest probability mass
    >= top_p (Holtzman et al. 2019; the reference has top-k only).
    ``top_p`` is traced — 0 (or >= 1) disables it with no extra compile."""
    z = filter_logits(logits, temperature, top_k, top_p)
    return jax.random.categorical(key, z, axis=-1)


def _dt_decode_ops(params: Params, cfg: GPTConfig) -> Dict[str, Any]:
    """Hoisted full-precision decode ops for ``_decode_chunk_core``.

    Everything loop-invariant — the PE table, the compute-dtype casts of
    all weights, and a concatenated (D, 3D) QKV matrix — is computed ONCE
    per chunk instead of once per token, and the three QKV matvecs fuse
    into one. XLA does not hoist these out of the scan on its own;
    measured on the v5e this is the difference between ~0.9k and ~8k
    tok/s single-stream.

    ``models.quant._q_decode_ops`` is the int8 weight-only twin; the two
    share the scan skeleton via ``_decode_chunk_core``.
    """
    dt = cfg.compute_dtype
    layers = jax.tree.map(lambda w: w.astype(dt), params["layers"])
    W3 = jnp.concatenate(
        [layers["Wq"], layers["Wk"], layers["Wv"]],
        axis=-1)  # (L, D, D + 2*kv_heads*d_head)
    tokW = params["tok_W"].astype(dt)
    head_b = params["head_b"].astype(dt)
    pe = None
    if cfg.pos not in ("rope", "alibi"):
        pe = (params["pos_W"] if cfg.pos == "learned"
              else sinusoidal_encoding(cfg.ctx_len, cfg.d_model)).astype(dt)
    lws = {"lp": layers, "W3": W3}
    if cfg.gated_ffn:
        # fuse the up + gate branches into ONE (D, 2F) matvec per token
        # (same hoisting story as the QKV concat above)
        lws["W1g"] = jnp.concatenate([layers["W1"], layers["Wg"]], axis=-1)
        lws["b1g"] = jnp.concatenate([layers["b1"], layers["bg"]], axis=-1)
        F = cfg.dff
        gate_fn = swiglu if cfg.ffn == "swiglu" else geglu

        def ffn(lw, x2):
            ug = x2 @ lw["W1g"] + lw["b1g"]  # (B, 1, 2F)
            h = gate_fn(ug[..., :F], ug[..., F:])
            return h @ lw["lp"]["W2"] + lw["lp"]["b2"]
    else:
        act = gelu if cfg.ffn == "gelu" else relu

        def ffn(lw, x2):
            return (act(x2 @ lw["lp"]["W1"] + lw["lp"]["b1"])
                    @ lw["lp"]["W2"] + lw["lp"]["b2"])
    return {
        # per-layer pytree scanned over L; lw below is one layer's slice
        "lws": lws,
        "embed": lambda token: tokW[token][:, None, :],
        # clamp: a serving slot's position may grow past the table while it
        # idles (output discarded); the clamp just keeps the gather in range
        "pe": (None if pe is None else
               lambda rel: pe[jnp.minimum(rel, cfg.ctx_len - 1)][:, None, :]),
        "ln1": lambda lw, x: layer_norm(x, lw["lp"]["ln1_g"],
                                        lw["lp"]["ln1_b"]),
        "qkv": lambda lw, xn: xn @ lw["W3"],
        "out": lambda lw, y: y @ lw["lp"]["Wo"],
        "ln2": lambda lw, x: layer_norm(x, lw["lp"]["ln2_g"],
                                        lw["lp"]["ln2_b"]),
        "ffn": ffn,
        "head": lambda h: (h @ tokW.T + head_b).astype(jnp.float32),
    }


def _make_decode_step(cfg: GPTConfig, ops, start, write_fn):
    """One-token decode step factory shared by the sampling chunk scan
    (``_decode_chunk_core``) and beam search (``models.beam``).

    Returns ``decode_step(kbuf, vbuf, pos, token) -> (K, V, logits)``:
    embed ``token`` at position ``pos`` (scalar shared position or per-row
    vector), run the layer stack against the KV cache, write the new K/V
    via ``write_fn``, and return the next-token logits.
    """
    dt = cfg.compute_dtype
    D = cfg.d_model
    KD = cfg.kv_heads * cfg.d_head
    t_ids = jnp.arange(cfg.ctx_len)
    start1 = jnp.atleast_1d(start)
    slopes = alibi_slopes(cfg.n_heads) if cfg.pos == "alibi" else None
    attn = ops.get("attn") or _gqa_decode_attn
    # position-aware attention backends (the Pallas paged kernels bound
    # their page walk by the slot position) opt in via this marker
    wants_pos = getattr(attn, "wants_pos", False)

    def decode_step(kbuf, vbuf, pos, token):
        rel = jnp.atleast_1d(pos - start)
        if cfg.pos == "rope":
            h = ops["embed"](token)
            c, s_ = rope_tables(cfg.d_head, rel[:, None])
            rope = (c[:, None].astype(dt), s_[:, None].astype(dt))
        elif cfg.pos == "alibi":
            h = ops["embed"](token)
            rope = None
        else:
            h = ops["embed"](token) + ops["pe"](rel)
            rope = None
        h = h.astype(dt)
        pos1 = jnp.atleast_1d(pos)
        live = (t_ids[None, :] <= pos1[:, None]) & (
            t_ids[None, :] >= start1[:, None])
        if cfg.window is not None:
            live &= t_ids[None, :] > pos1[:, None] - cfg.window
        mask = jnp.where(live, 0.0, -1e9).astype(dt)[:, None, None, :]
        if slopes is not None:
            # key slot j vs the query at ``pos``: slope_h * (j - pos);
            # j > pos is inert under the -1e9 of the live mask
            bias = (slopes[None, :, None, None]
                    * (t_ids[None, :] - pos1[:, None]).astype(jnp.float32)
                    [:, None, None, :])
            mask = mask + bias.astype(dt)

        def body(carry, xs):
            h_in = carry
            lw, k_l, v_l = xs
            xn = ops["ln1"](lw, h_in)
            qkv = ops["qkv"](lw, xn)
            q = _heads(qkv[..., :D], cfg.n_heads)
            k = _heads(qkv[..., D:D + KD], cfg.kv_heads)
            v = _heads(qkv[..., D + KD:], cfg.kv_heads)
            if rope is not None:
                q = rope_rotate(q, rope[0], rope[1])
                k = rope_rotate(k, rope[0], rope[1])
            k_l, v_l = write_fn(k_l, v_l, pos, k, v)
            a_raw = (attn(q, k_l, v_l, mask, pos1) if wants_pos
                     else attn(q, k_l, v_l, mask))
            a = ops["out"](lw, _unheads(a_raw))
            h1 = h_in + a
            f = ops["ffn"](lw, ops["ln2"](lw, h1))
            return h1 + f, (k_l, v_l)

        h2, (K, V) = lax.scan(body, h, (ops["lws"], kbuf, vbuf))
        return K, V, ops["head"](h2[:, -1])

    return decode_step


def _decode_chunk_core(cfg: GPTConfig, ops, logits, kbuf, vbuf, pos0, start,
                       key, n_tokens: int, temperature, top_k: int, top_p,
                       write_fn):
    """Shared sample->decode-step scan under every decode chunk.

    Each host dispatch costs a ~40 ms round trip on this runtime, so the
    whole loop runs as a lax.scan on device; only the final (tokens,
    logits, cache) cross the host boundary per chunk.

    Parameterized over the weight representation (``ops``, see
    ``_dt_decode_ops`` / ``models.quant``), the cache-position model
    (``pos0``/``start`` scalar = one shared decode position as in
    ``gpt_prefill[_batched]``; vectors = per-slot positions as in the
    continuous-batching engine), and the cache-write primitive
    (``fkv_write`` vs the per-slot ``fkv_write_slots``). ``temperature``/
    ``top_p`` may be scalars or per-row (B, 1) vectors.

    ``kbuf``/``vbuf`` may be any pytree the (write_fn, ops["attn"]) pair
    agrees on — the int8 KV cache passes {q, s} dicts; plain arrays use
    the default ``sdpa`` consumer.
    """
    decode_step = _make_decode_step(cfg, ops, start, write_fn)

    def outer(carry, k):
        lg, kb, vb, pos = carry
        tok = jax.random.categorical(
            k, filter_logits(lg, temperature, top_k, top_p), axis=-1)
        kb, vb, new_logits = decode_step(kb, vb, pos, tok)
        return (new_logits, kb, vb, pos + 1), tok

    keys = jax.random.split(key, n_tokens)
    (logits, K, V, pos), toks = lax.scan(
        outer, (logits, kbuf, vbuf, pos0), keys)
    return toks.T, logits, K, V, pos  # toks: (B, n)


@partial(jax.jit, static_argnames=("cfg", "n_tokens", "top_k"))
def gpt_decode_chunk(params, cache, logits, key, cfg: GPTConfig,
                     n_tokens: int, temperature=1.0, top_k: int = 0,
                     top_p=0.0):
    """Sample ``n_tokens`` autoregressively in ONE device computation.

    The step body is the hand-hoisted twin of ``gpt_decode_step``
    (equality pinned by tests); see ``_decode_chunk_core`` /
    ``_dt_decode_ops`` for the hoisting story.
    """
    ops = _dt_decode_ops(params, cfg)
    start = cache.get("start", jnp.zeros((), jnp.int32))
    toks, logits, K, V, pos = _decode_chunk_core(
        cfg, ops, logits, cache["k"], cache["v"], cache["length"], start,
        key, n_tokens, temperature, top_k, top_p, fkv_write)
    return toks, logits, dict(cache, k=K, v=V, length=pos)
