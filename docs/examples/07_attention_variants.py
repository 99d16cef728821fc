"""Walkthrough 07 — serving-oriented attention variants.

The reference has exactly one attention: full-causal MHA with equal Q/K/V
head counts (/root/reference/ai_comps/attention.py:98-264). Production
serving on TPU wants three independent knobs on top of the same math, and
this framework wires each through training, decoding, and the serve
engine:

1. GROUPED-QUERY ATTENTION (``n_kv_heads``): K/V are projected to fewer
   heads and each serves a group of query heads. The KV cache — whose
   per-token HBM read is the long-context decode bottleneck — shrinks by
   the group factor (measured 3.6x decode throughput at ctx 4096,
   BASELINE.md). The oracle: a GQA model equals the MHA model whose Wk/Wv
   tile each grouped block, forward and backward.

2. SLIDING-WINDOW ATTENTION (``window``): each token attends to the last
   N positions only (Mistral-style banded causal mask). Attention cost
   and live KV state become O(window), independent of ctx_len.

3. STREAMING RING DECODE (``models/stream.py``): with a window and a
   relative positional encoding (rope/alibi), decode needs only a
   window-sized RING of KV rows — each new token overwrites the row that
   just slid out of every future window. Absolute positions are
   unbounded, so generation runs arbitrarily far past ctx_len with no
   context rollover, while staying EXACTLY the windowed model's forward
   (RoPE keys are stored rotated at their absolute position; the rotary
   dot depends only on the distance, so slot reuse is exact).

4. PREFIX CACHING (``ServeEngine.register_prefix``): a shared system
   prompt is prefilled once; each request's admission copies the cached
   KV and block-extends it with just the suffix.

Runs on CPU; every section asserts its exactness claim.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))  # repo root, so the walkthrough runs standalone

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from linalg_tpu.models.gpt import (
    GPTConfig,
    gpt_apply,
    gpt_prefill,
    init_gpt_params,
)

rng = np.random.default_rng(0)

# --- 1. GQA == block-tiled MHA twin ---------------------------------------
cfg_gqa = GPTConfig(vocab_size=31, d_model=64, n_heads=4, n_layers=2,
                    ctx_len=32, n_kv_heads=2)
params = init_gpt_params(cfg_gqa, seed=0)
x = jnp.asarray(rng.integers(0, 31, (2, 12)), jnp.int32)

# tile each grouped K/V head block once per query head -> an ordinary MHA
d = cfg_gqa.d_head
g = cfg_gqa.n_heads // cfg_gqa.kv_heads


def tile(W):
    blocks = [W[..., i * d:(i + 1) * d] for i in range(cfg_gqa.kv_heads)]
    return jnp.concatenate([b for blk in blocks for b in [blk] * g], axis=-1)


mha_params = dict(params, layers=dict(params["layers"],
                                      Wk=tile(params["layers"]["Wk"]),
                                      Wv=tile(params["layers"]["Wv"])))
cfg_mha = GPTConfig(vocab_size=31, d_model=64, n_heads=4, n_layers=2,
                    ctx_len=32)
np.testing.assert_allclose(np.asarray(gpt_apply(params, x, cfg_gqa)),
                           np.asarray(gpt_apply(mha_params, x, cfg_mha)),
                           atol=1e-10)
print("1. GQA(kv=2) forward == block-tiled MHA twin  [exact]")
print(f"   KV cache: {cfg_gqa.kv_heads}/{cfg_gqa.n_heads} heads "
      f"-> {g}x smaller, {g}x less decode HBM read")

# --- 2. sliding window == banded-mask oracle ------------------------------
from linalg_tpu.nn.functional import causal_mask, sdpa

cfg_win = GPTConfig(vocab_size=31, d_model=64, n_heads=4, n_layers=2,
                    ctx_len=32, window=5, pos="rope")
params_w = init_gpt_params(cfg_win, seed=1)


def banded(q, k, v, _mask):
    T = q.shape[2]
    i = jnp.arange(T)
    m = causal_mask(T, dtype=q.dtype)
    m = jnp.where((i[:, None] - i[None, :]) >= 5,
                  jnp.asarray(-1e9, q.dtype), m)
    return sdpa(q, k, v, m)


np.testing.assert_allclose(
    np.asarray(gpt_apply(params_w, x, cfg_win)),
    np.asarray(gpt_apply(params_w, x, cfg_win, attn_fn=banded)), atol=1e-10)
print("2. window=5 forward == sdpa under the banded mask  [exact]")

# --- 3. ring decode: past ctx_len, O(window) state ------------------------
from linalg_tpu.models.stream import gpt_stream_chunk, gpt_stream_prefill

prompt = jnp.asarray(rng.integers(0, 31, (1, 4)), jnp.int32)
logits, ring = gpt_stream_prefill(params_w, prompt, cfg_win)
assert ring["k"].shape[-2] == cfg_win.window  # 5 rows, not ctx_len
seq = list(np.asarray(prompt[0]))
for _ in range(40):  # final length 44 >> ctx_len 32
    toks, logits, ring = gpt_stream_chunk(params_w, ring, logits,
                                          jax.random.PRNGKey(0), cfg_win,
                                          1, 1e-9, 1, 0.0)
    tok = int(toks[0, 0])
    full = gpt_apply(params_w, jnp.asarray([seq], jnp.int32), cfg_win)
    assert int(jnp.argmax(full[0, -1])) == tok
    seq.append(tok)
print(f"3. ring stream decoded {len(seq)} tokens (ctx_len {cfg_win.ctx_len}) "
      f"on {cfg_win.window} KV rows == windowed full forward  [exact]")

# --- 4. prefix caching in the serve engine --------------------------------
from linalg_tpu.models.gpt import gpt_decode_chunk
from linalg_tpu.serve import Request, ServeEngine

cfg_s = GPTConfig(vocab_size=31, d_model=64, n_heads=4, n_layers=2,
                  ctx_len=64)
params_s = init_gpt_params(cfg_s, seed=2)
prefix = rng.integers(0, 31, (20,)).tolist()  # > one 16-row page: shareable
suffixes = [rng.integers(0, 31, (int(n),)).tolist() for n in (3, 5)]

eng = ServeEngine(params_s, cfg_s, n_slots=2, chunk=4, top_k=1)
pid = eng.register_prefix(prefix)  # ONE prefill for the shared prefix
ids = [eng.submit(Request(s, 8, prefix_id=pid)) for s in suffixes]
done = {c.request_id: c.tokens for c in eng.run()}

for rid, s in zip(ids, suffixes):
    full_ids = jnp.asarray(np.asarray(prefix + s, np.int32)[None])
    lg, cache = gpt_prefill(params_s, full_ids, cfg_s)
    want, _, _ = gpt_decode_chunk(params_s, cache, lg,
                                  jax.random.PRNGKey(0), cfg_s, 8,
                                  1.0, 1, 0.0)
    assert done[rid] == np.asarray(want)[0].tolist()
print("4. prefix-cached engine tokens == full-prompt decode  [exact]")
print("   (the prefix's quadratic prefill FLOPs are paid once, not "
      "once per request)")

# --- 5. paged KV: same tokens from a pool 67% of dense --------------------
# dense would hold 2 slots x 4 pages = 8; the pool has 5 usable pages:
# 1 holds the prefix's full page SHARED by both slots, each slot
# privately owns 2 (partial prefix tail + suffix + decode budget)
eng_p = ServeEngine(params_s, cfg_s, n_slots=2, chunk=4, top_k=1,
                    paged=True, page=16, n_pages=6)
pid_p = eng_p.register_prefix(prefix)
assert eng_p._shared_held == 1
ids_p = [eng_p.submit(Request(s, 8, prefix_id=pid_p)) for s in suffixes]
done_p = {c.request_id: c.tokens for c in eng_p.run()}
assert [done_p[i] for i in ids_p] == [done[i] for i in ids]
print("5. paged engine (5-page pool, prefix page shared) tokens == "
      "slot engine  [exact]")

print("all checks passed")
