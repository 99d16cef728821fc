"""Walkthrough 06 — KV-cached decoding and batched serving.

The reference's sampler recomputes a FULL O(T^2·L) forward per generated
character (gpt.py:518-546) even though it built a KVCache component it
never wired in (SURVEY §2.2). This walkthrough shows the TPU-native
serving path this framework provides instead:

1. prefill once, then O(T)-per-token incremental decode through the
   fixed-shape functional KV cache — one compiled step for every position;
2. ragged BATCHED serving: prompts of different lengths are LEFT-padded so
   every sequence's end aligns, the whole batch shares one decode
   position, and a per-sequence ``start`` masks the pads and offsets the
   positional encodings. Batched logits are exactly the unbatched ones.

Runs on CPU; on a TPU v5e the same code measures ~1.4k tok/s
single-stream and ~54k tok/s at batch 8 (BASELINE.md).
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
    gpt_decode_step,
    gpt_generate,
    gpt_prefill,
    gpt_prefill_batched,
    init_gpt_params,
)

cfg = GPTConfig(vocab_size=31, d_model=64, n_heads=4, n_layers=2, ctx_len=32)
params = init_gpt_params(cfg, seed=0)
rng = np.random.default_rng(0)

# --- 1. incremental decode == full forward --------------------------------
prompt = rng.integers(0, 31, (1, 6)).astype(np.int32)
logits, cache = gpt_prefill(params, jnp.asarray(prompt), cfg)
seq = list(prompt[0])
for _ in range(5):
    tok = int(jnp.argmax(logits[0]))  # greedy for determinism
    seq.append(tok)
    logits, cache = gpt_decode_step(params, cache,
                                    jnp.asarray([tok], jnp.int32), cfg)
    full = gpt_apply(params, jnp.asarray(np.asarray(seq)[None]), cfg)
    err = float(jnp.max(jnp.abs(logits[0] - full[0, -1])))
    assert err < 1e-3, err
print("incremental decode tracks the full forward at every step ✓")

# --- 2. ragged batched serving --------------------------------------------
prompts = [rng.integers(0, 31, (int(L),)).astype(np.int32)
           for L in (3, 7, 11)]
W = 16
buf = np.zeros((3, W), np.int32)
start = np.asarray([W - len(p) for p in prompts], np.int32)
for b, p in enumerate(prompts):
    buf[b, start[b]:] = p
blog, _ = gpt_prefill_batched(params, jnp.asarray(buf),
                              jnp.asarray(start), cfg)
for b, p in enumerate(prompts):
    ref = gpt_apply(params, jnp.asarray(p[None]), cfg)
    err = float(jnp.max(jnp.abs(blog[b] - ref[0, -1])))
    assert err < 1e-3, err
print("left-padded batched prefill == unbatched logits per sequence ✓")

out = gpt_generate(params, cfg, prompts, n_tokens=8, temperature=0.8,
                   top_k=5, seed=1)
assert out.shape == (3, 8)
print(f"gpt_generate sampled {out.shape} tokens for 3 ragged prompts ✓")

print("all checks passed")
