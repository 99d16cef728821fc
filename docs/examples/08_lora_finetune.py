"""Walkthrough 08 — LoRA: low-rank adaptation as a pytree transform.

The reference's only training mode is full-parameter training from
scratch or a resumed checkpoint (/root/reference/gpt.py:255-273). LoRA
(Hu et al. 2021) finetunes a frozen model by writing every target weight
as

    W_eff = W + (alpha / r) * A @ B,    A: (d_in, r), B: (r, d_out)

and training only A and B. Three facts make it work, and this
walkthrough checks each one numerically:

1. ZERO START. B is zero-initialized, so W_eff == W exactly at step 0 —
   finetuning begins AT the base model, not near it.
2. PROJECTED GRADIENTS. Because the merge is a pure function traced into
   the jitted loss, jax.grad gives dL/dB = (alpha/r) * A^T dL/dW_eff and
   dL/dA = (alpha/r) * dL/dW_eff B^T — the full gradient projected into
   the rank-r subspace. No custom backward needed; the chain rule IS the
   LoRA update.
3. FREE INFERENCE. After training, merge once: the adapted model is a
   plain dense param pytree and every decode path (KV cache, serving,
   beam, speculative) runs it unchanged at full speed.

The TPU angle: adapters keep the stacked (L, d_in, r) layout, so the
merge is one (L,d,r)x(L,r,d) einsum per target — a few MICROSECONDS next
to the model matmuls — and the optimizer state shrinks to the adapter
size (~3% of the model at d512/r8). Runs on CPU.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))  # repo root, so the walkthrough runs standalone

import jax
import jax.numpy as jnp
import numpy as np

from linalg_tpu.models.gpt import GPTConfig, gpt_apply, gpt_loss, \
    init_gpt_params
from linalg_tpu.models.lora import LoRAConfig, init_lora_params, lora_merge

cfg = GPTConfig(vocab_size=31, d_model=32, n_heads=2, n_layers=2, ctx_len=32)
base = init_gpt_params(cfg, seed=0)
lcfg = LoRAConfig(rank=4, alpha=8.0)
lora = init_lora_params(base, lcfg, seed=1)

# --- 1. zero start: merged model == base model, bit for bit --------------
rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, 31, (2, 16)))
np.testing.assert_array_equal(
    np.asarray(gpt_apply(lora_merge(base, lora, lcfg), x, cfg)),
    np.asarray(gpt_apply(base, x, cfg)))
print("1. B=0 merge reproduces the base model exactly")

# --- 2. the chain rule IS the LoRA update --------------------------------
y = jnp.asarray(rng.integers(0, 31, (2, 16)))
g_ad = jax.grad(lambda a: gpt_loss(lora_merge(base, a, lcfg), x, y, cfg))(lora)
g_w = jax.grad(lambda p: gpt_loss(p, x, y, cfg))(lora_merge(base, lora, lcfg))
a_q = lora["layers"]["Wq_A"]
want_dB = lcfg.scale * jnp.einsum("lir,lio->lro", a_q, g_w["layers"]["Wq"])
np.testing.assert_allclose(np.asarray(g_ad["layers"]["Wq_B"]),
                           np.asarray(want_dB), rtol=2e-5, atol=1e-7)
print("2. dL/dB == (alpha/r) * A^T dL/dW — the projected full gradient")

# --- 3. finetune: only the adapters move, loss drops ---------------------
from linalg_tpu.train.optim import adamw_init
from linalg_tpu.train.trainer import make_device_train_step

step = make_device_train_step(cfg, 8, base_lr=1e-2, min_lr=1e-3, warmup=2,
                              max_steps=40, weight_decay=0.0,
                              lora=(base, lcfg))
data = jnp.asarray(np.tile(np.array([1, 7, 2, 9]), 200), jnp.int32)
opt = adamw_init(lora)  # moments over the ADAPTERS only
key = jax.random.PRNGKey(0)
snap = jax.tree.map(lambda v: v.copy(), base)
losses = []
for _ in range(30):
    lora, opt, key, loss = step(lora, opt, data, key)
    losses.append(float(loss))
assert all(bool(jnp.all(p == q)) for p, q in
           zip(jax.tree.leaves(base), jax.tree.leaves(snap)))
assert np.mean(losses[-5:]) < np.mean(losses[:5]) - 0.3
n_ad = sum(v.size for v in jax.tree.leaves(lora))
n_base = sum(v.size for v in jax.tree.leaves(base))
print(f"3. 30 steps: loss {losses[0]:.3f} -> {losses[-1]:.3f}; base "
      f"bit-frozen; trainable = {100 * n_ad / n_base:.1f}% of the model")

# --- 4. merged inference: adapted != base, and costs nothing extra -------
tuned = lora_merge(base, lora, lcfg)
lt = gpt_apply(tuned, x, cfg)
lb = gpt_apply(base, x, cfg)
assert float(jnp.abs(lt - lb).max()) > 1e-3  # the adapter did something
assert jax.tree.structure(tuned) == jax.tree.structure(base)
print("4. merged params are a plain dense pytree — every decode path "
      "runs them unchanged")

print("all checks passed")
