"""Walkthrough 05 — the five parallelism axes on a virtual device mesh.

The reference has no parallelism (SURVEY §2.5); this walkthrough shows the
TPU-native scaling surface this framework adds: pick a mesh, annotate
shardings, and every strategy reproduces the unsharded numbers exactly.
No accelerator needed — run with 8 virtual CPU devices:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python docs/examples/05_parallelism.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))  # repo root, so the walkthrough runs standalone

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from linalg_tpu.models.gpt import GPTConfig, gpt_loss, init_gpt_params
from linalg_tpu.nn.functional import causal_mask, sdpa
from linalg_tpu.parallel import (
    gpt_param_specs,
    make_mesh,
    make_pp_1f1b_grads,
    make_pp_loss,
    make_ring_attention,
    make_ring_attention_pallas,
    make_sharded_train_step,
)
from linalg_tpu.train.optim import AdamWState, adamw_init


def main():
    assert len(jax.devices()) >= 8, "needs 8 virtual devices (see docstring)"
    cfg = GPTConfig(vocab_size=17, d_model=32, n_heads=4, n_layers=4,
                    d_ff=64, ctx_len=16)
    params = init_gpt_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 17, (8, 16), np.int32))
    y = jnp.asarray(rng.integers(0, 17, (8, 16), np.int32))
    ref = float(gpt_loss(params, x, y, cfg, attn_fn=sdpa))
    print(f"unsharded loss: {ref:.6f}")

    print("\n== dp x tp (batch x megatron heads/FFN, GSPMD) ==")
    mesh = make_mesh((2, 4), ("dp", "tp"))
    sh = jax.tree.map(lambda s: NamedSharding(mesh, s), gpt_param_specs(None),
                      is_leaf=lambda v: isinstance(v, P))
    p_s = jax.device_put(params, sh)
    o_s = jax.device_put(adamw_init(params),
                         AdamWState(m=sh, v=sh, t=NamedSharding(mesh, P())))
    xb = jax.device_put(x, NamedSharding(mesh, P("dp", None)))
    yb = jax.device_put(y, NamedSharding(mesh, P("dp", None)))
    _, _, loss = make_sharded_train_step(cfg, mesh)(p_s, o_s, xb, yb)
    print(f"dp=2 x tp=4 loss: {float(loss):.6f}  (delta {abs(float(loss)-ref):.1e})")

    print("\n== sp (ring attention over the sequence) ==")
    sp_mesh = make_mesh((8,), ("sp",))
    q, k, v = (jnp.asarray(rng.normal(size=(2, 4, 64, 8)), jnp.float32)
               for _ in range(3))
    ring = make_ring_attention(sp_mesh)(q, k, v)
    dense = sdpa(q, k, v, causal_mask(64))
    print(f"ppermute ring vs dense sdpa: {float(jnp.max(jnp.abs(ring - dense))):.1e}")
    pring = make_ring_attention_pallas(sp_mesh)(q, k, v)
    print(f"Pallas DMA ring vs dense   : {float(jnp.max(jnp.abs(pring - dense))):.1e}")

    print("\n== pp (pipeline: GPipe and 1F1B schedules) ==")
    pp_mesh = make_mesh((4,), ("pp",), jax.devices()[:4])
    gp = float(make_pp_loss(cfg, pp_mesh, n_microbatches=4)(params, x, y))
    f1, grads = make_pp_1f1b_grads(cfg, pp_mesh, n_microbatches=4)(params, x, y)
    print(f"GPipe loss: {gp:.6f}  (delta {abs(gp-ref):.1e})")
    print(f"1F1B  loss: {float(f1):.6f}  (delta {abs(float(f1)-ref):.1e}); "
          f"grad leaves: {len(jax.tree.leaves(grads))}")

    print("\n== ep (mixture-of-experts sharded over 'ep') ==")
    from linalg_tpu.models.moe import (MoEGPTConfig, init_moe_params,
                                       moe_gpt_loss)
    from linalg_tpu.parallel import make_ep_train_step

    mcfg = MoEGPTConfig(vocab_size=17, d_model=32, n_heads=4, n_layers=2,
                        d_ff=64, ctx_len=16, n_experts=4, router_top_k=2)
    mparams = init_moe_params(mcfg, seed=0)
    mref = float(moe_gpt_loss(mparams, x[:4], y[:4], mcfg))
    ep_mesh = make_mesh((2, 4), ("dp", "ep"))
    _, _, ml = make_ep_train_step(mcfg, ep_mesh, dp_axis="dp")(
        mparams, adamw_init(mparams), x[:4], y[:4])
    print(f"top-2 MoE unsharded {mref:.6f} vs dp x ep {float(ml):.6f} "
          f"(delta {abs(float(ml)-mref):.1e})")

    print("\n== fsdp (ZeRO-3: param/optimizer storage sharded 1/N) ==")
    from linalg_tpu.nn.functional import sdpa as _sdpa
    from linalg_tpu.parallel import fsdp_shardings

    fs_mesh = make_mesh((8,), ("fsdp",))
    # a config whose FFN weights cross the min-shard threshold
    fs_cfg = GPTConfig(vocab_size=17, d_model=64, n_heads=4, n_layers=2,
                       d_ff=256, ctx_len=16)
    fs_params = init_gpt_params(fs_cfg, seed=0)
    fs_ref = float(gpt_loss(fs_params, x, y, fs_cfg, attn_fn=_sdpa))
    fs_sh = fsdp_shardings(fs_params, fs_mesh)
    bsh = NamedSharding(fs_mesh, P("fsdp", None))
    fs_loss = float(jax.jit(
        lambda p, xx, yy: gpt_loss(p, xx, yy, fs_cfg, attn_fn=_sdpa),
        in_shardings=(fs_sh, bsh, bsh), out_shardings=None,
    )(jax.device_put(fs_params, fs_sh), jax.device_put(x, bsh),
      jax.device_put(y, bsh)))
    w1 = jax.device_put(fs_params, fs_sh)["layers"]["W1"]
    print(f"fsdp loss {fs_loss:.6f} (delta {abs(fs_loss-fs_ref):.1e}); "
          f"W1 stored {w1.addressable_shards[0].data.size} of {w1.size} "
          f"elements per device (1/{fs_mesh.shape['fsdp']})")

    for name, val, want in (("dp x tp", float(loss), ref),
                            ("GPipe", gp, ref), ("1F1B", float(f1), ref),
                            ("ep", float(ml), mref),
                            ("fsdp", fs_loss, fs_ref)):
        assert abs(val - want) < 1e-4, name
    print("\nall parallel strategies reproduce the unsharded numbers")
    print("all checks passed")


if __name__ == "__main__":
    main()
