"""A/B the (B,T,H*d) fused attention (nn.flash_btd) in the real train step.

Measures the published-config device-resident train step with the btd
kernel on vs off (rematted sdpa), f32 and bf16, using the trainer's real
sync cadence. Run on the TPU; one process at a time.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def measure(dtype, btd: bool, B: int = 64):
    os.environ["LINALG_TPU_BTD_ATTN"] = "1" if btd else "0"
    import jax
    import jax.numpy as jnp

    from linalg_tpu.models.gpt import GPTConfig, init_gpt_params
    from linalg_tpu.train.optim import adamw_init
    from linalg_tpu.train.trainer import make_device_train_step

    cfg = GPTConfig(vocab_size=65, d_model=512, n_heads=4, n_layers=4,
                    ctx_len=256, dtype=dtype)
    params = init_gpt_params(cfg, seed=0)
    opt_state = adamw_init(params)
    step = make_device_train_step(cfg, B, base_lr=3e-4, min_lr=3e-5,
                                  warmup=200, max_steps=10000,
                                  weight_decay=0.01)
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.integers(0, 65, size=(200_000,), dtype=np.int32))
    key = jax.random.PRNGKey(0)
    for _ in range(40):
        params, opt_state, key, loss = step(params, opt_state, data, key)
    l0 = float(loss)
    t0 = time.perf_counter()
    n = 0
    while n < 100:
        for _ in range(20):
            params, opt_state, key, loss = step(params, opt_state, data, key)
        _ = float(loss)
        n += 20
    dt = (time.perf_counter() - t0) / n
    print(f"{dtype:9s} btd={btd!s:5s} {dt*1e3:7.2f} ms/step  "
          f"(loss after warmup {l0:.4f})", flush=True)
    return dt


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    a = ap.parse_args()
    for dtype in ("float32", "bfloat16"):
        for btd in (True, False):
            measure(dtype, btd, a.batch)
