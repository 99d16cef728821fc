"""Host-sync pathologies of this runtime, isolated (axon TPU tunnel).

Round-1 folklore said "deep async dispatch queues degrade ~100x". The
isolated measurements below (v5e via axon, 2026-08-17) show the opposite
sign and locate the real cliff:

1. Deep queues are FINE for a self-contained dependency chain: enqueueing
   200 steps between blocking calls ran at 0.3-0.6 ms/step; depth 1 with
   only ``block_until_ready`` was also cheap (block_until_ready often
   returns early on this runtime — which is why it is unreliable for
   timing).

2. The cliff is SCALAR READBACK FREQUENCY x BUFFER DONATION. A trainer-
   shaped step (donated pytree state, RNG split, scalar loss out):

       donated, float(loss) every step : ~600 ms/step   <-- pathology
       plain,   float(loss) every step :  ~27 ms/step   (RTT-bound)
       donated, float(loss) every 20   :   ~2 ms/step
       plain,   float(loss) every 20   :  ~1.7 ms/step

   Donation makes per-step readbacks ~22x worse than the plain RTT cost —
   the donated execution apparently cannot overlap the device-to-host
   transfer, serializing a full pipeline drain per step.

Practical rules encoded in the trainer (train/trainer.py):
- do NOT donate the step's params/opt-state buffers: measured A/B at the
  published config showed +52% step time even at the every-20-step sync
  cadence (the donated execution serializes with the loss readback on
  this runtime), so the trainer deliberately leaves donation off, and
- read the loss back at most every ~20 steps.

Run:  python docs/repro_dispatch_queue.py
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def make_state():
    return {
        w: jnp.asarray(
            np.random.default_rng(i).standard_normal((512, 512)), jnp.float32
        )
        for i, w in enumerate("abcdefgh")
    }


def body(state, key):
    key, sub = jax.random.split(key)
    noise = jax.random.normal(sub, (512, 512))
    new = {k: v @ v * 1e-3 + noise * 1e-6 for k, v in state.items()}
    loss = sum(jnp.sum(v) for v in new.values())
    return new, key, loss


def main() -> None:
    variants = (
        ("donated", partial(jax.jit, donate_argnums=(0,))(body)),
        ("plain  ", jax.jit(body)),
    )
    for name, step in variants:
        state, key = make_state(), jax.random.PRNGKey(0)
        state, key, loss = step(state, key)
        jax.block_until_ready(loss)
        for depth, total in ((1, 20), (20, 100), (100, 200)):
            t0 = time.time()
            for i in range(total):
                state, key, loss = step(state, key)
                if (i + 1) % depth == 0:
                    float(loss)  # forced scalar readback, like the trainer
            float(loss)
            dt = (time.time() - t0) / total * 1000
            print(f"{name} readback every {depth:3d}: {dt:9.2f} ms/step")


if __name__ == "__main__":
    main()
