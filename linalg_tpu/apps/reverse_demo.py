"""Reversal-task seq2seq demo: train the encoder-decoder to reverse sequences.

Capability parity with the reference demo
(/root/reference/ai_comps/transformer.py:933-1034): teacher-forced training
on random sequences with reversed targets, epoch loss/accuracy prints, and a
greedy-decode sanity check at the end.

TPU-first: the train step (forward + backward + AdamW) is one jitted XLA
computation over the functional seq2seq model.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..models.seq2seq import (
    Seq2SeqConfig,
    init_seq2seq_params,
    make_reverse_batch,
    seq2seq_apply,
    seq2seq_loss,
)
from ..train.optim import adamw_init, adamw_update


def greedy_decode(params, cfg, src, bos_id=0):
    """Autoregressive greedy decode of the full target sequence."""
    B, T = src.shape
    tgt = np.full((B, 1), bos_id, dtype=np.int32)
    for _ in range(T):
        logits = seq2seq_apply(params, jnp.asarray(src), jnp.asarray(tgt), cfg)
        nxt = np.asarray(jnp.argmax(logits[:, -1], axis=-1), dtype=np.int32)
        tgt = np.concatenate([tgt, nxt[:, None]], axis=1)
    return tgt[:, 1:]


def train_reverse_demo(epochs: int = 200, B: int = 64, T: int = 10,
                       V: int = 12, lr: float = 3e-4, seed: int = 0):
    cfg = Seq2SeqConfig(vocab_size=V, d_model=64, n_heads=4, n_enc_layers=2,
                        n_dec_layers=2, d_ff=256, max_len=max(T + 1, 16))
    params = init_seq2seq_params(cfg, seed=seed)
    opt_state = adamw_init(params)
    rng = np.random.default_rng(seed)

    wd_tree = jax.tree.map(lambda _: 0.0, params)

    @jax.jit
    def step(params, opt_state, src, tgt_in, tgt_out):
        loss, grads = jax.value_and_grad(seq2seq_loss)(
            params, src, tgt_in, tgt_out, cfg
        )
        params, opt_state = adamw_update(params, grads, opt_state, lr, wd_tree)
        return params, opt_state, loss

    t0 = time.time()
    for ep in range(epochs):
        src, tgt_in, tgt_out = make_reverse_batch(B, T, V, rng=rng)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(src), jnp.asarray(tgt_in),
            jnp.asarray(tgt_out),
        )
        if ep % 20 == 0 or ep == epochs - 1:
            logits = seq2seq_apply(params, jnp.asarray(src), jnp.asarray(tgt_in), cfg)
            acc = float(
                (jnp.argmax(logits, -1) == jnp.asarray(tgt_out)).mean()
            )
            print(f"epoch {ep:4d}  loss {float(loss):.4f}  token-acc {acc:.3f}")
    print(f"trained in {time.time() - t0:.1f}s")

    # greedy decode sanity check
    src, _, tgt_out = make_reverse_batch(4, T, V, rng=rng)
    pred = greedy_decode(params, cfg, src)
    print("src :", src[0])
    print("pred:", pred[0])
    print("want:", tgt_out[0])
    acc = (pred == tgt_out).mean()
    print(f"greedy decode token-acc: {acc:.3f}")
    return params, cfg, acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--seq_len", type=int, default=10)
    ap.add_argument("--vocab", type=int, default=12)
    ap.add_argument("--lr", type=float, default=1e-3)
    args = ap.parse_args()
    train_reverse_demo(epochs=args.epochs, T=args.seq_len, V=args.vocab,
                       lr=args.lr)


if __name__ == "__main__":
    main()
