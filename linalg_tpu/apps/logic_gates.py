"""Learned boolean gates: 2-layer ReLU-softmax MLPs for XOR and OR.

Capability parity with /root/reference/xor.py and /root/reference/or.py:
a tiny MLP learns a gate's truth table, then is applied as a logic gate over
bit sequences with hard asserts against ``functools.reduce``. (The
reference's or.py crashes on construction — ``self.kai_init`` vs ``he_init``,
or.py:37,53 — capability reproduced here, bug not.)

TPU-first: training is a jitted full-batch step; gate application batches
the whole reduce chain's queries where possible.
"""

from __future__ import annotations

import functools
import operator
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["GateMLP", "train_gate", "gate_apply", "gate_reduce",
            "XOR_TABLE", "OR_TABLE"]

XOR_TABLE = ([0, 1, 1, 0], "XOR", operator.xor)
OR_TABLE = ([0, 1, 1, 1], "OR", operator.or_)

_INPUTS = np.array([[0.0, 0.0], [0.0, 1.0], [1.0, 0.0], [1.0, 1.0]],
                   dtype=np.float32)


class GateMLP:
    """2 -> H -> 2 MLP with ReLU hidden layer and softmax output."""

    def __init__(self, H: int = 8, seed: int = 0):
        rng = np.random.default_rng(seed)
        std1 = np.sqrt(2.0 / 2)
        std2 = np.sqrt(2.0 / H)
        self.params = {
            "W1": jnp.asarray(rng.normal(0, std1, (2, H)), jnp.float32),
            "b1": jnp.zeros(H, jnp.float32),
            "W2": jnp.asarray(rng.normal(0, std2, (H, 2)), jnp.float32),
            "b2": jnp.zeros(2, jnp.float32),
        }

    @staticmethod
    def apply(params, X):
        Hh = jnp.maximum(0.0, X @ params["W1"] + params["b1"])
        return Hh @ params["W2"] + params["b2"]

    def predict_proba(self, X):
        return jax.nn.softmax(self.apply(self.params, jnp.asarray(X, jnp.float32)), -1)

    def predict(self, X):
        return np.asarray(jnp.argmax(self.predict_proba(X), axis=-1))


def train_gate(labels: Sequence[int], H: int = 8, epochs: int = 400,
               lr: float = 0.1, weight_decay: float = 1e-4,
               seed: int = 0, verbose: bool = True) -> GateMLP:
    """Full-batch SGD on the replicated truth table until it is learned."""
    model = GateMLP(H=H, seed=seed)
    X = jnp.asarray(_INPUTS)
    y = jnp.asarray(np.asarray(labels, dtype=np.int32))

    def loss_fn(params):
        logits = GateMLP.apply(params, X)
        logz = jax.nn.logsumexp(logits, axis=-1)
        gold = jnp.take_along_axis(logits, y[:, None], axis=-1)[:, 0]
        ce = jnp.mean(logz - gold)
        l2 = sum(jnp.sum(w**2) for k, w in params.items() if k.startswith("W"))
        return ce + 0.5 * weight_decay * l2

    @jax.jit
    def step(params):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        return jax.tree.map(lambda p, g: p - lr * g, params, grads), loss

    for ep in range(epochs):
        model.params, loss = step(model.params)
        if verbose and (ep % 100 == 0 or ep == epochs - 1):
            acc = float((model.predict(_INPUTS) == np.asarray(labels)).mean())
            print(f"epoch {ep:4d}  loss(tt) {float(loss):.6f}  acc(tt) {acc:.3f}")
    return model


def gate_apply(model: GateMLP, a, b) -> int:
    """Apply the learned gate to two bits."""
    x = np.array([[float(a), float(b)]], dtype=np.float32)
    return int(model.predict(x)[0])


def gate_reduce(model: GateMLP, bits: Sequence[int]) -> Tuple[int, list]:
    """Left fold of the learned gate over a bit sequence."""
    bits = [int(b) for b in bits]
    acc = bits[0]
    intermediates = [acc]
    for nxt in bits[1:]:
        acc = gate_apply(model, acc, nxt)
        intermediates.append(acc)
    return acc, intermediates


def _demo(table):
    labels, name, op = table
    print(f"=== {name} gate ===")
    model = train_gate(labels)
    preds = model.predict(_INPUTS)
    print("Truth table preds:", preds)
    seq = [1, 0, 1, 1, 0]
    final_bit, steps = gate_reduce(model, seq)
    print(f"Sequence {seq} -> {name} fold {final_bit}, steps={steps}")
    for (a, b), want in zip([(0, 0), (0, 1), (1, 0), (1, 1)], labels):
        assert gate_apply(model, a, b) == want, (a, b, want)
    assert final_bit == functools.reduce(op, seq)
    print(f"{name}: all truth-table and fold asserts passed")
    return model


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--gate", choices=["xor", "or", "both"], default="both")
    args = ap.parse_args()
    if args.gate in ("xor", "both"):
        _demo(XOR_TABLE)
    if args.gate in ("or", "both"):
        _demo(OR_TABLE)


if __name__ == "__main__":
    main()
