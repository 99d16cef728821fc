"""Word-embedding similarity tool over GloVe text vectors.

Capability parity with /root/reference/glovecompare.py: load GloVe
``word v1 v2 ...`` text embeddings, report the cosine similarity of two
words and each word's top-k nearest neighbors.

TPU-first: similarities against the whole vocabulary are one jitted
matvec over the normalized embedding matrix.
"""

from __future__ import annotations

import argparse
import pathlib
import sys
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["load_glove", "cosine_similarity", "top_k_neighbors"]


def load_glove(path) -> Tuple[Dict[str, int], List[str], np.ndarray]:
    """Parse a GloVe text file -> (word->row, row->word, (V, D) matrix)."""
    words: List[str] = []
    vecs: List[np.ndarray] = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip().split(" ")
            if len(parts) < 3:
                continue
            words.append(parts[0])
            vecs.append(np.asarray(parts[1:], dtype=np.float32))
    if not vecs:
        raise ValueError(f"no embeddings parsed from {path}")
    M = np.stack(vecs, axis=0)
    return {w: i for i, w in enumerate(words)}, words, M


@jax.jit
def _cosine_all(M_unit, v_unit):
    return M_unit @ v_unit


def cosine_similarity(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def top_k_neighbors(M: np.ndarray, stoi: Dict[str, int], itos: List[str],
                    word: str, k: int = 10) -> List[Tuple[str, float]]:
    """k nearest words by cosine similarity (excluding the word itself)."""
    M_unit = jnp.asarray(M / (np.linalg.norm(M, axis=1, keepdims=True) + 1e-12))
    v = np.asarray(M[stoi[word]], dtype=np.float32)
    v_unit = jnp.asarray(v / (np.linalg.norm(v) + 1e-12))
    sims = np.array(_cosine_all(M_unit, v_unit))  # writable host copy
    sims[stoi[word]] = -np.inf
    idx = np.argpartition(sims, -k)[-k:]
    idx = idx[np.argsort(sims[idx])[::-1]]
    return [(itos[i], float(sims[i])) for i in idx]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("word1")
    ap.add_argument("word2")
    ap.add_argument("--glove", default="data/glove.6B.300d.txt")
    ap.add_argument("--top_k", type=int, default=10)
    args = ap.parse_args()

    path = pathlib.Path(args.glove)
    if not path.is_file():
        sys.exit(f"GloVe file not found: {path}")
    stoi, itos, M = load_glove(path)
    for w in (args.word1, args.word2):
        if w not in stoi:
            sys.exit(f"word not in vocabulary: {w}")

    sim = cosine_similarity(M[stoi[args.word1]], M[stoi[args.word2]])
    print(f"cosine({args.word1}, {args.word2}) = {sim:.4f}")
    for w in (args.word1, args.word2):
        print(f"\ntop-{args.top_k} neighbors of {w!r}:")
        for nb, s in top_k_neighbors(M, stoi, itos, w, args.top_k):
            print(f"  {nb:20s} {s:.4f}")


if __name__ == "__main__":
    main()
