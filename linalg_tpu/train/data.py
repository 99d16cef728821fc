"""TinyShakespeare data pipeline: load, char vocab, random-window batching.

Capability parity with the reference's data path
(/root/reference/gpt.py:219-251). The reference downloads TinyShakespeare
via HF datasets; this environment may be offline, so ``load_text`` resolves,
in order: an explicit path / $LINALG_TPU_DATA, a repo-local data file, the
reference URL, and finally a deterministic synthetic pseudo-Shakespeare
corpus so training and tests always run.
"""

from __future__ import annotations

import os
import pathlib
from typing import Dict, Iterator, List, Tuple

import numpy as np

__all__ = [
    "load_text",
    "build_char_vocab",
    "encode",
    "decode",
    "batch_stream",
    "synthetic_corpus",
]

_TINYSHAKES_URL = (
    "https://raw.githubusercontent.com/karpathy/char-rnn/master/data/"
    "tinyshakespeare/input.txt"
)

_LOCAL_CANDIDATES = (
    "data/tinyshakespeare.txt",
    "data/input.txt",
)


def synthetic_corpus(n_chars: int = 400_000, seed: int = 7) -> str:
    """Deterministic pseudo-Shakespeare: a char-level Markov babbler over a
    seed passage. Statistically rich enough for the char-LM to learn real
    structure (words, line breaks, speaker tags) without network access."""
    seed_text = (
        "FIRST CITIZEN:\n"
        "Before we proceed any further, hear me speak.\n\n"
        "ALL:\nSpeak, speak.\n\n"
        "FIRST CITIZEN:\n"
        "You are all resolved rather to die than to famish?\n\n"
        "ALL:\nResolved. resolved.\n\n"
        "FIRST CITIZEN:\n"
        "First, you know Caius Marcius is chief enemy to the people.\n\n"
        "ALL:\nWe know't, we know't.\n\n"
        "MENENIUS:\n"
        "What work's, my countrymen, in hand? where go you\n"
        "With bats and clubs? The matter? speak, I pray you.\n\n"
        "MARCIUS:\n"
        "Thanks. What's the matter, you dissentious rogues,\n"
        "That, rubbing the poor itch of your opinion,\n"
        "Make yourselves scabs?\n\n"
        "SICINIUS:\n"
        "Nature teaches beasts to know their friends.\n\n"
        "CORIOLANUS:\n"
        "What would you have, you curs,\n"
        "That like nor peace nor war? the one affrights you,\n"
        "The other makes you proud. He that trusts to you,\n"
        "Where he should find you lions, finds you hares;\n"
        "Where foxes, geese: you are no surer, no,\n"
        "Than is the coal of fire upon the ice,\n"
        "Or hailstone in the sun.\n\n"
    )
    order = 4
    rng = np.random.default_rng(seed)
    # Build order-k transition table from the seed passage.
    table: Dict[str, List[str]] = {}
    for i in range(len(seed_text) - order):
        ctx = seed_text[i : i + order]
        table.setdefault(ctx, []).append(seed_text[i + order])
    out = list(seed_text[:order])
    ctx = seed_text[:order]
    for _ in range(n_chars - order):
        choices = table.get(ctx)
        if not choices:
            ctx = seed_text[:order]
            choices = table[ctx]
        ch = choices[int(rng.integers(len(choices)))]
        out.append(ch)
        ctx = ctx[1:] + ch
    return "".join(out)


def load_text(path: str | None = None, allow_synthetic: bool = True) -> str:
    """Resolve the training corpus (see module docstring for the order)."""
    candidates = []
    if path:
        candidates.append(path)
    env = os.environ.get("LINALG_TPU_DATA")
    if env:
        candidates.append(env)
    here = pathlib.Path(__file__).resolve().parents[2]
    candidates += [str(here / c) for c in _LOCAL_CANDIDATES]
    for c in candidates:
        p = pathlib.Path(c)
        if p.is_file() and p.stat().st_size > 1000:
            return p.read_text(encoding="utf-8")

    try:  # network path (reference behavior)
        import urllib.request

        with urllib.request.urlopen(_TINYSHAKES_URL, timeout=10) as r:
            text = r.read().decode("utf-8")
        if len(text) > 1000:
            cache = here / "data"
            cache.mkdir(exist_ok=True)
            (cache / "tinyshakespeare.txt").write_text(text, encoding="utf-8")
            return text
    except Exception:
        pass

    if allow_synthetic:
        print(
            "[data] TinyShakespeare unavailable (offline); using the "
            "deterministic synthetic corpus"
        )
        return synthetic_corpus()
    raise FileNotFoundError("No training corpus available")


def build_char_vocab(text: str) -> Tuple[Dict[str, int], Dict[int, str]]:
    chars = sorted(set(text))
    stoi = {ch: i for i, ch in enumerate(chars)}
    itos = {i: ch for ch, i in stoi.items()}
    return stoi, itos


def encode(text: str, stoi: Dict[str, int]) -> np.ndarray:
    from ..native import encode_chars

    return encode_chars(text, stoi, drop_unknown=True)


def decode(ids, itos: Dict[int, str]) -> str:
    return "".join(itos[int(i)] for i in np.asarray(ids).ravel())


def batch_stream(
    data_ids: np.ndarray, B: int, T: int, rng: np.random.Generator
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Random windows (x, y = x shifted by one) forever (gpt.py:245-251).

    The window gather runs through the native C kernel when available.
    """
    from ..native import gather_windows

    data_ids = np.ascontiguousarray(data_ids, dtype=np.int32)
    L = len(data_ids)
    while True:
        ix = rng.integers(0, L - T - 1, size=B)
        yield gather_windows(data_ids, ix, T)
