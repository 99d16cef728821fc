"""Tokenizers: character-level, plus the declared BPE placeholder.

API parity with the reference tokenizer surface
(/root/reference/ai_comps/tokenizers.py:32-107): ``encode`` / ``decode`` /
``vocab_size`` / ``save`` / ``load`` / ``from_pretrained`` /
``__contains__``. Host-side pure Python; the byte fast path routes through
the native C kernel (linalg_tpu/native).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Dict, List, Optional

import numpy as np

__all__ = ["BaseTokenizer", "CharTokenizer", "BPETokenizer"]


class BaseTokenizer(ABC):
    """Minimal tokenizer interface."""

    @abstractmethod
    def encode(self, text: str) -> np.ndarray:
        """Text -> int32 token-id array."""

    @abstractmethod
    def decode(self, ids) -> str:
        """Token ids -> text."""

    @property
    @abstractmethod
    def vocab_size(self) -> int:
        """Number of distinct tokens."""


class CharTokenizer(BaseTokenizer):
    """Character vocabulary, ordered by sorted unique characters.

    Internally keeps only the ordered vocabulary list; the stoi/itos dicts
    are derived views kept for reference-API compatibility.
    """

    def __init__(self, text: Optional[str] = None,
                 vocab: Optional[List[str]] = None):
        if vocab is None and text is None:
            raise ValueError("Must provide either text or vocab")
        self._set_vocab(list(vocab) if vocab is not None else sorted(set(text)))

    def _set_vocab(self, chars: List[str]) -> None:
        self._vocab = chars
        self.stoi = {}
        self.itos = {}
        for i, ch in enumerate(chars):
            self.stoi[ch] = i
            self.itos[i] = ch

    # -- construction from serialized state ---------------------------------

    @classmethod
    def from_pretrained(cls, stoi: Dict[str, int], itos: Dict) -> "CharTokenizer":
        tok = cls.__new__(cls)
        ordered = [None] * len(itos)
        for k, v in itos.items():
            ordered[int(k)] = v
        tok._set_vocab(ordered)
        # honor any non-contiguous custom stoi the caller supplied
        tok.stoi = dict(stoi)
        return tok

    @classmethod
    def load(cls, data: Dict) -> "CharTokenizer":
        return cls.from_pretrained(data["stoi"], data["itos"])

    def save(self) -> Dict:
        """JSON-safe state (itos keys stringified)."""
        itos_json = {}
        for i, ch in self.itos.items():
            itos_json[str(i)] = ch
        return {"stoi": dict(self.stoi), "itos": itos_json}

    # -- core API ------------------------------------------------------------

    def encode(self, text: str, drop_unknown: bool = True) -> np.ndarray:
        from ..native import encode_chars

        return encode_chars(text, self.stoi, drop_unknown=drop_unknown)

    def decode(self, ids) -> str:
        flat = np.asarray(ids).ravel()
        return "".join(self.itos[int(i)] for i in flat)

    @property
    def vocab_size(self) -> int:
        return len(self.stoi)

    def __contains__(self, char: str) -> bool:
        return char in self.stoi

    def __repr__(self) -> str:
        return f"CharTokenizer(vocab_size={self.vocab_size})"


class BPETokenizer(BaseTokenizer):
    """Byte-level byte-pair encoding — implemented (the reference only
    declares a NotImplementedError stub, tokenizers.py:90-107).

    Tokens 0..255 are raw bytes; learned merges extend the vocabulary.
    Construct via ``BPETokenizer.train(text, vocab_size)`` or ``load``;
    the bare constructor raises (there is no untrained BPE), matching the
    spirit of the reference stub.
    """

    def __init__(self, merges: Optional[List[tuple]] = None):
        if merges is None:
            raise NotImplementedError(
                "BPETokenizer has no untrained form: use "
                "BPETokenizer.train(text, vocab_size) or BPETokenizer.load()."
            )
        self.merges: List[tuple] = [tuple(m) for m in merges]
        # pair -> merged token id, in training order (rank = priority)
        self.ranks: Dict[tuple, int] = {
            pair: 256 + i for i, pair in enumerate(self.merges)
        }

    # -- training -------------------------------------------------------------

    @classmethod
    def train(cls, text: str, vocab_size: int = 512) -> "BPETokenizer":
        """Learn merges by repeatedly fusing the most frequent adjacent pair.

        The merge loop is O(corpus x merges); it runs in the native C
        kernel (native/fastloader.c::bpe_train) when a compiler is
        available, with this Python loop as the exact-semantics fallback.
        """
        assert vocab_size >= 256, "byte-level BPE needs vocab_size >= 256"
        from ..native import bpe_train_native

        data = text.encode("utf-8")
        native = bpe_train_native(data, vocab_size)
        if native is not None:
            return cls(native)
        return cls(cls._train_py(data, vocab_size))

    @classmethod
    def _train_py(cls, data: bytes, vocab_size: int) -> List[tuple]:
        """Pure-Python merge learning (fallback + differential-test oracle
        for the C kernel)."""
        ids = list(data)
        merges: List[tuple] = []
        next_id = 256
        while next_id < vocab_size and len(ids) > 1:
            counts: Dict[tuple, int] = {}
            for a, b in zip(ids, ids[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
            pair, freq = max(counts.items(), key=lambda kv: (kv[1], -kv[0][0]))
            if freq < 2:
                break
            ids = cls._merge(ids, pair, next_id)
            merges.append(pair)
            next_id += 1
        return merges

    @staticmethod
    def _merge(ids: List[int], pair: tuple, new_id: int) -> List[int]:
        out = []
        i = 0
        n = len(ids)
        while i < n:
            if i + 1 < n and ids[i] == pair[0] and ids[i + 1] == pair[1]:
                out.append(new_id)
                i += 2
            else:
                out.append(ids[i])
                i += 1
        return out

    # -- core API --------------------------------------------------------------

    def encode(self, text: str) -> np.ndarray:
        from ..native import bpe_encode_native

        data = text.encode("utf-8")
        native = bpe_encode_native(data, self.merges)
        if native is not None:
            return native
        return self._encode_py(data)

    def _encode_py(self, data: bytes) -> np.ndarray:
        """Pure-Python encode (fallback + differential-test oracle for the
        C kernel)."""
        ids = list(data)
        while len(ids) > 1:
            # lowest-rank (earliest-learned) applicable pair merges first
            best = None
            best_rank = None
            for a, b in zip(ids, ids[1:]):
                r = self.ranks.get((a, b))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = (a, b), r
            if best is None:
                break
            ids = self._merge(ids, best, best_rank)
        return np.asarray(ids, dtype=np.int32)

    def token_bytes(self, i: int) -> bytes:
        """Raw byte expansion of one token id (for streaming decode: feed
        these through an incremental UTF-8 decoder so multi-byte characters
        split across tokens reassemble correctly)."""
        if not hasattr(self, "_expand"):
            self._expand: Dict[int, bytes] = {}
        expand = self._expand

        def to_bytes(i: int) -> bytes:
            if i < 256:
                return bytes([i])
            if i not in expand:
                a, b = self.merges[i - 256]
                expand[i] = to_bytes(a) + to_bytes(b)
            return expand[i]

        return to_bytes(int(i))

    def decode(self, ids) -> str:
        data = b"".join(self.token_bytes(int(i))
                        for i in np.asarray(ids).ravel())
        return data.decode("utf-8", errors="replace")

    @property
    def vocab_size(self) -> int:
        return 256 + len(self.merges)

    def save(self) -> Dict:
        return {"merges": [list(m) for m in self.merges]}

    @classmethod
    def load(cls, data: Dict) -> "BPETokenizer":
        return cls(merges=[tuple(m) for m in data["merges"]])
