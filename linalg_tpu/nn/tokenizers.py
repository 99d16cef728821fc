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
    """Byte-pair encoding placeholder — intentionally unimplemented, the
    same declared stub as the reference (tokenizers.py:90-107)."""

    def __init__(self):
        raise NotImplementedError("BPE tokenizer not yet implemented.")

    def encode(self, text: str) -> np.ndarray:  # pragma: no cover
        raise NotImplementedError

    def decode(self, ids) -> str:  # pragma: no cover
        raise NotImplementedError

    @property
    def vocab_size(self) -> int:  # pragma: no cover
        raise NotImplementedError
