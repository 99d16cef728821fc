"""Tokenizers: character-level, plus the declared BPE placeholder.

Reference: /root/reference/ai_comps/tokenizers.py:32-107 — same API
(``encode``/``decode``/``vocab_size``/``save``/``load``/``from_pretrained``/
``__contains__``); host-side pure Python (tokenization is not device work).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Dict, List, Optional

import numpy as np

__all__ = ["BaseTokenizer", "CharTokenizer", "BPETokenizer"]


class BaseTokenizer(ABC):
    @abstractmethod
    def encode(self, text: str) -> np.ndarray: ...

    @abstractmethod
    def decode(self, ids) -> str: ...

    @property
    @abstractmethod
    def vocab_size(self) -> int: ...


class CharTokenizer(BaseTokenizer):
    """Character vocabulary from sorted unique chars of a corpus."""

    def __init__(self, text: Optional[str] = None,
                 vocab: Optional[List[str]] = None):
        if vocab is not None:
            chars = list(vocab)
        elif text is not None:
            chars = sorted(set(text))
        else:
            raise ValueError("Must provide either text or vocab")
        self.stoi: Dict[str, int] = {ch: i for i, ch in enumerate(chars)}
        self.itos: Dict[int, str] = {i: ch for ch, i in self.stoi.items()}

    @classmethod
    def from_pretrained(cls, stoi: Dict[str, int], itos: Dict) -> "CharTokenizer":
        tok = cls.__new__(cls)
        tok.stoi = dict(stoi)
        tok.itos = {int(k): v for k, v in itos.items()}
        return tok

    def encode(self, text: str, drop_unknown: bool = True) -> np.ndarray:
        from ..native import encode_chars

        return encode_chars(text, self.stoi, drop_unknown=drop_unknown)

    def decode(self, ids) -> str:
        return "".join(self.itos[int(i)] for i in np.asarray(ids).ravel())

    @property
    def vocab_size(self) -> int:
        return len(self.stoi)

    def __contains__(self, char: str) -> bool:
        return char in self.stoi

    def save(self) -> Dict:
        """JSON-safe state dict (str keys for itos)."""
        return {
            "stoi": self.stoi,
            "itos": {str(k): v for k, v in self.itos.items()},
        }

    @classmethod
    def load(cls, data: Dict) -> "CharTokenizer":
        return cls.from_pretrained(data["stoi"], data["itos"])


class BPETokenizer(BaseTokenizer):
    """Byte-pair encoding placeholder — intentionally unimplemented, matching
    the reference's declared stub (tokenizers.py:90-107)."""

    def __init__(self):
        raise NotImplementedError("BPE tokenizer not yet implemented.")

    def encode(self, text: str) -> np.ndarray:  # pragma: no cover
        raise NotImplementedError

    def decode(self, ids) -> str:  # pragma: no cover
        raise NotImplementedError

    @property
    def vocab_size(self) -> int:  # pragma: no cover
        raise NotImplementedError
