"""ctypes loader for the native data-path kernels (fastloader.c).

Compiles the shared library on first use into a per-user cache dir (cc -O3
-shared -fPIC) and exposes typed wrappers. Every entry point has a
pure-Python/NumPy fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import pathlib
import subprocess
import tempfile
from typing import Dict, Optional, Tuple

import numpy as np

__all__ = [
    "native_available",
    "encode_chars",
    "gather_windows",
    "bpe_train_native",
    "bpe_encode_native",
]

_SRC = pathlib.Path(__file__).with_name("fastloader.c")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[ctypes.CDLL]:
    src = _SRC.read_text()
    tag = hashlib.sha256(src.encode()).hexdigest()[:16]
    cache = pathlib.Path(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
    ) / "linalg_tpu"
    cache.mkdir(parents=True, exist_ok=True)
    so = cache / f"fastloader-{tag}.so"
    if not so.exists():
        cc = os.environ.get("CC", "cc")
        with tempfile.TemporaryDirectory() as td:
            tmp = pathlib.Path(td) / "fastloader.so"
            cmd = [cc, "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(tmp)]
            subprocess.run(cmd, check=True, capture_output=True)
            tmp.replace(so)
    lib = ctypes.CDLL(str(so))
    lib.encode_ascii.restype = ctypes.c_int64
    lib.encode_ascii.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.gather_windows.restype = None
    lib.gather_windows.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.bpe_train.restype = ctypes.c_int32
    lib.bpe_train.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.bpe_encode.restype = ctypes.c_int64
    lib.bpe_encode.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
    ]
    return lib


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        try:
            _LIB = _build()
        except Exception:
            _LIB = None
    return _LIB


def native_available() -> bool:
    return _lib() is not None


def encode_chars(text: str, stoi: Dict[str, int],
                 drop_unknown: bool = True) -> np.ndarray:
    """CharTokenizer.encode semantics; native fast path for byte text."""
    lib = _lib()
    if lib is not None and all(len(c) == 1 and ord(c) < 256 for c in stoi):
        try:
            raw = text.encode("latin-1")
        except UnicodeEncodeError:
            raw = None
        if raw is not None:
            lut = np.full(256, -1, dtype=np.int32)
            for ch, i in stoi.items():
                lut[ord(ch)] = i
            out = np.empty(len(raw), dtype=np.int32)
            n = lib.encode_ascii(
                raw, len(raw),
                lut.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                1 if drop_unknown else 0,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
            out = out[:n]
            if not drop_unknown and (out < 0).any():
                raise KeyError("unknown character in text")
            return out
    # fallback
    if drop_unknown:
        ids = [stoi[c] for c in text if c in stoi]
    else:
        ids = [stoi[c] for c in text]
    return np.asarray(ids, dtype=np.int32)


def gather_windows(ids: np.ndarray, starts: np.ndarray,
                   T: int) -> Tuple[np.ndarray, np.ndarray]:
    """Random-window batch gather: x[b] = ids[s:s+T], y shifted by one."""
    ids = np.ascontiguousarray(ids, dtype=np.int32)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    B = starts.shape[0]
    lib = _lib()
    if lib is not None:
        x = np.empty((B, T), dtype=np.int32)
        y = np.empty((B, T), dtype=np.int32)
        lib.gather_windows(
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(ids),
            starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), B, T,
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            y.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return x, y
    x = np.stack([ids[s : s + T] for s in starts])
    y = np.stack([ids[s + 1 : s + T + 1] for s in starts])
    return x, y


def bpe_train_native(data: bytes, vocab_size: int):
    """Learn BPE merges in C; returns a list of (a, b) tuples, or None when
    the native library is unavailable (caller falls back to Python)."""
    lib = _lib()
    if lib is None:
        return None
    n_max = max(vocab_size - 256, 0)
    out = np.empty(2 * max(n_max, 1), dtype=np.int32)
    n = lib.bpe_train(
        data, len(data), vocab_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if n < 0:
        return None
    return [(int(out[2 * i]), int(out[2 * i + 1])) for i in range(n)]


def bpe_encode_native(data: bytes, merges) -> Optional[np.ndarray]:
    """Apply learned BPE merges in C; returns int32 ids, or None when the
    native library is unavailable (caller falls back to Python)."""
    lib = _lib()
    if lib is None:
        return None
    if len(data) == 0:
        return np.empty(0, dtype=np.int32)
    flat = np.asarray(merges, dtype=np.int32).reshape(-1)
    out = np.empty(len(data), dtype=np.int32)
    m = lib.bpe_encode(
        data, len(data),
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(merges),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if m < 0:
        return None
    return out[:m].copy()
