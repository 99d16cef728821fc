from .loader import (bpe_encode_native, bpe_train_native, encode_chars,
                     gather_windows, native_available)

__all__ = ["encode_chars", "gather_windows", "native_available",
           "bpe_train_native", "bpe_encode_native"]
