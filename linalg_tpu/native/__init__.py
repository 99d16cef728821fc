from .loader import encode_chars, gather_windows, native_available

__all__ = ["encode_chars", "gather_windows", "native_available"]
