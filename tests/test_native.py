"""Native data-path kernel tests (with and without the compiled library)."""

import numpy as np

from linalg_tpu.native import encode_chars, gather_windows, native_available
from linalg_tpu.nn.tokenizers import CharTokenizer


class TestNative:
    def test_compiles(self):
        # the environment ships a C toolchain; the native path must build
        assert native_available()

    def test_encode_matches_tokenizer(self):
        text = "hello brave new world! " * 50
        tok = CharTokenizer(text="helo bravnwd!")
        want = tok.encode(text)
        got = encode_chars(text, tok.stoi, drop_unknown=True)
        np.testing.assert_array_equal(got, want)

    def test_encode_drop_unknown_false_raises(self):
        import pytest

        tok = CharTokenizer(vocab=list("ab"))
        with pytest.raises(KeyError):
            encode_chars("abc", tok.stoi, drop_unknown=False)

    def test_encode_non_latin_falls_back(self):
        tok = CharTokenizer(text="日本語abc")
        out = encode_chars("語a日", tok.stoi)
        assert tok.decode(out) == "語a日"

    def test_gather_windows(self):
        ids = np.arange(100, dtype=np.int32)
        starts = np.asarray([0, 10, 50], dtype=np.int64)
        x, y = gather_windows(ids, starts, T=5)
        np.testing.assert_array_equal(x[1], np.arange(10, 15))
        np.testing.assert_array_equal(y[1], np.arange(11, 16))
        assert x.shape == (3, 5) and y.shape == (3, 5)

    def test_gather_matches_python(self):
        rng = np.random.default_rng(0)
        ids = rng.integers(0, 65, 1000).astype(np.int32)
        starts = rng.integers(0, 900, 16).astype(np.int64)
        x, y = gather_windows(ids, starts, T=64)
        for b, s in enumerate(starts):
            np.testing.assert_array_equal(x[b], ids[s : s + 64])
            np.testing.assert_array_equal(y[b], ids[s + 1 : s + 65])
