"""Native data-path kernel tests (with and without the compiled library)."""

import numpy as np
import pytest

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


class TestNativeBPE:
    """The C BPE kernels must reproduce the Python loops bit-for-bit."""

    def _corpus(self, seed, n=2000):
        rng = np.random.default_rng(seed)
        # skewed byte distribution so merges actually trigger
        return bytes(rng.choice(
            np.frombuffer(b"abcdeft .\n", dtype=np.uint8), size=n))

    def test_train_matches_python(self):
        from linalg_tpu.native import bpe_train_native
        from linalg_tpu.nn.tokenizers import BPETokenizer

        if bpe_train_native(b"ab", 257) is None:
            pytest.skip("no C toolchain")
        for seed in (0, 1, 2):
            data = self._corpus(seed)
            native = bpe_train_native(data, 300)
            py = BPETokenizer._train_py(data, 300)
            assert native == py

    def test_encode_matches_python(self):
        from linalg_tpu.native import bpe_encode_native
        from linalg_tpu.nn.tokenizers import BPETokenizer

        data = self._corpus(3, 4000)
        tok = BPETokenizer.train(data.decode("latin-1"), 320)
        if bpe_encode_native(b"ab", tok.merges) is None:
            pytest.skip("no C toolchain")
        for seed in (4, 5):
            text = self._corpus(seed, 700).decode("latin-1")
            enc_c = bpe_encode_native(text.encode("utf-8"), tok.merges)
            enc_py = tok._encode_py(text.encode("utf-8"))
            np.testing.assert_array_equal(enc_c, enc_py)

    def test_roundtrip_through_tokenizer_api(self):
        from linalg_tpu.nn.tokenizers import BPETokenizer

        text = "the quick brown fox jumps over the lazy dog " * 40
        tok = BPETokenizer.train(text, 300)
        ids = tok.encode(text)
        assert tok.decode(ids) == text
        assert len(ids) < len(text.encode("utf-8"))  # merges compress

    def test_empty_and_tiny_inputs(self):
        from linalg_tpu.nn.tokenizers import BPETokenizer

        tok = BPETokenizer.train("aaaa bbbb " * 20, 280)
        assert tok.encode("").shape == (0,)
        assert tok.decode(tok.encode("a")) == "a"
