"""Flash/fused attention kernel tests (interpreter mode on CPU).

Both kernels must match the exact einsum sdpa — forward and the custom_vjp
backward — in float32 interpreter mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from linalg_tpu.nn.flash import flash_attention
from linalg_tpu.nn.flash_long import flash_attention_long
from linalg_tpu.nn.flash_stream import flash_attention_stream
from linalg_tpu.nn.functional import causal_mask, sdpa


def _rand(shape, seed):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), jnp.float32
    )


@pytest.mark.parametrize(
    "fn,T",
    [(flash_attention, 64), (flash_attention, 128),
     (flash_attention_long, 512), (flash_attention_stream, 512)],
)
class TestFlashKernels:
    def test_forward_matches_sdpa(self, fn, T):
        B, h, d = 2, 2, 32
        q, k, v = _rand((B, h, T, d), 0), _rand((B, h, T, d), 1), _rand((B, h, T, d), 2)
        with pltpu.force_tpu_interpret_mode():
            o = fn(q, k, v, True)
            ref = sdpa(q, k, v, causal_mask(T))
        np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=1e-5)

    def test_backward_matches_sdpa(self, fn, T):
        B, h, d = 1, 2, 16
        q, k, v = _rand((B, h, T, d), 3), _rand((B, h, T, d), 4), _rand((B, h, T, d), 5)
        with pltpu.force_tpu_interpret_mode():
            g1 = jax.grad(
                lambda q, k, v: jnp.sum(jnp.sin(fn(q, k, v, True))),
                argnums=(0, 1, 2),
            )(q, k, v)
            g2 = jax.grad(
                lambda q, k, v: jnp.sum(jnp.sin(sdpa(q, k, v, causal_mask(T)))),
                argnums=(0, 1, 2),
            )(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    def test_causality(self, fn, T):
        # output at position t must ignore positions > t
        B, h, d = 1, 1, 16
        q = _rand((B, h, T, d), 6)
        k = _rand((B, h, T, d), 7)
        v = _rand((B, h, T, d), 8)
        k2 = k.at[:, :, T // 2 :].set(99.0)
        v2 = v.at[:, :, T // 2 :].set(99.0)
        with pltpu.force_tpu_interpret_mode():
            o1 = fn(q, k, v, True)
            o2 = fn(q, k2, v2, True)
        np.testing.assert_allclose(
            np.asarray(o1)[:, :, : T // 2],
            np.asarray(o2)[:, :, : T // 2],
            atol=1e-5,
        )


class TestNonCausal:
    def test_full_attention(self):
        T = 64
        q, k, v = _rand((1, 2, T, 16), 9), _rand((1, 2, T, 16), 10), _rand((1, 2, T, 16), 11)
        with pltpu.force_tpu_interpret_mode():
            o = flash_attention(q, k, v, False)
            ref = sdpa(q, k, v, None)
        np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=1e-5)


class TestStreamBackwardKernels:
    """The streaming Pallas backward vs the chunked-XLA oracle it replaced."""

    @pytest.mark.parametrize("causal,window",
                             [(True, None), (False, None), (True, 64)])
    def test_pallas_bwd_matches_xla_oracle(self, causal, window):
        from linalg_tpu.nn import flash_stream as fs

        B, h, T, d = 1, 2, 512, 16
        q, k, v = _rand((B, h, T, d), 20), _rand((B, h, T, d), 21), _rand((B, h, T, d), 22)
        do = _rand((B, h, T, d), 23)
        with pltpu.force_tpu_interpret_mode():
            _o, res = fs._vjp_fwd(q, k, v, causal, window)
            g_pallas = fs._vjp_bwd(causal, window, res, do)
            g_xla = fs._vjp_bwd_xla(causal, window, res, do)
        for a, b in zip(g_pallas, g_xla):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5)


class TestStreamWindow:
    """Sliding-window band in the streaming kernel: block pairs behind
    the band are skipped at grid-build time; the survivors mask in-tile.
    Oracle: sdpa under the explicitly banded causal mask."""

    @staticmethod
    def _banded(T, window, dt=jnp.float32):
        i = jnp.arange(T)
        m = causal_mask(T, dtype=dt)
        far = (i[:, None] - i[None, :]) >= window
        return jnp.where(far[None, None], jnp.asarray(-1e9, dt), m)

    # T=1536 (3 blocks of 512) with window 256 actually DROPS pair (2,0)
    # from the grid; window 100 exercises a band inside one block; window
    # 1536 must reproduce full causal exactly.
    @pytest.mark.parametrize("T,window", [(512, 64), (512, 100),
                                          (1536, 256), (512, 512)])
    def test_forward_matches_banded_sdpa(self, T, window):
        B, h, d = 1, 2, 16
        q, k, v = _rand((B, h, T, d), 40), _rand((B, h, T, d), 41), _rand((B, h, T, d), 42)
        with pltpu.force_tpu_interpret_mode():
            o = flash_attention_stream(q, k, v, True, window)
            ref = sdpa(q, k, v, self._banded(T, window))
        np.testing.assert_allclose(np.asarray(o), np.asarray(ref),
                                   atol=1e-5)

    @pytest.mark.parametrize("T,window", [(512, 64), (1536, 256)])
    def test_backward_matches_banded_sdpa(self, T, window):
        B, h, d = 1, 1, 16
        q, k, v = _rand((B, h, T, d), 43), _rand((B, h, T, d), 44), _rand((B, h, T, d), 45)
        with pltpu.force_tpu_interpret_mode():
            g1 = jax.grad(
                lambda q, k, v: jnp.sum(
                    jnp.sin(flash_attention_stream(q, k, v, True, window))),
                argnums=(0, 1, 2))(q, k, v)
            g2 = jax.grad(
                lambda q, k, v: jnp.sum(
                    jnp.sin(sdpa(q, k, v, self._banded(T, window)))),
                argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5)

    def test_grid_skips_out_of_band_blocks(self):
        from linalg_tpu.nn.flash_stream import _pairs

        # T=1536, blocks 512: full causal keeps all 6 lower pairs; window
        # 256 must drop (2,0) — queries 1024+ can see back to 769 at most
        i_c, _, _, _ = _pairs(3, 3, True, False, 512, 512)
        i_w, j_w, _, _ = _pairs(3, 3, True, False, 512, 512, window=256)
        assert i_c.shape[0] == 6
        assert i_w.shape[0] == 5
        assert (2, 0) not in set(zip(i_w.tolist(), j_w.tolist()))


class TestRaggedPadding:
    """_padded_attn right-pads ragged T to a kernel-legal multiple of 256.

    Padding must be EXACT under the causal mask (padded keys sit after
    every real query, so they are masked out; padded query rows are
    sliced off) — forward and gradients. Verified against sdpa as the
    inner kernel so the check runs on CPU, plus (interpret-mode) against
    a real Pallas kernel.
    """

    def _causal_sdpa(self, q, k, v, causal):
        assert causal is True
        return sdpa(q, k, v, causal_mask(q.shape[-2], dtype=q.dtype))

    @pytest.mark.parametrize("T", [257, 300, 511])
    def test_forward_exact(self, T):
        from linalg_tpu.models.gpt import _padded_attn

        B, h, d = 1, 2, 16
        q, k, v = _rand((B, h, T, d), 30), _rand((B, h, T, d), 31), _rand((B, h, T, d), 32)
        Tp = ((T + 255) // 256) * 256
        padded = _padded_attn(self._causal_sdpa, T, Tp)
        out = padded(q, k, v, None)
        ref = sdpa(q, k, v, causal_mask(T))
        assert out.shape == (B, h, T, d)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_gradients_exact(self):
        from linalg_tpu.models.gpt import _padded_attn

        B, h, T, d = 1, 2, 300, 16
        Tp = 512
        q, k, v = _rand((B, h, T, d), 33), _rand((B, h, T, d), 34), _rand((B, h, T, d), 35)
        w = _rand((B, h, T, d), 36)
        padded = _padded_attn(self._causal_sdpa, T, Tp)
        g1 = jax.grad(lambda q, k, v: jnp.sum(padded(q, k, v, None) * w),
                      argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(
            lambda q, k, v: jnp.sum(sdpa(q, k, v, causal_mask(T)) * w),
            argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

    def test_forward_exact_pallas(self):
        from linalg_tpu.models.gpt import _padded_attn

        B, h, T, d = 1, 2, 300, 16
        q, k, v = _rand((B, h, T, d), 37), _rand((B, h, T, d), 38), _rand((B, h, T, d), 39)
        padded = _padded_attn(flash_attention_stream, T, 512)
        with pltpu.force_tpu_interpret_mode():
            out = padded(q, k, v, None)
            ref = sdpa(q, k, v, causal_mask(T))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)


class TestStreamGQA:
    """GQA-native streaming kernel: k/v carry fewer heads than q and are
    mapped to query groups by the //g block index maps — no expanded K/V
    in HBM. Oracle: sdpa over jnp.repeat-expanded heads (forward) and its
    grads (dk/dv group-sum = the repeat transpose)."""

    @pytest.mark.parametrize("H,hk,window", [(4, 2, None), (4, 1, None),
                                             (4, 2, 64)])
    def test_forward_and_grads_match_expanded(self, H, hk, window):
        from linalg_tpu.nn import flash_stream as fs

        B, T, d = 2, 512, 16
        g = H // hk
        q = _rand((B, H, T, d), 50)
        k = _rand((B, hk, T, d), 51)
        v = _rand((B, hk, T, d), 52)

        def ref(q, k, v):
            m = causal_mask(T)
            if window is not None:
                i = jnp.arange(T)
                m = jnp.where((i[:, None] - i[None, :]) >= window, -1e9, m)
            return sdpa(q, jnp.repeat(k, g, 1), jnp.repeat(v, g, 1), m)

        with pltpu.force_tpu_interpret_mode():
            o = flash_attention_stream(q, k, v, True, window)
            np.testing.assert_allclose(np.asarray(o), np.asarray(ref(q, k, v)),
                                       atol=1e-5)
            g1 = jax.grad(lambda *a: jnp.sum(jnp.sin(
                flash_attention_stream(*a, True, window))),
                argnums=(0, 1, 2))(q, k, v)
            g2 = jax.grad(lambda *a: jnp.sum(jnp.sin(ref(*a))),
                          argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5)

    def test_bad_head_ratio_raises(self):
        q = _rand((1, 3, 512, 16), 53)
        k = _rand((1, 2, 512, 16), 54)
        with pytest.raises(ValueError, match="divide"):
            flash_attention_stream(q, k, k, True)
