"""Sliding-window attention (GPTConfig.window, --window).

The reference has full causal attention only (/root/reference/ai_comps/
attention.py:12-42 causal_mask); ``window`` is the TPU-serving extension
(Mistral-style local attention): each token attends to the last
``window`` positions including itself, bounding attention cost and live
KV state by the window instead of ctx_len.

Load-bearing oracles:
- the windowed forward == sdpa under an explicitly banded mask;
- KV-cached decode == the windowed full forward, for every positional
  mode, exactly (the cache carries MORE than a window of rows; the
  decode mask bans the stale ones);
- window >= T reproduces full causal attention bit-for-bit.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from linalg_tpu.models.gpt import (
    GPTConfig,
    gpt_apply,
    gpt_decode_step,
    gpt_generate,
    gpt_loss,
    gpt_prefill,
    init_gpt_params,
)
from linalg_tpu.nn.functional import causal_mask, sdpa

CFG = GPTConfig(vocab_size=37, d_model=32, n_heads=4, n_layers=2,
                ctx_len=24, window=6)


def _data(B=3, T=24, seed=0, V=37):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.integers(0, V, (B, T)), jnp.int32)
    y = jnp.asarray(rng.integers(0, V, (B, T)), jnp.int32)
    return x, y


def _banded_attn(window):
    """Reference attention: sdpa under an explicitly banded causal mask."""

    def attn(q, k, v, _mask):
        T = q.shape[2]
        i = jnp.arange(T)
        m = causal_mask(T, dtype=q.dtype)
        far = (i[:, None] - i[None, :]) >= window
        m = jnp.where(far[None, None], jnp.asarray(-1e9, q.dtype), m)
        return sdpa(q, k, v, m)

    return attn


class TestConfig:
    def test_validation(self):
        with pytest.raises(ValueError, match="window"):
            GPTConfig(vocab_size=7, window=0)

    def test_default_full_causal(self):
        assert GPTConfig(vocab_size=7).window is None


class TestForward:
    def test_matches_banded_sdpa(self):
        params = init_gpt_params(CFG, seed=0)
        x, _ = _data()
        got = gpt_apply(params, x, CFG)
        want = gpt_apply(params, x, CFG, attn_fn=_banded_attn(CFG.window))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-10)

    def test_wide_window_equals_full_causal(self):
        cfg_w = GPTConfig(vocab_size=37, d_model=32, n_heads=4, n_layers=2,
                          ctx_len=24, window=24)
        cfg_f = GPTConfig(vocab_size=37, d_model=32, n_heads=4, n_layers=2,
                          ctx_len=24)
        params = init_gpt_params(cfg_f, seed=0)
        x, _ = _data()
        np.testing.assert_array_equal(
            np.asarray(gpt_apply(params, x, cfg_w)),
            np.asarray(gpt_apply(params, x, cfg_f, attn_fn=sdpa)))

    def test_window_changes_output(self):
        params = init_gpt_params(CFG, seed=0)
        x, _ = _data()
        full = GPTConfig(vocab_size=37, d_model=32, n_heads=4, n_layers=2,
                         ctx_len=24)
        assert not np.allclose(np.asarray(gpt_apply(params, x, CFG)),
                               np.asarray(gpt_apply(params, x, full)))

    @pytest.mark.parametrize("pos", ["rope", "alibi"])
    def test_positional_modes(self, pos):
        cfg = GPTConfig(vocab_size=37, d_model=32, n_heads=4, n_layers=2,
                        ctx_len=24, window=5, pos=pos)
        params = init_gpt_params(cfg, seed=1)
        x, _ = _data(seed=1)
        got = gpt_apply(params, x, cfg)
        assert np.all(np.isfinite(np.asarray(got)))
        # ALiBi: window must override the bias (keys beyond the band are
        # BANNED, not just downweighted)
        if pos == "alibi":
            wide = GPTConfig(vocab_size=37, d_model=32, n_heads=4,
                             n_layers=2, ctx_len=24, pos=pos)
            assert not np.allclose(np.asarray(got),
                                   np.asarray(gpt_apply(params, x, wide)))


class TestGrads:
    def test_loss_and_grads_match_banded_reference(self):
        params = init_gpt_params(CFG, seed=0)
        x, y = _data()
        l1, g1 = jax.value_and_grad(gpt_loss)(params, x, y, CFG)
        l2, g2 = jax.value_and_grad(
            lambda p: gpt_loss(p, x, y, CFG,
                               attn_fn=_banded_attn(CFG.window)))(params)
        assert float(l1) == pytest.approx(float(l2), rel=1e-12)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-10)


class TestDecode:
    @pytest.mark.parametrize("pos", ["sinusoidal", "rope", "alibi"])
    def test_decode_matches_full_forward(self, pos):
        """KV-cached greedy decode == windowed full forward — including
        steps where the window has slid past the prompt start."""
        cfg = GPTConfig(vocab_size=37, d_model=32, n_heads=4, n_layers=2,
                        ctx_len=24, window=4, pos=pos)
        params = init_gpt_params(cfg, seed=0)
        x, _ = _data()
        prompt = x[:1, :6]
        logits, cache = gpt_prefill(params, prompt, cfg)
        seq = list(np.asarray(prompt[0]))
        for _ in range(10):  # 6 + 10 = 16 tokens >> window 4
            tok = int(jnp.argmax(logits))
            full = gpt_apply(params, jnp.asarray([seq], jnp.int32), cfg)
            assert int(jnp.argmax(full[0, -1])) == tok
            seq.append(tok)
            logits, cache = gpt_decode_step(
                params, cache, jnp.asarray([tok], jnp.int32), cfg)

    def test_gqa_window_decode(self):
        cfg = GPTConfig(vocab_size=37, d_model=32, n_heads=4, n_layers=2,
                        ctx_len=24, window=5, n_kv_heads=2, pos="rope")
        params = init_gpt_params(cfg, seed=2)
        x, _ = _data(seed=2)
        prompt = x[:1, :8]
        logits, cache = gpt_prefill(params, prompt, cfg)
        seq = list(np.asarray(prompt[0]))
        for _ in range(8):
            tok = int(jnp.argmax(logits))
            full = gpt_apply(params, jnp.asarray([seq], jnp.int32), cfg)
            assert int(jnp.argmax(full[0, -1])) == tok
            seq.append(tok)
            logits, cache = gpt_decode_step(
                params, cache, jnp.asarray([tok], jnp.int32), cfg)

    def test_batched_generate_matches_unbatched(self):
        params = init_gpt_params(CFG, seed=0)
        x, _ = _data()
        prompts = [list(np.asarray(x[0, :7])), list(np.asarray(x[1, :12]))]
        outB = np.asarray(
            gpt_generate(params, CFG, prompts, 8, temperature=1e-6, seed=1))
        for b, p in enumerate(prompts):
            o1 = np.asarray(
                gpt_generate(params, CFG, [p], 8, temperature=1e-6, seed=1))
            np.testing.assert_array_equal(outB[b], o1[0])

    def test_speculative_block_respects_window(self):
        """gpt_decode_block (the speculative verifier / prefix extender)
        under a window: greedy self-draft output == plain greedy decode."""
        from linalg_tpu.models.speculative import gpt_generate_speculative

        params = init_gpt_params(CFG, seed=3)
        rng = np.random.default_rng(3)
        prompt = rng.integers(0, 37, size=(8,)).astype(np.int32)
        want = np.asarray(
            gpt_generate(params, CFG, [list(prompt)], 8,
                         temperature=1e-6))[0]
        got, _ = gpt_generate_speculative(params, CFG, prompt, 8,
                                          n_draft=3, top_k=1, seed=0)
        np.testing.assert_array_equal(np.asarray(got), want)


class TestServe:
    def test_engine_matches_single_stream(self):
        from linalg_tpu.models.gpt import gpt_decode_chunk
        from linalg_tpu.serve import Request, ServeEngine

        params = init_gpt_params(CFG, seed=0)
        rng = np.random.default_rng(5)
        prompt = rng.integers(0, 37, size=(7,)).tolist()
        ids = jnp.asarray(np.asarray(prompt, np.int32)[None])
        logits, cache = gpt_prefill(params, ids, CFG)
        toks, _, _ = gpt_decode_chunk(params, cache, logits,
                                      jax.random.PRNGKey(0), CFG, 8,
                                      1.0, 1, 0.0)
        want = np.asarray(toks)[0].tolist()
        eng = ServeEngine(params, CFG, n_slots=2, chunk=4, top_k=1)
        eng.submit(Request(prompt, 8))
        assert eng.run()[0].tokens == want

    def test_prefix_cache_with_window(self):
        from linalg_tpu.serve import Request, ServeEngine

        params = init_gpt_params(CFG, seed=0)
        rng = np.random.default_rng(6)
        prefix = rng.integers(0, 37, size=(9,)).tolist()
        suffix = rng.integers(0, 37, size=(4,)).tolist()
        want = np.asarray(
            gpt_generate(params, CFG, [prefix + suffix], 6,
                         temperature=1e-6))[0].tolist()
        eng = ServeEngine(params, CFG, n_slots=2, chunk=4, top_k=1)
        pid = eng.register_prefix(prefix)
        eng.submit(Request(suffix, 6, prefix_id=pid))
        assert eng.run()[0].tokens == want


class TestCheckpoint:
    def test_roundtrip_preserves_window(self, tmp_path):
        from linalg_tpu.train.checkpoint import load_ckpt, save_ckpt

        params = init_gpt_params(CFG, seed=0)
        stoi = {str(i): i for i in range(37)}
        itos = {i: str(i) for i in range(37)}
        save_ckpt(tmp_path, params, CFG, stoi, itos)
        p2, cfg2, _, _ = load_ckpt(tmp_path)
        assert cfg2.window == 6
        x, _ = _data()
        np.testing.assert_allclose(np.asarray(gpt_apply(params, x, CFG)),
                                   np.asarray(gpt_apply(p2, x, cfg2)),
                                   atol=1e-6)


class TestTrainer:
    def test_cli_train_with_window(self, tmp_path):
        from linalg_tpu.apps.gpt import build_parser
        from linalg_tpu.train.trainer import train

        args = build_parser().parse_args([
            "--train", "--steps", "10", "--eval_every", "10",
            "--batch_size", "4", "--ctx_len", "32", "--d_model", "32",
            "--heads", "4", "--layers", "1", "--ckpt_dir", str(tmp_path),
            "--window", "8",
        ])
        _, cfg, _, _ = train(args)
        assert cfg.window == 8
        assert (tmp_path / "chars_gpt_best.npz").exists()

    def test_sp_window_trains_on_xla_ring(self, tmp_path):
        """--window composes with --sp via the XLA ring."""
        from linalg_tpu.apps.gpt import build_parser
        from linalg_tpu.train.trainer import train

        args = build_parser().parse_args([
            "--train", "--steps", "10", "--eval_every", "10",
            "--batch_size", "8", "--ctx_len", "32", "--d_model", "32",
            "--heads", "4", "--layers", "1", "--ckpt_dir", str(tmp_path),
            "--dp", "2", "--sp", "4", "--window", "8",
        ])
        _, cfg, _, _ = train(args)
        assert cfg.window == 8
        assert (tmp_path / "chars_gpt_best.npz").exists()

    def test_sp_window_trains_on_pallas_ring(self, tmp_path):
        """--window + --ring pallas trains: the DMA ring carries the band
        (on this CPU host the (dp, sp) mesh takes the documented XLA
        fallback — the single-axis Pallas path is pinned in
        TestPallasRingWindow below)."""
        from linalg_tpu.apps.gpt import build_parser
        from linalg_tpu.train.trainer import train

        args = build_parser().parse_args([
            "--train", "--steps", "10", "--eval_every", "10",
            "--batch_size", "8", "--ctx_len", "32", "--d_model", "32",
            "--heads", "4", "--layers", "1", "--ckpt_dir", str(tmp_path),
            "--sp", "2", "--window", "8", "--ring", "pallas",
        ])
        _, cfg, _, _ = train(args)
        assert cfg.window == 8
        assert (tmp_path / "chars_gpt_best.npz").exists()

    def test_sp_pallas_step_matches_xla_step_window(self):
        # the full sp train step with ring=pallas + window must agree with
        # ring=xla (the multi-axis interpret fallback covers the step
        # plumbing; the kernel band itself is pinned in
        # TestPallasRingWindow)
        from linalg_tpu.parallel.mesh import make_mesh
        from linalg_tpu.parallel.sharding import make_sp_train_step
        from linalg_tpu.train.optim import adamw_init

        mesh = make_mesh((1, 8), ("dp", "sp"))
        params = init_gpt_params(CFG, seed=0)
        x, y = _data(B=2)
        outs = {}
        for name, pallas in (("xla", False), ("pallas", True)):
            step = make_sp_train_step(CFG, mesh, pallas=pallas)
            _, _, loss = step(params, adamw_init(params), x, y)
            outs[name] = float(loss)
        assert outs["xla"] == pytest.approx(outs["pallas"], abs=1e-5)

    def test_sp_ring_loss_matches_unsharded_window(self):
        from linalg_tpu.parallel.mesh import make_mesh
        from linalg_tpu.parallel.sharding import make_sp_train_step
        from linalg_tpu.train.optim import adamw_init

        mesh = make_mesh((1, 8), ("dp", "sp"), jax.devices()[:8])
        params = init_gpt_params(CFG, seed=0)
        x, y = _data(B=2)
        ref = float(gpt_loss(params, x, y, CFG))
        step = make_sp_train_step(CFG, mesh)
        _, _, loss = step(params, adamw_init(params), x, y)
        assert abs(float(loss) - ref) < 1e-4

    def test_moe_window_trains(self):
        from linalg_tpu.models.moe import (MoEGPTConfig, init_moe_params,
                                           moe_gpt_loss)

        cfg = MoEGPTConfig(vocab_size=37, d_model=32, n_heads=4, n_layers=2,
                           ctx_len=24, n_experts=2, window=6)
        params = init_moe_params(cfg, seed=0)
        x, y = _data()
        loss, g = jax.value_and_grad(moe_gpt_loss)(params, x, y, cfg)
        assert np.isfinite(float(loss))
        for leaf in jax.tree.leaves(g):
            assert np.all(np.isfinite(np.asarray(leaf)))


class TestPallasRingWindow:
    """The in-kernel DMA ring carries the sliding-window band.

    A single-axis 'sp' mesh exercises the REAL Pallas kernels in
    interpret mode (multi-axis meshes take the documented XLA fallback);
    windows are chosen to hit all three chunk-liveness regimes with
    Tl = 8: sub-chunk (4), cross-chunk with dead far-past chunks (12),
    and window >= T (40 == full causal).
    """

    def _qkv(self, B=2, H=2, T=32, d=8, seed=7):
        rng = np.random.default_rng(seed)
        return tuple(jnp.asarray(rng.normal(size=(B, H, T, d)), jnp.float32)
                     for _ in range(3))

    def _mesh(self):
        from linalg_tpu.parallel.mesh import make_mesh

        return make_mesh((4,), ("sp",), jax.devices()[:4])

    @pytest.mark.parametrize("window", [4, 12, 40])
    def test_forward_matches_banded_sdpa(self, window):
        from linalg_tpu.parallel import make_ring_attention_pallas

        q, k, v = self._qkv()
        out = make_ring_attention_pallas(self._mesh(), window=window)(q, k, v)
        ref = _banded_attn(window)(q, k, v, None)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_window_ge_T_equals_causal(self):
        from linalg_tpu.parallel import make_ring_attention_pallas

        q, k, v = self._qkv(seed=8)
        mesh = self._mesh()
        win = make_ring_attention_pallas(mesh, window=64)(q, k, v)
        full = make_ring_attention_pallas(mesh)(q, k, v)
        np.testing.assert_allclose(np.asarray(win), np.asarray(full),
                                   atol=1e-6)

    @pytest.mark.parametrize("window", [4, 12])
    def test_backward_matches_banded_sdpa(self, window):
        # the bundle-lap Pallas backward under the band vs autodiff of the
        # banded sdpa oracle
        from linalg_tpu.parallel import make_ring_attention_pallas

        q, k, v = self._qkv(seed=9)
        mesh = self._mesh()
        g_p = jax.grad(lambda q, k, v: jnp.sum(
            make_ring_attention_pallas(mesh, window=window)(q, k, v) ** 2),
            argnums=(0, 1, 2))(q, k, v)
        g_r = jax.grad(lambda q, k, v: jnp.sum(
            _banded_attn(window)(q, k, v, None) ** 2),
            argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_p, g_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

    def test_window_with_alibi_slopes(self):
        from linalg_tpu.nn.positional import alibi_slopes
        from linalg_tpu.parallel import (make_ring_attention,
                                         make_ring_attention_pallas)

        q, k, v = self._qkv(seed=10)
        mesh = self._mesh()
        sl = tuple(float(s) for s in alibi_slopes(q.shape[1]))
        out = make_ring_attention_pallas(mesh, slopes=sl, window=12)(q, k, v)
        ref = make_ring_attention(mesh, slopes=sl, window=12)(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_rejects_non_causal_window(self):
        from linalg_tpu.parallel import make_ring_attention_pallas

        with pytest.raises(ValueError, match="causal"):
            make_ring_attention_pallas(self._mesh(), causal=False, window=8)

    def test_local_bodies_reject_non_causal_window(self):
        # the exported per-device bodies validate too, not only the
        # make_* wrapper (ADVICE r3): otherwise a one-sided band would be
        # silently produced
        from linalg_tpu.parallel.ring_pallas import (
            ring_attention_pallas_bwd_local, ring_attention_pallas_local)

        q, k, v = self._qkv(B=1, H=1, T=8, d=8)
        mesh = self._mesh()
        with pytest.raises(ValueError, match="causal"):
            ring_attention_pallas_local(q, k, v, mesh=mesh, axis="sp",
                                        causal=False, window=4)
        with pytest.raises(ValueError, match="causal"):
            ring_attention_pallas_bwd_local(
                q, k, v, q, jnp.zeros(q.shape[:3]), jnp.zeros(q.shape[:3]),
                mesh=mesh, axis="sp", causal=False, window=4)


class TestStream:
    """Ring-buffer streaming decode (models/stream.py): O(window) KV
    state, unbounded absolute positions, EXACT windowed-forward output."""

    @pytest.mark.parametrize("pos", ["rope", "alibi"])
    def test_stream_matches_full_forward_past_ctx(self, pos):
        from linalg_tpu.models.stream import (gpt_stream_chunk,
                                              gpt_stream_prefill)

        cfg = GPTConfig(vocab_size=37, d_model=32, n_heads=4, n_layers=2,
                        ctx_len=16, window=6, pos=pos)
        params = init_gpt_params(cfg, seed=0)
        rng = np.random.default_rng(0)
        prompt = rng.integers(0, 37, size=(1, 5)).astype(np.int32)
        logits, ring = gpt_stream_prefill(params, jnp.asarray(prompt), cfg)
        seq = list(prompt[0])
        for _ in range(25):  # final length 30 >> ctx_len 16
            toks, logits, ring = gpt_stream_chunk(
                params, ring, logits, jax.random.PRNGKey(0), cfg, 1,
                1e-9, 1, 0.0)
            tok = int(toks[0, 0])
            full = gpt_apply(params, jnp.asarray([seq], jnp.int32), cfg)
            assert int(jnp.argmax(full[0, -1])) == tok
            seq.append(tok)
        assert ring["k"].shape[-2] == 6  # O(window) state, not O(T)

    def test_stream_gqa(self):
        from linalg_tpu.models.stream import (gpt_stream_chunk,
                                              gpt_stream_prefill)

        cfg = GPTConfig(vocab_size=37, d_model=32, n_heads=4, n_layers=2,
                        ctx_len=16, window=5, pos="rope", n_kv_heads=2)
        params = init_gpt_params(cfg, seed=1)
        rng = np.random.default_rng(1)
        prompt = rng.integers(0, 37, size=(1, 7)).astype(np.int32)
        logits, ring = gpt_stream_prefill(params, jnp.asarray(prompt), cfg)
        assert ring["k"].shape[2] == 2  # grouped ring
        seq = list(prompt[0])
        for _ in range(15):
            toks, logits, ring = gpt_stream_chunk(
                params, ring, logits, jax.random.PRNGKey(0), cfg, 1,
                1e-9, 1, 0.0)
            tok = int(toks[0, 0])
            full = gpt_apply(params, jnp.asarray([seq], jnp.int32), cfg)
            assert int(jnp.argmax(full[0, -1])) == tok
            seq.append(tok)

    def test_chunked_equals_stepwise(self):
        from linalg_tpu.models.stream import (gpt_stream_chunk,
                                              gpt_stream_prefill)

        cfg = GPTConfig(vocab_size=37, d_model=32, n_heads=4, n_layers=2,
                        ctx_len=16, window=6, pos="rope")
        params = init_gpt_params(cfg, seed=2)
        prompt = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
        lg1, r1 = gpt_stream_prefill(params, prompt, cfg)
        toksA, _, _ = gpt_stream_chunk(params, r1, lg1,
                                       jax.random.PRNGKey(7), cfg, 12,
                                       1e-9, 1, 0.0)
        lg2, r2 = gpt_stream_prefill(params, prompt, cfg)
        got = []
        key = jax.random.PRNGKey(7)  # same key tree as the 12-chunk scan
        keys = jax.random.split(key, 12)
        for k in keys:
            t, lg2, r2 = gpt_stream_chunk(params, r2, lg2, k, cfg, 1,
                                          1e-9, 1, 0.0)
            got.append(int(t[0, 0]))
        np.testing.assert_array_equal(np.asarray(toksA)[0], got)

    def test_validation(self):
        from linalg_tpu.models.stream import init_stream_cache

        with pytest.raises(ValueError, match="window"):
            init_stream_cache(GPTConfig(vocab_size=7, pos="rope"))
        with pytest.raises(ValueError, match="rope"):
            init_stream_cache(GPTConfig(vocab_size=7, window=4))

    def test_sampler_streams_past_ctx(self):
        """trainer.sample on a windowed rope model: unbounded stream, no
        rollover re-prefill, output continues fluently past ctx_len."""
        from linalg_tpu.train.trainer import sample

        cfg = GPTConfig(vocab_size=37, d_model=32, n_heads=4, n_layers=2,
                        ctx_len=16, window=6, pos="rope")
        params = init_gpt_params(cfg, seed=0)
        itos = {i: chr(97 + (i % 26)) for i in range(37)}
        out = list(sample(params, cfg, np.asarray([1, 2, 3]), itos,
                          steps=100, seed=0))
        assert len(out) == 100  # 100 tokens >> ctx 16: no rollover crash


class TestBeam:
    def test_beam1_equals_greedy_with_window(self):
        """Beam search rides _make_decode_step, so the window flows
        through; beam=1 must equal greedy decode on a windowed model."""
        from linalg_tpu.models.beam import gpt_generate_beam

        params = init_gpt_params(CFG, seed=4)
        rng = np.random.default_rng(4)
        prompt = rng.integers(0, 37, size=(6,)).astype(np.int32)
        greedy = np.asarray(
            gpt_generate(params, CFG, [list(prompt)], 8,
                         temperature=1e-6))[0]
        beam, _ = gpt_generate_beam(params, CFG, prompt, 8, beam=1)
        np.testing.assert_array_equal(np.asarray(beam), greedy)


class TestRingEngine:
    """Ring-mode serve engine: windowed rope/alibi models get O(window)
    slot KV with unbounded positions — a request's generation budget is
    no longer capped by ctx_len."""

    RCFG = GPTConfig(vocab_size=37, d_model=32, n_heads=4, n_layers=2,
                     ctx_len=24, window=6, pos="rope")

    def _stream_oracle(self, params, cfg, prompt, n):
        from linalg_tpu.models.stream import (gpt_stream_chunk,
                                              gpt_stream_prefill)

        ids = jnp.asarray(np.asarray(prompt, np.int32)[None])
        logits, ring = gpt_stream_prefill(params, ids, cfg)
        toks, _, _ = gpt_stream_chunk(params, ring, logits,
                                      jax.random.PRNGKey(0), cfg, n,
                                      1.0, 1, 0.0)
        return np.asarray(toks)[0].tolist()

    def test_ring_mode_auto_and_shapes(self):
        from linalg_tpu.serve import ServeEngine

        params = init_gpt_params(self.RCFG, seed=0)
        eng = ServeEngine(params, self.RCFG, n_slots=3, chunk=4)
        assert eng._ring
        assert eng._cache["k"].shape[-2] == 6  # window rows, not ctx 24
        # sinusoidal windowed cfg stays on the bounded path
        eng2 = ServeEngine(init_gpt_params(CFG, seed=0), CFG, n_slots=2,
                           chunk=4)
        assert not eng2._ring

    def test_matches_stream_oracle(self):
        from linalg_tpu.serve import Request, ServeEngine

        params = init_gpt_params(self.RCFG, seed=0)
        rng = np.random.default_rng(0)
        prompts = [rng.integers(0, 37, size=(int(n),)).tolist()
                   for n in (4, 7, 5)]
        eng = ServeEngine(params, self.RCFG, n_slots=2, chunk=4, top_k=1)
        ids = [eng.submit(Request(p, 8)) for p in prompts]
        done = {c.request_id: c.tokens for c in eng.run()}
        for rid, p in zip(ids, prompts):
            assert done[rid] == self._stream_oracle(params, self.RCFG, p, 8)

    def test_unbounded_generation_past_ctx(self):
        """max_new_tokens + prompt far beyond ctx_len: rejected by the
        bounded engine, served exactly by the ring engine."""
        from linalg_tpu.serve import Request, ServeEngine

        params = init_gpt_params(self.RCFG, seed=1)
        rng = np.random.default_rng(1)
        prompt = rng.integers(0, 37, size=(6,)).tolist()
        n = 64  # 6 + 64 = 70 >> ctx 24
        bounded_cfg = GPTConfig(vocab_size=37, d_model=32, n_heads=4,
                                n_layers=2, ctx_len=24, window=6)
        beng = ServeEngine(init_gpt_params(bounded_cfg, seed=1),
                           bounded_cfg, n_slots=2, chunk=4, top_k=1)
        with pytest.raises(ValueError, match="reserved"):
            beng.submit(Request(prompt, n))
        eng = ServeEngine(params, self.RCFG, n_slots=2, chunk=4, top_k=1)
        eng.submit(Request(prompt, n))
        out = eng.run()[0]
        assert len(out.tokens) == n
        assert out.tokens == self._stream_oracle(params, self.RCFG,
                                                 prompt, n)

    def test_prefix_cache_in_ring_mode(self):
        from linalg_tpu.serve import Request, ServeEngine

        params = init_gpt_params(self.RCFG, seed=2)
        rng = np.random.default_rng(2)
        prefix = rng.integers(0, 37, size=(9,)).tolist()
        suffix = rng.integers(0, 37, size=(4,)).tolist()
        eng = ServeEngine(params, self.RCFG, n_slots=2, chunk=4, top_k=1)
        pid = eng.register_prefix(prefix)
        eng.submit(Request(suffix, 30, prefix_id=pid))  # past ctx
        out = eng.run()[0]
        assert out.tokens == self._stream_oracle(params, self.RCFG,
                                                 prefix + suffix, 30)

    def test_slot_reuse_and_mixed_lengths(self):
        from linalg_tpu.serve import Request, ServeEngine

        params = init_gpt_params(self.RCFG, seed=3)
        rng = np.random.default_rng(3)
        reqs = [rng.integers(0, 37, size=(int(l),)).tolist()
                for l in (3, 8, 5, 6, 4)]
        budgets = [5, 40, 9, 17, 30]
        eng = ServeEngine(params, self.RCFG, n_slots=2, chunk=4, top_k=1)
        ids = [eng.submit(Request(p, n)) for p, n in zip(reqs, budgets)]
        done = {c.request_id: c.tokens for c in eng.run()}
        for rid, p, n in zip(ids, reqs, budgets):
            assert done[rid] == self._stream_oracle(params, self.RCFG, p, n)
