"""Continuous-batching serving engine tests (linalg_tpu/serve).

The correctness claim is slot isolation: a request decoded inside a busy
multi-slot engine batch yields EXACTLY the tokens of the single-stream
KV-cached decode (models.gpt.gpt_prefill + gpt_decode_chunk), regardless of
what the other slots are doing, when it was admitted, or how the chunk
boundary falls. Greedy (top_k=1) pins this without RNG coupling.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from linalg_tpu.models.gpt import (
    GPTConfig,
    gpt_decode_chunk,
    gpt_prefill,
    init_gpt_params,
)
from linalg_tpu.nn.cache import fkv_write_slots
from linalg_tpu.serve import Completion, Request, ServeEngine, serve

CFG = GPTConfig(vocab_size=31, d_model=32, n_heads=2, n_layers=2, ctx_len=64)
PARAMS = init_gpt_params(CFG, seed=7)


def greedy_single(params, cfg, prompt, n):
    """Single-stream greedy oracle: prefill + shared-position decode chunk."""
    ids = jnp.asarray(np.asarray(prompt, np.int32)[None])
    logits, cache = gpt_prefill(params, ids, cfg)
    toks, _, _ = gpt_decode_chunk(params, cache, logits,
                                  jax.random.PRNGKey(0), cfg, n,
                                  1.0, 1, 0.0)
    return np.asarray(toks)[0].tolist()


def rng_prompt(rng, cfg, lo=3, hi=12):
    return rng.integers(0, cfg.vocab_size, size=rng.integers(lo, hi)).tolist()


class TestFkvWriteSlots:
    def test_per_slot_positions(self):
        B, h, T, d = 3, 2, 8, 4
        k = jnp.zeros((B, h, T, d), jnp.float32)
        v = jnp.ones((B, h, T, d), jnp.float32)
        kn = jnp.arange(B * h * d, dtype=jnp.float32).reshape(B, h, 1, d)
        pos = jnp.asarray([0, 3, 7])
        k2, v2 = fkv_write_slots(k, v, pos, kn, kn + 100)
        for b, p in enumerate([0, 3, 7]):
            np.testing.assert_array_equal(np.asarray(k2)[b, :, p], np.asarray(kn)[b, :, 0])
            np.testing.assert_array_equal(np.asarray(v2)[b, :, p], np.asarray(kn)[b, :, 0] + 100)
            # untouched rows keep their old values
            other = [t for t in range(T) if t != p]
            np.testing.assert_array_equal(np.asarray(k2)[b, :, other], 0.0)
            np.testing.assert_array_equal(np.asarray(v2)[b, :, other], 1.0)

    def test_multi_token_write(self):
        B, h, T, d = 2, 1, 8, 4
        k = jnp.zeros((B, h, T, d), jnp.float32)
        kn = jnp.ones((B, h, 3, d), jnp.float32)
        k2, _ = fkv_write_slots(k, k, jnp.asarray([1, 4]), kn, kn)
        assert np.asarray(k2)[0, 0, 1:4].sum() == 3 * d
        assert np.asarray(k2)[1, 0, 4:7].sum() == 3 * d


class TestEngineGreedyEquality:
    def test_single_request_matches_single_stream(self):
        rng = np.random.default_rng(0)
        prompt = rng_prompt(rng, CFG)
        want = greedy_single(PARAMS, CFG, prompt, 10)
        out = serve(PARAMS, CFG, [Request(prompt, 10)],
                    n_slots=3, chunk=4, top_k=1)
        assert len(out) == 1
        assert out[0].tokens == want
        assert out[0].finish_reason == "length"

    @pytest.mark.parametrize("pos", ["rope", "alibi", "learned"])
    def test_positional_modes(self, pos):
        cfg = GPTConfig(vocab_size=31, d_model=32, n_heads=2, n_layers=2,
                        ctx_len=64, pos=pos)
        params = init_gpt_params(cfg, seed=9)
        rng = np.random.default_rng(1)
        prompt = rng_prompt(rng, cfg)
        want = greedy_single(params, cfg, prompt, 8)
        out = serve(params, cfg, [Request(prompt, 8)],
                    n_slots=2, chunk=4, top_k=1)
        assert out[0].tokens == want

    @pytest.mark.parametrize("ffn", ["swiglu", "geglu"])
    def test_ffn_variants(self, ffn):
        cfg = GPTConfig(vocab_size=31, d_model=32, n_heads=2, n_layers=2,
                        ctx_len=64, ffn=ffn)
        params = init_gpt_params(cfg, seed=9)
        rng = np.random.default_rng(1)
        prompt = rng_prompt(rng, cfg)
        want = greedy_single(params, cfg, prompt, 8)
        out = serve(params, cfg, [Request(prompt, 8)],
                    n_slots=2, chunk=4, top_k=1)
        assert out[0].tokens == want

    def test_concurrent_requests_are_isolated(self):
        """Requests of different lengths decoding simultaneously in one
        batch each match their solo single-stream decode exactly."""
        rng = np.random.default_rng(2)
        reqs = [Request(rng_prompt(rng, CFG), int(n)) for n in (5, 11, 7, 16)]
        want = [greedy_single(PARAMS, CFG, r.prompt, r.max_new_tokens)
                for r in reqs]
        out = serve(PARAMS, CFG, reqs, n_slots=4, chunk=4, top_k=1)
        assert [c.tokens for c in out] == want

    def test_staggered_admission_and_slot_reuse(self):
        """More requests than slots: late requests are admitted into freed
        slots mid-stream (different absolute chunk phase) and still match."""
        rng = np.random.default_rng(3)
        reqs = [Request(rng_prompt(rng, CFG), int(n))
                for n in (3, 9, 4, 13, 6, 8)]
        want = [greedy_single(PARAMS, CFG, r.prompt, r.max_new_tokens)
                for r in reqs]
        eng = ServeEngine(PARAMS, CFG, n_slots=2, chunk=4, top_k=1)
        for r in reqs:
            eng.submit(r)
        done = eng.run()
        assert len(done) == len(reqs)
        by_id = {c.request_id: c for c in done}
        for i in range(len(reqs)):
            assert by_id[i].tokens == want[i], f"request {i} diverged"
        assert eng.stats["prefills"] == len(reqs)
        assert eng.n_active == 0 and eng.pending == 0

    def test_incremental_submit_mid_flight(self):
        """submit() while the engine is mid-decode joins the in-flight batch
        without disturbing the running request."""
        rng = np.random.default_rng(4)
        a = Request(rng_prompt(rng, CFG), 12)
        b = Request(rng_prompt(rng, CFG), 6)
        want_a = greedy_single(PARAMS, CFG, a.prompt, 12)
        want_b = greedy_single(PARAMS, CFG, b.prompt, 6)
        eng = ServeEngine(PARAMS, CFG, n_slots=2, chunk=3, top_k=1)
        eng.submit(a)
        assert eng.step()  # a alone for one chunk
        eng.submit(b)      # b joins mid-flight
        eng.run()
        by_id = {c.request_id: c for c in eng.completions}
        assert by_id[0].tokens == want_a
        assert by_id[1].tokens == want_b


class TestEngineSemantics:
    def test_stop_token(self):
        rng = np.random.default_rng(5)
        prompt = rng_prompt(rng, CFG)
        full = greedy_single(PARAMS, CFG, prompt, 16)
        stop = full[4]  # force an early stop at the 5th generated token
        out = serve(PARAMS, CFG,
                    [Request(prompt, 16, stop_token=stop)],
                    n_slots=2, chunk=4, top_k=1)
        c = out[0]
        assert c.finish_reason == "stop"
        assert c.tokens == full[:full.index(stop) + 1]

    def test_latency_fields(self):
        # host-observable request timing: submit <= admit <= finish, and
        # a QUEUED request (more requests than slots) waits measurably
        rng = np.random.default_rng(55)
        reqs = [Request(rng_prompt(rng, CFG), 8) for _ in range(3)]
        out = serve(PARAMS, CFG, reqs, n_slots=1, chunk=4, top_k=1)
        assert len(out) == 3
        for c in out:
            assert c.submitted_at <= c.admitted_at <= c.finished_at
            assert c.queue_s >= 0 and c.latency_s > 0
            assert c.decode_tok_s > 0
        # with one slot the later requests queue behind the first
        by_finish = sorted(out, key=lambda c: c.finished_at)
        assert by_finish[-1].queue_s > by_finish[0].queue_s

    def test_chunk_boundary_exact_budget(self):
        """max_new_tokens equal to and off by one from the chunk size."""
        rng = np.random.default_rng(6)
        prompt = rng_prompt(rng, CFG)
        for n in (4, 5, 8):
            want = greedy_single(PARAMS, CFG, prompt, n)
            out = serve(PARAMS, CFG, [Request(prompt, n)],
                        n_slots=1, chunk=4, top_k=1)
            assert out[0].tokens == want

    def test_validation(self):
        eng = ServeEngine(PARAMS, CFG, n_slots=2, chunk=8)
        with pytest.raises(ValueError, match="empty prompt"):
            eng.submit(Request([], 4))
        # since round 5 prompts past prefill_window admit via chunked
        # prefill; only the ctx BUDGET rejects
        with pytest.raises(ValueError, match="exceeds ctx_len"):
            eng.submit(Request(list(range(CFG.ctx_len)), 4))
        with pytest.raises(ValueError, match="exceeds ctx_len"):
            eng.submit(Request([1, 2, 3], CFG.ctx_len))
        with pytest.raises(ValueError, match="max_new_tokens"):
            eng.submit(Request([1], 0))

    def test_sampling_reproducible_and_in_range(self):
        rng = np.random.default_rng(7)
        reqs = [Request(rng_prompt(rng, CFG), 8, temperature=0.8, top_p=0.9),
                Request(rng_prompt(rng, CFG), 8, temperature=1.3)]
        out1 = serve(PARAMS, CFG, list(reqs), n_slots=2, chunk=4, seed=42)
        out2 = serve(PARAMS, CFG, list(reqs), n_slots=2, chunk=4, seed=42)
        assert [c.tokens for c in out1] == [c.tokens for c in out2]
        for c in out1:
            assert len(c.tokens) == 8
            assert all(0 <= t < CFG.vocab_size for t in c.tokens)

    def test_latency_fields(self):
        rng = np.random.default_rng(8)
        out = serve(PARAMS, CFG, [Request(rng_prompt(rng, CFG), 4)],
                    n_slots=1, chunk=4)
        c = out[0]
        assert c.finished_at >= c.submitted_at > 0
        assert isinstance(c, Completion) and c.prompt_len > 0


class TestServeMoE:
    """MoE continuous batching: per-row routing groups make each slot's
    routing independent, so engine outputs must equal the single-stream
    MoE decode exactly (greedy).

    The oracle prefills through the SAME right-padded window the engine's
    admission uses: MoE expert capacity scales with the (static) prefill
    length, so a window-padded prefill can route a real token that the
    unpadded prompt would have dropped to overflow (strictly fewer drops,
    never more — pads queue after real tokens). The equality claim is slot
    ISOLATION, which the shared window isolates from that documented
    capacity semantics."""

    def _setup(self, top_k=1):
        from linalg_tpu.models.moe import MoEGPTConfig, init_moe_params

        cfg = MoEGPTConfig(vocab_size=31, d_model=32, n_heads=2, n_layers=2,
                           ctx_len=64, n_experts=4, router_top_k=top_k)
        return cfg, init_moe_params(cfg, seed=21)

    def _greedy_single(self, params, cfg, prompt, n, window):
        from linalg_tpu.models.moe import moe_decode_chunk, moe_prefill

        ids = np.zeros((1, window), np.int32)
        ids[0, :len(prompt)] = np.asarray(prompt, np.int32)
        logits, cache = moe_prefill(params, jnp.asarray(ids), cfg,
                                    length=len(prompt))
        toks, _, _ = moe_decode_chunk(params, cache, logits,
                                      jax.random.PRNGKey(0), cfg, n,
                                      1.0, 1, 0.0)
        return np.asarray(toks)[0].tolist()

    @pytest.mark.parametrize("router_top_k", [1, 2])
    def test_concurrent_matches_single_stream(self, router_top_k):
        cfg, params = self._setup(router_top_k)
        rng = np.random.default_rng(6)
        reqs = [Request(rng_prompt(rng, cfg), int(n)) for n in (5, 9, 7)]
        eng = ServeEngine(params, cfg, n_slots=3, chunk=4, top_k=1)
        want = [self._greedy_single(params, cfg, r.prompt, r.max_new_tokens,
                                    eng.prefill_window)
                for r in reqs]
        for r in reqs:
            eng.submit(r)
        out = sorted(eng.run(), key=lambda c: c.request_id)
        assert [c.tokens for c in out] == want

    def test_slot_reuse(self):
        cfg, params = self._setup()
        rng = np.random.default_rng(7)
        reqs = [Request(rng_prompt(rng, cfg), int(n)) for n in (3, 8, 5, 6)]
        eng = ServeEngine(params, cfg, n_slots=2, chunk=4, top_k=1)
        want = [self._greedy_single(params, cfg, r.prompt, r.max_new_tokens,
                                    eng.prefill_window)
                for r in reqs]
        for r in reqs:
            eng.submit(r)
        done = eng.run()
        by_id = {c.request_id: c for c in done}
        assert [by_id[i].tokens for i in range(len(reqs))] == want


class TestPerSlotTopK:
    def test_vector_filter_matches_static(self):
        from linalg_tpu.models.gpt import filter_logits

        rng = np.random.default_rng(9)
        z = jnp.asarray(rng.normal(size=(4, 31)), jnp.float32)
        for k in (1, 3, 10, 31):
            want = np.asarray(filter_logits(z, 0.9, k, 0.0))
            got = np.asarray(filter_logits(
                z, 0.9, jnp.full((4, 1), k, jnp.int32), 0.0))
            np.testing.assert_allclose(got, want)
        # k == 0 disables; vector path must match the static no-op
        got0 = np.asarray(filter_logits(z, 0.9, jnp.zeros((4, 1), jnp.int32),
                                        0.0))
        np.testing.assert_allclose(got0, np.asarray(filter_logits(z, 0.9, 0,
                                                                  0.0)))

    def test_mixed_slot_topk(self):
        """A greedy (top_k=1) request decodes EXACTLY its single-stream
        tokens while a free-sampling request shares the batch."""
        rng = np.random.default_rng(10)
        greedy = Request(rng_prompt(rng, CFG), 10, top_k=1)
        wild = Request(rng_prompt(rng, CFG), 10, temperature=1.4, top_k=0)
        want = greedy_single(PARAMS, CFG, greedy.prompt, 10)
        out = serve(PARAMS, CFG, [greedy, wild], n_slots=2, chunk=4,
                    top_k=0)
        by_id = {c.request_id: c for c in out}
        assert by_id[0].tokens == want
        assert all(0 <= t < CFG.vocab_size for t in by_id[1].tokens)

    def test_engine_default_fallback(self):
        """Requests without top_k inherit the engine-wide default."""
        rng = np.random.default_rng(11)
        prompt = rng_prompt(rng, CFG)
        want = greedy_single(PARAMS, CFG, prompt, 8)
        out = serve(PARAMS, CFG, [Request(prompt, 8)], n_slots=2, chunk=4,
                    top_k=1)
        assert out[0].tokens == want


class TestServeQuant:
    """Int8 weight-only decode inside the engine: exact slot-isolation pin
    against the single-stream quantized decode (same ops, same cache
    contract), plus the dense-only guard."""

    def _greedy_single_q(self, prompt, n):
        from linalg_tpu.models.quant import (gpt_decode_chunk_q,
                                             quantize_gpt_params)

        ids = jnp.asarray(np.asarray(prompt, np.int32)[None])
        logits, cache = gpt_prefill(PARAMS, ids, CFG)
        q = quantize_gpt_params(PARAMS, CFG)
        toks, _, _ = gpt_decode_chunk_q(q, cache, logits,
                                        jax.random.PRNGKey(0), CFG, n,
                                        1.0, 1, 0.0)
        return np.asarray(toks)[0].tolist()

    def test_concurrent_matches_single_stream_quant(self):
        rng = np.random.default_rng(12)
        reqs = [Request(rng_prompt(rng, CFG), int(n)) for n in (6, 10)]
        want = [self._greedy_single_q(r.prompt, r.max_new_tokens)
                for r in reqs]
        out = serve(PARAMS, CFG, reqs, n_slots=2, chunk=4, top_k=1,
                    quant="int8")
        assert [c.tokens for c in out] == want

    def test_moe_quant_raises(self):
        from linalg_tpu.models.moe import MoEGPTConfig, init_moe_params

        mcfg = MoEGPTConfig(vocab_size=31, d_model=32, n_heads=2,
                            n_layers=2, ctx_len=64, n_experts=2)
        with pytest.raises(ValueError, match="dense"):
            ServeEngine(init_moe_params(mcfg, seed=0), mcfg, quant="int8")

    def test_unknown_quant_raises(self):
        with pytest.raises(ValueError, match="quant"):
            ServeEngine(PARAMS, CFG, quant="fp4")


class TestServeCLI:
    """--serve end-to-end: checkpoint -> prompts file -> engine -> JSONL.

    The engine's token equality is pinned above; this pins the CLI
    plumbing — encode, reference-style tail truncation of over-window
    prompts, request-order output, unencodable-prompt handling, and the
    JSONL schema.
    """

    def _ckpt(self, tmp_path):
        from linalg_tpu.train.checkpoint import save_ckpt

        chars = "abcdefghijklmnopqrstuvwxyz .,!?"  # 31 = CFG.vocab_size
        assert len(chars) == CFG.vocab_size
        stoi = {c: i for i, c in enumerate(chars)}
        itos = {i: c for i, c in enumerate(chars)}
        save_ckpt(tmp_path, PARAMS, CFG, stoi, itos)
        return stoi, itos

    def _serve_args(self, tmp_path, **over):
        from linalg_tpu.apps.gpt import build_parser

        args = build_parser().parse_args([
            "--serve", "--ckpt_dir", str(tmp_path),
            "--prompts", str(tmp_path / "prompts.txt"),
            "--out", str(tmp_path / "out.jsonl"),
            "--gen_tokens", "6", "--n_slots", "2", "--chunk", "4",
            "--top_k", "1",  # greedy: deterministic
        ])
        for k, v in over.items():
            setattr(args, k, v)
        return args

    def test_serve_cli_jsonl(self, tmp_path, capsys):
        import json

        from linalg_tpu.apps.gpt import serve_cli

        stoi, itos = self._ckpt(tmp_path)
        long_prompt = "the quick brown fox " * 8  # > prefill window (56)
        (tmp_path / "prompts.txt").write_text(
            "hello world\n\n" + long_prompt + "\n###\n", encoding="utf-8")
        serve_cli(self._serve_args(tmp_path))
        out = capsys.readouterr().out
        assert "tok/s useful" in out
        rows = [json.loads(ln) for ln in
                (tmp_path / "out.jsonl").read_text().splitlines()]
        # blank line dropped; "###" has no encodable chars -> empty row
        assert [r["id"] for r in rows] == [0, 1, 2]
        assert rows[0]["prompt"] == "hello world"
        assert rows[2]["finish_reason"] == "empty" and rows[2]["text"] == ""
        for r in rows[:2]:
            assert r["new_tokens"] == 6
            assert len(r["text"]) == 6
            assert all(ch in stoi for ch in r["text"])

        # greedy CLI output == single-stream greedy oracle (tail-truncated
        # prompt, exactly as the CLI must feed the engine: ctx 64 minus the
        # 8-row reserved budget for gen=6 in 4-token chunks -> 56)
        ids = [stoi[c] for c in long_prompt if c in stoi][-56:]
        want = greedy_single(PARAMS, CFG, ids, 6)
        assert rows[1]["text"] == "".join(itos[t] for t in want)

    def test_serve_cli_stdout_mode(self, tmp_path, capsys):
        from linalg_tpu.apps.gpt import serve_cli

        self._ckpt(tmp_path)
        (tmp_path / "prompts.txt").write_text("hello\n", encoding="utf-8")
        serve_cli(self._serve_args(tmp_path, out=""))
        out = capsys.readouterr().out
        assert "--- [0] 'hello'" in out

    def test_serve_cli_prefix_file(self, tmp_path, capsys):
        """--prefix_file: output equals the single-stream greedy decode of
        prefix + prompt (one shared prefill, per-request suffix extend)."""
        import json

        from linalg_tpu.apps.gpt import serve_cli

        stoi, itos = self._ckpt(tmp_path)
        prefix_text = "the quick brown fox jumps"
        (tmp_path / "sys.txt").write_text(prefix_text, encoding="utf-8")
        (tmp_path / "prompts.txt").write_text(" over\n lazy\n",
                                              encoding="utf-8")
        serve_cli(self._serve_args(tmp_path,
                                   prefix_file=str(tmp_path / "sys.txt")))
        rows = [json.loads(ln) for ln in
                (tmp_path / "out.jsonl").read_text().splitlines()]
        assert len(rows) == 2
        for row, suffix in zip(rows, (" over", " lazy")):
            ids = [stoi[c] for c in (prefix_text + suffix)]
            want = greedy_single(PARAMS, CFG, ids, 6)
            assert row["text"] == "".join(itos[t] for t in want)

    def test_serve_cli_auto_prefix(self, tmp_path, capsys):
        """--auto_prefix: prompts submit as prefix+line with NO explicit
        prefix_id; the engine's submit-time matcher splits them. Output
        must equal the explicit --prefix_file path's."""
        import json

        from linalg_tpu.apps.gpt import serve_cli

        stoi, itos = self._ckpt(tmp_path)
        prefix_text = "the quick brown fox jumps"
        (tmp_path / "sys.txt").write_text(prefix_text, encoding="utf-8")
        (tmp_path / "prompts.txt").write_text(" over\n lazy\n",
                                              encoding="utf-8")
        serve_cli(self._serve_args(tmp_path, auto_prefix=True,
                                   prefix_file=str(tmp_path / "sys.txt")))
        rows = [json.loads(ln) for ln in
                (tmp_path / "out.jsonl").read_text().splitlines()]
        assert len(rows) == 2
        for row, suffix in zip(rows, (" over", " lazy")):
            ids = [stoi[c] for c in (prefix_text + suffix)]
            want = greedy_single(PARAMS, CFG, ids, 6)
            assert row["text"] == "".join(itos[t] for t in want)


class TestPrefixCache:
    """Prefix caching: register a shared prompt prefix once, admit requests
    that reuse its KV and block-extend with only their suffix. Oracle: the
    engine given the FULL prompt (prefix + suffix) as a plain request."""

    def _eng(self, cfg=None, params=None, **kw):
        return ServeEngine(params if params is not None else PARAMS,
                           cfg if cfg is not None else CFG,
                           n_slots=2, chunk=4, top_k=1, **kw)

    @pytest.mark.parametrize("pos", ["sinusoidal", "rope", "alibi",
                                     "learned"])
    def test_matches_full_prompt(self, pos):
        cfg = GPTConfig(vocab_size=31, d_model=32, n_heads=2, n_layers=2,
                        ctx_len=64, pos=pos)
        params = init_gpt_params(cfg, seed=9)
        rng = np.random.default_rng(4)
        prefix = rng_prompt(rng, cfg, 8, 16)
        suffixes = [rng_prompt(rng, cfg, 2, 6) for _ in range(3)]
        want = [greedy_single(params, cfg, prefix + s, 8) for s in suffixes]

        eng = self._eng(cfg, params)
        pid = eng.register_prefix(prefix)
        for s in suffixes:
            eng.submit(Request(s, 8, prefix_id=pid))
        done = sorted(eng.run(), key=lambda c: c.request_id)
        assert [c.tokens for c in done] == want

    def test_gqa_prefix(self):
        cfg = GPTConfig(vocab_size=31, d_model=32, n_heads=4, n_layers=2,
                        ctx_len=64, n_kv_heads=2, pos="rope")
        params = init_gpt_params(cfg, seed=3)
        rng = np.random.default_rng(5)
        prefix, suffix = rng_prompt(rng, cfg, 8, 16), rng_prompt(rng, cfg)
        want = greedy_single(params, cfg, prefix + suffix, 6)
        eng = self._eng(cfg, params)
        pid = eng.register_prefix(prefix)
        eng.submit(Request(suffix, 6, prefix_id=pid))
        assert eng.run()[0].tokens == want

    def test_long_prompts_with_and_without_prefix(self):
        """Prompts past prefill_window admit EITHER via a registered
        prefix or (round 5) via chunked prefill — token-equal paths."""
        rng = np.random.default_rng(6)
        prefix = rng_prompt(rng, CFG, 30, 31)  # 30 tokens
        suffix = rng_prompt(rng, CFG, 6, 8)
        eng = self._eng(prefill_window=16)
        want = greedy_single(PARAMS, CFG, prefix + suffix, 4)
        # chunked prefill: the raw long prompt just admits now
        rid_plain = eng.submit(Request(prefix + suffix, 4))
        pid = eng.register_prefix(prefix)
        rid_pref = eng.submit(Request(suffix, 4, prefix_id=pid))
        done = {c.request_id: c.tokens for c in eng.run()}
        assert done[rid_plain] == want
        assert done[rid_pref] == want

    def test_mixed_prefix_and_plain_slots(self):
        """A prefix-cached request and a plain request decode side by side
        in one engine batch without cross-talk."""
        rng = np.random.default_rng(7)
        prefix = rng_prompt(rng, CFG, 10, 14)
        suffix = rng_prompt(rng, CFG, 3, 6)
        plain = rng_prompt(rng, CFG)
        want_pref = greedy_single(PARAMS, CFG, prefix + suffix, 7)
        want_plain = greedy_single(PARAMS, CFG, plain, 7)
        eng = self._eng()
        pid = eng.register_prefix(prefix)
        a = eng.submit(Request(suffix, 7, prefix_id=pid))
        b = eng.submit(Request(plain, 7))
        done = {c.request_id: c.tokens for c in eng.run()}
        assert done[a] == want_pref and done[b] == want_plain

    def test_slot_reuse_after_prefix_request(self):
        """A later PLAIN admission fully overwrites a prefix slot."""
        rng = np.random.default_rng(8)
        prefix = rng_prompt(rng, CFG, 10, 14)
        plain = rng_prompt(rng, CFG)
        eng = ServeEngine(PARAMS, CFG, n_slots=1, chunk=4, top_k=1)
        pid = eng.register_prefix(prefix)
        eng.submit(Request(rng_prompt(rng, CFG, 2, 4), 5, prefix_id=pid))
        eng.submit(Request(plain, 5))
        done = sorted(eng.run(), key=lambda c: c.request_id)
        assert done[1].tokens == greedy_single(PARAMS, CFG, plain, 5)

    def test_validation(self):
        eng = self._eng()
        with pytest.raises(ValueError, match="unknown prefix_id"):
            eng.submit(Request([1, 2], 4, prefix_id=99))
        with pytest.raises(ValueError, match="prefix length"):
            eng.register_prefix([])
        with pytest.raises(ValueError, match="prefix length"):
            eng.register_prefix(list(range(CFG.ctx_len)))
        pid = eng.register_prefix(list(range(20)))
        # prefix + prompt + reserved budget must fit ctx_len (64)
        with pytest.raises(ValueError, match="reserved decode budget"):
            eng.submit(Request(list(range(12)), 33, prefix_id=pid))

    def test_moe_rejected(self):
        from linalg_tpu.models.moe import MoEGPTConfig, init_moe_params

        cfg = MoEGPTConfig(vocab_size=31, d_model=32, n_heads=2, n_layers=2,
                           ctx_len=64, n_experts=2)
        eng = ServeEngine(init_moe_params(cfg, seed=0), cfg, n_slots=2,
                          chunk=4)
        with pytest.raises(ValueError, match="dense GPT only"):
            eng.register_prefix([1, 2, 3])



class TestServeTP:
    """Tensor-parallel serving (ServeEngine(mesh=...)): params megatron-
    sharded on 'tp', KV cache head-sharded, GSPMD inserts the collectives.
    The contract is TOKEN-IDENTICAL output to the unsharded engine."""

    def _mesh(self, tp=4):
        from jax.sharding import Mesh

        return Mesh(np.asarray(jax.devices()[:tp]).reshape(1, tp),
                    ("dp", "tp"))

    def _run(self, params, cfg, prompts, n, mesh=None, **kw):
        eng = ServeEngine(params, cfg, n_slots=2, chunk=4, top_k=1,
                          mesh=mesh, **kw)
        ids = [eng.submit(Request(p, n)) for p in prompts]
        done = {c.request_id: c.tokens for c in eng.run()}
        return [done[i] for i in ids]

    def test_matches_unsharded(self):
        rng = np.random.default_rng(0)
        prompts = [rng_prompt(rng, CFG) for _ in range(4)]
        want = self._run(PARAMS, CFG, prompts, 8)
        got = self._run(PARAMS, CFG, prompts, 8, mesh=self._mesh())
        assert got == want

    def test_gqa_rope_tp(self):
        """tp=4 with kv_heads=2: KV head shards are finer than whole heads;
        GSPMD reshards, tokens must not change."""
        cfg = GPTConfig(vocab_size=31, d_model=32, n_heads=4, n_layers=2,
                        ctx_len=64, n_kv_heads=2, pos="rope")
        params = init_gpt_params(cfg, seed=3)
        rng = np.random.default_rng(1)
        prompts = [rng_prompt(rng, cfg) for _ in range(3)]
        want = self._run(params, cfg, prompts, 6)
        got = self._run(params, cfg, prompts, 6, mesh=self._mesh())
        assert got == want

    def test_prefix_cache_under_tp(self):
        rng = np.random.default_rng(2)
        prefix = rng_prompt(rng, CFG, 10, 14)
        suffix = rng_prompt(rng, CFG, 3, 6)
        want = greedy_single(PARAMS, CFG, prefix + suffix, 6)
        eng = ServeEngine(PARAMS, CFG, n_slots=2, chunk=4, top_k=1,
                          mesh=self._mesh())
        pid = eng.register_prefix(prefix)
        eng.submit(Request(suffix, 6, prefix_id=pid))
        assert eng.run()[0].tokens == want

    def test_validation(self):
        from jax.sharding import Mesh

        from linalg_tpu.models.moe import MoEGPTConfig, init_moe_params

        mesh = self._mesh()
        with pytest.raises(ValueError, match="dense GPT"):
            cfg = MoEGPTConfig(vocab_size=31, d_model=32, n_heads=2,
                               n_layers=2, ctx_len=64, n_experts=2)
            ServeEngine(init_moe_params(cfg, seed=0), cfg, mesh=mesh)
        with pytest.raises(ValueError, match="dense GPT"):
            ServeEngine(PARAMS, CFG, mesh=mesh, quant="int8")
        bad = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("x",))
        with pytest.raises(ValueError, match="'tp' axis"):
            ServeEngine(PARAMS, CFG, mesh=bad)

    def test_serve_cli_tp(self, tmp_path):
        import json

        from linalg_tpu.apps.gpt import serve_cli
        from linalg_tpu.train.checkpoint import save_ckpt

        chars = "abcdefghijklmnopqrstuvwxyz .,!?"
        stoi = {c: i for i, c in enumerate(chars)}
        itos = {i: c for i, c in enumerate(chars)}
        save_ckpt(tmp_path, PARAMS, CFG, stoi, itos)
        (tmp_path / "prompts.txt").write_text("hello there\n",
                                              encoding="utf-8")
        from linalg_tpu.apps.gpt import build_parser

        args = build_parser().parse_args([
            "--serve", "--ckpt_dir", str(tmp_path),
            "--prompts", str(tmp_path / "prompts.txt"),
            "--out", str(tmp_path / "out.jsonl"),
            "--gen_tokens", "6", "--n_slots", "2", "--chunk", "4",
            "--top_k", "1", "--tp", "4",
        ])
        serve_cli(args)
        rows = [json.loads(ln) for ln in
                (tmp_path / "out.jsonl").read_text().splitlines()]
        ids = [stoi[c] for c in "hello there"]
        want = greedy_single(PARAMS, CFG, ids, 6)
        assert rows[0]["text"] == "".join(itos[t] for t in want)


class TestChunkedPrefill:
    """Prompts longer than prefill_window admit via chunked block-extends
    (round-4 verdict item: the window is a chunking detail, not a cap)."""

    CFG_L = GPTConfig(vocab_size=31, d_model=32, n_heads=2, n_layers=2,
                      ctx_len=128)
    P_L = init_gpt_params(CFG_L, seed=7)

    def _greedy(self, prompt, n):
        ids = jnp.asarray(np.asarray(prompt, np.int32)[None])
        logits, cache = gpt_prefill(self.P_L, ids, self.CFG_L)
        toks, _, _ = gpt_decode_chunk(self.P_L, cache, logits,
                                      jax.random.PRNGKey(0), self.CFG_L,
                                      n, 1.0, 1, 0.0)
        return np.asarray(toks)[0].tolist()

    def test_long_prompts_match_one_shot_prefill(self):
        rng = np.random.default_rng(0)
        eng = ServeEngine(self.P_L, self.CFG_L, n_slots=2, chunk=4,
                          prefill_window=16, top_k=1)
        W = eng.prefill_window
        # boundary lengths: 1, exactly W, W+1, a multiple, and the largest
        # admissible prompt (ctx - chunk-rounded budget)
        for plen in (1, W, W + 1, 3 * W, self.CFG_L.ctx_len - 8):
            prompt = rng.integers(0, 31, plen).tolist()
            eng.submit(Request(prompt, 8))
            out = eng.run()
            assert out[-1].tokens == self._greedy(prompt, 8), plen

    def test_mixed_long_and_short_requests(self):
        rng = np.random.default_rng(1)
        eng = ServeEngine(self.P_L, self.CFG_L, n_slots=3, chunk=4,
                          prefill_window=16, top_k=1)
        reqs = [Request(rng.integers(0, 31, n).tolist(), 6)
                for n in (3, 40, 17, 90, 5)]
        ids = [eng.submit(r) for r in reqs]
        done = {c.request_id: c.tokens for c in eng.run()}
        for rid, r in zip(ids, reqs):
            assert done[rid] == self._greedy(r.prompt, 6)

    def test_budget_still_enforced(self):
        eng = ServeEngine(self.P_L, self.CFG_L, n_slots=2, chunk=4,
                          prefill_window=16)
        with pytest.raises(ValueError, match="ctx_len"):
            eng.submit(Request(list(range(1, 126)), 8))  # 125+8 > 128

    def test_moe_keeps_the_cap(self):
        from linalg_tpu.models.moe import MoEGPTConfig, init_moe_params

        mcfg = MoEGPTConfig(vocab_size=31, d_model=32, n_heads=2,
                            n_layers=2, ctx_len=128, n_experts=2)
        eng = ServeEngine(init_moe_params(mcfg, seed=0), mcfg, n_slots=2,
                          chunk=4, prefill_window=16)
        with pytest.raises(ValueError, match="prefill_window"):
            eng.submit(Request(list(range(1, 20)), 4))

    def test_prefix_plus_long_suffix(self):
        rng = np.random.default_rng(2)
        eng = ServeEngine(self.P_L, self.CFG_L, n_slots=2, chunk=4,
                          prefill_window=16, top_k=1)
        prefix = rng.integers(0, 31, 21).tolist()
        suffix = rng.integers(0, 31, 37).tolist()  # > 2 windows
        pid = eng.register_prefix(prefix)
        eng.submit(Request(suffix, 8, prefix_id=pid))
        out = eng.run()
        assert out[0].tokens == self._greedy(prefix + suffix, 8)


class TestChunkedPrefillModes:
    """Chunked prefill composes with ring, tp-mesh and paged engines
    (token equality vs the one-shot single-stream oracle)."""

    def _greedy(self, params, cfg, prompt, n):
        return greedy_single(params, cfg, prompt, n)

    def test_ring_mode(self):
        cfg = GPTConfig(vocab_size=31, d_model=32, n_heads=2, n_layers=2,
                        ctx_len=64, window=16, pos="rope")
        params = init_gpt_params(cfg, seed=7)
        rng = np.random.default_rng(0)
        prompt = rng.integers(0, 31, 40).tolist()
        eng = ServeEngine(params, cfg, n_slots=2, chunk=4,
                          prefill_window=16, top_k=1)
        assert eng._ring
        eng.submit(Request(prompt, 8))
        assert eng.run()[0].tokens == self._greedy(params, cfg, prompt, 8)

    def test_tp_mesh(self):
        from jax.sharding import Mesh

        if len(jax.devices()) < 2:
            pytest.skip("needs 2 devices")
        cfg = GPTConfig(vocab_size=31, d_model=32, n_heads=2, n_layers=2,
                        ctx_len=64)
        params = init_gpt_params(cfg, seed=7)
        mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(1, 2),
                    ("dp", "tp"))
        rng = np.random.default_rng(1)
        prompt = rng.integers(0, 31, 40).tolist()
        eng = ServeEngine(params, cfg, n_slots=2, chunk=4,
                          prefill_window=16, top_k=1, mesh=mesh)
        eng.submit(Request(prompt, 8))
        assert eng.run()[0].tokens == self._greedy(params, cfg, prompt, 8)

    def test_paged_mode(self):
        cfg = GPTConfig(vocab_size=31, d_model=32, n_heads=2, n_layers=2,
                        ctx_len=64)
        params = init_gpt_params(cfg, seed=7)
        rng = np.random.default_rng(2)
        prompt = rng.integers(0, 31, 40).tolist()
        eng = ServeEngine(params, cfg, n_slots=2, chunk=4,
                          prefill_window=16, top_k=1, paged=True, page=16)
        eng.submit(Request(prompt, 8))
        assert eng.run()[0].tokens == self._greedy(params, cfg, prompt, 8)


class TestAutoPrefix:
    """auto_prefix=True: submit() transparently reuses the longest
    registered prefix that properly prefixes the prompt (same adapter),
    so register_prefix acts as a cache the caller never addresses
    per-request. Token equality with the explicit-prefix_id path (which
    TestPrefixCache pins to full-prompt prefills)."""

    def _eng(self, **kw):
        return ServeEngine(PARAMS, CFG, n_slots=2, chunk=4, top_k=1, **kw)

    def test_matches_explicit_and_full(self):
        rng = np.random.default_rng(21)
        prefix = rng_prompt(rng, CFG, 10, 14)
        suffix = rng_prompt(rng, CFG, 3, 6)
        want = greedy_single(PARAMS, CFG, prefix + suffix, 8)

        eng = self._eng(auto_prefix=True)
        eng.register_prefix(prefix)
        eng.submit(Request(prefix + suffix, 8))  # FULL prompt, no id
        assert eng.run()[0].tokens == want
        # the admission really did reuse the prefix: only the suffix
        # was prefilled (stats count one prefill either way; pin via
        # prompt_len bookkeeping of the completion)
        eng2 = self._eng(auto_prefix=True)
        pid = eng2.register_prefix(prefix)
        eng2.submit(Request(prefix + suffix, 8))
        c = eng2.run()[0]
        assert c.prompt_len == len(suffix)  # suffix-only admission

    def test_longest_of_nested_prefixes_wins(self):
        rng = np.random.default_rng(22)
        p1 = rng_prompt(rng, CFG, 6, 8)
        p2 = p1 + rng_prompt(rng, CFG, 6, 8)  # nests p1
        tail = rng_prompt(rng, CFG, 3, 5)
        want = greedy_single(PARAMS, CFG, p2 + tail, 8)
        eng = self._eng(auto_prefix=True)
        eng.register_prefix(p1)
        eng.register_prefix(p2)
        eng.submit(Request(p2 + tail, 8))
        c = eng.run()[0]
        assert c.tokens == want
        assert c.prompt_len == len(tail)  # matched p2, not p1

    def test_exact_prefix_prompt_needs_proper_suffix(self):
        """A prompt EQUAL to a registered prefix matches nothing (a
        proper suffix must remain for admission) and still serves."""
        rng = np.random.default_rng(23)
        prefix = rng_prompt(rng, CFG, 8, 10)
        want = greedy_single(PARAMS, CFG, prefix, 6)
        eng = self._eng(auto_prefix=True)
        eng.register_prefix(prefix)
        eng.submit(Request(prefix, 6))
        c = eng.run()[0]
        assert c.tokens == want and c.prompt_len == len(prefix)

    def test_adapter_mismatch_never_matches(self):
        from linalg_tpu.models.lora import LoRAConfig, init_lora_params

        lcfg = LoRAConfig(rank=2, alpha=4.0)
        lora = init_lora_params(PARAMS, lcfg, seed=1)
        rng = np.random.default_rng(24)
        prefix = rng_prompt(rng, CFG, 8, 10)
        tail = rng_prompt(rng, CFG, 3, 5)
        eng = self._eng(auto_prefix=True, max_loras=1, lora_rank=2)
        lid = eng.register_lora(lora, lcfg)
        eng.register_prefix(prefix)  # base-model prefix (lora_id=0)
        eng.submit(Request(prefix + tail, 6, lora_id=lid))
        c = eng.run()[0]
        assert c.prompt_len == len(prefix) + len(tail)  # no reuse

    def test_off_by_default(self):
        rng = np.random.default_rng(25)
        prefix = rng_prompt(rng, CFG, 8, 10)
        tail = rng_prompt(rng, CFG, 3, 5)
        eng = self._eng()
        eng.register_prefix(prefix)
        eng.submit(Request(prefix + tail, 6))
        assert eng.run()[0].prompt_len == len(prefix) + len(tail)
