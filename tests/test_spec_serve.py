"""Speculative decoding inside the continuous-batching engine
(linalg_tpu/serve/spec.py).

Correctness claims:

1. GREEDY BIT-EQUALITY — ``ServeEngine(speculative=K)`` emits exactly the
   plain engine's greedy tokens for every K, under mixed concurrent
   requests, staggered admission, prefixes, chunked prefill and stop
   tokens (the plain engine is itself pinned to single-stream decode by
   tests/test_serve.py).
2. DISTRIBUTION EXACTNESS — the first emitted token's Monte-Carlo law
   equals the filtered target softmax regardless of what was drafted
   (point-mass rejection sampling, per slot).
3. BOOKKEEPING — per-(slot, round) valid counts reconstruct each
   request's stream; budgets and positions stay inside the reservation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from linalg_tpu.models.gpt import (
    GPTConfig,
    gpt_prefill,
    filter_logits,
    init_gpt_params,
)
from linalg_tpu.serve import Request, ServeEngine

CFG = GPTConfig(vocab_size=31, d_model=32, n_heads=2, n_layers=2,
                ctx_len=128)
PARAMS = init_gpt_params(CFG, seed=7)


def run_engine(reqs, params=PARAMS, cfg=CFG, **kw):
    eng = ServeEngine(params, cfg, n_slots=3, chunk=8, top_k=1, **kw)
    ids = [eng.submit(r) for r in reqs]
    done = {c.request_id: c for c in eng.run()}
    return [done[i] for i in ids], eng


def rng_reqs(rng, n_list, **kw):
    return [Request(rng.integers(0, 31, rng.integers(3, 12)).tolist(),
                    int(n), **kw) for n in n_list]


class TestGreedyBitEquality:
    @pytest.mark.parametrize("K", [1, 3, 5])
    def test_mixed_requests(self, K):
        rng = np.random.default_rng(0)
        reqs = rng_reqs(rng, (5, 12, 7, 20, 9))
        plain, _ = run_engine(reqs)
        spec, eng = run_engine(reqs, speculative=K)
        assert [c.tokens for c in spec] == [c.tokens for c in plain]
        assert all(c.finish_reason == "length" for c in spec)
        # rounds are bounded by dispatched chunks; the async valid drain
        # can add a few WASTED tail rounds per slot (host learns about
        # completed budgets a few chunks late — see _drain_spec), so the
        # drafting-efficiency claim (rounds < emitted) is pinned on the
        # repetitive-prompt test, not this mixed workload
        assert eng.stats["spec_rounds"] == (eng.stats["chunks"]
                                            * eng._spec_rounds)

    @pytest.mark.parametrize("pos", ["rope", "alibi"])
    def test_positional_modes(self, pos):
        cfg = GPTConfig(vocab_size=31, d_model=32, n_heads=2, n_layers=2,
                        ctx_len=128, pos=pos)
        params = init_gpt_params(cfg, seed=9)
        rng = np.random.default_rng(1)
        reqs = rng_reqs(rng, (6, 14, 9))
        plain, _ = run_engine(reqs, params, cfg)
        spec, _ = run_engine(reqs, params, cfg, speculative=3)
        assert [c.tokens for c in spec] == [c.tokens for c in plain]

    def test_repetitive_prompts_accept_drafts(self):
        """On a repeating pattern, prompt-lookup drafts hit and rounds
        drop well below the emitted token count."""
        prompt = [1, 2, 3, 4] * 6
        reqs = [Request(prompt, 24)]
        plain, _ = run_engine(reqs)
        spec, eng = run_engine(reqs, speculative=4)
        assert spec[0].tokens == plain[0].tokens
        assert eng.stats["spec_rounds"] < len(spec[0].tokens)

    def test_single_token_prompt(self):
        reqs = [Request([3], 10)]
        plain, _ = run_engine(reqs)
        spec, _ = run_engine(reqs, speculative=2)
        assert spec[0].tokens == plain[0].tokens

    def test_stop_token(self):
        rng = np.random.default_rng(2)
        prompt = rng.integers(0, 31, 8).tolist()
        full, _ = run_engine([Request(prompt, 24)])
        stop = full[0].tokens[5]
        want = full[0].tokens[:full[0].tokens.index(stop) + 1]
        spec, _ = run_engine([Request(prompt, 24, stop_token=stop)],
                             speculative=3)
        assert spec[0].finish_reason == "stop"
        assert spec[0].tokens == want

    def test_prefix_and_chunked_prefill(self):
        rng = np.random.default_rng(3)
        prefix = rng.integers(0, 31, 20).tolist()
        long_prompt = rng.integers(0, 31, 40).tolist()  # > prefill_window
        eng = ServeEngine(PARAMS, CFG, n_slots=2, chunk=8, top_k=1,
                          prefill_window=16, speculative=3)
        pid = eng.register_prefix(prefix)
        r1 = eng.submit(Request(long_prompt, 8))
        r2 = eng.submit(Request(long_prompt[:5], 8, prefix_id=pid))
        done = {c.request_id: c.tokens for c in eng.run()}
        plain = ServeEngine(PARAMS, CFG, n_slots=2, chunk=8, top_k=1,
                            prefill_window=16)
        pid_p = plain.register_prefix(prefix)
        p1 = plain.submit(Request(long_prompt, 8))
        p2 = plain.submit(Request(long_prompt[:5], 8, prefix_id=pid_p))
        want = {c.request_id: c.tokens for c in plain.run()}
        assert done[r1] == want[p1]
        assert done[r2] == want[p2]

    def test_staggered_admission(self):
        rng = np.random.default_rng(4)
        reqs = rng_reqs(rng, (4, 9, 5, 13, 6, 8))  # 6 reqs, 3 slots
        plain, _ = run_engine(reqs)
        spec, eng = run_engine(reqs, speculative=2)
        assert [c.tokens for c in spec] == [c.tokens for c in plain]
        assert eng.n_active == 0 and eng.pending == 0


class TestDistributionExactness:
    def test_first_token_marginal_is_target(self):
        """Monte Carlo over the batched round: the first emitted token of
        every slot follows softmax(filtered target logits) regardless of
        the drafts (exact point-mass rejection sampling)."""
        from linalg_tpu.serve.spec import decode_chunk_spec, \
            spec_cache_fields

        cfg = GPTConfig(vocab_size=11, d_model=32, n_heads=2, n_layers=2,
                        ctx_len=32)
        params = init_gpt_params(cfg, seed=1)
        prompt = np.asarray([1, 2, 3, 1, 2], np.int32)
        # spec-mode admission state: prefill prompt[:-1], pending = last
        _, cache1 = gpt_prefill(params, jnp.asarray(prompt[None, :-1]), cfg)
        B = 2
        cache = {
            "k": jnp.repeat(cache1["k"], B, axis=1),
            "v": jnp.repeat(cache1["v"], B, axis=1),
            "pos": jnp.full((B,), len(prompt) - 1, jnp.int32),
        }
        cache.update(spec_cache_fields(cfg, B))
        hist = np.zeros((B, cfg.ctx_len), np.int32)
        hist[:, :len(prompt)] = prompt
        cache.update(hist=jnp.asarray(hist),
                     pending=jnp.full((B,), prompt[-1], jnp.int32))
        temp = jnp.ones((B,), jnp.float32)
        zeros = jnp.zeros((B,), jnp.float32)
        budget = jnp.full((B,), 8, jnp.int32)

        def first_tok(key):
            toks, valid, _ = decode_chunk_spec(
                params, cache, key, temp, zeros,
                jnp.zeros((B,), jnp.int32), budget, cfg, 1, 2)
            return toks[:, 0, 0]  # first emitted token per slot

        N = 4000
        draws = jax.lax.map(first_tok,
                            jax.random.split(jax.random.PRNGKey(0), N))
        # target: softmax of the model's next-token logits after prompt
        lg, _ = gpt_prefill(params, jnp.asarray(prompt[None]), cfg)
        target = np.asarray(jax.nn.softmax(filter_logits(lg[0], 1.0, 0,
                                                         0.0)))
        for b in range(B):
            emp = np.bincount(np.asarray(draws)[:, b],
                              minlength=11) / N
            np.testing.assert_allclose(emp, target, atol=0.03)


class TestBookkeeping:
    def test_validation(self):
        from linalg_tpu.models.moe import MoEGPTConfig, init_moe_params

        # spec x paged(gather) COMPOSES (TestSpecPaged) and so does
        # spec x multi-LoRA (TestSpecLoRA); quant still rejects — the
        # pending prompt token would be recomputed through int8 ops that
        # admission prefilled in f32 (see the engine's rationale)
        with pytest.raises(ValueError, match="speculative"):
            ServeEngine(PARAMS, CFG, speculative=2, quant="int8")
        mcfg = MoEGPTConfig(vocab_size=31, d_model=32, n_heads=2,
                            n_layers=2, ctx_len=64, n_experts=2)
        with pytest.raises(ValueError, match="speculative"):
            ServeEngine(init_moe_params(mcfg, seed=0), mcfg, speculative=2)

    def test_budget_reservation(self):
        eng = ServeEngine(PARAMS, CFG, speculative=3)  # S=4, slack 8
        with pytest.raises(ValueError, match="slack"):
            eng.submit(Request([1, 2, 3], CFG.ctx_len - 3 - 7))
        eng.submit(Request([1, 2, 3], CFG.ctx_len - 3 - 8))  # fits

    def test_positions_stay_reserved(self):
        """Device positions never run past plen + budget + 2S."""
        rng = np.random.default_rng(5)
        eng = ServeEngine(PARAMS, CFG, n_slots=2, chunk=8, top_k=1,
                          speculative=3)
        prompt = rng.integers(0, 31, 10).tolist()
        eng.submit(Request(prompt, 30))
        eng.run()
        S = 4
        assert int(np.asarray(eng._cache["pos"]).max()) <= 10 + 30 + 2 * S

    def test_exact_token_counts(self):
        rng = np.random.default_rng(6)
        reqs = rng_reqs(rng, (5, 17, 11))
        out, _ = run_engine(reqs, speculative=3)
        for c, r in zip(out, reqs):
            assert len(c.tokens) == r.max_new_tokens


class TestSpecCLI:
    def test_serve_cli_speculative_matches_plain(self, tmp_path, capsys):
        import json

        from linalg_tpu.apps.gpt import build_parser, serve_cli
        from linalg_tpu.train.trainer import train

        args = build_parser().parse_args([
            "--train", "--steps", "12", "--eval_every", "6",
            "--batch_size", "4", "--ctx_len", "64", "--d_model", "32",
            "--heads", "2", "--layers", "1",
            "--ckpt_dir", str(tmp_path), "--lr_model", "1e-3"])
        train(args)
        (tmp_path / "prompts.txt").write_text("the one\nand the other\n",
                                              encoding="utf-8")

        def run(extra, out):
            a = build_parser().parse_args([
                "--serve", "--ckpt_dir", str(tmp_path),
                "--prompts", str(tmp_path / "prompts.txt"),
                "--out", str(tmp_path / out),
                "--gen_tokens", "10", "--n_slots", "2", "--chunk", "8",
                "--top_k", "1"] + extra)
            serve_cli(a)
            return [json.loads(ln) for ln in
                    (tmp_path / out).read_text().splitlines()]

        spec = run(["--speculative", "3"], "spec.jsonl")
        plain = run([], "plain.jsonl")
        capsys.readouterr()
        assert [r["text"] for r in spec] == [r["text"] for r in plain]


class TestSpecPaged:
    """speculative x paged composition: the spec chunk block-scatters
    through the page table and reads via the gather — tokens bit-equal
    to the plain engine (greedy), pages still queue under pressure."""

    def test_matches_plain_engine(self):
        rng = np.random.default_rng(8)
        reqs = rng_reqs(rng, (5, 12, 7, 20))
        plain, _ = run_engine(reqs)
        spec, eng = run_engine(reqs, speculative=3, paged=True, page=16)
        assert [c.tokens for c in spec] == [c.tokens for c in plain]
        assert eng._paged and eng._spec

    def test_page_pressure_queues_and_completes(self):
        rng = np.random.default_rng(9)
        reqs = rng_reqs(rng, (5, 12, 7, 20))
        plain, _ = run_engine(reqs)
        eng = ServeEngine(PARAMS, CFG, n_slots=2, chunk=8, top_k=1,
                          speculative=3, paged=True, page=16, n_pages=7)
        ids = [eng.submit(r) for r in reqs]
        done = {c.request_id: c.tokens for c in eng.run()}
        assert [done[i] for i in ids] == [c.tokens for c in plain]

    def test_prefix_pages_shared(self):
        rng = np.random.default_rng(10)
        prefix = rng.integers(0, 31, 32).tolist()
        suffix = rng.integers(0, 31, 5).tolist()
        spec = ServeEngine(PARAMS, CFG, n_slots=2, chunk=8, top_k=1,
                           speculative=2, paged=True, page=16)
        pid = spec.submit  # noqa: just to keep flake quiet
        pid = spec.register_prefix(prefix)
        spec.submit(Request(suffix, 8, prefix_id=pid))
        got = spec.run()[0].tokens
        ref = ServeEngine(PARAMS, CFG, n_slots=2, chunk=8, top_k=1)
        qid = ref.register_prefix(prefix)
        ref.submit(Request(suffix, 8, prefix_id=qid))
        assert got == ref.run()[0].tokens

    def test_kernel_and_kv8_rejected(self):
        with pytest.raises(ValueError, match="speculative"):
            ServeEngine(PARAMS, CFG, speculative=2, paged=True, page=16,
                        paged_attn="kernel")
        with pytest.raises(ValueError, match="speculative"):
            ServeEngine(PARAMS, CFG, speculative=2, paged=True, page=16,
                        kv8=True)


class TestSpecLoRA:
    """speculative x multi-LoRA composition: the verify block runs the
    SAME per-slot side-path ops the plain chunk scans with
    (serve.engine.select_decode_ops through spec._block_step_slots), so
    greedy tokens stay exactly equal to the plain multi-LoRA engine —
    which tests/test_lora.py pins to per-adapter merged engines."""

    def _adapter(self, seed, rank=4, alpha=8.0):
        from linalg_tpu.models.lora import LoRAConfig, init_lora_params

        lcfg = LoRAConfig(rank=rank, alpha=alpha)
        lora = init_lora_params(PARAMS, lcfg, seed=seed)
        rng = np.random.default_rng(seed + 100)
        layers = {
            k: (jnp.asarray(rng.normal(0, 0.05, v.shape), jnp.float32)
                if k.endswith("_B") else v)
            for k, v in lora["layers"].items()
        }
        return {"layers": layers}, lcfg

    def _run(self, reqs, **kw):
        eng = ServeEngine(PARAMS, CFG, n_slots=3, chunk=8, top_k=1,
                          max_loras=2, lora_rank=4, **kw)
        for s in (1, 2):
            eng.register_lora(*self._adapter(s))
        ids = [eng.submit(Request(p, n, lora_id=l)) for p, n, l in reqs]
        done = {c.request_id: c for c in eng.run()}
        return [done[i].tokens for i in ids]

    @pytest.mark.parametrize("K", [1, 3])
    def test_mixed_adapters_match_plain_engine(self, K):
        rng = np.random.default_rng(4)
        reqs = [(rng.integers(0, 31, rng.integers(3, 12)).tolist(),
                 int(n), l) for n, l in ((7, 0), (12, 1), (9, 2), (15, 1))]
        assert self._run(reqs, speculative=K) == self._run(reqs)

    def test_base_slots_unaffected_by_adapters(self):
        """lora_id=0 requests in a spec engine with registered adapters
        emit exactly the no-LoRA spec engine's tokens."""
        rng = np.random.default_rng(5)
        reqs = rng_reqs(rng, (8, 14))
        base, _ = run_engine(reqs, speculative=3)
        got = self._run([(r.prompt, r.max_new_tokens, 0) for r in reqs],
                        speculative=3)
        assert got == [c.tokens for c in base]

    def test_paged_lora_spec(self):
        """Triple composition: page-table KV + per-slot adapters +
        speculative rounds, equal to the plain paged multi-LoRA engine."""
        rng = np.random.default_rng(6)
        reqs = [(rng.integers(0, 31, rng.integers(3, 10)).tolist(),
                 int(n), l) for n, l in ((6, 1), (10, 2), (8, 0))]
        plain = self._run(reqs, paged=True, page=16)
        spec = self._run(reqs, paged=True, page=16, speculative=2)
        assert spec == plain

    def test_quant_spec_still_rejected(self):
        with pytest.raises(ValueError, match="int8"):
            ServeEngine(PARAMS, CFG, speculative=2, quant="int8")


class TestLazyValidDrain:
    """The async valid-drain path (ServeEngine._drain_spec): CPU executes
    synchronously, so these tests FORCE the lag the TPU's truly-async
    copies produce via the _spec_lazy_min test seam (keep >= N chunks
    undrained). Regression pin for the samp-vector aliasing bug: the
    engine mutates _temp/_top_p/_top_k/_budget numpy arrays in place at
    admission/retire, and jnp.asarray on CPU aliases the buffer
    zero-copy — enqueued-but-unexecuted chunks then read the
    retroactively-mutated vector (observed: a lag-retire's budget[s]=0
    froze the next occupant's in-flight chunks at 15/55 tokens). step()
    now builds _samp_dev with copying jnp.array."""

    @pytest.mark.parametrize("lag", [2, 8, 16])
    def test_lagged_drain_matches_plain(self, lag):
        rng = np.random.default_rng(40)
        reqs = [Request(rng.integers(0, 31, int(n)).tolist(), int(m))
                for n, m in zip(rng.integers(4, 30, 7),
                                rng.integers(8, 60, 7))]

        def run(**kw):
            eng = ServeEngine(PARAMS, CFG, n_slots=4, chunk=12, top_k=1,
                              **kw)
            eng._spec_lazy_min = lag
            ids = [eng.submit(r) for r in reqs]
            done = {c.request_id: c for c in eng.run()}
            return [done[i] for i in ids]

        plain = run()
        spec = run(speculative=3)
        assert [c.tokens for c in spec] == [c.tokens for c in plain]
        assert all(c.finish_reason == "length" for c in spec)

    def test_lagged_slot_reuse_budgets_exact(self):
        """Short-budget requests retire and their slots readmit while
        older chunks are still undrained — every request must still get
        EXACTLY its budget."""
        rng = np.random.default_rng(41)
        reqs = [Request(rng.integers(0, 31, 6).tolist(), int(m))
                for m in (5, 30, 7, 25, 6, 20, 8, 15)]
        eng = ServeEngine(PARAMS, CFG, n_slots=2, chunk=12, top_k=1,
                          speculative=3)
        eng._spec_lazy_min = 6
        ids = [eng.submit(r) for r in reqs]
        done = {c.request_id: c for c in eng.run()}
        got = [len(done[i].tokens) for i in ids]
        assert got == [r.max_new_tokens for r in reqs], got

    def test_lagged_stop_token_still_eager(self):
        rng = np.random.default_rng(42)
        prompt = rng.integers(0, 31, 8).tolist()
        full, _ = run_engine([Request(prompt, 20)])
        stop = int(full[0].tokens[4])
        reqs = [Request(prompt, 20, stop_token=stop)]
        plain, _ = run_engine(reqs)
        eng = ServeEngine(PARAMS, CFG, n_slots=3, chunk=8, top_k=1,
                          speculative=3)
        eng._spec_lazy_min = 8  # ignored while a stopper is active
        eng.submit(reqs[0])
        lagged = eng.run()[0]
        assert lagged.tokens == plain[0].tokens
        assert lagged.finish_reason == plain[0].finish_reason == "stop"
