"""Paged-KV serving tests (linalg_tpu/serve/paged.py).

The correctness claim is layout transparency: paged mode stores the same
K/V values at table-indirected addresses, so engine outputs are EXACTLY
the slot-engine outputs (which are themselves pinned to single-stream
decode by tests/test_serve.py) — under mixed prompts, admission churn,
stop tokens, prefixes, and page-pressure queueing. Plus allocator
bookkeeping: reserve on admit, release on finish, queue when full.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from linalg_tpu.models.gpt import GPTConfig, init_gpt_params
from linalg_tpu.serve import PageAllocator, Request, ServeEngine, serve
from linalg_tpu.serve.paged import init_paged_cache

CFG = GPTConfig(vocab_size=31, d_model=32, n_heads=2, n_layers=2, ctx_len=64)
PARAMS = init_gpt_params(CFG, seed=7)


def rng_prompt(rng, cfg, lo=3, hi=12):
    return rng.integers(0, cfg.vocab_size, size=rng.integers(lo, hi)).tolist()


def slot_tokens(requests, **kw):
    """Reference: the (already single-stream-pinned) slot engine."""
    done = serve(PARAMS, CFG, requests, **kw)
    return {c.request_id: (c.tokens, c.finish_reason) for c in done}


def paged_tokens(requests, n_pages=None, page=16, **kw):
    eng = ServeEngine(PARAMS, CFG, paged=True, page=page, n_pages=n_pages,
                      **kw)
    ids = [eng.submit(r) for r in requests]
    done = {c.request_id: (c.tokens, c.finish_reason) for c in eng.run()}
    assert set(done) == set(ids)
    return done, eng


class TestAllocator:
    def test_alloc_release_roundtrip(self):
        a = PageAllocator(8)
        assert a.n_free == 7  # page 0 is trash
        got = a.alloc(3)
        assert len(set(got)) == 3 and all(0 < p < 8 for p in got)
        assert a.n_free == 4
        a.release(got)
        assert a.n_free == 7

    def test_alloc_overflow_raises(self):
        a = PageAllocator(4)
        a.alloc(2)
        with pytest.raises(MemoryError):
            a.alloc(2)

    def test_init_validation(self):
        with pytest.raises(ValueError, match="divide"):
            init_paged_cache(CFG, 2, 8, 24)  # 24 does not divide ctx 64
        with pytest.raises(ValueError, match="trash"):
            init_paged_cache(CFG, 2, 1, 16)


class TestPagedEquality:
    def test_mixed_requests_match_slot_engine(self):
        rng = np.random.default_rng(0)
        reqs = [Request(rng_prompt(rng, CFG), int(rng.integers(4, 14)))
                for _ in range(9)]
        want = slot_tokens([Request(r.prompt, r.max_new_tokens)
                            for r in reqs], n_slots=3, chunk=4, top_k=1)
        got, eng = paged_tokens(reqs, n_slots=3, chunk=4, top_k=1)
        assert [got[i] for i in sorted(got)] == \
            [want[i] for i in sorted(want)]
        # every page returned to the pool after the run
        assert eng._allocator.n_free == eng._allocator.n_pages - 1

    def test_stop_token_matches(self):
        rng = np.random.default_rng(1)
        reqs = [Request(rng_prompt(rng, CFG), 20, stop_token=5)
                for _ in range(4)]
        want = slot_tokens(
            [Request(r.prompt, 20, stop_token=5) for r in reqs],
            n_slots=2, chunk=4, top_k=1)
        got, _ = paged_tokens(reqs, n_slots=2, chunk=4, top_k=1)
        assert [got[i] for i in sorted(got)] == \
            [want[i] for i in sorted(want)]

    def test_sampled_path_matches(self):
        # same RNG stream + identical logits => identical samples
        rng = np.random.default_rng(2)
        reqs = [Request(rng_prompt(rng, CFG), 8, temperature=0.8,
                        top_p=0.9, top_k=7) for _ in range(3)]
        want = slot_tokens(
            [Request(r.prompt, 8, temperature=0.8, top_p=0.9, top_k=7)
             for r in reqs], n_slots=3, chunk=4, seed=0)
        got, _ = paged_tokens(reqs, n_slots=3, chunk=4, seed=0)
        assert [got[i] for i in sorted(got)] == \
            [want[i] for i in sorted(want)]

    def test_prefix_matches_slot_engine(self):
        rng = np.random.default_rng(3)
        prefix = rng.integers(0, CFG.vocab_size, size=20).tolist()
        prompts = [rng_prompt(rng, CFG) for _ in range(4)]

        def run(paged):
            eng = (ServeEngine(PARAMS, CFG, n_slots=2, chunk=4, top_k=1,
                               paged=True, page=16) if paged else
                   ServeEngine(PARAMS, CFG, n_slots=2, chunk=4, top_k=1))
            pid = eng.register_prefix(prefix)
            ids = [eng.submit(Request(p, 6, prefix_id=pid))
                   for p in prompts]
            done = {c.request_id: c.tokens for c in eng.run()}
            return [done[i] for i in ids]

        assert run(True) == run(False)


class TestPrefixSharing:
    def test_shared_pages_fit_where_copies_cannot(self):
        # prefix of 32 rows = 2 full pages (page=16), shared: each
        # admission owns ONE private page (partial tail + suffix +
        # budget). Pool of 4 usable pages serves 2 concurrent slots
        # (2 shared + 2x1 private); per-slot COPIES would need 6.
        rng = np.random.default_rng(6)
        prefix = rng.integers(0, CFG.vocab_size, size=32).tolist()
        prompts = [rng.integers(0, CFG.vocab_size, size=5).tolist()
                   for _ in range(4)]

        def run(paged):
            eng = (ServeEngine(PARAMS, CFG, n_slots=2, chunk=4, top_k=1,
                               paged=True, page=16, n_pages=5) if paged
                   else ServeEngine(PARAMS, CFG, n_slots=2, chunk=4,
                                    top_k=1))
            pid = eng.register_prefix(prefix)
            if paged:
                assert eng._shared_held == 2
            ids = [eng.submit(Request(p, 6, prefix_id=pid))
                   for p in prompts]
            done = {c.request_id: c.tokens for c in eng.run()}
            if paged:  # shared pages stay pinned, private ones returned
                assert eng._allocator.n_free == 2
            return [done[i] for i in ids]

        assert run(True) == run(False)

    def test_prefix_too_big_for_pool_raises(self):
        eng = ServeEngine(PARAMS, CFG, paged=True, page=16, n_pages=3,
                          n_slots=2, chunk=4)
        with pytest.raises(ValueError, match="free"):
            eng.register_prefix(list(range(1, 50)))  # 3 full pages, 2 free


class TestPagePressure:
    def test_small_pool_queues_and_completes(self):
        # pool of 7 pages (page=16, ctx=64): each request reserves 2, so
        # only 3 of 4 slots can hold requests at once — the 6 requests
        # must queue on pages, all complete, outputs unchanged
        rng = np.random.default_rng(4)
        reqs = [Request(rng_prompt(rng, CFG, 3, 8), 8) for _ in range(6)]
        want = slot_tokens([Request(r.prompt, 8) for r in reqs],
                           n_slots=4, chunk=4, top_k=1)
        got, eng = paged_tokens(reqs, n_pages=8, n_slots=4, chunk=4,
                                top_k=1)
        assert [got[i] for i in sorted(got)] == \
            [want[i] for i in sorted(want)]
        assert eng._allocator.n_free == 7

    def test_pool_smaller_than_slots_dense_equivalent(self):
        # the memory claim: 4 slots x ctx 64 would need 16 pages dense;
        # a 9-page pool (56% of dense) still serves short requests in all
        # 4 slots concurrently
        rng = np.random.default_rng(5)
        reqs = [Request(rng_prompt(rng, CFG, 3, 8), 8) for _ in range(4)]
        eng = ServeEngine(PARAMS, CFG, paged=True, page=16, n_pages=9,
                          n_slots=4, chunk=8, top_k=1)
        for r in reqs:
            eng.submit(r)
        eng.step()
        # all four admitted concurrently within 8 usable pages (each
        # reserves 2: prompt<=8 + budget 8 rounded to chunk 8 => 16 rows)
        assert eng.stats["prefills"] == 4 and eng.pending == 0
        eng.run()
        assert len(eng.completions) == 4

    def test_oversized_request_raises_at_submit(self):
        eng = ServeEngine(PARAMS, CFG, paged=True, page=16, n_pages=3,
                          n_slots=2, chunk=4)
        with pytest.raises(ValueError, match="pages"):
            eng.submit(Request([1, 2, 3], 40))  # needs 3 pages, pool has 2


class TestPagedKernel:
    """Pallas in-place page-read attention vs the XLA table-gather."""

    @pytest.mark.parametrize("H,hk", [(2, 2), (4, 2), (4, 1), (8, 1)])
    def test_kernel_matches_gather_unit(self, H, hk):
        from linalg_tpu.models.gpt import _gqa_decode_attn
        from linalg_tpu.serve.paged import paged_attn_pallas

        rng = np.random.default_rng(H * 10 + hk)
        B, d, page, Pmax, n_pages = 3, 64, 16, 4, 9
        ctx = page * Pmax
        q = jnp.asarray(rng.normal(size=(B, H, 1, d)), jnp.float32)
        pk = jnp.asarray(rng.normal(size=(n_pages, hk, page, d)),
                         jnp.float32)
        pv = jnp.asarray(rng.normal(size=(n_pages, hk, page, d)),
                         jnp.float32)
        # distinct pages per slot, some rows masked dead (pos-style) and
        # an alibi-like per-head bias on the live ones
        table = jnp.asarray(rng.permutation(np.arange(1, 1 + B * Pmax))
                            .reshape(B, Pmax), jnp.int32)
        pos = rng.integers(1, ctx, size=(B,))
        live = np.arange(ctx)[None, :] < pos[:, None]
        mask = np.where(live[:, None, None, :], 0.0, -1e9).astype(np.float32)
        mask = mask + rng.normal(scale=0.1, size=(B, H, 1, ctx)) * live[
            :, None, None, :]
        mask = jnp.asarray(mask)

        got = paged_attn_pallas(q, pk, pv, mask, table,
                                jnp.asarray(pos, jnp.int32))

        def gathered(pool):
            x = pool[table]
            x = jnp.swapaxes(x, 1, 2)
            return x.reshape(B, hk, ctx, d)

        want = _gqa_decode_attn(q, gathered(pk), gathered(pv), mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-6)

    @pytest.mark.parametrize("H,hk,d", [
        (2, 2, 128), (4, 2, 128), (8, 1, 128), (4, 4, 128),
        # narrow heads ride the fold-f = 128/d path (round-4 verdict
        # item 8: GQA d_head-64 shapes no longer fall to the grid kernel)
        (4, 2, 64), (8, 1, 64), (4, 4, 64), (8, 2, 32)])
    def test_dma_kernel_matches_gather_unit(self, H, hk, d):
        from linalg_tpu.models.gpt import _gqa_decode_attn
        from linalg_tpu.serve.paged import paged_attn_pallas_dma

        rng = np.random.default_rng(H * 10 + hk + d)
        B, page, Pmax, n_pages = 3, 16, 4, 13
        ctx = page * Pmax
        q = jnp.asarray(rng.normal(size=(B, H, 1, d)), jnp.float32)
        pk = jnp.asarray(rng.normal(size=(n_pages, hk, page, d)),
                         jnp.float32)
        pv = jnp.asarray(rng.normal(size=(n_pages, hk, page, d)),
                         jnp.float32)
        table = jnp.asarray(rng.permutation(np.arange(1, 1 + B * Pmax))
                            .reshape(B, Pmax), jnp.int32)
        pos = rng.integers(1, ctx, size=(B,))
        live = np.arange(ctx)[None, :] < pos[:, None]
        mask = jnp.asarray(
            np.where(live[:, None, None, :], 0.0, -1e9).astype(np.float32))

        got = paged_attn_pallas_dma(q, pk, pv, mask, table,
                                    jnp.asarray(pos, jnp.int32), depth=3)

        def gathered(pool):
            x = pool[table]
            x = jnp.swapaxes(x, 1, 2)
            return x.reshape(B, hk, ctx, d)

        want = _gqa_decode_attn(q, gathered(pk), gathered(pv), mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-6)

    def test_kernel_engine_matches_gather_engine_d128(self):
        # d_model/heads = 128 routes use_kernel through the DMA kernel
        cfg = GPTConfig(vocab_size=31, d_model=256, n_heads=2, n_kv_heads=1,
                        n_layers=2, ctx_len=64, pos="rope")
        params = init_gpt_params(cfg, seed=2)
        rng = np.random.default_rng(8)
        reqs = [Request(rng_prompt(rng, cfg), int(rng.integers(4, 10)))
                for _ in range(4)]

        def run(mode):
            eng = ServeEngine(params, cfg, n_slots=2, chunk=4, top_k=1,
                              paged=True, page=16, paged_attn=mode)
            ids = [eng.submit(Request(r.prompt, r.max_new_tokens))
                   for r in reqs]
            done = {c.request_id: c.tokens for c in eng.run()}
            return [done[i] for i in ids]

        assert run("kernel") == run("gather")

    @pytest.mark.parametrize("pos_mode", ["sinusoidal", "alibi"])
    def test_kernel_engine_matches_gather_engine(self, pos_mode):
        cfg = GPTConfig(vocab_size=31, d_model=32, n_heads=4, n_kv_heads=2,
                        n_layers=2, ctx_len=64, pos=pos_mode)
        params = init_gpt_params(cfg, seed=1)
        rng = np.random.default_rng(7)
        reqs = [Request(rng_prompt(rng, cfg), int(rng.integers(4, 10)))
                for _ in range(5)]

        def run(mode):
            eng = ServeEngine(params, cfg, n_slots=2, chunk=4, top_k=1,
                              paged=True, page=16, paged_attn=mode)
            ids = [eng.submit(Request(r.prompt, r.max_new_tokens))
                   for r in reqs]
            done = {c.request_id: c.tokens for c in eng.run()}
            return [done[i] for i in ids]

        assert run("kernel") == run("gather")

    def test_validation(self):
        with pytest.raises(ValueError, match="paged_attn"):
            ServeEngine(PARAMS, CFG, paged=True, paged_attn="fused")
        with pytest.raises(ValueError, match="page % 8"):
            ServeEngine(PARAMS, CFG, paged=True, page=4, n_pages=40,
                        paged_attn="kernel")


class TestPagedCLI:
    def test_serve_cli_paged_matches_slot(self, tmp_path, capsys):
        import json

        from linalg_tpu.apps.gpt import build_parser, serve_cli
        from linalg_tpu.train.checkpoint import save_ckpt

        chars = "abcdefghijklmnopqrstuvwxyz .,!?"
        stoi = {c: i for i, c in enumerate(chars)}
        itos = {i: c for i, c in enumerate(chars)}
        save_ckpt(tmp_path, PARAMS, CFG, stoi, itos)
        (tmp_path / "prompts.txt").write_text("hello world\nquick fox\n",
                                              encoding="utf-8")

        def run(extra, out):
            args = build_parser().parse_args([
                "--serve", "--ckpt_dir", str(tmp_path),
                "--prompts", str(tmp_path / "prompts.txt"),
                "--out", str(tmp_path / out),
                "--gen_tokens", "6", "--n_slots", "2", "--chunk", "4",
                "--top_k", "1"] + extra)
            serve_cli(args)
            return [json.loads(ln) for ln in
                    (tmp_path / out).read_text().splitlines()]

        paged = run(["--paged", "--page", "16", "--n_pages", "5"],
                    "paged.jsonl")
        slot = run([], "slot.jsonl")
        capsys.readouterr()
        assert [r["text"] for r in paged] == [r["text"] for r in slot]

    def test_serve_cli_page_cache(self, tmp_path, capsys):
        """--page_cache plumbs through and stays token-equal to slot."""
        import json

        from linalg_tpu.apps.gpt import build_parser, serve_cli
        from linalg_tpu.train.checkpoint import save_ckpt

        chars = "abcdefghijklmnopqrstuvwxyz .,!?"
        stoi = {c: i for i, c in enumerate(chars)}
        itos = {i: c for i, c in enumerate(chars)}
        save_ckpt(tmp_path, PARAMS, CFG, stoi, itos)
        # identical prompts: the second admission reuses the first's
        # retired pages (n_slots=1 serializes them)
        (tmp_path / "prompts.txt").write_text(
            "hello world, here!\nhello world, here!\n", encoding="utf-8")

        def run(extra, out):
            args = build_parser().parse_args([
                "--serve", "--ckpt_dir", str(tmp_path),
                "--prompts", str(tmp_path / "prompts.txt"),
                "--out", str(tmp_path / out),
                "--gen_tokens", "6", "--n_slots", "1", "--chunk", "4",
                "--top_k", "1"] + extra)
            serve_cli(args)
            return [json.loads(ln) for ln in
                    (tmp_path / out).read_text().splitlines()]

        pc = run(["--paged", "--page", "8", "--page_cache"], "pc.jsonl")
        slot = run([], "slot.jsonl")
        msgs = capsys.readouterr().out
        assert [r["text"] for r in pc] == [r["text"] for r in slot]
        assert "[page cache: 2 page hits" in msgs


class TestPagedValidation:
    def test_rejects_unsupported_modes(self):
        from linalg_tpu.models.moe import MoEGPTConfig, init_moe_params

        mcfg = MoEGPTConfig(vocab_size=31, d_model=32, n_heads=2,
                            n_layers=2, ctx_len=64, n_experts=2)
        with pytest.raises(ValueError, match="paged"):
            ServeEngine(init_moe_params(mcfg, seed=0), mcfg, paged=True)
        # paged x quant COMPOSES since round 5; window/ring still rejects
        wcfg = GPTConfig(vocab_size=31, d_model=32, n_heads=2, n_layers=2,
                         ctx_len=64, window=16, pos="rope")
        with pytest.raises(ValueError, match="paged|window"):
            ServeEngine(init_gpt_params(wcfg, seed=0), wcfg, paged=True,
                        page=16)


class TestWriteLowerings:
    """The legacy 'dus' KV-write lowering (LINALG_TPU_KV_WRITE=dus) must
    stay equal to the flat row-scatter default — it is the A/B baseline
    tools/ab_kv_write.py measures against (advisor round 4)."""

    def _both(self, monkeypatch, fn):
        monkeypatch.delenv("LINALG_TPU_KV_WRITE", raising=False)
        jax.clear_caches()  # the gate is read at trace time
        flat = fn()
        monkeypatch.setenv("LINALG_TPU_KV_WRITE", "dus")
        jax.clear_caches()
        dus = fn()
        monkeypatch.delenv("LINALG_TPU_KV_WRITE", raising=False)
        jax.clear_caches()
        return flat, dus

    def test_fkv_write_slots_flat_equals_dus(self, monkeypatch):
        from linalg_tpu.nn.cache import fkv_write_slots

        rng = np.random.default_rng(0)
        B, h, T, d = 3, 2, 16, 4
        kb = jnp.asarray(rng.normal(size=(B, h, T, d)), jnp.float32)
        vb = jnp.asarray(rng.normal(size=(B, h, T, d)), jnp.float32)
        kn = jnp.asarray(rng.normal(size=(B, h, 1, d)), jnp.float32)
        vn = jnp.asarray(rng.normal(size=(B, h, 1, d)), jnp.float32)
        # in-range, upper-clamp, and NEGATIVE positions (the round-4
        # advisor bug: flat clamped only the upper bound)
        pos = jnp.asarray([5, T + 9, -3], jnp.int32)
        (kf, vf), (kd, vd) = self._both(
            monkeypatch, lambda: fkv_write_slots(kb, vb, pos, kn, vn))
        np.testing.assert_array_equal(np.asarray(kf), np.asarray(kd))
        np.testing.assert_array_equal(np.asarray(vf), np.asarray(vd))

    def test_paged_chunk_flat_equals_dus(self, monkeypatch):
        from linalg_tpu.serve.paged import decode_chunk_paged

        page, B = 16, 2
        n_pages = 1 + B * (CFG.ctx_len // page)
        cache = init_paged_cache(CFG, B, n_pages, page)
        # give each slot a private page table and a mid-sequence position
        table = np.zeros((B, CFG.ctx_len // page), np.int32)
        ids = iter(range(1, n_pages))
        for b in range(B):
            table[b] = [next(ids) for _ in range(CFG.ctx_len // page)]
        cache = dict(cache, table=jnp.asarray(table),
                     pos=jnp.asarray([3, 20], jnp.int32))
        rng = np.random.default_rng(1)
        logits = jnp.asarray(rng.normal(size=(B, CFG.vocab_size)),
                             jnp.float32)
        key = jax.random.PRNGKey(0)
        ones = jnp.ones((B,), jnp.float32)

        def run():
            t, lg, c = decode_chunk_paged(
                PARAMS, cache, logits, key, ones, 0 * ones,
                jnp.zeros((B,), jnp.int32), CFG, 4)
            return (np.asarray(t), np.asarray(lg),
                    np.asarray(c["pool_k"]), np.asarray(c["pool_v"]))

        flat, dus = self._both(monkeypatch, run)
        for a, b in zip(flat, dus):
            np.testing.assert_array_equal(a, b)


class TestPagedCompositions:
    """Round-4 verdict item 2: paged KV composes with multi-LoRA, int8
    weight-only decode, and int8 KV pages. The weight representation and
    the KV layout meet only at _decode_chunk_core's (ops, write_fn) seams,
    so each pair is pinned exactly against its layout-free twin."""

    def _reqs(self, rng, ns=(6, 10, 8)):
        return [Request(rng.integers(0, 31, rng.integers(3, 10)).tolist(),
                        int(n)) for n in ns]

    def test_paged_quant_matches_slot_quant(self):
        rng = np.random.default_rng(10)
        reqs = self._reqs(rng)
        slot = serve(PARAMS, CFG, reqs, n_slots=2, chunk=4, top_k=1,
                     quant="int8")
        eng = ServeEngine(PARAMS, CFG, n_slots=2, chunk=4, top_k=1,
                         paged=True, page=16, quant="int8")
        for r in reqs:
            eng.submit(r)
        paged = sorted(eng.run(), key=lambda c: c.request_id)
        assert [c.tokens for c in paged] == [c.tokens for c in slot]

    def test_paged_multi_lora_matches_merged_oracle(self):
        from linalg_tpu.models.gpt import gpt_decode_chunk, gpt_prefill
        from linalg_tpu.models.lora import (LoRAConfig, init_lora_params,
                                            lora_merge)

        lcfg = LoRAConfig(rank=4)
        ad = init_lora_params(PARAMS, lcfg, seed=1)
        rng = np.random.default_rng(11)
        ad["layers"] = {
            k: (v if k.endswith("_A") else
                jnp.asarray(rng.normal(0, 0.05, v.shape), jnp.float32))
            for k, v in ad["layers"].items()}
        eng = ServeEngine(PARAMS, CFG, n_slots=2, chunk=4, top_k=1,
                          paged=True, page=16, max_loras=2, lora_rank=4)
        i1 = eng.register_lora(ad, lcfg)
        prompt = rng.integers(0, 31, 8).tolist()
        r0 = eng.submit(Request(prompt, 8))
        r1 = eng.submit(Request(prompt, 8, lora_id=i1))
        done = {c.request_id: c.tokens for c in eng.run()}

        def greedy(params):
            ids = jnp.asarray(np.asarray(prompt, np.int32)[None])
            lg, cache = gpt_prefill(params, ids, CFG)
            t, _, _ = gpt_decode_chunk(params, cache, lg,
                                       jax.random.PRNGKey(0), CFG, 8,
                                       1.0, 1, 0.0)
            return np.asarray(t)[0].tolist()

        assert done[r0] == greedy(PARAMS)
        assert done[r1] == greedy(lora_merge(PARAMS, ad, lcfg))

    def test_paged_lora_prefix_pages_shared(self):
        """Adapter-worn prefixes share pages in paged mode too."""
        from linalg_tpu.models.lora import LoRAConfig, init_lora_params

        lcfg = LoRAConfig(rank=4)
        ad = init_lora_params(PARAMS, lcfg, seed=2)
        rng = np.random.default_rng(12)
        ad["layers"] = {
            k: (v if k.endswith("_A") else
                jnp.asarray(rng.normal(0, 0.05, v.shape), jnp.float32))
            for k, v in ad["layers"].items()}
        eng = ServeEngine(PARAMS, CFG, n_slots=2, chunk=4, top_k=1,
                          paged=True, page=16, max_loras=1, lora_rank=4)
        i1 = eng.register_lora(ad, lcfg)
        prefix = rng.integers(0, 31, 20).tolist()
        pid = eng.register_prefix(prefix, lora_id=i1)
        suffix = rng.integers(0, 31, 5).tolist()
        eng.submit(Request(suffix, 6, prefix_id=pid, lora_id=i1))
        out = eng.run()
        # oracle: un-paged multi-LoRA engine with the same prefix
        ref = ServeEngine(PARAMS, CFG, n_slots=2, chunk=4, top_k=1,
                          max_loras=1, lora_rank=4)
        j1 = ref.register_lora(ad, lcfg)
        qid = ref.register_prefix(prefix, lora_id=j1)
        ref.submit(Request(suffix, 6, prefix_id=qid, lora_id=j1))
        want = ref.run()
        assert out[0].tokens == want[0].tokens

    def test_kv8_matches_dense_int8_kv_exactly(self):
        """paged kv8 == a dense-layout int8-KV decode built from
        models.quant's pieces (same per-row quantization points, so the
        layout is transparent at EXACT equality, not just "close")."""
        from linalg_tpu.models.gpt import (_decode_chunk_core,
                                           _dt_decode_ops, gpt_prefill)
        from linalg_tpu.models.quant import (_kv8_attn, _kv8_write,
                                             quantize_kv_cache)
        from linalg_tpu.nn.cache import fkv_write_slots

        rng = np.random.default_rng(13)
        prompt = rng.integers(0, 31, 7).tolist()
        eng = ServeEngine(PARAMS, CFG, n_slots=1, chunk=8, top_k=1,
                          paged=True, page=16, kv8=True)
        eng.submit(Request(prompt, 8))
        got = eng.run()[0].tokens

        # dense int8-KV twin: quantized prefill cache + kv8 write/attn
        ids = jnp.asarray(np.asarray(prompt, np.int32)[None])
        logits, cache = gpt_prefill(PARAMS, ids, CFG)
        qc = quantize_kv_cache(cache)
        ops = dict(_dt_decode_ops(PARAMS, CFG),
                   attn=_kv8_attn(CFG.compute_dtype))
        toks, *_ = _decode_chunk_core(
            CFG, ops, logits, qc["k"], qc["v"],
            jnp.asarray([len(prompt)], jnp.int32), jnp.zeros((), jnp.int32),
            jax.random.PRNGKey(0), 8, jnp.ones((1, 1), jnp.float32),
            jnp.ones((1,), jnp.int32), jnp.zeros((1, 1), jnp.float32),
            _kv8_write(fkv_write_slots))
        assert got == np.asarray(toks)[0].tolist()

    def test_kv8_pool_bytes_halve(self):
        from linalg_tpu.serve.paged import init_paged_cache

        plain = init_paged_cache(CFG, 2, 9, 16)
        q8 = init_paged_cache(CFG, 2, 9, 16, kv8=True)
        nb = lambda t: sum(a.nbytes for a in jax.tree.leaves(t))
        # f32 pools -> int8 + 1 f32 scale per d_head=16 row: ~0.31x
        assert nb(q8["pool_k"]) < 0.5 * nb(plain["pool_k"])

    def test_kv8_engine_serves_mixed_requests(self):
        rng = np.random.default_rng(14)
        reqs = self._reqs(rng, ns=(6, 12, 9, 7))
        eng = ServeEngine(PARAMS, CFG, n_slots=2, chunk=4, top_k=1,
                          paged=True, page=16, kv8=True)
        ids = [eng.submit(r) for r in reqs]
        done = {c.request_id: c for c in eng.run()}
        assert set(done) == set(ids)
        slot = serve(PARAMS, CFG, reqs, n_slots=2, chunk=4, top_k=1)
        flat = [(a, b) for c, s in zip(ids, slot)
                for a, b in zip(done[c].tokens, s.tokens)]
        agree = np.mean([a == b for a, b in flat])
        assert agree > 0.8  # int8 KV is lossy but close at these scales

    def test_validation(self):
        with pytest.raises(ValueError, match="kv8"):
            ServeEngine(PARAMS, CFG, kv8=True)  # needs paged
        with pytest.raises(ValueError, match="kv8"):
            ServeEngine(PARAMS, CFG, paged=True, page=16, kv8=True,
                        paged_attn="kernel")


class TestAdmissionSchedule:
    """Round-4 verdict item 9: FIFO head-of-line blocking documented and
    pinned; opt-in best-fit lets small requests flow past a blocked
    large one."""

    def _engine(self, schedule):
        # pool of 5 usable pages (page=16, ctx=64): A takes 3, B needs 4
        # (blocked behind A), C needs 1
        return ServeEngine(PARAMS, CFG, n_slots=2, chunk=4, top_k=1,
                          paged=True, page=16, n_pages=6,
                          schedule=schedule)

    A = staticmethod(lambda: Request([1, 2, 3, 4, 5], 27))   # 3 pages
    B = staticmethod(lambda: Request([1] * 10, 50))          # 4 pages
    C = staticmethod(lambda: Request([2, 3, 4], 8))          # 1 page

    def test_fifo_blocks_but_never_starves(self):
        eng = self._engine("fifo")
        ra = eng.submit(self.A())
        rb = eng.submit(self.B())
        rc = eng.submit(self.C())
        eng.step()
        # B cannot fit while A holds 3 of 5 pages; FIFO keeps C behind B
        assert eng.n_active == 1 and eng.pending == 2
        done = {c.request_id: c for c in eng.run()}
        assert set(done) == {ra, rb, rc}  # everyone completes eventually

    def test_best_fit_admits_small_past_blocked_large(self):
        eng = self._engine("best-fit")
        ra = eng.submit(self.A())
        rb = eng.submit(self.B())
        rc = eng.submit(self.C())
        eng.step()
        # C (1 page) flows past the blocked B into the second slot
        assert eng.n_active == 2 and eng.pending == 1
        active = {r.request_id for r in eng._slot_req if r is not None}
        assert active == {ra, rc}
        done = {c.request_id: c for c in eng.run()}
        assert set(done) == {ra, rb, rc}
        # and the tokens are unaffected by the schedule
        ref = self._engine("fifo")
        ids = [ref.submit(r()) for r in (self.A, self.B, self.C)]
        want = {c.request_id: c.tokens for c in ref.run()}
        for got_id, want_id in zip((ra, rb, rc), ids):
            assert done[got_id].tokens == want[want_id]

    def test_validation(self):
        with pytest.raises(ValueError, match="schedule"):
            ServeEngine(PARAMS, CFG, schedule="lifo")


class TestPageCache:
    """Automatic (content-addressed) prefix caching: retired requests
    leave their full prompt pages in the pool keyed by a per-adapter
    chain hash; admissions reuse the longest cached block run and
    prefill only the tail. Warm tokens must be EXACTLY the cold
    engine's (pooled rows are a deterministic function of the token
    prefix), refs pin in-use pages, refs-0 entries evict LRU under
    pressure."""

    def _eng(self, **kw):
        kw.setdefault("n_slots", 2)
        kw.setdefault("chunk", 4)
        kw.setdefault("top_k", 1)
        kw.setdefault("page", 8)
        return ServeEngine(PARAMS, CFG, paged=True, page_cache=True, **kw)

    def test_warm_repeat_exact_and_hits(self):
        rng = np.random.default_rng(30)
        prompt = rng_prompt(rng, CFG, 20, 21)  # 20 tokens = 2 full pages
        cold = slot_tokens([Request(prompt, 8)], n_slots=2, chunk=4,
                           top_k=1)
        eng = self._eng()
        r1 = eng.submit(Request(prompt, 8))
        t1 = {c.request_id: c.tokens for c in eng.run()}[r1]
        assert eng.stats["page_cache_hits"] == 0  # cold
        r2 = eng.submit(Request(prompt, 8))
        t2 = {c.request_id: c.tokens for c in eng.run()}[r2]
        want = next(iter(cold.values()))[0]
        assert t1 == want and t2 == want
        assert eng.stats["page_cache_hits"] == 2  # both full pages reused

    def test_shared_block_prefix_partial_hit(self):
        rng = np.random.default_rng(31)
        head = rng_prompt(rng, CFG, 16, 17)  # 2 full pages
        a = head + rng_prompt(rng, CFG, 5, 8)
        b = head + rng_prompt(rng, CFG, 5, 8)
        cold = slot_tokens([Request(a, 6), Request(b, 6)], n_slots=2,
                           chunk=4, top_k=1)
        eng = self._eng(n_slots=1)  # serialize: a retires before b admits
        ra = eng.submit(Request(a, 6))
        rb = eng.submit(Request(b, 6))
        done = {c.request_id: c.tokens for c in eng.run()}
        assert done[ra] == cold[ra][0]
        assert done[rb] == cold[rb][0]
        assert eng.stats["page_cache_hits"] == 2  # b reused head's pages

    def test_eviction_under_pressure(self):
        """A pool too small for two requests' pages evicts the refs-0
        cached pages of the first to admit the second — and stays
        exact."""
        rng = np.random.default_rng(32)
        a = rng_prompt(rng, CFG, 20, 21)
        b = rng_prompt(rng, CFG, 20, 21)
        cold = slot_tokens([Request(a, 8), Request(b, 8)], n_slots=2,
                           chunk=4, top_k=1)
        # per request: 20 prompt + 8 decode = 28 rows -> 4 pages of 8;
        # 5 usable pages hold b's 4 only after evicting one of a's 2
        # cached (refs-0) blocks
        eng = self._eng(n_slots=1, n_pages=6)
        ra = eng.submit(Request(a, 8))
        done = {c.request_id: c.tokens for c in eng.run()}
        rb = eng.submit(Request(b, 8))
        done.update({c.request_id: c.tokens for c in eng.run()})
        assert done[ra] == cold[ra][0] and done[rb] == cold[rb][0]
        assert eng.stats["page_cache_evicted"] > 0
        # and a re-run of `a` now misses (its pages were evicted for b)

    def test_adapter_keys_are_separate(self):
        from linalg_tpu.models.lora import LoRAConfig, init_lora_params

        lcfg = LoRAConfig(rank=2, alpha=4.0)
        lora = init_lora_params(PARAMS, lcfg, seed=3)
        rng = np.random.default_rng(33)
        lb = {k: (jnp.asarray(rng.normal(0, 0.05, v.shape), jnp.float32)
                  if k.endswith("_B") else v)
              for k, v in lora["layers"].items()}
        rng2 = np.random.default_rng(34)
        prompt = rng_prompt(rng2, CFG, 20, 21)
        eng = self._eng(max_loras=1, lora_rank=2)
        lid = eng.register_lora({"layers": lb}, lcfg)
        r1 = eng.submit(Request(prompt, 6))          # base model
        eng.run()
        r2 = eng.submit(Request(prompt, 6, lora_id=lid))  # adapter
        eng.run()
        # same tokens, different adapter -> different chain keys, no hit
        assert eng.stats["page_cache_hits"] == 0
        r3 = eng.submit(Request(prompt, 6, lora_id=lid))
        eng.run()
        assert eng.stats["page_cache_hits"] == 2  # adapter's own pages

    def test_speculative_page_cache_exact(self):
        rng = np.random.default_rng(35)
        prompt = (rng_prompt(rng, CFG, 10, 11) * 3)[:24]  # 3 full pages
        plain = self._eng()
        r0 = plain.submit(Request(prompt, 8))
        want = {c.request_id: c.tokens for c in plain.run()}[r0]
        eng = self._eng(speculative=2)
        r1 = eng.submit(Request(prompt, 8))
        t1 = {c.request_id: c.tokens for c in eng.run()}[r1]
        r2 = eng.submit(Request(prompt, 8))
        t2 = {c.request_id: c.tokens for c in eng.run()}[r2]
        assert t1 == want and t2 == want
        assert eng.stats["page_cache_hits"] >= 2

    def test_concurrent_identical_prompts_dedup_insert(self):
        """Two identical requests in flight together: both compute their
        pages privately (no retire yet), and the SECOND retire finds the
        keys taken — its duplicate pages release instead of leaking."""
        rng = np.random.default_rng(36)
        # 17 tokens: 2 full pages + a 1-token tail (a 16-token prompt
        # would cap warm matching at ONE block — the last full block is
        # excluded so >= 1 token remains to produce admission logits)
        prompt = rng_prompt(rng, CFG, 17, 18)
        cold = slot_tokens([Request(prompt, 6)] * 2, n_slots=2, chunk=4,
                           top_k=1)
        eng = self._eng(n_slots=2)
        ids = [eng.submit(Request(prompt, 6)) for _ in range(2)]
        done = {c.request_id: c.tokens for c in eng.run()}
        for rid in ids:
            assert done[rid] == cold[rid][0]
        free0 = eng._allocator.n_free
        # cache holds ONE copy of the 2 blocks; a warm run hits both
        r3 = eng.submit(Request(prompt, 6))
        done3 = {c.request_id: c.tokens for c in eng.run()}
        assert done3[r3] == cold[ids[0]][0]
        assert eng.stats["page_cache_hits"] == 2
        assert eng._allocator.n_free == free0  # no leak

    def test_explicit_prefix_requests_bypass_page_cache(self):
        rng = np.random.default_rng(37)
        prefix = rng_prompt(rng, CFG, 16, 17)
        tail = rng_prompt(rng, CFG, 4, 6)
        eng = self._eng()
        pid = eng.register_prefix(prefix)
        eng.submit(Request(tail, 6, prefix_id=pid))
        eng.run()
        eng.submit(Request(tail, 6, prefix_id=pid))
        eng.run()
        assert eng.stats["page_cache_hits"] == 0  # prefix path, no pc

    def test_validation(self):
        with pytest.raises(ValueError, match="paged"):
            ServeEngine(PARAMS, CFG, page_cache=True)
        with pytest.raises(ValueError, match="kv8"):
            ServeEngine(PARAMS, CFG, paged=True, page=8, kv8=True,
                        page_cache=True)
