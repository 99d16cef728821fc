"""Grouped-query attention (GQA/MQA): config, training, decode, serving.

The reference has single-ratio MHA only (/root/reference/ai_comps/
attention.py:98-264); ``GPTConfig(n_kv_heads=...)`` is the TPU-serving
extension (Ainslie et al. 2023): K/V are projected to n_kv_heads <=
n_heads and each KV head serves a group of query heads. The KV cache —
and its per-token decode HBM traffic, the long-context serving
bottleneck — shrinks by the group factor.

The load-bearing oracle: a GQA model must be EXACTLY equivalent to the
MHA model whose Wk/Wv tile each grouped head's block once per query head
(jnp.repeat on heads == column-block tiling of the projection), forward
AND backward (the repeat's transpose sums each group's dK/dV).
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
    init_decode_cache,
    init_gpt_params,
)

CFG = GPTConfig(vocab_size=37, d_model=32, n_heads=4, n_layers=2,
                ctx_len=24, n_kv_heads=2)


def _data(B=3, T=24, seed=0, V=37):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.integers(0, V, (B, T)), jnp.int32)
    y = jnp.asarray(rng.integers(0, V, (B, T)), jnp.int32)
    return x, y


def _tile_kv(params, cfg):
    """The MHA twin's params: tile each grouped K/V head block g times."""
    g = cfg.n_heads // cfg.kv_heads
    d = cfg.d_head

    def tile(W):  # (L, D, kv*d) -> (L, D, H*d), head-block repeat
        blocks = [W[..., i * d:(i + 1) * d] for i in range(cfg.kv_heads)]
        return jnp.concatenate(
            [b for blk in blocks for b in [blk] * g], axis=-1)

    lay = dict(params["layers"])
    lay["Wk"] = tile(lay["Wk"])
    lay["Wv"] = tile(lay["Wv"])
    return dict(params, layers=lay)


class TestConfig:
    def test_validation(self):
        with pytest.raises(ValueError, match="divide"):
            GPTConfig(vocab_size=7, n_heads=4, n_kv_heads=3)
        with pytest.raises(ValueError, match="divide"):
            GPTConfig(vocab_size=7, n_heads=4, n_kv_heads=0)

    def test_kv_heads_default(self):
        assert GPTConfig(vocab_size=7, n_heads=4).kv_heads == 4
        assert CFG.kv_heads == 2

    def test_param_shapes(self):
        p = init_gpt_params(CFG, seed=0)
        KD = CFG.kv_heads * CFG.d_head
        assert p["layers"]["Wk"].shape == (2, 32, KD)
        assert p["layers"]["Wv"].shape == (2, 32, KD)
        assert p["layers"]["Wq"].shape == (2, 32, 32)

    def test_cache_shape_is_grouped(self):
        cache = init_decode_cache(CFG, batch=2)
        assert cache["k"].shape == (2, 2, CFG.kv_heads, 24, CFG.d_head)


class TestTiledOracle:
    """GQA forward/backward == the head-block-tiled MHA model, exactly."""

    @pytest.mark.parametrize("pos", ["sinusoidal", "rope", "alibi"])
    def test_forward_equals_tiled_mha(self, pos):
        cfg = GPTConfig(vocab_size=37, d_model=32, n_heads=4, n_layers=2,
                        ctx_len=24, n_kv_heads=2, pos=pos)
        mha = GPTConfig(vocab_size=37, d_model=32, n_heads=4, n_layers=2,
                        ctx_len=24, pos=pos)
        params = init_gpt_params(cfg, seed=0)
        x, _ = _data()
        a = gpt_apply(params, x, cfg)
        b = gpt_apply(_tile_kv(params, cfg), x, mha)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_mqa_forward_equals_tiled_mha(self):
        cfg = GPTConfig(vocab_size=37, d_model=32, n_heads=4, n_layers=2,
                        ctx_len=24, n_kv_heads=1)
        mha = GPTConfig(vocab_size=37, d_model=32, n_heads=4, n_layers=2,
                        ctx_len=24)
        params = init_gpt_params(cfg, seed=1)
        x, _ = _data(seed=1)
        np.testing.assert_allclose(
            np.asarray(gpt_apply(params, x, cfg)),
            np.asarray(gpt_apply(_tile_kv(params, cfg), x, mha)), atol=1e-5)

    def test_grads_equal_tiled_mha_groupsum(self):
        """d(Wk_gqa) block i == sum of the tiled model's group-i blocks —
        the repeat's transpose, via the full training loss."""
        mha = GPTConfig(vocab_size=37, d_model=32, n_heads=4, n_layers=2,
                        ctx_len=24)
        params = init_gpt_params(CFG, seed=2)
        x, y = _data(seed=2)
        g_gqa = jax.grad(gpt_loss)(params, x, y, CFG)
        g_mha = jax.grad(gpt_loss)(_tile_kv(params, CFG), x, y, mha)
        d = CFG.d_head
        g = CFG.n_heads // CFG.kv_heads
        for name in ("Wk", "Wv"):
            got = np.asarray(g_gqa["layers"][name])
            tiled = np.asarray(g_mha["layers"][name])
            for i in range(CFG.kv_heads):
                want = sum(
                    tiled[..., (i * g + j) * d:(i * g + j + 1) * d]
                    for j in range(g))
                np.testing.assert_allclose(
                    got[..., i * d:(i + 1) * d], want, atol=1e-5)
        # the non-grouped leaves agree outright
        np.testing.assert_allclose(np.asarray(g_gqa["layers"]["Wq"]),
                                   np.asarray(g_mha["layers"]["Wq"]),
                                   atol=1e-5)


class TestDecode:
    @pytest.mark.parametrize("pos", ["sinusoidal", "rope", "alibi"])
    def test_greedy_decode_matches_forward(self, pos):
        cfg = GPTConfig(vocab_size=37, d_model=32, n_heads=4, n_layers=2,
                        ctx_len=24, n_kv_heads=2, pos=pos)
        params = init_gpt_params(cfg, seed=0)
        x, _ = _data()
        prompt = x[:1, :8]
        logits, cache = gpt_prefill(params, prompt, cfg)
        assert cache["k"].shape[2] == 2  # grouped cache
        seq = list(np.asarray(prompt[0]))
        for _ in range(6):
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

    def test_decode_chunk_matches_stepwise(self):
        from linalg_tpu.models.gpt import gpt_decode_chunk

        params = init_gpt_params(CFG, seed=3)
        x, _ = _data(seed=3)
        prompt = x[:1, :6]
        logits, cache = gpt_prefill(params, prompt, CFG)
        toks, _, _ = gpt_decode_chunk(params, cache, logits,
                                      jax.random.PRNGKey(0), CFG, 8,
                                      1e-6, 1, 0.0)
        logits2, cache2 = gpt_prefill(params, prompt, CFG)
        got = []
        for _ in range(8):
            t = int(jnp.argmax(logits2))
            got.append(t)
            logits2, cache2 = gpt_decode_step(
                params, cache2, jnp.asarray([t], jnp.int32), CFG)
        np.testing.assert_array_equal(np.asarray(toks)[0], got)


class TestServing:
    def test_speculative_greedy_matches_plain(self):
        from linalg_tpu.models.gpt import gpt_decode_chunk
        from linalg_tpu.models.speculative import gpt_generate_speculative

        cfg = GPTConfig(vocab_size=23, d_model=32, n_heads=4, n_layers=2,
                        ctx_len=96, n_kv_heads=2)
        params = init_gpt_params(cfg, seed=0)
        rng = np.random.default_rng(0)
        prompt = np.tile(rng.integers(0, 23, 8), 3).astype(np.int32)
        out, rounds = gpt_generate_speculative(
            params, cfg, prompt, 20, n_draft=4, top_k=1, seed=0)
        logits, cache = gpt_prefill(params, jnp.asarray(prompt[None]), cfg)
        ref, _, _ = gpt_decode_chunk(params, cache, logits,
                                     jax.random.PRNGKey(0), cfg, 20,
                                     1.0, 1, 0.0)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref)[0])

    def test_engine_matches_single_stream(self):
        from linalg_tpu.serve.engine import Request, serve

        params = init_gpt_params(CFG, seed=0)
        x, _ = _data()
        prompts = [list(np.asarray(x[0, :5])), list(np.asarray(x[1, :9]))]
        out = serve(params, CFG,
                    [Request(p, 6, temperature=1e-6) for p in prompts],
                    n_slots=2, chunk=4, top_k=1)
        for p, c in zip(prompts, out):
            ref = np.asarray(
                gpt_generate(params, CFG, [p], 6, temperature=1e-6,
                             top_k=1))[0]
            np.testing.assert_array_equal(c.tokens, list(ref))

    def test_int8_and_int8kv_decode(self):
        from linalg_tpu.models.gpt import gpt_decode_chunk
        from linalg_tpu.models.quant import (gpt_decode_chunk_q,
                                             quantize_gpt_params,
                                             quantize_kv_cache)

        params = init_gpt_params(CFG, seed=0)
        qparams = quantize_gpt_params(params, CFG)
        x, _ = _data()
        prompt = x[:1, :8]
        logits, cache = gpt_prefill(params, prompt, CFG)
        ref, _, _ = gpt_decode_chunk(params, cache, logits,
                                     jax.random.PRNGKey(0), CFG, 6,
                                     1e-6, 1, 0.0)
        t8, _, _ = gpt_decode_chunk_q(qparams, cache, logits,
                                      jax.random.PRNGKey(0), CFG, 6,
                                      1e-6, 1, 0.0)
        tkv, _, _ = gpt_decode_chunk_q(qparams, quantize_kv_cache(cache),
                                       logits, jax.random.PRNGKey(0), CFG,
                                       6, 1e-6, 1, 0.0, kv8=True)
        # int8 decode may legitimately diverge argmax on near-ties of a
        # random-init model; require the FIRST token (pre-drift) to agree
        assert int(np.asarray(t8)[0, 0]) == int(np.asarray(ref)[0, 0])
        assert int(np.asarray(tkv)[0, 0]) == int(np.asarray(ref)[0, 0])


class TestMoE:
    def test_moe_gqa_trains_and_decodes(self):
        from linalg_tpu.models.moe import (MoEGPTConfig, init_moe_params,
                                           moe_gpt_apply, moe_gpt_loss)

        cfg = MoEGPTConfig(vocab_size=37, d_model=32, n_heads=4, n_layers=2,
                           ctx_len=24, n_experts=4, n_kv_heads=2)
        params = init_moe_params(cfg, seed=0)
        x, y = _data()
        loss, g = jax.value_and_grad(moe_gpt_loss)(params, x, y, cfg)
        assert np.isfinite(float(loss))
        for leaf in jax.tree.leaves(g):
            assert np.all(np.isfinite(np.asarray(leaf)))
        # greedy serving matches the full forward
        prompts = [list(range(5))]
        out = np.asarray(
            gpt_generate(params, cfg, prompts, 5, temperature=1e-6))[0]
        seq = list(prompts[0])
        for tok in out:
            full, _ = moe_gpt_apply(params, jnp.asarray([seq], jnp.int32),
                                    cfg)
            assert int(jnp.argmax(full[0, -1])) == int(tok)
            seq.append(int(tok))


class TestCheckpoint:
    def test_roundtrip_preserves_kv_heads(self, tmp_path):
        from linalg_tpu.train.checkpoint import load_ckpt, save_ckpt

        params = init_gpt_params(CFG, seed=0)
        stoi = {str(i): i for i in range(37)}
        itos = {i: str(i) for i in range(37)}
        save_ckpt(tmp_path, params, CFG, stoi, itos)
        p2, cfg2, _, _ = load_ckpt(tmp_path)
        assert cfg2.n_kv_heads == 2 and cfg2.kv_heads == 2
        x, _ = _data()
        np.testing.assert_allclose(np.asarray(gpt_apply(params, x, CFG)),
                                   np.asarray(gpt_apply(p2, x, cfg2)),
                                   atol=1e-6)

    def test_mha_meta_has_no_kv_key(self, tmp_path):
        """Plain-MHA checkpoints keep the reference-compatible meta."""
        import json

        from linalg_tpu.train.checkpoint import save_ckpt

        cfg = GPTConfig(vocab_size=37, d_model=32, n_heads=4, n_layers=2,
                        ctx_len=24)
        params = init_gpt_params(cfg, seed=0)
        save_ckpt(tmp_path, params, cfg, {"a": 0}, {0: "a"})
        meta = json.loads((tmp_path / "chars_gpt_meta.json").read_text())
        assert "kv_heads" not in meta


class TestSharded:
    def test_dp_tp_loss_matches_unsharded(self):
        from linalg_tpu.parallel.mesh import make_mesh
        from linalg_tpu.parallel.sharding import make_sharded_attn

        devs = jax.devices()
        mesh = make_mesh((2, 4), ("dp", "tp"), devs[:8])
        params = init_gpt_params(CFG, seed=0)
        x, y = _data(B=4)
        ref = float(gpt_loss(params, x, y, CFG))
        attn = make_sharded_attn(mesh, CFG.ctx_len, CFG.d_head, cfg=CFG)
        with mesh:
            sh = float(gpt_loss(params, x, y, CFG, attn_fn=attn))
        assert abs(sh - ref) < 1e-4

    def test_pipeline_loss_matches_unsharded(self):
        from linalg_tpu.parallel.mesh import make_mesh
        from linalg_tpu.parallel.pipeline import make_pp_train_step
        from linalg_tpu.train.optim import adamw_init

        devs = jax.devices()
        mesh = make_mesh((2, 4), ("dp", "pp"), devs[:8])
        cfg = GPTConfig(vocab_size=37, d_model=32, n_heads=4, n_layers=8,
                        d_ff=64, ctx_len=16, n_kv_heads=2)
        params = init_gpt_params(cfg, seed=0)
        x, y = _data(B=8, T=16)
        ref = float(gpt_loss(params, x, y, cfg))
        step = make_pp_train_step(cfg, mesh, n_microbatches=2, dp_axis="dp")
        _, _, loss = step(params, adamw_init(params), x, y)
        assert abs(float(loss) - ref) < 1e-4

    def test_gspmd_step_loss_matches_unsharded(self):
        """The GSPMD dp x tp step with tp > kv_heads: Wk/Wv column shards
        split single KV heads across devices; GSPMD must reshard around
        the grouped-head reshape without changing the math (only f32
        reassociation-level drift allowed)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from linalg_tpu.parallel.mesh import make_mesh
        from linalg_tpu.parallel.sharding import (gpt_param_specs,
                                                  make_sharded_train_step)
        from linalg_tpu.train.optim import AdamWState, adamw_init

        cfg = GPTConfig(vocab_size=37, d_model=32, n_heads=4, n_layers=2,
                        ctx_len=16, n_kv_heads=2)
        params = init_gpt_params(cfg, seed=0)
        x, y = _data(B=8, T=16)
        ref = float(gpt_loss(params, x, y, cfg))
        mesh = make_mesh((2, 4), ("dp", "tp"))
        sh = jax.tree.map(lambda s: NamedSharding(mesh, s),
                          gpt_param_specs(None),
                          is_leaf=lambda v: isinstance(v, P))
        params_s = jax.device_put(params, sh)
        opt_s = jax.device_put(
            adamw_init(params),
            AdamWState(m=sh, v=sh, t=NamedSharding(mesh, P())))
        xb = jax.device_put(x, NamedSharding(mesh, P("dp", None)))
        yb = jax.device_put(y, NamedSharding(mesh, P("dp", None)))
        step = make_sharded_train_step(cfg, mesh, lr=1e-3, weight_decay=0.0)
        _, _, loss = step(params_s, opt_s, xb, yb)
        assert float(loss) == pytest.approx(ref, rel=1e-5)

    def test_cli_train_dp_tp_gqa(self, tmp_path):
        """The product surface: --kv_heads through the sharded trainer."""
        from linalg_tpu.apps.gpt import build_parser
        from linalg_tpu.train.trainer import train

        args = build_parser().parse_args([
            "--train", "--steps", "10", "--eval_every", "10",
            "--batch_size", "8", "--ctx_len", "32", "--d_model", "32",
            "--heads", "4", "--layers", "1", "--ckpt_dir", str(tmp_path),
            "--dp", "2", "--tp", "4", "--kv_heads", "2",
        ])
        _, cfg, _, _ = train(args)
        assert cfg.kv_heads == 2
        assert (tmp_path / "chars_gpt_best.npz").exists()

    def test_sp_train_step_matches_unsharded(self):
        from linalg_tpu.parallel.mesh import make_mesh
        from linalg_tpu.parallel.sharding import make_sp_train_step
        from linalg_tpu.train.optim import adamw_init

        devs = jax.devices()
        mesh = make_mesh((1, 8), ("dp", "sp"), devs[:8])
        params = init_gpt_params(CFG, seed=0)
        x, y = _data(B=2)
        ref = float(gpt_loss(params, x, y, CFG))
        step = make_sp_train_step(CFG, mesh)
        _, _, loss = step(params, adamw_init(params), x, y)
        assert abs(float(loss) - ref) < 1e-4
