"""ALiBi positional mode: slopes, training, decode, serving, sharding.

The reference lists ALiBi as an unbuilt roadmap item (README.md:57-65);
``GPTConfig(pos="alibi")`` implements it end-to-end: position enters ONLY
as the per-head additive score bias ``slope_h * (j - i)`` (Press et al.,
"Train Short, Test Long") — no PE table, no rotation — threaded through
the training trunk, prefill, cached decode, batched serving, the dp x tp
sharded step (head-sliced slopes inside shard_map), MoE, the pipeline
stages, and the sp rings (XLA ppermute AND the in-kernel DMA Pallas ring,
where the slopes are baked in as compile-time constants).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from linalg_tpu.models.gpt import (
    GPTConfig,
    gpt_apply,
    gpt_decode_step,
    gpt_generate,
    gpt_loss,
    gpt_prefill,
    init_gpt_params,
)
from linalg_tpu.nn.positional import alibi_slopes


class TestSlopes:
    def test_power_of_two(self):
        np.testing.assert_allclose(np.asarray(alibi_slopes(8)),
                                   [2.0 ** -(i + 1) for i in range(8)],
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(alibi_slopes(4)),
                                   [0.25 ** (i + 1) for i in range(4)],
                                   rtol=1e-6)

    def test_non_power_of_two_interleaves(self):
        # paper rule: slopes(4) then every other slope of slopes(8)
        s6 = np.asarray(alibi_slopes(6))
        s4 = np.asarray(alibi_slopes(4))
        s8 = np.asarray(alibi_slopes(8))
        np.testing.assert_allclose(s6[:4], s4, rtol=1e-6)
        np.testing.assert_allclose(s6[4:], s8[0::2][:2], rtol=1e-6)

    def test_rejects_zero(self):
        with pytest.raises(ValueError):
            alibi_slopes(0)


CFG = GPTConfig(vocab_size=37, d_model=32, n_heads=4, n_layers=2,
                ctx_len=24, pos="alibi")


def _data(B=3, T=24, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.integers(0, CFG.vocab_size, (B, T)), jnp.int32)
    y = jnp.asarray(rng.integers(0, CFG.vocab_size, (B, T)), jnp.int32)
    return x, y


class TestTraining:
    def test_loss_and_grads_finite(self):
        params = init_gpt_params(CFG, seed=0)
        x, y = _data()
        loss, g = jax.value_and_grad(gpt_loss)(params, x, y, CFG)
        assert np.isfinite(float(loss))
        for leaf in jax.tree.leaves(g):
            assert np.all(np.isfinite(np.asarray(leaf)))

    def test_position_sensitive(self):
        """No PE table, yet reversing the sequence must change the last
        logits — position enters through the score bias."""
        params = init_gpt_params(CFG, seed=0)
        x, _ = _data()
        a = gpt_apply(params, x, CFG)[:, -1]
        b = gpt_apply(params, x[:, ::-1], CFG)[:, -1]
        assert not np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_no_pe_params(self):
        assert "pos_W" not in init_gpt_params(CFG, seed=0)


class TestDecode:
    def test_prefill_matches_forward(self):
        params = init_gpt_params(CFG, seed=0)
        x, _ = _data()
        prompt = x[:1, :10]
        logits, _cache = gpt_prefill(params, prompt, CFG)
        full = gpt_apply(params, prompt, CFG)
        np.testing.assert_allclose(np.asarray(logits),
                                   np.asarray(full[:, -1]), atol=1e-4)

    def test_greedy_decode_matches_forward(self):
        params = init_gpt_params(CFG, seed=0)
        x, _ = _data()
        prompt = x[:1, :8]
        logits, cache = gpt_prefill(params, prompt, CFG)
        seq = list(np.asarray(prompt[0]))
        for _ in range(6):
            tok = int(jnp.argmax(logits))
            full = gpt_apply(params, jnp.asarray([seq], jnp.int32), CFG)
            assert int(jnp.argmax(full[0, -1])) == tok
            seq.append(tok)
            logits, cache = gpt_decode_step(
                params, cache, jnp.asarray([tok], jnp.int32), CFG)

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


class TestSharded:
    def test_dp_tp_loss_matches_unsharded(self):
        from linalg_tpu.parallel.mesh import make_mesh
        from linalg_tpu.parallel.sharding import make_sharded_attn

        devs = jax.devices()
        assert len(devs) >= 8, "conftest pins 8 virtual CPU devices"
        mesh = make_mesh((2, 4), ("dp", "tp"), devs[:8])
        params = init_gpt_params(CFG, seed=0)
        x, y = _data(B=4)
        ref = float(gpt_loss(params, x, y, CFG))
        attn = make_sharded_attn(mesh, CFG.ctx_len, CFG.d_head, cfg=CFG)
        with mesh:
            sh = float(gpt_loss(params, x, y, CFG, attn_fn=attn))
        assert abs(sh - ref) < 1e-4

    def test_ep_attn_replicated_heads(self):
        """head_axis=None (the MoE dp x ep step) uses the full slope set."""
        from linalg_tpu.parallel.mesh import make_mesh
        from linalg_tpu.parallel.sharding import make_sharded_attn

        devs = jax.devices()
        mesh = make_mesh((2, 4), ("dp", "ep"), devs[:8])
        params = init_gpt_params(CFG, seed=0)
        x, y = _data(B=4)
        ref = float(gpt_loss(params, x, y, CFG))
        attn = make_sharded_attn(mesh, CFG.ctx_len, CFG.d_head,
                                 head_axis=None, cfg=CFG)
        with mesh:
            sh = float(gpt_loss(params, x, y, CFG, attn_fn=attn))
        assert abs(sh - ref) < 1e-4

    def _alibi_sdpa_ref(self, q, k, v):
        """Dense reference: sdpa with the per-head distance bias folded
        into the causal mask (exactly models.gpt._trunk_mask's shape)."""
        from linalg_tpu.nn.functional import causal_mask, sdpa

        h, T = q.shape[1], q.shape[2]
        sl = alibi_slopes(h)
        i = jnp.arange(T)
        bias = sl[:, None, None] * (i[None, None, :] - i[None, :, None])
        mask = causal_mask(T, dtype=q.dtype) + bias[None].astype(q.dtype)
        return sdpa(q, k, v, mask)

    def _qkv(self, B=2, H=4, T=24, d=8, seed=3):
        rng = np.random.default_rng(seed)
        return tuple(jnp.asarray(rng.normal(size=(B, H, T, d)), jnp.float32)
                     for _ in range(3))

    def test_sp_xla_ring_alibi_matches_sdpa(self):
        from linalg_tpu.parallel import make_ring_attention
        from linalg_tpu.parallel.mesh import make_mesh

        q, k, v = self._qkv()
        mesh = make_mesh((8,), ("sp",), jax.devices()[:8])
        sl = tuple(float(s) for s in alibi_slopes(q.shape[1]))
        out = make_ring_attention(mesh, slopes=sl)(q, k, v)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(self._alibi_sdpa_ref(q, k, v)),
                                   atol=1e-5)

    def test_sp_pallas_ring_alibi_fwd_and_grads(self):
        """The in-kernel DMA ring (fwd AND bundle-lap bwd) with baked-in
        slopes must match autodiff through the dense alibi sdpa."""
        from linalg_tpu.parallel import make_ring_attention_pallas
        from linalg_tpu.parallel.mesh import make_mesh

        q, k, v = self._qkv(T=32, seed=4)
        mesh = make_mesh((4,), ("sp",), jax.devices()[:4])
        sl = tuple(float(s) for s in alibi_slopes(q.shape[1]))
        ring = make_ring_attention_pallas(mesh, slopes=sl)
        np.testing.assert_allclose(np.asarray(ring(q, k, v)),
                                   np.asarray(self._alibi_sdpa_ref(q, k, v)),
                                   atol=1e-5)
        w = jnp.asarray(np.random.default_rng(5).normal(size=q.shape),
                        jnp.float32)
        g_p = jax.grad(lambda *a: jnp.sum(ring(*a) * w),
                       argnums=(0, 1, 2))(q, k, v)
        g_r = jax.grad(lambda *a: jnp.sum(self._alibi_sdpa_ref(*a) * w),
                       argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_p, g_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

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

    def test_pipeline_loss_matches_unsharded(self):
        from linalg_tpu.parallel.mesh import make_mesh
        from linalg_tpu.parallel.pipeline import make_pp_train_step
        from linalg_tpu.train.optim import adamw_init

        devs = jax.devices()
        mesh = make_mesh((2, 4), ("dp", "pp"), devs[:8])
        cfg = GPTConfig(vocab_size=37, d_model=32, n_heads=4, n_layers=8,
                        d_ff=64, ctx_len=16, pos="alibi")
        params = init_gpt_params(cfg, seed=0)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.integers(0, 37, (8, 16)), jnp.int32)
        y = jnp.asarray(rng.integers(0, 37, (8, 16)), jnp.int32)
        ref = float(gpt_loss(params, x, y, cfg))
        step = make_pp_train_step(cfg, mesh, n_microbatches=2, dp_axis="dp")
        _, _, loss = step(params, adamw_init(params), x, y)
        assert abs(float(loss) - ref) < 1e-4


class TestMoE:
    def test_moe_alibi_trains_and_serves(self):
        from linalg_tpu.models.moe import (MoEGPTConfig, init_moe_params,
                                           moe_gpt_loss)

        cfg = MoEGPTConfig(vocab_size=37, d_model=32, n_heads=4, n_layers=2,
                           ctx_len=24, n_experts=4, pos="alibi")
        params = init_moe_params(cfg, seed=0)
        x, y = _data()
        loss, g = jax.value_and_grad(moe_gpt_loss)(params, x, y, cfg)
        assert np.isfinite(float(loss))
        for leaf in jax.tree.leaves(g):
            assert np.all(np.isfinite(np.asarray(leaf)))
        # batched serving dispatches on the config type; greedy must match
        # the single-sequence path
        prompts = [list(range(5)), list(range(3, 15))]
        outB = np.asarray(
            gpt_generate(params, cfg, prompts, 6, temperature=1e-6, seed=2))
        for b, p in enumerate(prompts):
            o1 = np.asarray(
                gpt_generate(params, cfg, [p], 6, temperature=1e-6, seed=2))
            np.testing.assert_array_equal(outB[b], o1[0])


class TestCheckpoint:
    def test_meta_roundtrip(self, tmp_path):
        from linalg_tpu.train.checkpoint import load_ckpt, save_ckpt

        params = init_gpt_params(CFG, seed=0)
        save_ckpt(str(tmp_path), params, CFG, {"a": 0}, {0: "a"})
        params2, cfg2, _stoi, _itos = load_ckpt(str(tmp_path))
        assert cfg2.pos == "alibi"
        np.testing.assert_allclose(np.asarray(params2["tok_W"]),
                                   np.asarray(params["tok_W"]))
