"""MoE GPT (expert routing) and pipeline-parallelism tests.

The reference has a dense FFN only (transformer.py:102-206) and no
parallelism (SURVEY §2.5); these cover the TPU-native scaling extensions:
Switch-style top-1 MoE with capacity + load-balance loss, expert
parallelism over 'ep', and the GPipe microbatch pipeline over 'pp'.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from linalg_tpu.models.gpt import GPTConfig, gpt_loss, init_gpt_params
from linalg_tpu.models.moe import (
    MoEGPTConfig,
    init_moe_params,
    moe_ffn,
    moe_gpt_apply,
    moe_gpt_loss,
)
from linalg_tpu.nn.functional import relu
from linalg_tpu.parallel import make_mesh
from linalg_tpu.train.optim import adamw_init


class TestMoEFFN:
    def _weights(self, E, D=8, F=16, seed=0):
        rng = np.random.default_rng(seed)
        return (
            jnp.asarray(rng.normal(size=(D, E)), jnp.float32),
            jnp.asarray(rng.normal(size=(E, D, F)), jnp.float32),
            jnp.asarray(rng.normal(size=(E, F)), jnp.float32),
            jnp.asarray(rng.normal(size=(E, F, D)), jnp.float32),
            jnp.asarray(rng.normal(size=(E, D)), jnp.float32),
        )

    def test_single_expert_equals_dense_ffn(self):
        # E=1 with ample capacity routes every token to the one expert with
        # gate 1.0 -> identical to the dense 2-layer ReLU MLP
        Wr, W1, b1, W2, b2 = self._weights(E=1)
        Wr = jnp.zeros_like(Wr)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(2, 4, 8)), jnp.float32)
        out, aux = moe_ffn(x, Wr, W1, b1, W2, b2, capacity=8)
        dense = relu(x @ W1[0] + b1[0]) @ W2[0] + b2[0]
        np.testing.assert_allclose(np.asarray(out), np.asarray(dense),
                                   atol=1e-5)
        assert float(aux) == pytest.approx(1.0, abs=1e-5)

    def test_capacity_drops_overflow_tokens(self):
        # one expert, capacity 1: routing is per ROW group, so only each
        # row's first token (arrival order) gets an FFN output; the rest
        # are dropped to zero (residual carries them)
        Wr, W1, b1, W2, b2 = self._weights(E=1)
        Wr = jnp.zeros_like(Wr)
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(2, 4, 8)), jnp.float32)
        out, _ = moe_ffn(x, Wr, W1, b1, W2, b2, capacity=1)
        o = np.asarray(out)
        for b in range(2):
            assert np.any(o[b, 0] != 0)
            assert np.all(o[b, 1:] == 0)

    def test_gate_scales_output(self):
        # biased router: output is gate * expert(x); with 2 identical
        # experts the only difference from dense is the gate factor
        E, D, F = 2, 8, 16
        rng = np.random.default_rng(3)
        W1e = jnp.asarray(rng.normal(size=(D, F)), jnp.float32)
        W2e = jnp.asarray(rng.normal(size=(F, D)), jnp.float32)
        W1 = jnp.stack([W1e, W1e])
        W2 = jnp.stack([W2e, W2e])
        b1 = jnp.zeros((E, F), jnp.float32)
        b2 = jnp.zeros((E, D), jnp.float32)
        Wr = jnp.zeros((D, E), jnp.float32)  # uniform -> gate = 0.5
        x = jnp.asarray(rng.normal(size=(1, 4, D)), jnp.float32)
        out, _ = moe_ffn(x, Wr, W1, b1, W2, b2, capacity=8)
        dense = relu(x @ W1e) @ W2e
        np.testing.assert_allclose(np.asarray(out), 0.5 * np.asarray(dense),
                                   atol=1e-5)

    def test_top2_two_identical_experts_equals_dense(self):
        # top-2 over 2 identical experts with a uniform router: gates are
        # (0.5, 0.5), renormalized to sum 1, so the combine reproduces the
        # dense FFN exactly (no dropped second choices at ample capacity)
        E, D, F = 2, 8, 16
        rng = np.random.default_rng(5)
        W1e = jnp.asarray(rng.normal(size=(D, F)), jnp.float32)
        W2e = jnp.asarray(rng.normal(size=(F, D)), jnp.float32)
        W1 = jnp.stack([W1e, W1e])
        W2 = jnp.stack([W2e, W2e])
        b1 = jnp.zeros((E, F), jnp.float32)
        b2 = jnp.zeros((E, D), jnp.float32)
        Wr = jnp.zeros((D, E), jnp.float32)
        x = jnp.asarray(rng.normal(size=(1, 4, D)), jnp.float32)
        out, _ = moe_ffn(x, Wr, W1, b1, W2, b2, capacity=8, top_k=2)
        dense = relu(x @ W1e) @ W2e
        np.testing.assert_allclose(np.asarray(out), np.asarray(dense),
                                   atol=1e-5)

    def test_top2_first_choices_get_capacity_priority(self):
        # capacity 4 = exactly the row's token count: every token's FIRST
        # choice must be granted (all tokens pick the same first expert),
        # and all second choices to that expert must be dropped.  With a
        # router hugely biased to expert 0 and slightly to expert 1, out =
        # g1*e(x) for every token -- identical expert weights make the
        # dropped second choice the only difference from dense.
        E, D, F = 2, 8, 16
        rng = np.random.default_rng(6)
        W1e = jnp.asarray(rng.normal(size=(D, F)), jnp.float32)
        W2e = jnp.asarray(rng.normal(size=(F, D)), jnp.float32)
        W1 = jnp.stack([W1e, W1e])
        W2 = jnp.stack([W2e, W2e])
        b1 = jnp.zeros((E, F), jnp.float32)
        b2 = jnp.zeros((E, D), jnp.float32)
        # logits (5, 0): first choice expert 0 (p~0.993), second expert 1
        Wr = jnp.zeros((D, E), jnp.float32)
        br_like_x = jnp.ones((1, 4, D), jnp.float32)  # x>0 so x@Wr biased
        Wr = Wr.at[:, 0].set(5.0 / D)
        x = br_like_x * jnp.asarray(rng.normal(size=(1, 4, D)) * 0 + 1,
                                    jnp.float32)
        out, _ = moe_ffn(x, Wr, W1, b1, W2, b2, capacity=4, top_k=2)
        # expert 0 grants all 4 first choices; expert 1 grants the 4 second
        # choices (capacity 4) -> full convex combine == dense
        dense = relu(x @ W1e) @ W2e
        np.testing.assert_allclose(np.asarray(out), np.asarray(dense),
                                   atol=1e-5)
        # with capacity 2, positional priority grants BOTH queues to tokens
        # 0,1 (every queue is cumsum-ordered): they get the full convex
        # combine (== dense); tokens 2,3 are over capacity in both their
        # first- and second-choice queues -> dropped to zero entirely
        out2, _ = moe_ffn(x, Wr, W1, b1, W2, b2, capacity=2, top_k=2)
        o2 = np.asarray(out2)
        np.testing.assert_allclose(o2[0, :2], np.asarray(dense)[0, :2],
                                   atol=1e-5)
        np.testing.assert_allclose(o2[0, 2:], 0.0, atol=1e-6)

    def test_top2_moe_gpt_trains(self):
        from linalg_tpu.train.optim import adamw_update, gpt_wd_mask

        cfg = MoEGPTConfig(vocab_size=17, d_model=32, n_heads=4, n_layers=2,
                           d_ff=64, ctx_len=16, n_experts=4, router_top_k=2)
        params = init_moe_params(cfg, seed=0)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.integers(0, 17, (4, 16)), jnp.int32)
        y = jnp.asarray(rng.integers(0, 17, (4, 16)), jnp.int32)

        @jax.jit
        def step(p, o):
            loss, g = jax.value_and_grad(
                lambda p: moe_gpt_loss(p, x, y, cfg))(p)
            p, o = adamw_update(p, g, o, 1e-2, gpt_wd_mask(p, 0.0))
            return p, o, loss

        opt = adamw_init(params)
        first = None
        for _ in range(30):
            params, opt, loss = step(params, opt)
            if first is None:
                first = float(loss)
        assert float(loss) < first

    def test_top2_decode_matches_full_forward(self):
        from linalg_tpu.models.moe import moe_decode_step, moe_prefill

        cfg = MoEGPTConfig(vocab_size=17, d_model=32, n_heads=4, n_layers=2,
                           d_ff=64, ctx_len=16, n_experts=2,
                           capacity_factor=4.0, router_top_k=2)
        params = init_moe_params(cfg, seed=0)
        rng = np.random.default_rng(0)
        seq = jnp.asarray(rng.integers(0, 17, (1, 8)), jnp.int32)
        logits_pre, cache = moe_prefill(params, seq[:, :4], cfg)
        outs = [logits_pre]
        for t in range(4, 8):
            logits_t, cache = moe_decode_step(params, cache, seq[:, t], cfg)
            outs.append(logits_t)
        full, _ = moe_gpt_apply(params, seq, cfg)
        for i, t in enumerate(range(3, 8)):
            np.testing.assert_allclose(np.asarray(outs[i][0]),
                                       np.asarray(full[0, t]), atol=1e-3)

    def test_grads_flow_to_router_and_experts(self):
        Wr, W1, b1, W2, b2 = self._weights(E=4)
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(2, 4, 8)), jnp.float32)

        def f(Wr, W1):
            out, aux = moe_ffn(x, Wr, W1, b1, W2, b2, capacity=4)
            return jnp.sum(out**2) + aux

        gWr, gW1 = jax.grad(f, argnums=(0, 1))(Wr, W1)
        assert float(jnp.sum(jnp.abs(gWr))) > 0
        assert float(jnp.sum(jnp.abs(gW1))) > 0


class TestMoEGPT:
    def _setup(self):
        cfg = MoEGPTConfig(vocab_size=17, d_model=32, n_heads=4, n_layers=2,
                           d_ff=64, ctx_len=16, n_experts=4)
        params = init_moe_params(cfg, seed=0)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.integers(0, 17, (4, 16)), jnp.int32)
        y = jnp.asarray(rng.integers(0, 17, (4, 16)), jnp.int32)
        return cfg, params, x, y

    def test_forward_shapes_and_finite(self):
        cfg, params, x, _ = self._setup()
        logits, aux = moe_gpt_apply(params, x, cfg)
        assert logits.shape == (4, 16, 17)
        assert bool(jnp.all(jnp.isfinite(logits)))
        assert float(aux) > 0

    def test_training_reduces_loss(self):
        from linalg_tpu.train.optim import adamw_update, gpt_wd_mask

        cfg, params, x, y = self._setup()

        @jax.jit
        def step(p, o):
            loss, g = jax.value_and_grad(
                lambda p: moe_gpt_loss(p, x, y, cfg))(p)
            p, o = adamw_update(p, g, o, 1e-2, gpt_wd_mask(p, 0.0))
            return p, o, loss

        opt = adamw_init(params)
        first = None
        for i in range(30):
            params, opt, loss = step(params, opt)
            if first is None:
                first = float(loss)
        assert float(loss) < first

    def test_rope_variant(self):
        cfg = MoEGPTConfig(vocab_size=17, d_model=32, n_heads=4, n_layers=2,
                           d_ff=64, ctx_len=16, n_experts=4, pos="rope")
        params = init_moe_params(cfg, seed=0)
        x = jnp.asarray(np.random.default_rng(0).integers(0, 17, (2, 16)),
                        jnp.int32)
        logits, _ = moe_gpt_apply(params, x, cfg)
        assert bool(jnp.all(jnp.isfinite(logits)))

    def test_ckpt_roundtrip(self, tmp_path):
        from linalg_tpu.train.checkpoint import load_ckpt, save_ckpt

        cfg, params, _, _ = self._setup()
        stoi = {chr(97 + i): i for i in range(17)}
        itos = {i: c for c, i in stoi.items()}
        save_ckpt(tmp_path, params, cfg, stoi, itos)
        params2, cfg2, stoi2, _ = load_ckpt(tmp_path)
        assert isinstance(cfg2, MoEGPTConfig)
        assert cfg2 == cfg
        assert stoi2 == stoi
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-7)

    def test_ckpt_roundtrip_top2(self, tmp_path):
        # router_top_k must survive the meta sidecar: param shapes are
        # identical for top-1 vs top-2, so losing it silently changes
        # routing on resume with no error
        from linalg_tpu.train.checkpoint import load_ckpt, save_ckpt

        cfg = MoEGPTConfig(vocab_size=17, d_model=32, n_heads=4, n_layers=2,
                           d_ff=64, ctx_len=16, n_experts=4, router_top_k=2)
        params = init_moe_params(cfg, seed=0)
        stoi = {chr(97 + i): i for i in range(17)}
        itos = {i: c for c, i in stoi.items()}
        save_ckpt(tmp_path, params, cfg, stoi, itos)
        _, cfg2, _, _ = load_ckpt(tmp_path)
        assert isinstance(cfg2, MoEGPTConfig)
        assert cfg2.router_top_k == 2
        assert cfg2 == cfg


class TestMoEDecode:
    def test_prefill_matches_apply(self):
        cfg = MoEGPTConfig(vocab_size=17, d_model=32, n_heads=4, n_layers=2,
                           d_ff=64, ctx_len=16, n_experts=4)
        params = init_moe_params(cfg, seed=0)
        x = jnp.asarray(np.random.default_rng(0).integers(0, 17, (1, 8)),
                        jnp.int32)
        from linalg_tpu.models.moe import moe_prefill

        logits_full, _ = moe_gpt_apply(params, x, cfg)
        logits_pre, cache = moe_prefill(params, x, cfg)
        # prefill and the full forward route the SAME token set with the
        # same capacity and arrival order, so they drop identically and the
        # last-position logits must agree
        np.testing.assert_allclose(np.asarray(logits_pre),
                                   np.asarray(logits_full[:, -1]), atol=1e-4)
        assert int(cache["length"]) == 8

    def test_incremental_decode_matches_full_forward(self):
        # feeding tokens one at a time through the cached decode step must
        # reproduce the full forward's next-token logits at each position
        from linalg_tpu.models.moe import moe_decode_step, moe_prefill

        cfg = MoEGPTConfig(vocab_size=17, d_model=32, n_heads=4, n_layers=2,
                           d_ff=64, ctx_len=16, n_experts=2,
                           capacity_factor=4.0)
        params = init_moe_params(cfg, seed=0)
        rng = np.random.default_rng(0)
        seq = jnp.asarray(rng.integers(0, 17, (1, 8)), jnp.int32)

        logits_pre, cache = moe_prefill(params, seq[:, :4], cfg)
        outs = [logits_pre]
        for t in range(4, 8):
            logits_t, cache = moe_decode_step(params, cache, seq[:, t], cfg)
            outs.append(logits_t)

        # full forward reference: logits at positions 3..7
        full, _ = moe_gpt_apply(params, seq, cfg)
        for i, t in enumerate(range(3, 8)):
            np.testing.assert_allclose(np.asarray(outs[i][0]),
                                       np.asarray(full[0, t]), atol=1e-3)

    def test_bf16_decode_matches_bf16_forward(self):
        # MoE prefill/decode mirror moe_gpt_apply's mixed precision: bf16
        # weights/activations/KV cache, f32 router and logits
        import jax.numpy as jnp_

        from linalg_tpu.models.moe import moe_decode_step, moe_prefill

        cfg = MoEGPTConfig(vocab_size=17, d_model=32, n_heads=4, n_layers=2,
                           d_ff=64, ctx_len=16, n_experts=2,
                           capacity_factor=4.0, dtype="bfloat16")
        params = init_moe_params(cfg, seed=0)
        rng = np.random.default_rng(3)
        seq = jnp.asarray(rng.integers(0, 17, (1, 8)), jnp.int32)
        logits_pre, cache = moe_prefill(params, seq[:, :4], cfg)
        assert cache["k"].dtype == jnp_.bfloat16
        assert logits_pre.dtype == jnp_.float32
        full, _ = moe_gpt_apply(params, seq, cfg)
        np.testing.assert_allclose(np.asarray(logits_pre[0]),
                                   np.asarray(full[0, 3]), atol=3e-2)
        for t in range(4, 8):
            logits_t, cache = moe_decode_step(params, cache, seq[:, t], cfg)
            np.testing.assert_allclose(np.asarray(logits_t[0]),
                                       np.asarray(full[0, t]), atol=3e-2)


@pytest.fixture()
def _eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")


class TestExpertParallel:
    def test_ep_sharded_loss_matches_unsharded(self, _eight_devices):
        from linalg_tpu.parallel import make_ep_train_step

        cfg = MoEGPTConfig(vocab_size=17, d_model=32, n_heads=4, n_layers=2,
                           d_ff=64, ctx_len=16, n_experts=8)
        params = init_moe_params(cfg, seed=0)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.integers(0, 17, (4, 16)), jnp.int32)
        y = jnp.asarray(rng.integers(0, 17, (4, 16)), jnp.int32)
        ref = float(moe_gpt_loss(params, x, y, cfg))

        mesh = make_mesh((2, 4), ("dp", "ep"))
        step = make_ep_train_step(cfg, mesh, dp_axis="dp")
        _, _, loss = step(params, adamw_init(params), x, y)
        assert float(loss) == pytest.approx(ref, abs=1e-5)

    def test_ep_device_resident_step_trains(self, _eight_devices):
        # the dp x ep device-resident loop: corpus replicated, windows
        # sampled in-jit, experts ep-sharded — loss must decrease
        from jax.sharding import NamedSharding, PartitionSpec as P

        from linalg_tpu.parallel.expert import (make_ep_device_train_step,
                                                make_ep_eval,
                                                moe_param_specs)
        from linalg_tpu.train.optim import AdamWState

        cfg = MoEGPTConfig(vocab_size=17, d_model=32, n_heads=4, n_layers=2,
                           d_ff=64, ctx_len=16, n_experts=4,
                           router_top_k=2)
        params = init_moe_params(cfg, seed=0)
        mesh = make_mesh((2, 4), ("dp", "ep"))
        param_sh = jax.tree.map(lambda s: NamedSharding(mesh, s),
                                moe_param_specs(),
                                is_leaf=lambda v: isinstance(v, P))
        repl = NamedSharding(mesh, P())
        params = jax.device_put(params, param_sh)
        opt = jax.device_put(adamw_init(params),
                             AdamWState(m=param_sh, v=param_sh, t=repl))
        rng = np.random.default_rng(0)
        data = jax.device_put(
            jnp.asarray(rng.integers(0, 17, 512), jnp.int32), repl)
        key = jax.device_put(jax.random.PRNGKey(0), repl)
        step = make_ep_device_train_step(
            cfg, mesh, 8, base_lr=1e-2, min_lr=1e-3, warmup=2,
            max_steps=20, weight_decay=0.0)
        losses = []
        for _ in range(10):
            params, opt, key, loss = step(params, opt, data, key)
            losses.append(float(loss))
        assert losses[-1] < losses[0]
        val = make_ep_eval(cfg, mesh, 8, 4)(params, data, key)
        assert np.isfinite(float(val))


class TestPipelineParallel:
    def _setup(self, n_layers=8):
        cfg = GPTConfig(vocab_size=17, d_model=32, n_heads=4,
                        n_layers=n_layers, d_ff=64, ctx_len=16)
        params = init_gpt_params(cfg, seed=0)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.integers(0, 17, (8, 16)), jnp.int32)
        y = jnp.asarray(rng.integers(0, 17, (8, 16)), jnp.int32)
        return cfg, params, x, y

    def test_pp_loss_matches_unsharded(self, _eight_devices):
        from linalg_tpu.nn.functional import sdpa
        from linalg_tpu.parallel import make_pp_loss

        cfg, params, x, y = self._setup()
        ref = float(gpt_loss(params, x, y, cfg, attn_fn=sdpa))
        mesh = make_mesh((4,), ("pp",), jax.devices()[:4])
        loss = float(make_pp_loss(cfg, mesh, n_microbatches=4)(params, x, y))
        assert loss == pytest.approx(ref, abs=1e-5)

    def test_dp_x_pp_loss_matches_unsharded(self, _eight_devices):
        from linalg_tpu.nn.functional import sdpa
        from linalg_tpu.parallel import make_pp_loss

        cfg, params, x, y = self._setup()
        ref = float(gpt_loss(params, x, y, cfg, attn_fn=sdpa))
        mesh = make_mesh((2, 4), ("dp", "pp"))
        loss = float(make_pp_loss(cfg, mesh, n_microbatches=2,
                                  dp_axis="dp")(params, x, y))
        assert loss == pytest.approx(ref, abs=1e-5)

    def test_pp_grads_match_unsharded(self, _eight_devices):
        # the pipelined backward (transposed ppermute schedule) must give
        # the same gradients as plain backprop through the layer scan
        from linalg_tpu.nn.functional import sdpa
        from linalg_tpu.parallel import make_pp_loss

        cfg, params, x, y = self._setup(n_layers=4)
        mesh = make_mesh((4,), ("pp",), jax.devices()[:4])
        loss_fn = make_pp_loss(cfg, mesh, n_microbatches=2)
        g_pp = jax.grad(loss_fn)(params, x, y)
        g_ref = jax.grad(
            lambda p: gpt_loss(p, x, y, cfg, attn_fn=sdpa))(params)
        flat_pp, _ = jax.tree.flatten(g_pp)
        flat_ref, _ = jax.tree.flatten(g_ref)
        for a, b in zip(flat_pp, flat_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5)

    def test_pp_training_reduces_loss(self, _eight_devices):
        from linalg_tpu.parallel import make_pp_train_step

        cfg, params, x, y = self._setup()
        mesh = make_mesh((4,), ("pp",), jax.devices()[:4])
        step = make_pp_train_step(cfg, mesh, n_microbatches=4, lr=1e-3,
                                  weight_decay=0.0)
        opt = adamw_init(params)
        losses = []
        for _ in range(8):
            params, opt, loss = step(params, opt, x, y)
            losses.append(float(loss))
        assert losses[-1] < losses[0]

    def test_1f1b_loss_and_grads_match_unsharded(self, _eight_devices):
        # the explicit 1F1B schedule (manual per-stage vjp, O(S) ring
        # stash) must reproduce the unsharded loss AND gradients exactly
        from linalg_tpu.nn.functional import sdpa
        from linalg_tpu.parallel import make_pp_1f1b_grads

        cfg, params, x, y = self._setup(n_layers=4)
        mesh = make_mesh((4,), ("pp",), jax.devices()[:4])
        loss, grads = make_pp_1f1b_grads(cfg, mesh, n_microbatches=4)(
            params, x, y)
        ref_loss, ref_grads = jax.value_and_grad(
            lambda p: gpt_loss(p, x, y, cfg, attn_fn=sdpa))(params)
        assert float(loss) == pytest.approx(float(ref_loss), abs=1e-5)
        for a, b in zip(jax.tree.leaves(grads), jax.tree.leaves(ref_grads)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5)

    def test_1f1b_dp_x_pp_matches_unsharded(self, _eight_devices):
        from linalg_tpu.nn.functional import sdpa
        from linalg_tpu.parallel import make_pp_1f1b_grads

        cfg, params, x, y = self._setup(n_layers=4)
        mesh = make_mesh((2, 4), ("dp", "pp"))
        loss, grads = make_pp_1f1b_grads(cfg, mesh, n_microbatches=2,
                                         dp_axis="dp")(params, x, y)
        ref_loss, ref_grads = jax.value_and_grad(
            lambda p: gpt_loss(p, x, y, cfg, attn_fn=sdpa))(params)
        assert float(loss) == pytest.approx(float(ref_loss), abs=1e-5)
        for a, b in zip(jax.tree.leaves(grads), jax.tree.leaves(ref_grads)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5)

    def test_1f1b_training_reduces_loss(self, _eight_devices):
        from linalg_tpu.parallel import make_pp_1f1b_train_step

        cfg, params, x, y = self._setup()
        mesh = make_mesh((4,), ("pp",), jax.devices()[:4])
        step = make_pp_1f1b_train_step(cfg, mesh, n_microbatches=4,
                                       lr=1e-3, weight_decay=0.0)
        opt = adamw_init(params)
        losses = []
        for _ in range(8):
            params, opt, loss = step(params, opt, x, y)
            losses.append(float(loss))
        assert losses[-1] < losses[0]

    def test_pp_requires_divisible_layers(self, _eight_devices):
        from linalg_tpu.parallel import make_pp_loss

        cfg, _, _, _ = self._setup(n_layers=6)
        mesh = make_mesh((4,), ("pp",), jax.devices()[:4])
        with pytest.raises(AssertionError):
            make_pp_loss(cfg, mesh, n_microbatches=2)


class TestMoEBF16:
    def test_bf16_close_to_f32_and_trains(self):
        from linalg_tpu.train.optim import adamw_update, gpt_wd_mask

        common = dict(vocab_size=17, d_model=32, n_heads=4, n_layers=2,
                      d_ff=64, ctx_len=16, n_experts=4, router_top_k=2)
        cfg32 = MoEGPTConfig(**common)
        cfg16 = MoEGPTConfig(dtype="bfloat16", **common)
        params = init_moe_params(cfg32, seed=0)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.integers(0, 17, (4, 16)), jnp.int32)
        y = jnp.asarray(rng.integers(0, 17, (4, 16)), jnp.int32)
        l32, a32 = moe_gpt_apply(params, x, cfg32)
        l16, a16 = moe_gpt_apply(params, x, cfg16)
        assert l16.dtype == jnp.float32  # CE stays f32
        # bf16 tracks f32 within bf16 resolution; the f32 router keeps the
        # aux loss (routing statistics) nearly exact
        assert float(jnp.max(jnp.abs(l16 - l32))) < 0.15
        assert float(jnp.abs(a16 - a32)) < 1e-2

        @jax.jit
        def step(p, o):
            loss, g = jax.value_and_grad(
                lambda p: moe_gpt_loss(p, x, y, cfg16))(p)
            p, o = adamw_update(p, g, o, 1e-2, gpt_wd_mask(p, 0.0))
            return p, o, loss

        opt = adamw_init(params)
        first = None
        for _ in range(30):
            params, opt, loss = step(params, opt)
            if first is None:
                first = float(loss)
        assert float(loss) < first
        # master params remain f32
        assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(params))


class TestPipelineBF16:
    def test_pp_and_1f1b_bf16_track_f32(self, _eight_devices):
        from linalg_tpu.parallel import make_pp_1f1b_grads, make_pp_loss

        common = dict(vocab_size=17, d_model=32, n_heads=4, n_layers=4,
                      d_ff=64, ctx_len=16)
        cfg32 = GPTConfig(**common)
        cfg16 = GPTConfig(dtype="bfloat16", **common)
        params = init_gpt_params(cfg32, seed=0)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.integers(0, 17, (8, 16)), jnp.int32)
        y = jnp.asarray(rng.integers(0, 17, (8, 16)), jnp.int32)
        mesh = make_mesh((4,), ("pp",), jax.devices()[:4])
        ref = float(make_pp_loss(cfg32, mesh, n_microbatches=4)(params, x, y))
        l16 = float(make_pp_loss(cfg16, mesh, n_microbatches=4)(params, x, y))
        assert abs(l16 - ref) < 0.05  # bf16 resolution, same computation
        f1, grads = make_pp_1f1b_grads(cfg16, mesh, n_microbatches=4)(
            params, x, y)
        assert abs(float(f1) - ref) < 0.05
        assert all(g.dtype == jnp.float32 for g in jax.tree.leaves(grads))


class TestPipelineCLI:
    def test_train_pp_via_cli_flags(self, tmp_path):
        # --pp from the CLI trainer: (dp, pp) mesh, 1F1B device-resident
        # step, checkpointing — pipeline parallelism as a product surface,
        # not just a library demo (reference surface: gpt.py:578-609)
        from linalg_tpu.apps.gpt import build_parser
        from linalg_tpu.train.trainer import train

        args = build_parser().parse_args([
            "--train", "--steps", "10", "--eval_every", "10",
            "--batch_size", "8", "--ctx_len", "32", "--d_model", "32",
            "--heads", "4", "--layers", "4", "--ckpt_dir", str(tmp_path),
            "--dp", "2", "--pp", "4",
        ])
        params, cfg, stoi, itos = train(args)
        assert (tmp_path / "chars_gpt_best.npz").exists()
        # resume through the same pp path
        args2 = build_parser().parse_args([
            "--train", "--steps", "5", "--eval_every", "5",
            "--batch_size", "8", "--ctx_len", "32", "--d_model", "32",
            "--heads", "4", "--layers", "4", "--ckpt_dir", str(tmp_path),
            "--dp", "2", "--pp", "4",
        ])
        _, cfg2, _, _ = train(args2)
        assert cfg2 == cfg

    def test_pp_loss_decreases_via_cli(self, tmp_path, capsys):
        from linalg_tpu.apps.gpt import build_parser
        from linalg_tpu.train.trainer import train

        args = build_parser().parse_args([
            "--train", "--steps", "40", "--eval_every", "40",
            "--batch_size", "8", "--ctx_len", "32", "--d_model", "32",
            "--heads", "4", "--layers", "2", "--ckpt_dir", str(tmp_path),
            "--pp", "2", "--lr_model", "1e-3",
        ])
        train(args)
        out = capsys.readouterr().out
        losses = [float(l.split("loss")[1].split()[0])
                  for l in out.splitlines()
                  if l.startswith("step") and "loss" in l]
        assert losses[-1] < losses[0]

    def test_pp_rejects_moe_and_bad_divisibility(self, tmp_path):
        import pytest

        from linalg_tpu.apps.gpt import build_parser
        from linalg_tpu.train.trainer import train

        args = build_parser().parse_args([
            "--train", "--steps", "1", "--ctx_len", "32", "--d_model", "32",
            "--heads", "4", "--layers", "4", "--ckpt_dir",
            str(tmp_path / "x"), "--pp", "2", "--experts", "4",
        ])
        with pytest.raises(AssertionError, match="experts"):
            train(args)
        args = build_parser().parse_args([
            "--train", "--steps", "1", "--ctx_len", "32", "--d_model", "32",
            "--heads", "4", "--layers", "3", "--ckpt_dir",
            str(tmp_path / "y"), "--pp", "2",
        ])
        with pytest.raises(AssertionError, match="divide by pp"):
            train(args)


class TestDispatchModes:
    """gather (int32 slot gathers) and einsum (dense one-hot) dispatch are
    the same routing function — outputs AND gradients must match."""

    def _rand(self, B, T, D, E, F, seed=0):
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
        Wr = jnp.asarray(rng.standard_normal((D, E)) * 0.1, jnp.float32)
        W1 = jnp.asarray(rng.standard_normal((E, D, F)) * 0.1, jnp.float32)
        b1 = jnp.asarray(rng.standard_normal((E, F)) * 0.1, jnp.float32)
        W2 = jnp.asarray(rng.standard_normal((E, F, D)) * 0.1, jnp.float32)
        b2 = jnp.asarray(rng.standard_normal((E, D)) * 0.1, jnp.float32)
        return x, Wr, W1, b1, W2, b2

    @pytest.mark.parametrize("top_k,cap", [(1, 8), (1, 2), (2, 6), (2, 2)])
    def test_outputs_match(self, top_k, cap):
        args = self._rand(3, 16, 8, 4, 16, seed=top_k * 10 + cap)
        o_g, a_g = moe_ffn(*args, capacity=cap, top_k=top_k, mode="gather")
        o_e, a_e = moe_ffn(*args, capacity=cap, top_k=top_k, mode="einsum")
        np.testing.assert_allclose(np.asarray(o_g), np.asarray(o_e),
                                   atol=1e-5)
        np.testing.assert_allclose(float(a_g), float(a_e), rtol=1e-6)

    def test_grads_match(self):
        args = self._rand(2, 12, 8, 4, 16, seed=5)

        def loss(mode, *a):
            o, aux = moe_ffn(*a, capacity=4, top_k=2, mode=mode)
            return jnp.sum(jnp.sin(o)) + aux

        g_g = jax.grad(lambda *a: loss("gather", *a), argnums=tuple(range(6)))(*args)
        g_e = jax.grad(lambda *a: loss("einsum", *a), argnums=tuple(range(6)))(*args)
        for a, b in zip(g_g, g_e):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5)

    @pytest.mark.parametrize("mode", ["einsum", "gather"])
    def test_exact_routing_at_long_T_bf16(self, mode):
        # slot bookkeeping must be exact past 256 tokens under bf16
        # compute (a bf16 cumsum saturates at 256 -> misrouting): einsum
        # counts in f32, gather in int32 — both compared against the
        # all-f32 routing of the same (bf16-rounded) inputs
        B, T, D, E, F = 1, 512, 8, 4, 16
        x, Wr, W1, b1, W2, b2 = self._rand(B, T, D, E, F, seed=9)
        xb = x.astype(jnp.bfloat16)
        o_b, _ = moe_ffn(xb, Wr.astype(jnp.bfloat16), W1.astype(jnp.bfloat16),
                         b1.astype(jnp.bfloat16), W2.astype(jnp.bfloat16),
                         b2.astype(jnp.bfloat16), capacity=200, top_k=1,
                         mode=mode)
        o_f, _ = moe_ffn(xb.astype(jnp.float32), Wr, W1, b1, W2, b2,
                         capacity=200, top_k=1, mode="einsum")
        # bf16 tolerance; what matters is no token got MISROUTED (which
        # shows up as O(1) errors, not rounding noise)
        np.testing.assert_allclose(np.asarray(o_b, dtype=np.float32),
                                   np.asarray(o_f), atol=0.15)


class TestMoEBatchedServing:
    """MoE batched serving: valid-masked routing keeps left pads out of
    expert capacity; batched prefill/decode match the unbatched path."""

    CFG = MoEGPTConfig(vocab_size=17, d_model=32, n_heads=4, n_layers=2,
                       d_ff=64, ctx_len=16, n_experts=2,
                       capacity_factor=4.0)  # ample: no capacity drops

    def test_batched_prefill_matches_unbatched(self):
        from linalg_tpu.models.moe import moe_prefill_batched, moe_prefill

        params = init_moe_params(self.CFG, seed=0)
        rng = np.random.default_rng(0)
        p1 = rng.integers(0, 17, (4,)).astype(np.int32)
        p2 = rng.integers(0, 17, (8,)).astype(np.int32)
        W = 10
        buf = np.zeros((2, W), np.int32)
        buf[0, W - 4:] = p1
        buf[1, W - 8:] = p2
        start = jnp.asarray([W - 4, W - 8], jnp.int32)
        logits, cache = moe_prefill_batched(params, jnp.asarray(buf),
                                            start, self.CFG)
        assert int(cache["length"]) == W
        for b, p in enumerate((p1, p2)):
            ref, _ = moe_prefill(params, jnp.asarray(p[None]), self.CFG)
            np.testing.assert_allclose(np.asarray(logits[b]),
                                       np.asarray(ref[0]), atol=2e-4)

    def test_batched_decode_matches_unbatched(self):
        from linalg_tpu.models.moe import (moe_decode_step,
                                           moe_prefill_batched, moe_prefill)

        params = init_moe_params(self.CFG, seed=1)
        rng = np.random.default_rng(1)
        p1 = rng.integers(0, 17, (3,)).astype(np.int32)
        p2 = rng.integers(0, 17, (6,)).astype(np.int32)
        forced = rng.integers(0, 17, (2, 3)).astype(np.int32)
        W = 8
        buf = np.zeros((2, W), np.int32)
        buf[0, W - 3:] = p1
        buf[1, W - 6:] = p2
        start = jnp.asarray([W - 3, W - 6], jnp.int32)
        _, cache = moe_prefill_batched(params, jnp.asarray(buf), start,
                                       self.CFG)
        refs = []
        for p in (p1, p2):
            _, c = moe_prefill(params, jnp.asarray(p[None]), self.CFG)
            refs.append(c)
        for t in range(3):
            tok = jnp.asarray(forced[:, t])
            logits, cache = moe_decode_step(params, cache, tok, self.CFG)
            for b in range(2):
                rl, refs[b] = moe_decode_step(
                    params, refs[b], jnp.asarray(forced[b:b + 1, t]),
                    self.CFG)
                np.testing.assert_allclose(np.asarray(logits[b]),
                                           np.asarray(rl[0]), atol=3e-4)

    def test_generate_dispatches_moe(self):
        from linalg_tpu.models.gpt import gpt_generate

        params = init_moe_params(self.CFG, seed=2)
        prompts = [np.asarray([1, 2, 3]), np.asarray([4, 5])]
        out = gpt_generate(params, self.CFG, prompts, n_tokens=5, seed=0)
        assert out.shape == (2, 5)
        assert int(jnp.max(out)) < self.CFG.vocab_size


def test_moe_decode_chunk_matches_stepwise():
    """The hoisted-invariants MoE chunk samples exactly the per-step path."""
    import jax as _jax

    from linalg_tpu.models.gpt import gpt_prefill, sample_token
    from linalg_tpu.models.moe import (moe_decode_chunk, moe_decode_step,
                                       moe_prefill)

    cfg = MoEGPTConfig(vocab_size=19, d_model=32, n_heads=4, n_layers=2,
                       d_ff=64, ctx_len=16, n_experts=2, capacity_factor=4.0)
    params = init_moe_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, 19, (1, 5)), jnp.int32)
    logits0, cache0 = moe_prefill(params, prompt, cfg)
    key = _jax.random.PRNGKey(4)
    n = 5
    toks, logits_c, cache_c = moe_decode_chunk(params, cache0, logits0, key,
                                               cfg, n, 0.9, 3)
    keys = _jax.random.split(key, n)
    logits, cache = logits0, cache0
    ref = []
    for i in range(n):
        tok = sample_token(keys[i], logits, 0.9, 3)
        ref.append(int(tok[0]))
        logits, cache = moe_decode_step(params, cache, tok, cfg)
    assert [int(t) for t in np.asarray(toks[0])] == ref
    np.testing.assert_allclose(np.asarray(logits_c), np.asarray(logits),
                               atol=1e-4)
