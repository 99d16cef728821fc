"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from linalg_tpu.models.gpt import GPTConfig, gpt_loss, init_gpt_params
from linalg_tpu.nn.functional import sdpa
from linalg_tpu.parallel import (
    dryrun_multichip,
    gpt_param_specs,
    make_mesh,
    make_sharded_train_step,
    pick_dp_tp,
)
from linalg_tpu.train.optim import AdamWState, adamw_init


@pytest.fixture(autouse=True)
def _require_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")


class TestMeshHelpers:
    def test_pick_dp_tp(self):
        assert pick_dp_tp(8, 4) == (2, 4)
        assert pick_dp_tp(8, 8) == (1, 8)
        assert pick_dp_tp(8, 3) == (8, 1)
        assert pick_dp_tp(4, 4) == (1, 4)
        assert pick_dp_tp(1, 4) == (1, 1)

    def test_make_mesh_shapes(self):
        mesh = make_mesh((2, 4), ("dp", "tp"))
        assert mesh.shape == {"dp": 2, "tp": 4}
        mesh1 = make_mesh()
        assert mesh1.shape["dp"] == 8


class TestShardedTraining:
    def test_dryrun(self, capsys):
        dryrun_multichip(8)
        assert "dryrun_multichip ok" in capsys.readouterr().out

    def test_sharded_loss_matches_single_device(self):
        # the dp x tp sharded step must compute the SAME loss as an
        # unsharded evaluation of the same params/batch
        from jax.sharding import NamedSharding, PartitionSpec as P

        cfg = GPTConfig(vocab_size=17, d_model=32, n_heads=4, n_layers=2,
                        d_ff=64, ctx_len=16)
        params = init_gpt_params(cfg, seed=0)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.integers(0, 17, (8, 16), np.int32))
        y = jnp.asarray(rng.integers(0, 17, (8, 16), np.int32))
        ref_loss = float(gpt_loss(params, x, y, cfg, attn_fn=sdpa))

        mesh = make_mesh((2, 4), ("dp", "tp"))
        sh = jax.tree.map(
            lambda s: NamedSharding(mesh, s), gpt_param_specs(None),
            is_leaf=lambda v: isinstance(v, P),
        )
        params_s = jax.device_put(params, sh)
        opt_s = jax.device_put(
            adamw_init(params),
            AdamWState(m=sh, v=sh, t=NamedSharding(mesh, P())),
        )
        xb = jax.device_put(x, NamedSharding(mesh, P("dp", None)))
        yb = jax.device_put(y, NamedSharding(mesh, P("dp", None)))
        step = make_sharded_train_step(cfg, mesh, lr=1e-3, weight_decay=0.0)
        params2, opt2, loss = step(params_s, opt_s, xb, yb)
        assert float(loss) == pytest.approx(ref_loss, rel=1e-5)
        # params actually changed
        d = jax.tree.leaves(
            jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), params, params2)
        )
        assert max(d) > 0

    def test_two_steps_reduce_loss(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        cfg = GPTConfig(vocab_size=11, d_model=32, n_heads=4, n_layers=1,
                        d_ff=64, ctx_len=8)
        params = init_gpt_params(cfg, seed=1)
        mesh = make_mesh((2, 4), ("dp", "tp"))
        sh = jax.tree.map(
            lambda s: NamedSharding(mesh, s), gpt_param_specs(None),
            is_leaf=lambda v: isinstance(v, P),
        )
        params = jax.device_put(params, sh)
        opt = jax.device_put(
            adamw_init(params), AdamWState(m=sh, v=sh, t=NamedSharding(mesh, P())),
        )
        rng = np.random.default_rng(1)
        x = jax.device_put(
            jnp.asarray(rng.integers(0, 11, (8, 8), np.int32)),
            NamedSharding(mesh, P("dp", None)),
        )
        y = jax.device_put(
            jnp.asarray(rng.integers(0, 11, (8, 8), np.int32)),
            NamedSharding(mesh, P("dp", None)),
        )
        step = make_sharded_train_step(cfg, mesh, lr=1e-2, weight_decay=0.0)
        losses = []
        for _ in range(8):
            params, opt, loss = step(params, opt, x, y)
            losses.append(float(loss))
        assert losses[-1] < losses[0]


class TestShardedCLI:
    def test_train_sharded_via_cli_flags(self, tmp_path):
        from linalg_tpu.apps.gpt import build_parser
        from linalg_tpu.train.trainer import train

        args = build_parser().parse_args([
            "--train", "--steps", "10", "--eval_every", "10",
            "--batch_size", "8", "--ctx_len", "32", "--d_model", "32",
            "--heads", "4", "--layers", "1", "--ckpt_dir", str(tmp_path),
            "--dp", "2", "--tp", "4",
        ])
        params, cfg, stoi, itos = train(args)
        assert (tmp_path / "chars_gpt_best.npz").exists()

    def test_train_sharded_moe_via_cli_flags(self, tmp_path):
        # dp x ep: with --experts the model-parallel axis shards experts
        from linalg_tpu.apps.gpt import build_parser
        from linalg_tpu.models.moe import MoEGPTConfig
        from linalg_tpu.train.trainer import train

        args = build_parser().parse_args([
            "--train", "--steps", "10", "--eval_every", "10",
            "--batch_size", "8", "--ctx_len", "32", "--d_model", "32",
            "--heads", "4", "--layers", "1", "--ckpt_dir", str(tmp_path),
            "--dp", "2", "--tp", "4", "--experts", "4",
            "--router_top_k", "2",
        ])
        params, cfg, stoi, itos = train(args)
        assert isinstance(cfg, MoEGPTConfig)
        assert cfg.router_top_k == 2
        assert (tmp_path / "chars_gpt_best.npz").exists()


class TestShardedAttn:
    def test_matches_unsharded_sdpa(self):
        from linalg_tpu.nn.functional import causal_mask
        from linalg_tpu.parallel import make_sharded_attn

        mesh = make_mesh((2, 4), ("dp", "tp"))
        rng = np.random.default_rng(0)
        q, k, v = (jnp.asarray(rng.normal(size=(2, 4, 16, 8)), jnp.float32)
                   for _ in range(3))
        attn = make_sharded_attn(mesh, T=16, d_head=8)
        with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") \
                else _nullcontext():
            out = attn(q, k, v, None)
        ref = sdpa(q, k, v, causal_mask(16, dtype=jnp.float32))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_grad_flows_through_shard_map(self):
        from linalg_tpu.parallel import make_sharded_attn

        mesh = make_mesh((2, 4), ("dp", "tp"))
        rng = np.random.default_rng(1)
        q, k, v = (jnp.asarray(rng.normal(size=(2, 4, 16, 8)), jnp.float32)
                   for _ in range(3))
        attn = make_sharded_attn(mesh, T=16, d_head=8)
        g = jax.grad(lambda q: jnp.sum(attn(q, k, v, None) ** 2))(q)
        assert float(jnp.abs(g).sum()) > 0


def _nullcontext():
    import contextlib

    return contextlib.nullcontext()


class TestShardedDeviceStep:
    def test_device_resident_step_learns(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from linalg_tpu.parallel import (
            make_sharded_device_train_step,
            make_sharded_eval,
        )

        cfg = GPTConfig(vocab_size=11, d_model=32, n_heads=4, n_layers=1,
                        d_ff=64, ctx_len=8)
        params = init_gpt_params(cfg, seed=1)
        mesh = make_mesh((2, 4), ("dp", "tp"))
        sh = jax.tree.map(
            lambda s: NamedSharding(mesh, s), gpt_param_specs(None),
            is_leaf=lambda v: isinstance(v, P),
        )
        replicated = NamedSharding(mesh, P())
        params = jax.device_put(params, sh)
        opt = jax.device_put(
            adamw_init(params), AdamWState(m=sh, v=sh, t=replicated)
        )
        rng = np.random.default_rng(2)
        data = jax.device_put(
            jnp.asarray(rng.integers(0, 11, 512, np.int32)), replicated
        )
        key = jax.device_put(jax.random.PRNGKey(0), replicated)
        step = make_sharded_device_train_step(
            cfg, mesh, 8, base_lr=1e-2, min_lr=1e-3, warmup=2,
            max_steps=32, weight_decay=0.0,
        )
        losses = []
        for _ in range(16):
            params, opt, key, loss = step(params, opt, data, key)
            losses.append(float(loss))
        assert np.mean(losses[-4:]) < np.mean(losses[:4])

        evaluate = make_sharded_eval(cfg, mesh, 8, 4)
        v = float(evaluate(params, data, jax.random.PRNGKey(3)))
        assert np.isfinite(v)


class TestRingAttention:
    """Sequence-parallel ring attention vs the exact sdpa."""

    def _qkv(self, B=2, h=2, T=64, d=16, seed=0):
        rng = np.random.default_rng(seed)
        return tuple(
            jnp.asarray(rng.normal(size=(B, h, T, d)), jnp.float32)
            for _ in range(3)
        )

    @pytest.mark.parametrize("causal", [True, False])
    def test_matches_sdpa(self, causal):
        from linalg_tpu.nn.functional import causal_mask
        from linalg_tpu.parallel.ring import make_ring_attention

        mesh = make_mesh((8,), ("sp",))
        q, k, v = self._qkv()
        attn = make_ring_attention(mesh, causal=causal)
        out = attn(q, k, v)
        mask = causal_mask(64) if causal else None
        ref = sdpa(q, k, v, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_dp_sp_mesh(self):
        from linalg_tpu.nn.functional import causal_mask
        from linalg_tpu.parallel.ring import make_ring_attention

        mesh = make_mesh((2, 4), ("dp", "sp"))
        q, k, v = self._qkv(seed=1)
        attn = make_ring_attention(mesh, batch_axis="dp")
        out = attn(q, k, v)
        ref = sdpa(q, k, v, causal_mask(64))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_grads_match_sdpa(self):
        from linalg_tpu.nn.functional import causal_mask
        from linalg_tpu.parallel.ring import make_ring_attention

        mesh = make_mesh((4,), ("sp",), jax.devices()[:4])
        q, k, v = self._qkv(T=32, seed=2)
        attn = make_ring_attention(mesh)

        g1 = jax.grad(
            lambda q, k, v: jnp.sum(jnp.sin(attn(q, k, v))),
            argnums=(0, 1, 2),
        )(q, k, v)
        g2 = jax.grad(
            lambda q, k, v: jnp.sum(jnp.sin(sdpa(q, k, v, causal_mask(32)))),
            argnums=(0, 1, 2),
        )(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5)


class TestSequenceParallelTraining:
    def test_sp_loss_matches_unsharded(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from linalg_tpu.parallel import make_sp_train_step

        cfg = GPTConfig(vocab_size=17, d_model=32, n_heads=4, n_layers=2,
                        d_ff=64, ctx_len=32)
        params = init_gpt_params(cfg, seed=0)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.integers(0, 17, (4, 32), np.int32))
        y = jnp.asarray(rng.integers(0, 17, (4, 32), np.int32))
        ref_loss = float(gpt_loss(params, x, y, cfg, attn_fn=sdpa))

        mesh = make_mesh((2, 4), ("dp", "sp"))
        repl = NamedSharding(mesh, P())
        batch_sh = NamedSharding(mesh, P("dp", "sp"))
        params_s = jax.device_put(params, repl)
        opt = jax.device_put(
            adamw_init(params),
            AdamWState(m=jax.tree.map(lambda _: repl, params),
                       v=jax.tree.map(lambda _: repl, params), t=repl),
        )
        xb = jax.device_put(x, batch_sh)
        yb = jax.device_put(y, batch_sh)
        step = make_sp_train_step(cfg, mesh, lr=1e-2, weight_decay=0.0)
        losses = []
        p, o = params_s, opt
        for _ in range(6):
            p, o, loss = step(p, o, xb, yb)
            losses.append(float(loss))
        assert losses[0] == pytest.approx(ref_loss, rel=1e-5)
        assert losses[-1] < losses[0]


class TestDistributed:
    """Multi-host init helpers, exercised in their single-process modes
    (a real pod runs one process per host; the math is host-count
    arithmetic that must also be right at process_count == 1)."""

    def test_init_noop_single_process(self):
        from linalg_tpu.parallel import init_distributed, is_distributed

        # CPU test backend: no coordinator, no pod metadata -> local run
        assert init_distributed() is False
        assert is_distributed() is False

    def test_host_local_batch_slice(self):
        from linalg_tpu.parallel import host_local_batch_slice

        # process_count == 1: the whole batch belongs to this process
        start, size = host_local_batch_slice(64)
        assert (start, size) == (0, 64)

    def test_global_mesh_shape_caps_tp_to_local(self):
        from linalg_tpu.parallel import global_mesh_shape

        dp, tp = global_mesh_shape(n_heads=4)
        assert dp * tp == len(jax.devices())
        assert tp <= len(jax.local_devices())
        assert 4 % tp == 0


class TestPallasRingAttention:
    """In-kernel DMA ring (remote copies + credit backpressure), validated
    in interpret mode on the virtual mesh against sdpa and the XLA ring."""

    def _qkv(self, B=2, H=2, T=32, d=8, seed=0):
        rng = np.random.default_rng(seed)
        return tuple(jnp.asarray(rng.normal(size=(B, H, T, d)), jnp.float32)
                     for _ in range(3))

    def test_matches_sdpa_and_xla_ring(self):
        from linalg_tpu.nn.functional import causal_mask
        from linalg_tpu.parallel import (make_ring_attention,
                                         make_ring_attention_pallas)

        q, k, v = self._qkv()
        T = q.shape[2]
        mesh = make_mesh((4,), ("sp",), jax.devices()[:4])
        out = make_ring_attention_pallas(mesh)(q, k, v)
        ref = sdpa(q, k, v, causal_mask(T))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)
        xla = make_ring_attention(mesh)(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(xla),
                                   atol=1e-5)

    def test_non_causal(self):
        from linalg_tpu.parallel import make_ring_attention_pallas

        q, k, v = self._qkv(seed=1)
        mesh = make_mesh((4,), ("sp",), jax.devices()[:4])
        out = make_ring_attention_pallas(mesh, causal=False)(q, k, v)
        zero = jnp.zeros((q.shape[2], q.shape[2]), jnp.float32)
        ref = sdpa(q, k, v, zero)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    @pytest.mark.parametrize("n_dev", [2, 4, 8])
    def test_pallas_backward_matches_xla_ring(self, n_dev):
        # the bundle-lap Pallas backward (dk/dv travel the ring) must give
        # the same gradients as autodiff through the ppermute ring
        from linalg_tpu.parallel import (make_ring_attention,
                                         make_ring_attention_pallas)

        q, k, v = self._qkv(seed=2, T=32 if n_dev != 8 else 64)
        mesh = make_mesh((n_dev,), ("sp",), jax.devices()[:n_dev])
        g_p = jax.grad(lambda q, k, v: jnp.sum(
            make_ring_attention_pallas(mesh)(q, k, v) ** 2),
            argnums=(0, 1, 2))(q, k, v)
        g_x = jax.grad(lambda q, k, v: jnp.sum(
            make_ring_attention(mesh)(q, k, v) ** 2),
            argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_p, g_x):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

    def test_pallas_backward_non_causal(self):
        from linalg_tpu.nn.functional import sdpa as _sdpa
        from linalg_tpu.parallel import make_ring_attention_pallas

        q, k, v = self._qkv(seed=9)
        mesh = make_mesh((4,), ("sp",), jax.devices()[:4])
        zero = jnp.zeros((q.shape[2], q.shape[2]), jnp.float32)
        g_p = jax.grad(lambda q, k, v: jnp.sum(
            make_ring_attention_pallas(mesh, causal=False)(q, k, v) ** 2),
            argnums=(0, 1, 2))(q, k, v)
        g_d = jax.grad(lambda q, k, v: jnp.sum(
            _sdpa(q, k, v, zero) ** 2), argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_p, g_d):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

    def test_dp_x_sp_mesh(self):
        # off-TPU multi-axis meshes take the documented XLA-ring fallback
        from linalg_tpu.nn.functional import causal_mask
        from linalg_tpu.parallel import make_ring_attention_pallas

        q, k, v = self._qkv(seed=3)
        mesh = make_mesh((2, 4), ("dp", "sp"))
        out = make_ring_attention_pallas(mesh, batch_axis="dp")(q, k, v)
        ref = sdpa(q, k, v, causal_mask(q.shape[2]))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)


class TestSequenceParallelCLI:
    def test_train_sp_via_cli_flags(self, tmp_path):
        from linalg_tpu.apps.gpt import build_parser
        from linalg_tpu.train.trainer import train

        args = build_parser().parse_args([
            "--train", "--steps", "10", "--eval_every", "10",
            "--batch_size", "8", "--ctx_len", "32", "--d_model", "32",
            "--heads", "4", "--layers", "1", "--ckpt_dir", str(tmp_path),
            "--dp", "2", "--sp", "4",
        ])
        params, cfg, stoi, itos = train(args)
        assert (tmp_path / "chars_gpt_best.npz").exists()

    def test_sp_rejects_tp_and_moe(self, tmp_path):
        from linalg_tpu.apps.gpt import build_parser
        from linalg_tpu.train.trainer import train

        args = build_parser().parse_args([
            "--train", "--steps", "1", "--ctx_len", "32", "--d_model", "32",
            "--heads", "4", "--layers", "1", "--ckpt_dir",
            str(tmp_path / "x"), "--tp", "2", "--sp", "2",
        ])
        with pytest.raises(AssertionError, match="composes with --dp"):
            train(args)


class TestSequenceParallelPallasStep:
    def test_sp_step_with_pallas_ring_matches_xla_ring(self):
        # the full train step with the Pallas DMA ring (fwd+bwd kernels)
        # must match the ppermute-ring step exactly
        from linalg_tpu.parallel import make_sp_train_step

        cfg = GPTConfig(vocab_size=13, d_model=32, n_heads=4, n_layers=2,
                        d_ff=64, ctx_len=32)
        params = init_gpt_params(cfg, seed=0)
        # NB: interpret-mode remote DMA only supports single-named-axis
        # meshes, so the Pallas path is exercised on a pure-sp mesh; the
        # batch spec's 'dp' axis must still exist -> size-1 dp... which
        # makes the mesh two-axis. Instead run the comparison on the
        # sp-only path via axis rename: build a (1, 8) mesh and rely on
        # the multi-axis interpret fallback for 'pallas' (which routes to
        # the XLA ring) — the real Pallas bwd equivalence is covered by
        # TestPallasRingAttention; here we pin the STEP-level plumbing.
        mesh = make_mesh((1, 8), ("dp", "sp"))
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.integers(0, 13, (4, 32), np.int32))
        y = jnp.asarray(rng.integers(0, 13, (4, 32), np.int32))
        outs = {}
        for name, pallas in (("xla", False), ("pallas", True)):
            step = make_sp_train_step(cfg, mesh, lr=1e-2, weight_decay=0.0,
                                      pallas=pallas)
            p2, _, loss = step(params, adamw_init(params), x, y)
            outs[name] = (float(loss), p2)
        assert outs["xla"][0] == pytest.approx(outs["pallas"][0], abs=1e-5)
        for a, b in zip(jax.tree.leaves(outs["xla"][1]),
                        jax.tree.leaves(outs["pallas"][1])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)


class TestPallasRingBF16:
    def test_bf16_inputs_track_f32(self):
        # kernels accumulate in f32 internally; bf16 in/out must track the
        # f32 result within bf16 resolution, grads included
        from linalg_tpu.parallel import make_ring_attention_pallas

        rng = np.random.default_rng(11)
        q32, k32, v32 = (jnp.asarray(rng.normal(size=(1, 2, 32, 8)),
                                     jnp.float32) for _ in range(3))
        mesh = make_mesh((4,), ("sp",), jax.devices()[:4])
        attn = make_ring_attention_pallas(mesh)
        o32 = attn(q32, k32, v32)
        o16 = attn(q32.astype(jnp.bfloat16), k32.astype(jnp.bfloat16),
                   v32.astype(jnp.bfloat16))
        assert o16.dtype == jnp.bfloat16
        assert float(jnp.max(jnp.abs(o16.astype(jnp.float32) - o32))) < 0.1
        g16 = jax.grad(lambda q: jnp.sum(
            attn(q, k32.astype(jnp.bfloat16),
                 v32.astype(jnp.bfloat16)).astype(jnp.float32) ** 2))(
            q32.astype(jnp.bfloat16))
        assert bool(jnp.all(jnp.isfinite(g16.astype(jnp.float32))))


class TestShardedClipNorm:
    """--clip_norm reaches every sharded axis through the adamw_update seam:
    a clipped sharded step must equal the clipped UNSHARDED step."""

    def test_dp_clipped_step_matches_unsharded(self):
        import jax
        import jax.numpy as jnp

        from linalg_tpu.models.gpt import GPTConfig, init_gpt_params
        from linalg_tpu.parallel.mesh import make_mesh
        from linalg_tpu.parallel.sharding import (
            gpt_param_specs, make_sharded_device_train_step)
        from linalg_tpu.train.optim import adamw_init
        from linalg_tpu.train.trainer import make_device_train_step

        cfg = GPTConfig(vocab_size=19, d_model=32, n_heads=4, n_layers=2,
                        ctx_len=16)
        params = init_gpt_params(cfg, seed=0)
        rng = np.random.default_rng(0)
        data = jnp.asarray(rng.integers(0, 19, size=(4096,), dtype=np.int32))
        kw = dict(base_lr=1e-3, min_lr=1e-4, warmup=10, max_steps=100,
                  weight_decay=0.01, clip_norm=0.25)
        key = jax.random.PRNGKey(3)

        ref_step = make_device_train_step(cfg, 8, **kw)
        p_ref, _, _, l_ref = ref_step(params, adamw_init(params), data, key)

        mesh = make_mesh((2, 4), ("dp", "tp"))
        step = make_sharded_device_train_step(cfg, mesh, 8, **kw)
        p_sh, _, _, l_sh = step(params, adamw_init(params), data, key)
        assert abs(float(l_sh) - float(l_ref)) < 1e-5
        for a, b in zip(jax.tree.leaves(p_sh), jax.tree.leaves(p_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5)
