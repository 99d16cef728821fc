"""FSDP (ZeRO-3) tests on the virtual 8-device CPU mesh.

The fully-sharded axis must (a) store every large param/moment leaf at
1/N bytes per device, (b) compute the SAME loss and gradients as the
unsharded step, and (c) train end-to-end from the CLI flags.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from linalg_tpu.models.gpt import GPTConfig, gpt_loss, init_gpt_params
from linalg_tpu.nn.functional import sdpa
from linalg_tpu.parallel import (
    fsdp_param_specs,
    fsdp_shardings,
    make_fsdp_device_train_step,
    make_fsdp_eval,
    make_mesh,
)
from linalg_tpu.train.optim import AdamWState, adamw_init


@pytest.fixture(autouse=True)
def _require_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")


def _mesh(n=8):
    return make_mesh((n,), ("fsdp",), jax.devices()[:n])


class TestFsdpSpecs:
    def test_large_leaves_sharded_small_replicated(self):
        cfg = GPTConfig(vocab_size=65, d_model=256, n_heads=4, n_layers=2,
                        ctx_len=64)
        params = init_gpt_params(cfg, seed=0)
        specs = fsdp_param_specs(params, 8)
        # big matmul weights shard
        assert specs["layers"]["Wq"] != P()
        assert specs["layers"]["W1"] != P()
        assert specs["tok_W"] != P()  # (65, 256): d_model axis shards
        assert specs["tok_W"] == P(None, "fsdp")
        # tiny leaves replicate (LN scales, head bias)
        assert specs["layers"]["ln1_g"] == P()
        assert specs["head_b"] == P()
        # every sharded dim actually divides by 8
        for spec, leaf in zip(jax.tree.leaves(
                specs, is_leaf=lambda v: isinstance(v, P)),
                jax.tree.leaves(params)):
            for dim, name in enumerate(spec):
                if name is not None:
                    assert leaf.shape[dim] % 8 == 0

    def test_per_device_bytes_are_one_nth(self):
        cfg = GPTConfig(vocab_size=65, d_model=256, n_heads=4, n_layers=2,
                        ctx_len=64)
        params = init_gpt_params(cfg, seed=0)
        mesh = _mesh()
        sharded = jax.device_put(params, fsdp_shardings(params, mesh))
        w = sharded["layers"]["W1"]
        assert w.addressable_shards[0].data.size * 8 == w.size

    def test_gqa_and_learned_pos_shard_without_special_cases(self):
        cfg = GPTConfig(vocab_size=65, d_model=256, n_heads=8,
                        n_kv_heads=2, n_layers=2, ctx_len=64, pos="learned")
        params = init_gpt_params(cfg, seed=0)
        specs = fsdp_param_specs(params, 8)
        # Wk is (L, D, kv_heads*dh) = (2, 256, 64): D shards, not the
        # narrow kv dim
        assert specs["layers"]["Wk"] == P(None, "fsdp", None)
        assert specs["pos_W"] == P(None, "fsdp")


class TestFsdpStep:
    def _setup(self, seed=0):
        cfg = GPTConfig(vocab_size=17, d_model=32, n_heads=4, n_layers=2,
                        d_ff=64, ctx_len=16)
        params = init_gpt_params(cfg, seed=seed)
        mesh = _mesh()
        return cfg, params, mesh

    def test_grads_match_unsharded(self):
        # jit with fsdp in_shardings must produce the same gradients as
        # the plain single-device jax.grad (collectives reorder sums ->
        # tolerance, not equality)
        cfg, params, mesh = self._setup()
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.integers(0, 17, (8, 16), np.int32))
        y = jnp.asarray(rng.integers(0, 17, (8, 16), np.int32))
        g_ref = jax.grad(lambda p: gpt_loss(p, x, y, cfg, attn_fn=sdpa))(
            params)

        param_sh = fsdp_shardings(params, mesh)
        batch_sh = NamedSharding(mesh, P("fsdp", None))
        sharded = jax.device_put(params, param_sh)
        g_fn = jax.jit(
            jax.grad(lambda p, xx, yy: gpt_loss(p, xx, yy, cfg,
                                                attn_fn=sdpa)),
            in_shardings=(param_sh, batch_sh, batch_sh),
            out_shardings=param_sh,
        )
        g = g_fn(sharded, jax.device_put(x, batch_sh),
                 jax.device_put(y, batch_sh))
        for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5)

    def test_device_step_learns_and_keeps_sharding(self):
        # d_ff large enough that W1 crosses the min-shard threshold (tiny
        # leaves replicate by design)
        cfg = GPTConfig(vocab_size=17, d_model=64, n_heads=4, n_layers=2,
                        d_ff=256, ctx_len=16)
        params = init_gpt_params(cfg, seed=1)
        mesh = _mesh()
        repl = NamedSharding(mesh, P())
        param_sh = fsdp_shardings(params, mesh)
        params = jax.device_put(params, param_sh)
        opt = jax.device_put(adamw_init(params),
                             AdamWState(m=param_sh, v=param_sh, t=repl))
        rng = np.random.default_rng(2)
        data = jax.device_put(jnp.asarray(rng.integers(0, 17, 512, np.int32)),
                              repl)
        key = jax.device_put(jax.random.PRNGKey(0), repl)
        step = make_fsdp_device_train_step(
            cfg, mesh, params, 8, base_lr=1e-2, min_lr=1e-3, warmup=2,
            max_steps=32, weight_decay=0.0)
        losses = []
        for _ in range(16):
            params, opt, key, loss = step(params, opt, data, key)
            losses.append(float(loss))
        assert np.mean(losses[-4:]) < np.mean(losses[:4])
        # params AND moments still stored 1/8 per device after the steps
        w = params["layers"]["W1"]
        assert w.addressable_shards[0].data.size * 8 == w.size
        m = opt.m["layers"]["W1"]
        assert m.addressable_shards[0].data.size * 8 == m.size

        evaluate = make_fsdp_eval(cfg, mesh, params, 8, 4)
        v = float(evaluate(params, data, jax.random.PRNGKey(3)))
        assert np.isfinite(v)

    def test_fsdp_step_loss_matches_dp_step(self):
        # same seeds, same sampling code: the fsdp step's first-step loss
        # equals the plain single-chip device step's (the sharding is a
        # storage layout, not a math change)
        from linalg_tpu.train.trainer import make_device_train_step

        cfg, params, mesh = self._setup(seed=3)
        rng = np.random.default_rng(4)
        data_host = jnp.asarray(rng.integers(0, 17, 512, np.int32))
        kw = dict(base_lr=1e-2, min_lr=1e-3, warmup=2, max_steps=32,
                  weight_decay=0.0)

        ref_step = make_device_train_step(cfg, 8, **kw)
        _, _, _, ref_loss = ref_step(params, adamw_init(params), data_host,
                                     jax.random.PRNGKey(7))

        repl = NamedSharding(mesh, P())
        param_sh = fsdp_shardings(params, mesh)
        sharded = jax.device_put(params, param_sh)
        opt = jax.device_put(adamw_init(params),
                             AdamWState(m=param_sh, v=param_sh, t=repl))
        step = make_fsdp_device_train_step(cfg, mesh, params, 8, **kw)
        _, _, _, loss = step(sharded, opt,
                             jax.device_put(data_host, repl),
                             jax.device_put(jax.random.PRNGKey(7), repl))
        np.testing.assert_allclose(float(loss), float(ref_loss), atol=1e-5)


class TestFsdpCLI:
    def test_train_fsdp_via_cli_flags(self, tmp_path):
        from linalg_tpu.apps.gpt import build_parser
        from linalg_tpu.train.trainer import train

        args = build_parser().parse_args([
            "--train", "--steps", "10", "--eval_every", "10",
            "--batch_size", "8", "--ctx_len", "32", "--d_model", "32",
            "--heads", "4", "--layers", "1", "--ckpt_dir", str(tmp_path),
            "--fsdp", "8",
        ])
        params, cfg, stoi, itos = train(args)
        assert (tmp_path / "chars_gpt_best.npz").exists()

    def test_fsdp_rejects_other_axes(self, tmp_path):
        from linalg_tpu.apps.gpt import build_parser
        from linalg_tpu.train.trainer import train

        args = build_parser().parse_args([
            "--train", "--steps", "2", "--eval_every", "2",
            "--batch_size", "8", "--ctx_len", "32", "--d_model", "32",
            "--heads", "4", "--layers", "1", "--ckpt_dir", str(tmp_path),
            "--fsdp", "4", "--dp", "2",
        ])
        with pytest.raises(AssertionError, match="fsdp"):
            train(args)
