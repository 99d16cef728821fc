"""Trainer integration tests (CPU, tiny configs): train, checkpoint-best,
resume-or-init semantics."""

import numpy as np
import pytest

from linalg_tpu.apps.gpt import build_parser
from linalg_tpu.train.trainer import sample, train


def _args(tmp_path, steps=30, **over):
    base = [
        "--train", "--steps", str(steps), "--eval_every", "15",
        "--batch_size", "4", "--ctx_len", "32", "--d_model", "32",
        "--heads", "2", "--layers", "1", "--ckpt_dir", str(tmp_path),
        "--lr_model", "1e-3",
    ]
    args = build_parser().parse_args(base)
    for k, v in over.items():
        setattr(args, k, v)
    return args


class TestTrainer:
    def test_train_saves_and_resumes(self, tmp_path, capsys):
        params, cfg, stoi, itos = train(_args(tmp_path))
        out = capsys.readouterr().out
        assert "starting from scratch" in out
        assert "saved best" in out
        assert (tmp_path / "chars_gpt_best.npz").exists()
        assert (tmp_path / "chars_gpt_meta.json").exists()

        # second run must RESUME (and ignore mismatched arch flags: the
        # checkpoint's architecture wins, reference semantics)
        params2, cfg2, _, _ = train(_args(tmp_path, steps=5, d_model=64))
        out = capsys.readouterr().out
        assert "resumed from" in out
        assert cfg2 == cfg  # checkpoint architecture, not the CLI flags

    def test_sampler_runs_from_training_output(self, tmp_path):
        params, cfg, stoi, itos = train(_args(tmp_path, steps=10))
        some_char = next(iter(stoi))
        ctx = np.asarray([stoi[some_char]], dtype=np.int32)
        text = "".join(sample(params, cfg, ctx, itos, steps=20, seed=0))
        assert len(text) == 20
        assert all(ch in stoi for ch in text)

    def test_corrupt_checkpoint_falls_back(self, tmp_path, capsys):
        (tmp_path / "chars_gpt_best.npz").write_bytes(b"not-a-checkpoint")
        (tmp_path / "chars_gpt_meta.json").write_text("{broken")
        train(_args(tmp_path, steps=5))
        out = capsys.readouterr().out
        assert "starting from scratch" in out


class TestBPETrainer:
    def test_bpe_train_resume_sample_roundtrip(self, tmp_path):
        # --tokenizer bpe end-to-end: train stores the merge table in the
        # meta sidecar, resume rebuilds the same tokenizer, and sampling
        # decodes through it (closes the reference's "built but not wired"
        # anti-pattern, SURVEY §2.2)
        from linalg_tpu.nn.tokenizers import BPETokenizer
        from linalg_tpu.train.checkpoint import load_ckpt, load_tokenizer

        args = _args(tmp_path, steps=15)
        args.tokenizer = "bpe"
        args.vocab_size = 300
        params, cfg, stoi, itos = train(args)
        assert cfg.vocab_size == 300

        tok = load_tokenizer(tmp_path)
        assert isinstance(tok, BPETokenizer)
        assert tok.vocab_size == 300
        params2, cfg2, _, _ = load_ckpt(tmp_path)
        assert cfg2.vocab_size == 300

        ctx = tok.encode("the quick")
        text = "".join(sample(params2, cfg2, ctx, tok, steps=20, seed=0))
        assert len(text) >= 1  # multi-byte replacement can shrink chars

        # resume path: a second train run reuses the stored tokenizer
        args2 = _args(tmp_path, steps=5)
        args2.tokenizer = "bpe"
        args2.vocab_size = 300
        _, cfg3, _, _ = train(args2)
        assert cfg3 == cfg2

    def test_char_sample_accepts_tokenizer_object(self, tmp_path):
        from linalg_tpu.train.checkpoint import load_tokenizer

        params, cfg, stoi, itos = train(_args(tmp_path, steps=15))
        tok = load_tokenizer(tmp_path)
        ctx = tok.encode(next(iter(stoi)))
        text = "".join(sample(params, cfg, ctx, tok, steps=10, seed=0))
        assert len(text) == 10
        assert all(ch in stoi for ch in text)


class TestGradAccum:
    """grad_accum=N must be the SAME step as the full batch (mean of equal
    microbatch means == full mean), not merely similar."""

    def test_step_matches_full_batch(self):
        import jax
        import jax.numpy as jnp

        from linalg_tpu.models.gpt import GPTConfig, init_gpt_params
        from linalg_tpu.train.optim import adamw_init
        from linalg_tpu.train.trainer import make_device_train_step

        cfg = GPTConfig(vocab_size=17, d_model=32, n_heads=2, n_layers=2,
                        ctx_len=16)
        params = init_gpt_params(cfg, seed=0)
        rng = np.random.default_rng(0)
        data = jnp.asarray(rng.integers(0, 17, size=(4096,), dtype=np.int32))
        kw = dict(base_lr=1e-3, min_lr=1e-4, warmup=10, max_steps=100,
                  weight_decay=0.01)
        out = {}
        for ga in (1, 4):
            step = make_device_train_step(cfg, 8, grad_accum=ga, **kw)
            p, o, k, loss = step(params, adamw_init(params),
                                 data, jax.random.PRNGKey(7))
            out[ga] = (p, float(loss))
        assert abs(out[1][1] - out[4][1]) < 1e-5
        for a, b in zip(jax.tree.leaves(out[1][0]), jax.tree.leaves(out[4][0])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

    def test_rejects_nondivisible(self):
        from linalg_tpu.models.gpt import GPTConfig
        from linalg_tpu.train.trainer import make_device_train_step

        cfg = GPTConfig(vocab_size=17, d_model=32, n_heads=2, n_layers=1,
                        ctx_len=16)
        with pytest.raises(ValueError, match="grad_accum"):
            make_device_train_step(cfg, 8, grad_accum=3, base_lr=1e-3,
                                   min_lr=1e-4, warmup=10, max_steps=100,
                                   weight_decay=0.0)


class TestClipNorm:
    def test_clip_by_global_norm(self):
        import jax
        import jax.numpy as jnp

        from linalg_tpu.train.optim import clip_by_global_norm

        g = {"a": jnp.full((3,), 3.0), "b": jnp.full((4,), 4.0)}
        # global norm = sqrt(9*3 + 16*4) = sqrt(91)
        clipped, norm = clip_by_global_norm(g, 1.0)
        np.testing.assert_allclose(float(norm), np.sqrt(91.0), rtol=1e-6)
        total = sum(float(jnp.sum(jnp.square(x)))
                    for x in jax.tree.leaves(clipped))
        np.testing.assert_allclose(np.sqrt(total), 1.0, rtol=1e-5)
        # under the threshold: unchanged
        same, _ = clip_by_global_norm(g, 100.0)
        for a, b in zip(jax.tree.leaves(same), jax.tree.leaves(g)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_clipped_step_trains(self):
        import jax
        import jax.numpy as jnp

        from linalg_tpu.models.gpt import GPTConfig, init_gpt_params
        from linalg_tpu.train.optim import adamw_init
        from linalg_tpu.train.trainer import make_device_train_step

        cfg = GPTConfig(vocab_size=17, d_model=32, n_heads=2, n_layers=1,
                        ctx_len=16)
        params = init_gpt_params(cfg, seed=0)
        rng = np.random.default_rng(0)
        data = jnp.asarray(rng.integers(0, 17, size=(4096,), dtype=np.int32))
        step = make_device_train_step(cfg, 8, clip_norm=0.5, base_lr=1e-2,
                                      min_lr=1e-3, warmup=2, max_steps=50,
                                      weight_decay=0.0)
        o = adamw_init(params)
        k = jax.random.PRNGKey(0)
        p, o, k, l0 = step(params, o, data, k)
        for _ in range(30):
            p, o, k, l = step(p, o, data, k)
        assert float(l) < float(l0)


class TestMetricsLog:
    def test_log_file_jsonl(self, tmp_path):
        import json

        log = tmp_path / "metrics.jsonl"
        train(_args(tmp_path, steps=30, log_file=str(log)))
        rows = [json.loads(ln) for ln in log.read_text().splitlines()]
        train_rows = [r for r in rows if r["event"] == "train"]
        eval_rows = [r for r in rows if r["event"] == "eval"]
        done_rows = [r for r in rows if r["event"] == "done"]
        assert [r["step"] for r in train_rows] == [1, 20]
        assert all(np.isfinite(r["loss"]) for r in train_rows)
        assert train_rows[1]["tokens_per_sec"] > 0
        assert [r["step"] for r in eval_rows] == [15, 30]
        assert eval_rows[0]["ckpt"]  # first eval always checkpoints
        assert len(done_rows) == 1 and done_rows[0]["steps"] == 30
        assert done_rows[0]["best_val_loss"] == min(
            r["val_loss"] for r in eval_rows)

        # resume APPENDS (history preserved across restarts)
        train(_args(tmp_path, steps=5, eval_every=5, log_file=str(log)))
        rows2 = [json.loads(ln) for ln in log.read_text().splitlines()]
        assert len(rows2) > len(rows)
        assert [r["event"] for r in rows2[:len(rows)]] == \
            [r["event"] for r in rows]


class TestFFNFlag:
    def test_swiglu_cli_train_resume_decode(self, tmp_path, capsys):
        """--ffn swiglu end to end: train saves Wg/bg + ffn meta, resume
        rebuilds the gated config, the sampler decodes through it."""
        import json

        from linalg_tpu.train.trainer import sample

        params, cfg, stoi, itos = train(_args(tmp_path, ffn="swiglu"))
        assert cfg.ffn == "swiglu"
        assert "Wg" in params["layers"]
        meta = json.loads((tmp_path / "chars_gpt_meta.json").read_text())
        assert meta["ffn"] == "swiglu"
        with np.load(tmp_path / "chars_gpt_best.npz") as z:
            assert "l0_Wg" in z.files and "l0_bg" in z.files
        params2, cfg2, _, _ = train(_args(tmp_path, steps=5))
        out = capsys.readouterr().out
        assert "resumed from" in out
        assert cfg2.ffn == "swiglu"
        ctx = np.asarray([next(iter(stoi.values()))], dtype=np.int32)
        text = "".join(sample(params2, cfg2, ctx, itos, steps=10, seed=0))
        assert len(text) == 10
