#!/usr/bin/env python
"""Benchmark surface for linalg_tpu — every BASELINE.md row, committed.

Default (no args): the HEADLINE line only — 4096^2 float32 Householder QR
vs jax.lax.linalg.qr, ONE JSON line (the driver's contract):
  {"metric": ..., "value": <our GFLOP/s>, "unit": "GFLOP/s",
   "vs_baseline": <t_xla / t_ours>}

``python bench.py --all`` re-measures the whole committed surface — one
JSON line per row (attention kernels fwd+bwd, train steps f32/bf16, MoE
step, sampler tok/s, MFU) — with the HEADLINE LAST so the driver's
last-line parse still works. ``--only NAME`` runs one section
(qr|attention|train|moe|sampler).

vs_baseline semantics per row:
- qr:        t_xla / t_ours (same device, same run; >0.833 meets the
             1.2x BASELINE.json target, >1 beats XLA outright)
- attention: t_sdpa / t_ours at the same shape (same run); at T=8192 sdpa's
             score tensor is ~2 GB so the row reports vs the recorded
             round-2 value instead (noted in the metric string)
- train:     reference NumPy step time (67.8 s/step, BASELINE.md round 1,
             measured on this host via the reference's own modules) / ours
- moe:       dense f32 step (same run) / moe step — cost of 8x FFN params
- sampler:   tokens/s vs the round-2 recorded 1000 tok/s floor

Timing methodology: the host<->device round-trip on this runtime is ~40 ms,
dwarfing most kernels, so each candidate runs REPS times in a dependency
chain inside one jit; the null chain's time is subtracted and the remainder
divided by REPS (see docs/repro_dispatch_queue.py for why naive per-call
timing lies). Train steps are timed as wall-clock over windows of 20 steps
with one scalar readback per window (the trainer's real sync cadence).
"""

import argparse
import json
import time

import numpy as np

N = 4096
REPS = 8
TRIALS = 7

# reference NumPy CPU GPT step at the published config, measured on this
# host via the reference's own modules (BASELINE.md round 1)
REF_NUMPY_STEP_S = 67.8


def _emit(metric, value, unit, vs_baseline):
    print(json.dumps({
        "metric": metric,
        "value": round(float(value), 3),
        "unit": unit,
        "vs_baseline": (None if vs_baseline is None
                        else round(float(vs_baseline), 3)),
    }), flush=True)


# ---------------------------------------------------------------------------
# chain timing helpers
# ---------------------------------------------------------------------------


def _chain_median(chain, null_chain, x, reps=REPS, trials=TRIALS):
    """Median per-iteration time of a dependency chain minus the null chain."""
    import jax
    import jax.numpy as jnp

    def once(f):
        t0 = time.perf_counter()
        r = f(x)
        _ = float(jnp.sum(r[0] if isinstance(r, tuple) else r))
        return time.perf_counter() - t0

    for f in (null_chain, chain):
        jax.block_until_ready(f(x))
    t_c, t_n = [], []
    for _ in range(trials):
        t_n.append(once(null_chain))
        t_c.append(once(chain))
    t_null = float(np.median(t_n))
    return max(1e-9, (float(np.median(t_c)) - t_null) / reps)


# ---------------------------------------------------------------------------
# qr (the headline)
# ---------------------------------------------------------------------------


def bench_qr():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from linalg_tpu.ops.qr import householder_qr

    rng = np.random.default_rng(0)
    A = rng.standard_normal((N, N)).astype(np.float32)
    Aj = jnp.asarray(A)
    jax.block_until_ready(Aj)

    def chain_of(qr_fn):
        @jax.jit
        def chain(x):
            def body(i, acc):
                Q, _R = qr_fn(acc)
                return x + 1e-9 * Q
            return lax.fori_loop(0, REPS, body, x)
        return chain

    @jax.jit
    def null_chain(x):
        return lax.fori_loop(0, REPS, lambda i, acc: x + 1e-9 * acc, x)

    def once(f):
        t0 = time.perf_counter()
        r = f(Aj)
        _ = float(jnp.sum(r[0]))  # force full execution
        return time.perf_counter() - t0

    ours_chain = chain_of(householder_qr)
    ref_chain = chain_of(jnp.linalg.qr)
    # warm up all three compilations
    for f in (null_chain, ours_chain, ref_chain):
        jax.block_until_ready(f(Aj))
    # interleave trials so clock/thermal drift hits both candidates equally
    t_n, t_o, t_r = [], [], []
    for _ in range(TRIALS):
        t_n.append(once(null_chain))
        t_o.append(once(ours_chain))
        t_r.append(once(ref_chain))
    t_null = float(np.median(t_n))
    t_ours = max(1e-9, (float(np.median(t_o)) - t_null) / REPS)
    t_ref = max(1e-9, (float(np.median(t_r)) - t_null) / REPS)

    # accuracy gate
    Q, R = householder_qr(Aj)
    rel = float(
        np.linalg.norm(np.asarray(Q) @ np.asarray(R) - A) / np.linalg.norm(A)
    )
    flops = 2.0 * N**3  # factorization+Q-formation convention, both sides equal
    result = {
        "metric": f"householder_qr {N}x{N} f32 GFLOP/s (rel_resid {rel:.2e}, "
                  f"ours {t_ours*1e3:.2f} ms vs jax.lax.linalg.qr {t_ref*1e3:.2f} ms)",
        "value": round(flops / t_ours / 1e9, 1),
        "unit": "GFLOP/s",
        "vs_baseline": round(t_ref / t_ours, 3),
    }
    if rel > 1e-6:
        result["metric"] += " ACCURACY_FAIL"
        result["vs_baseline"] = 0.0
    print(json.dumps(result), flush=True)


# ---------------------------------------------------------------------------
# attention kernels: fwd+bwd chains vs sdpa
# ---------------------------------------------------------------------------


def _attn_fwdbwd_time(attn_fn, B, h, T, d, seed=0):
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, h, T, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, h, T, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, h, T, d)), jnp.float32)

    grad_fn = jax.grad(lambda qq: jnp.sum(attn_fn(qq, k, v)))

    @jax.jit
    def chain(x):
        def body(i, acc):
            return acc + 1e-9 * grad_fn(acc)
        return lax.fori_loop(0, REPS, body, x)

    @jax.jit
    def null_chain(x):
        return lax.fori_loop(0, REPS, lambda i, acc: x + 1e-9 * acc, x)

    return _chain_median(chain, null_chain, q)


def bench_attention():
    from linalg_tpu.nn.flash import flash_attention
    from linalg_tpu.nn.flash_long import flash_attention_long
    from linalg_tpu.nn.flash_stream import flash_attention_stream
    from linalg_tpu.nn.functional import causal_mask, sdpa

    def sdpa_causal(q, k, v):
        return sdpa(q, k, v, causal_mask(q.shape[-2], dtype=q.dtype))

    rows = [
        # B=8 so the chain stays above the null-chain noise floor — at
        # B1·h8·T1024 the fused kernel measured indistinguishable from 0
        ("flash", lambda q, k, v: flash_attention(q, k, v, True),
         8, 8, 1024, 64, True),
        ("flash_long", lambda q, k, v: flash_attention_long(q, k, v, True),
         8, 8, 2048, 64, True),
        ("flash_long", lambda q, k, v: flash_attention_long(q, k, v, True),
         1, 8, 4096, 64, True),
        ("flash_stream", lambda q, k, v: flash_attention_stream(q, k, v, True),
         1, 8, 4096, 64, True),
        ("flash_stream", lambda q, k, v: flash_attention_stream(q, k, v, True),
         1, 4, 8192, 128, False),  # sdpa at 8192: ~2 GB score tensor
    ]
    # round-2 recorded value for the no-sdpa row (B1 h4 T8192 d128): 4.6 ms
    recorded_8192_ms = 4.6
    for name, fn, B, h, T, d, vs_sdpa in rows:
        t = _attn_fwdbwd_time(fn, B, h, T, d)
        if vs_sdpa:
            t_ref = _attn_fwdbwd_time(sdpa_causal, B, h, T, d)
            base = t_ref / t
            note = f"sdpa {t_ref*1e3:.2f} ms"
        else:
            base = recorded_8192_ms / (t * 1e3)
            note = f"vs recorded r2 {recorded_8192_ms} ms"
        _emit(f"{name} fwd+bwd B{B} h{h} T{T} d{d} causal f32 ({note})",
              t * 1e3, "ms", base)


# ---------------------------------------------------------------------------
# train steps (published config), MoE, MFU
# ---------------------------------------------------------------------------


def _gpt_step_flops(cfg, batch):
    """Matmul FLOPs of one fwd+bwd train step (2 mults-adds per MAC; the
    backward costs 2x the forward's matmul work)."""
    d, L, T = cfg.d_model, cfg.n_layers, cfg.ctx_len
    ff = cfg.d_ff or 4 * d
    n_tok = batch * T
    per_tok_layer = 8 * d * d + 4 * d * ff          # qkv+o, ffn (fwd)
    attn = 4 * T * d                                # scores + AV per token
    head = 2 * d * cfg.vocab_size
    fwd = n_tok * (L * (per_tok_layer + attn) + head)
    return 3 * fwd  # fwd + 2x bwd


def _measure_step_loop(step_fn, params, opt_state, data, key, steps=100,
                       window=20, warmup=40):
    import jax

    for _ in range(warmup):
        params, opt_state, key, loss = step_fn(params, opt_state, data, key)
    _ = float(loss)
    t0 = time.perf_counter()
    n = 0
    while n < steps:
        for _ in range(window):
            params, opt_state, key, loss = step_fn(params, opt_state, data, key)
        _ = float(loss)  # the trainer's real sync cadence
        n += window
    return (time.perf_counter() - t0) / n


def _train_row(dtype):
    import jax
    import jax.numpy as jnp

    from linalg_tpu.models.gpt import GPTConfig, init_gpt_params
    from linalg_tpu.train.optim import adamw_init
    from linalg_tpu.train.trainer import make_device_train_step

    B = 64
    cfg = GPTConfig(vocab_size=65, d_model=512, n_heads=4, n_layers=4,
                    ctx_len=256, dtype=dtype)
    params = init_gpt_params(cfg, seed=0)
    opt_state = adamw_init(params)
    step = make_device_train_step(cfg, B, base_lr=3e-4, min_lr=3e-5,
                                  warmup=200, max_steps=10000,
                                  weight_decay=0.01)
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.integers(0, 65, size=(200_000,), dtype=np.int32))
    key = jax.random.PRNGKey(0)
    dt = _measure_step_loop(step, params, opt_state, data, key)
    toks = B * cfg.ctx_len / dt
    flops = _gpt_step_flops(cfg, B)
    tfs = flops / dt / 1e12
    # v5e MXU peak ~197 TFLOP/s bf16 — used for BOTH rows: XLA's default
    # f32 matmul precision truncates operands to bf16 on the MXU (measured
    # pure-matmul chain: 153 TFLOP/s for "f32" inputs, impossible against
    # a ~98 TFLOP/s true-f32 peak), so the bf16 roofline is the honest
    # denominator for the default-precision f32 step too.
    peak = 197.0
    mfu = 100.0 * tfs / peak
    _emit(f"GPT train step {dtype} published-config B{B} T256 d512 L4 "
          f"({toks/1e3:.0f}k tok/s, {tfs:.1f} TFLOP/s, MFU {mfu:.1f}% of "
          f"v5e {dtype} peak, vs reference NumPy {REF_NUMPY_STEP_S} s/step)",
          dt * 1e3, "ms", REF_NUMPY_STEP_S / dt)
    return dt


def bench_train():
    _train_row("float32")
    _train_row("bfloat16")


def bench_moe():
    import jax
    import jax.numpy as jnp

    from linalg_tpu.models.moe import MoEGPTConfig, init_moe_params
    from linalg_tpu.train.optim import adamw_init
    from linalg_tpu.train.trainer import make_device_train_step

    B = 64
    cfg = MoEGPTConfig(vocab_size=65, d_model=512, n_heads=4, n_layers=4,
                       ctx_len=256, n_experts=8)
    params = init_moe_params(cfg, seed=0)
    opt_state = adamw_init(params)
    step = make_device_train_step(cfg, B, base_lr=3e-4, min_lr=3e-5,
                                  warmup=200, max_steps=10000,
                                  weight_decay=0.01)
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.integers(0, 65, size=(200_000,), dtype=np.int32))
    key = jax.random.PRNGKey(0)
    dt = _measure_step_loop(step, params, opt_state, data, key)
    # recorded round-2 dense f32 step for the ratio (same config)
    dense_ref_s = 18.5e-3
    toks = B * cfg.ctx_len / dt
    _emit(f"MoE GPT train step f32 8 experts top-1 published-config "
          f"({toks/1e3:.0f}k tok/s; vs dense f32 recorded "
          f"{dense_ref_s*1e3:.1f} ms)",
          dt * 1e3, "ms", dense_ref_s / dt)


def bench_sampler():
    import jax

    from linalg_tpu.models.gpt import GPTConfig, init_gpt_params
    from linalg_tpu.train.trainer import sample

    cfg = GPTConfig(vocab_size=65, d_model=512, n_heads=4, n_layers=4,
                    ctx_len=256)
    params = init_gpt_params(cfg, seed=0)
    itos = {i: chr(97 + (i % 26)) for i in range(65)}
    ctx = np.asarray([1, 2, 3], dtype=np.int32)
    # warmup: compiles prefill + the fixed decode chunk
    list(sample(params, cfg, ctx, itos, steps=256, seed=0))
    n = 2048
    t0 = time.perf_counter()
    out = list(sample(params, cfg, ctx, itos, steps=n, seed=1))
    dt = time.perf_counter() - t0
    assert len(out) == n
    toks = n / dt
    _emit(f"KV-cached sampler published-config, {n} tokens incl. context "
          f"rollover (vs recorded r2 1000 tok/s)",
          toks, "tok/s", toks / 1000.0)

    # batched serving: left-padded ragged prompts, one shared decode
    # position for the whole batch (gpt_generate)
    from linalg_tpu.models.gpt import gpt_generate

    B = 8
    rng = np.random.default_rng(1)
    prompts = [rng.integers(0, 65, size=(int(L),)).astype(np.int32)
               for L in rng.integers(3, 120, size=(B,))]
    n_new = 128
    _ = gpt_generate(params, cfg, prompts, n_new, seed=0)  # compile
    t0 = time.perf_counter()
    reps = 8
    for i in range(reps):
        out = gpt_generate(params, cfg, prompts, n_new, seed=i)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / reps
    toks_b = B * n_new / dt
    _emit(f"batched serving gpt_generate B{B} ragged prompts, {n_new} new "
          f"tokens each (vs single-stream sampler above)",
          toks_b, "tok/s", toks_b / max(toks, 1.0))


def bench_serve():
    """Continuous batching vs static batching on a ragged request stream.

    Static batching (gpt_generate) must decode every batch member to the
    LONGEST budget in its batch; the slot engine retires each request at
    its own budget and backfills the freed slot, so the win is the ragged-
    ness of the workload (here budgets 16..128, ~2.3x spread).
    """
    from linalg_tpu.models.gpt import GPTConfig, gpt_generate, init_gpt_params
    from linalg_tpu.serve import Request, ServeEngine

    cfg = GPTConfig(vocab_size=65, d_model=512, n_heads=4, n_layers=4,
                    ctx_len=256)
    params = init_gpt_params(cfg, seed=0)
    rng = np.random.default_rng(3)
    R, SLOTS, CHUNK = 48, 8, 32
    reqs = [(rng.integers(0, 65, size=(int(L),)).astype(np.int32), int(n))
            for L, n in zip(rng.integers(3, 120, size=(R,)),
                            rng.integers(8, 129, size=(R,)))]

    def run_engine():
        eng = ServeEngine(params, cfg, n_slots=SLOTS, chunk=CHUNK,
                          prefill_window=128)
        for p, n in reqs:
            eng.submit(Request(p, n))
        done = eng.run()
        return sum(len(c.tokens) for c in done)

    run_engine()  # compile (one prefill shape + one decode-chunk shape)
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        useful = run_engine()
        samples.append(useful / (time.perf_counter() - t0))
    eng_tps = float(np.median(samples))

    # static-batch baseline: batches of SLOTS in arrival order, every
    # member padded to the batch max budget, useful tokens counted
    def run_static():
        tot = 0
        for i in range(0, R, SLOTS):
            grp = reqs[i:i + SLOTS]
            n_max = max(n for _, n in grp)
            out = gpt_generate(params, cfg, [p for p, _ in grp], n_max,
                               seed=i)
            np.asarray(out)
            tot += sum(n for _, n in grp)
        return tot

    run_static()  # compile (one shape per distinct n_max — realistic cost,
    # but exclude it: static batching is the baseline at its best)
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        useful_s = run_static()
        samples.append(useful_s / (time.perf_counter() - t0))
    static_tps = float(np.median(samples))
    _emit(f"continuous batching: {R} ragged requests (budgets 8-128), "
          f"{SLOTS} slots, chunk {CHUNK} — useful tok/s vs static "
          f"gpt_generate batches in arrival order ({static_tps:.0f} tok/s)",
          eng_tps, "tok/s", eng_tps / max(static_tps, 1.0))


def bench_prefix():
    """Prefix caching: R requests sharing one long system prompt.

    The prefix KV is prefilled ONCE (register_prefix) and every admission
    block-extends it with just the request suffix, vs the plain engine
    re-prefilling prefix+suffix per request. The admission PRIMITIVE is
    ~2x (chained A/B: extend 1.5 ms vs full prefill 3.0 ms at a
    1900-token prefix, d512/8L bf16 — both floors share the ctx-sized KV
    buffer write); end-to-end the ratio is diluted by decode, which this
    short-decode workload keeps to ~8 tokens/request.
    """
    import time as _t

    from linalg_tpu.models.gpt import GPTConfig, init_gpt_params
    from linalg_tpu.serve.engine import Request, ServeEngine

    cfg = GPTConfig(vocab_size=65, d_model=512, n_heads=8, n_layers=8,
                    ctx_len=2048, dtype="bfloat16")
    params = init_gpt_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    prefix = rng.integers(0, 65, size=(1900,)).tolist()
    R, N = 48, 8
    sufs = [rng.integers(0, 65, size=(int(n),)).tolist()
            for n in rng.integers(4, 24, size=(R,))]

    def run_prefix():
        eng = ServeEngine(params, cfg, n_slots=8, chunk=8, top_k=1,
                          prefill_window=32)
        pid = eng.register_prefix(prefix)
        for s in sufs:
            eng.submit(Request(s, N, prefix_id=pid))
        return sum(len(c.tokens) for c in eng.run())

    def run_plain():
        eng = ServeEngine(params, cfg, n_slots=8, chunk=8, top_k=1,
                          prefill_window=2040)
        for s in sufs:
            eng.submit(Request(prefix + s, N))
        return sum(len(c.tokens) for c in eng.run())

    run_prefix(); run_plain()  # compile
    rates = {}
    for name, fn in (("prefix", run_prefix), ("plain", run_plain)):
        ts = []
        for _ in range(3):
            t0 = _t.perf_counter()
            tot = fn()
            ts.append(tot / (_t.perf_counter() - t0))
        rates[name] = float(np.median(ts))
    _emit(f"prefix-cached serving: {R} requests sharing a 1900-token "
          f"prefix, {N} new tokens each, d512/8L ctx2048 bf16 (vs plain "
          f"full-prompt engine {rates['plain']:.0f} tok/s)",
          rates["prefix"], "tok/s", rates["prefix"] / rates["plain"])


def bench_page_cache():
    """Automatic page-level prefix caching (no registration).

    The bench_prefix workload WITHOUT register_prefix: R requests share
    a long system prompt, submitted as FULL prompts. page_cache=True
    pools the first request's prompt pages under content-addressed keys
    and every later admission reuses them (gather + tail extend), vs the
    same paged engine re-prefilling every full prompt. The delta is the
    shared prefill work: identical tokens both ways (exactness pinned by
    TestPageCache).
    """
    import time as _t

    from linalg_tpu.models.gpt import GPTConfig, init_gpt_params
    from linalg_tpu.serve.engine import Request, ServeEngine

    cfg = GPTConfig(vocab_size=65, d_model=512, n_heads=8, n_layers=8,
                    ctx_len=2048, dtype="bfloat16")
    params = init_gpt_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    prefix = rng.integers(0, 65, size=(1900,)).tolist()
    R, N = 48, 8
    sufs = [rng.integers(0, 65, size=(int(n),)).tolist()
            for n in rng.integers(4, 24, size=(R,))]

    def run(pc):
        eng = ServeEngine(params, cfg, n_slots=8, chunk=8, top_k=1,
                          prefill_window=256, paged=True, page=128,
                          page_cache=pc)
        for s in sufs:
            eng.submit(Request(prefix + s, N))
        tot = sum(len(c.tokens) for c in eng.run())
        return tot, eng.stats["page_cache_hits"]

    run(True); run(False)  # compile
    rates, hits = {}, 0
    for name, pc in (("cached", True), ("cold", False)):
        ts = []
        for _ in range(3):
            t0 = _t.perf_counter()
            tot, h = run(pc)
            ts.append(tot / (_t.perf_counter() - t0))
        rates[name] = float(np.median(ts))
        if pc:
            hits = h
    _emit(f"automatic page cache: {R} full prompts sharing a 1900-token "
          f"prefix, {N} new tokens each, d512/8L ctx2048 bf16 paged "
          f"({hits} page hits; vs page_cache=False {rates['cold']:.0f} "
          f"tok/s)", rates["cached"], "tok/s",
          rates["cached"] / rates["cold"])


def bench_paged():
    """Paged KV cache: compute transparency + the memory/queueing tradeoff.

    Two rows against the dense slot engine on the same ragged stream:
    (1) paged with a DENSE-EQUIVALENT pool — measures what the page
    indirection itself costs the engine (chip history: gather and the
    Pallas kernel tie with slot at this toy ctx; the attention-level
    story at ctx 4096 is in tools/ab_paged.py + BASELINE.md round 4);
    (2) paged with the pool at ~85% of dense — the throughput cost of
    admission control by memory (requests QUEUE on page pressure; the
    tradeoff the operator buys with n_pages, not a compute cost).
    """
    from linalg_tpu.models.gpt import GPTConfig, init_gpt_params
    from linalg_tpu.serve import Request, ServeEngine

    # workload sized PAST the noise floor (round-4 verdict: the ctx-256
    # toy decoded ~0.3 s and the slot baseline swung 7.9k-13.1k tok/s
    # run to run): ctx 1024, budgets 128-384 — several seconds of steady
    # decode per run
    cfg = GPTConfig(vocab_size=65, d_model=512, n_heads=4, n_layers=4,
                    ctx_len=1024)
    params = init_gpt_params(cfg, seed=0)
    rng = np.random.default_rng(3)
    R, SLOTS, CHUNK, PAGE = 64, 8, 32, 64
    reqs = [(rng.integers(0, 65, size=(int(L),)).astype(np.int32), int(n))
            for L, n in zip(rng.integers(3, 120, size=(R,)),
                            rng.integers(128, 385, size=(R,)))]
    # per-request page need = ceil((prompt + chunk-rounded budget)/page);
    # "full" removes queueing entirely (every slot can hold the WORST
    # request), "tight" caps the pool at the top-SLOTS needs
    needs = sorted(-(-(len(p) + -(-n // CHUNK) * CHUNK) // PAGE)
                   for p, n in reqs)
    n_full = 1 + SLOTS * needs[-1]
    n_pages = 1 + sum(needs[-SLOTS:])
    dense_pages = SLOTS * (cfg.ctx_len // PAGE)

    def run(mode):
        eng = ServeEngine(params, cfg, n_slots=SLOTS, chunk=CHUNK,
                          prefill_window=128, paged=(mode != "slot"),
                          page=PAGE,
                          n_pages=(n_full if mode == "full" else n_pages))
        for p, n in reqs:
            eng.submit(Request(p, n))
        return sum(len(c.tokens) for c in eng.run())

    rates = {}
    for name in ("slot", "full", "tight"):
        fn = lambda: run(name)
        fn()  # compile
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            useful = fn()
            samples.append(useful / (time.perf_counter() - t0))
        rates[name] = float(np.median(samples))
    _emit(f"paged KV serving, uncapped pool (no queueing): {R} ragged "
          f"requests, {SLOTS} slots — useful tok/s vs dense slot engine "
          f"({rates['slot']:.0f} tok/s); measures the page indirection "
          f"itself", rates["full"], "tok/s", rates["full"] / rates["slot"])
    _emit(f"paged KV serving, pool capped at {n_pages - 1}/{dense_pages} "
          f"pages ({100 * (n_pages - 1) // dense_pages}% of dense KV "
          f"memory) — queueing on page pressure, same workload "
          f"(vs slot {rates['slot']:.0f} tok/s)",
          rates["tight"], "tok/s", rates["tight"] / rates["slot"])


def bench_paged_ab():
    """Load-bearing chunk-level A/B for the paged read/write lowerings.

    tools/ab_kv_write.py's protocol folded into the committed bench
    (round-4 verdict item 7): ONE process interleaves the compiled
    32-token decode chunk of {dense slot, paged XLA-gather, paged Pallas
    DMA kernel} under BOTH cache-write lowerings (flat row-scatter vs
    legacy vmapped-DUS / double-index scatter), half-full ctx-4096
    bf16 GQA caches — chip clock drift hits every variant equally.
    Emits the kernel-vs-slot and gather-vs-slot ratios (flat writes, the
    committed default); the dus/flat ratios ride in the row text.
    """
    import os

    import jax
    import jax.numpy as jnp

    from linalg_tpu.models.gpt import GPTConfig, init_gpt_params
    from linalg_tpu.serve.paged import init_paged_cache

    cfg = GPTConfig(vocab_size=65, d_model=512, n_heads=4, n_kv_heads=2,
                    n_layers=8, ctx_len=4096, dtype="bfloat16")
    page, B, CHUNK, Pmax = 256, 8, 32, 16
    params = init_gpt_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    n_pages = 1 + B * Pmax
    logits = jnp.asarray(rng.normal(size=(B, cfg.vocab_size)), jnp.float32)
    key = jax.random.PRNGKey(0)
    ones = jnp.ones((B,), jnp.float32)
    zeros = jnp.zeros((B,), jnp.float32)
    ksamp = jnp.ones((B,), jnp.int32)
    dt = cfg.compute_dtype
    shape = (cfg.n_layers, B, cfg.kv_heads, cfg.ctx_len, cfg.d_head)
    slot_cache = {"k": jnp.asarray(rng.normal(size=shape), dt),
                  "v": jnp.asarray(rng.normal(size=shape), dt),
                  "pos": jnp.full((B,), cfg.ctx_len // 2, jnp.int32)}
    pc = init_paged_cache(cfg, B, n_pages, page)
    pc = dict(pc,
              pool_k=jnp.asarray(rng.normal(size=pc["pool_k"].shape), dt),
              pool_v=jnp.asarray(rng.normal(size=pc["pool_v"].shape), dt),
              table=jnp.asarray(
                  rng.permutation(np.arange(1, n_pages)).reshape(B, Pmax),
                  jnp.int32),
              pos=jnp.full((B,), cfg.ctx_len // 2, jnp.int32))

    def variants():
        from linalg_tpu.serve.engine import decode_chunk_slots
        from linalg_tpu.serve.paged import decode_chunk_paged

        return {
            "slot": lambda: decode_chunk_slots(
                params, slot_cache, logits, key, ones, zeros, ksamp, cfg,
                CHUNK)[0],
            "gather": lambda: decode_chunk_paged(
                params, pc, logits, key, ones, zeros, ksamp, cfg,
                CHUNK, use_kernel=False)[0],
            "kernel": lambda: decode_chunk_paged(
                params, pc, logits, key, ones, zeros, ksamp, cfg,
                CHUNK, use_kernel=True)[0],
        }

    results = {}
    for _pass in range(2):
        for mode in ("dus", "flat"):
            os.environ["LINALG_TPU_KV_WRITE"] = mode
            jax.clear_caches()  # the write gate is read at trace time
            for name, fn in variants().items():
                np.asarray(fn())  # compile + sync
                ts = []
                for _ in range(5):
                    t0 = time.perf_counter()
                    np.asarray(fn())
                    ts.append(time.perf_counter() - t0)
                results.setdefault((mode, name), []).append(
                    float(np.median(ts)) * 1e3)
    os.environ.pop("LINALG_TPU_KV_WRITE", None)
    med = {k: float(np.median(v)) for k, v in results.items()}
    slot, gather, kernel = (med[("flat", n)]
                            for n in ("slot", "gather", "kernel"))
    dus_note = ", ".join(
        f"{n} dus/flat {med[('dus', n)] / med[('flat', n)]:.2f}x"
        for n in ("slot", "gather", "kernel"))
    tok_s = B * CHUNK / (kernel / 1e3)
    _emit(f"paged chunk A/B (interleaved, half-full ctx-4096 bf16 GQA "
          f"d512/8L hk2, chunk {CHUNK}): Pallas DMA kernel {kernel:.1f} ms "
          f"vs slot {slot:.1f} ms ({slot / kernel:.2f}x) vs gather "
          f"{gather:.1f} ms ({gather / kernel:.2f}x); write lowerings: "
          f"{dus_note}", tok_s, "tok/s", slot / kernel)


def bench_spec_serve():
    """Speculative decoding INSIDE the continuous-batching engine.

    Engine-vs-engine A/B on a ragged stream of REPETITIVE prompts (the
    prompt-lookup drafter's target workload): ServeEngine(speculative=8)
    vs the plain slot engine, greedy, same requests — the tok/s ratio is
    the composition win the round-4 verdict asked for (speculative and
    continuous batching used together). Round counts ride in the text.
    """
    from linalg_tpu.models.gpt import GPTConfig, init_gpt_params
    from linalg_tpu.serve import Request, ServeEngine

    cfg = GPTConfig(vocab_size=65, d_model=512, n_heads=4, n_layers=4,
                    ctx_len=1024)
    params = init_gpt_params(cfg, seed=0)
    rng = np.random.default_rng(7)
    R, SLOTS, CHUNK, K = 32, 8, 36, 8
    reqs = []
    for i in range(R):
        motif = rng.integers(0, 65, size=(int(rng.integers(8, 25)),))
        prompt = np.tile(motif, 12)[:int(rng.integers(60, 120))]
        reqs.append((prompt.astype(np.int32).tolist(),
                     int(rng.integers(128, 257))))

    def run(spec):
        eng = ServeEngine(params, cfg, n_slots=SLOTS, chunk=CHUNK,
                          prefill_window=128, top_k=1, speculative=spec)
        for p, n in reqs:
            eng.submit(Request(p, n))
        done = eng.run()
        return sum(len(c.tokens) for c in done), eng.stats

    rates, stats = {}, {}
    for name, spec in (("plain", 0), ("spec", K)):
        run(spec)  # compile
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            useful, st = run(spec)
            samples.append(useful / (time.perf_counter() - t0))
        rates[name], stats[name] = float(np.median(samples)), st
    rounds = stats["spec"].get("spec_rounds", 0)
    emitted = stats["spec"]["emitted_tokens"]
    _emit(f"speculative continuous batching K={K}: {R} repetitive ragged "
          f"requests, {SLOTS} slots — engine tok/s vs plain engine "
          f"({rates['plain']:.0f} tok/s; {rounds} verify rounds for "
          f"{emitted} emitted tokens = {emitted / max(rounds, 1):.1f} "
          f"tok/round)", rates["spec"], "tok/s",
          rates["spec"] / max(rates["plain"], 1.0))


def bench_admission():
    """Chunked-prefill admission latency vs prompt length.

    submit() admits ANY prompt up to the ctx budget by looping the
    fixed-shape block-extend (round-4 verdict item 4); this row measures
    the admission cost's scaling: ms/request at prompt lengths
    16 / 256 / 1024 / 2000 on a ctx-2048 bf16 d512/8L model (decode held
    to one chunk so prefill dominates). vs_baseline is the scaling
    efficiency of 2000 vs 256 tokens relative to linear (1.0 = admission
    cost grows exactly with prompt length; the quadratic attention term
    and the per-chunk dispatch overhead both push it off linear).
    """
    from linalg_tpu.models.gpt import GPTConfig, init_gpt_params
    from linalg_tpu.serve import Request, ServeEngine

    cfg = GPTConfig(vocab_size=65, d_model=512, n_heads=8, n_layers=8,
                    ctx_len=2048, dtype="bfloat16")
    params = init_gpt_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    R = 16
    ms = {}
    for plen in (16, 256, 1024, 2000):
        prompts = [rng.integers(0, 65, size=(plen,)).tolist()
                   for _ in range(R)]

        def run():
            eng = ServeEngine(params, cfg, n_slots=8, chunk=8, top_k=1,
                              prefill_window=256)
            for p in prompts:
                eng.submit(Request(p, 8))
            eng.run()

        run()  # compile (shared prefill/extend shapes across lengths)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            ts.append((time.perf_counter() - t0) / R * 1e3)
        ms[plen] = float(np.median(ts))
    eff = (ms[2000] / ms[256]) / (2000 / 256)
    _emit(f"chunked-prefill admission, ms/request (prompt 16: "
          f"{ms[16]:.1f}, 256: {ms[256]:.1f}, 1024: {ms[1024]:.1f}, "
          f"2000: {ms[2000]:.1f}; ctx-2048 bf16 d512/8L, window 256, "
          f"decode 8 tok) — value is the 2000-token row; vs_baseline = "
          f"2000-vs-256 scaling efficiency relative to linear",
          ms[2000], "ms", eff)


def bench_train_big():
    """Compute-bound-scale training row (round-4 verdict item 6).

    The published d512/4L/ctx256 config is operand-traffic-bound (52.8%
    MFU bf16 — BASELINE.md step-floor audit); this row measures the
    framework at a scale where arithmetic intensity supports the MXU:
    d1024/8L/ctx1024 bf16 (~100M params), B tuned to fit the v5e's HBM.
    Emits step ms with tok/s, TFLOP/s and MFU against the 197 TFLOP/s
    bf16 peak in the text; vs_baseline is MFU/100 (fraction of peak).
    """
    import jax
    import jax.numpy as jnp

    from linalg_tpu.models.gpt import GPTConfig, init_gpt_params
    from linalg_tpu.train.optim import adamw_init
    from linalg_tpu.train.trainer import make_device_train_step

    # B=24 from the tools/ab_train_big.py sweep (chip, 3 sessions):
    # B16 194.8k / B24 197.2k / B32 189.8k tok/s, B48 ResourceExhausted
    # — B24 is the throughput knee (~70% MFU)
    B = 24
    cfg = GPTConfig(vocab_size=65, d_model=1024, n_heads=8, n_layers=8,
                    ctx_len=1024, dtype="bfloat16")
    params = init_gpt_params(cfg, seed=0)
    opt_state = adamw_init(params)
    step = make_device_train_step(cfg, B, base_lr=3e-4, min_lr=3e-5,
                                  warmup=200, max_steps=10000,
                                  weight_decay=0.01)
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.integers(0, 65, size=(400_000,), dtype=np.int32))
    key = jax.random.PRNGKey(0)
    dt = _measure_step_loop(step, params, opt_state, data, key, steps=60,
                            window=20, warmup=24)
    toks = B * cfg.ctx_len / dt
    flops = _gpt_step_flops(cfg, B)
    tfs = flops / dt / 1e12
    peak = 197.0
    mfu = 100.0 * tfs / peak
    _emit(f"GPT train step bf16 compute-bound scale B{B} T1024 d1024 L8 "
          f"(~100M params; {toks / 1e3:.0f}k tok/s, {tfs:.1f} TFLOP/s, "
          f"MFU {mfu:.1f}% of v5e bf16 peak)",
          dt * 1e3, "ms", mfu / 100.0)


def bench_lora():
    """Multi-LoRA serving: the cost of per-slot adapters in the decode.

    Mixed-adapter requests batch into one decode chunk through the
    low-rank side-path (y += scale*(x@A[id])@B[id] per attention
    projection) — this row measures that side-path's toll vs the plain
    engine on the same workload. The adapters here are rank-8 on a
    d512/4L model: the extra per-token FLOPs are ~1.5% of the base
    matvecs, so the expected cost is launch/gather overhead, not math.
    """
    from linalg_tpu.models.gpt import GPTConfig, init_gpt_params
    from linalg_tpu.models.lora import LoRAConfig, init_lora_params
    from linalg_tpu.serve import Request, ServeEngine

    cfg = GPTConfig(vocab_size=65, d_model=512, n_heads=4, n_layers=4,
                    ctx_len=256)
    params = init_gpt_params(cfg, seed=0)
    rng = np.random.default_rng(3)
    R, SLOTS, CHUNK = 48, 8, 32
    reqs = [(rng.integers(0, 65, size=(int(L),)).astype(np.int32), int(n))
            for L, n in zip(rng.integers(3, 120, size=(R,)),
                            rng.integers(8, 129, size=(R,)))]

    import jax.numpy as jnp

    def adapter(seed):
        lcfg = LoRAConfig(rank=8, alpha=16.0)
        lora = init_lora_params(params, lcfg, seed=seed)
        lora = {"layers": {
            k: (jnp.asarray(rng.normal(0, 0.02, v.shape), jnp.float32)
                if k.endswith("_B") else v)
            for k, v in lora["layers"].items()}}
        return lora, lcfg

    # Engines are built and adapters registered ONCE (setup: stack writes
    # + per-adapter merged-weight prefill params); each timed pass is
    # submit-all + run on the warm engine, so the row isolates the decode
    # side-path toll rather than registration/merge setup.
    N_LORAS = 4
    eng_lora = ServeEngine(params, cfg, n_slots=SLOTS, chunk=CHUNK,
                           prefill_window=128, max_loras=N_LORAS)
    lids = [0] + [eng_lora.register_lora(*adapter(s))
                  for s in range(N_LORAS)]
    eng_plain = ServeEngine(params, cfg, n_slots=SLOTS, chunk=CHUNK,
                            prefill_window=128)

    def run_lora():
        for i, (p, n) in enumerate(reqs):
            eng_lora.submit(Request(p, n, lora_id=lids[i % len(lids)]))
        return sum(len(c.tokens) for c in eng_lora.run())

    def run_plain():
        for p, n in reqs:
            eng_plain.submit(Request(p, n))
        return sum(len(c.tokens) for c in eng_plain.run())

    rates = {}
    for name, fn in (("plain", run_plain), ("lora4", run_lora)):
        fn()  # compile
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            useful = fn()
            samples.append(useful / (time.perf_counter() - t0))
        rates[name] = float(np.median(samples))
    _emit(f"multi-LoRA serving: {R} ragged requests over 4 rank-8 "
          f"adapters + base, {SLOTS} slots — useful tok/s vs the plain "
          f"engine ({rates['plain']:.0f} tok/s)",
          rates["lora4"], "tok/s", rates["lora4"] / rates["plain"])


def bench_quant():
    """Int8 weight-only decode (deq + int8 arithmetic) vs the bf16 decode.

    Decode re-reads every matmul weight per token, so the win scales with
    model size: at the published config (12.6M weight params) the chunk is
    fusion-launch-bound and quant LOSES; at d1024/8L (~100M params) the
    weight traffic dominates and deq wins ~1.14x (see models/quant.py).
    Each row measures 3 chained 128-token chunks (one final readback) from
    one prefill, median of 3.
    """
    from functools import partial as _partial

    import jax
    import jax.numpy as jnp

    from linalg_tpu.models.gpt import (GPTConfig, gpt_decode_chunk,
                                       gpt_prefill, init_gpt_params)
    from linalg_tpu.models.quant import (gpt_decode_chunk_q,
                                         quantize_gpt_params)

    def tok_s(cfg, params_like, decode, n=128, chains=3, reps=3,
              cache_xform=None):
        prompt = (np.arange(8) % cfg.vocab_size).astype(np.int32)
        logits, cache = gpt_prefill(_P[cfg], jnp.asarray(prompt[None]), cfg)
        if cache_xform is not None:
            cache = cache_xform(cache)
        key = jax.random.PRNGKey(0)

        def run():
            lg, c = logits, cache
            t = None
            for _ in range(chains):
                t, lg, c = decode(params_like, c, lg, key, cfg, n,
                                  1.0, 0, 0.0)
            np.asarray(t)  # ONE sync for the whole chain

        run()  # compile
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run()
            ts.append(chains * n / (time.perf_counter() - t0))
        return float(np.median(ts))

    _P = {}
    for name, (D, L) in (("published d512/4L", (512, 4)),
                         ("large d1024/8L", (1024, 8))):
        cfg = GPTConfig(vocab_size=65, d_model=D, n_heads=4, n_layers=L,
                        ctx_len=512, dtype="bfloat16")
        params = init_gpt_params(cfg, seed=0)
        _P[cfg] = params
        qparams = quantize_gpt_params(params, cfg)
        bf = tok_s(cfg, params, gpt_decode_chunk)
        for mode in ("deq", "int8"):
            q8 = tok_s(cfg, qparams,
                       _partial(gpt_decode_chunk_q, mode=mode))
            _emit(f"int8 weight-only decode ({mode}), {name} ctx512 "
                  f"(vs bf16 decode {bf:.0f} tok/s)",
                  q8, "tok/s", q8 / max(bf, 1.0))

    # long context: per-token traffic is KV-dominated, the int8 KV cache
    # (quant=int8kv) halves it
    from linalg_tpu.models.quant import quantize_kv_cache

    cfg = GPTConfig(vocab_size=65, d_model=512, n_heads=4, n_layers=4,
                    ctx_len=4096, dtype="bfloat16")
    _P[cfg] = init_gpt_params(cfg, seed=0)
    qparams = quantize_gpt_params(_P[cfg], cfg)
    bf = tok_s(cfg, _P[cfg], gpt_decode_chunk)
    kv8 = tok_s(cfg, qparams, _partial(gpt_decode_chunk_q, kv8=True),
                cache_xform=quantize_kv_cache)
    _emit(f"int8 weights + int8 KV decode, d512/4L ctx4096 "
          f"(vs bf16 decode {bf:.0f} tok/s)", kv8, "tok/s",
          kv8 / max(bf, 1.0))


def bench_gqa():
    """Grouped-query attention decode at long context vs the MHA twin.

    Decode is KV-cache-read bound at long context; GQA shrinks the cache
    (and its per-token HBM traffic) by heads/kv_heads, so the win should
    track the group factor as ctx grows. Same chained-chunk protocol as
    bench_quant: 3 chained 128-token chunks from one prefill, one final
    readback, median of 3. Rows: h8 MHA baseline, GQA kv=2 (4x smaller
    cache), MQA kv=1 (8x), each at ctx 4096, d512/4L bf16.
    """
    import jax
    import jax.numpy as jnp

    from linalg_tpu.models.gpt import (GPTConfig, gpt_decode_chunk,
                                       gpt_prefill, init_gpt_params)

    def tok_s(cfg, params, n=128, chains=3, reps=3):
        prompt = (np.arange(8) % cfg.vocab_size).astype(np.int32)
        logits, cache = gpt_prefill(params, jnp.asarray(prompt[None]), cfg)
        key = jax.random.PRNGKey(0)

        def run():
            lg, c = logits, cache
            t = None
            for _ in range(chains):
                t, lg, c = gpt_decode_chunk(params, c, lg, key, cfg, n,
                                            1.0, 0, 0.0)
            np.asarray(t)  # ONE sync for the whole chain

        run()  # compile
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run()
            ts.append(chains * n / (time.perf_counter() - t0))
        return float(np.median(ts))

    base = None
    for name, kv in (("MHA kv=8", None), ("GQA kv=2", 2), ("MQA kv=1", 1)):
        cfg = GPTConfig(vocab_size=65, d_model=512, n_heads=8, n_layers=4,
                        ctx_len=4096, dtype="bfloat16", n_kv_heads=kv)
        tps = tok_s(cfg, init_gpt_params(cfg, seed=0))
        if base is None:
            base = tps
        _emit(f"grouped-query decode {name}, d512/4L h8 ctx4096 bf16 "
              f"(vs MHA {base:.0f} tok/s)", tps, "tok/s",
              tps / max(base, 1.0))


def bench_stream():
    """Sliding-window streaming sampler vs the bounded rollover sampler.

    Long streams through a ctx-256 model: the bounded path re-prefills
    every ctx/2 tokens (plus a per-chunk length readback); the windowed
    ring path (models/stream.py) decodes through an O(window) ring cache
    with unbounded positions — no rollover, ever. The models differ by
    the window semantics (full vs banded attention), so this is a
    WORKLOAD throughput row, not a same-model kernel A/B.
    """
    import jax

    from linalg_tpu.models.gpt import GPTConfig, init_gpt_params
    from linalg_tpu.train.trainer import sample

    itos = {i: chr(97 + (i % 26)) for i in range(65)}
    ctx = np.asarray([1, 2, 3], dtype=np.int32)
    n = 4096
    rates = {}
    for name, kw in (("rollover", {}), ("stream", {"window": 256})):
        cfg = GPTConfig(vocab_size=65, d_model=512, n_heads=4, n_layers=4,
                        ctx_len=256, pos="rope", **kw)
        params = init_gpt_params(cfg, seed=0)
        list(sample(params, cfg, ctx, itos, steps=256, seed=0))  # compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = list(sample(params, cfg, ctx, itos, steps=n, seed=1))
            ts.append(n / (time.perf_counter() - t0))
        assert len(out) == n
        rates[name] = float(np.median(ts))
    _emit(f"windowed ring-stream sampler, {n} tokens through ctx-256 "
          f"rope model, window 256 (vs bounded rollover sampler "
          f"{rates['rollover']:.0f} tok/s)",
          rates["stream"], "tok/s", rates["stream"] / rates["rollover"])


def bench_speculative():
    """Speculative decoding vs plain decode (greedy, published config).

    Two honest rows: prompt-LOOKUP drafting on a repetitive prompt (the
    workload n-gram lookup is built for — the ratio on non-repetitive
    text tends to 1.0 minus overhead), and SELF-draft (the target
    drafting for itself, so draft cost == target cost — a worst-case
    overhead row, expected < 1.0). On CPU x64 self-draft acceptance is
    exact (rounds == ceil(n/(K+1)), pinned in tests); on the chip the
    decode and block-verify kernels fuse differently, and with
    random-init near-uniform logits those f32-level differences flip
    greedy argmax ties, so measured acceptance is partial — the row
    prints the actual round count.
    """
    from linalg_tpu.models.gpt import (GPTConfig, gpt_decode_chunk,
                                       gpt_prefill, init_gpt_params)
    from linalg_tpu.models.speculative import (
        gpt_generate_speculative, gpt_generate_speculative_draft)

    cfg = GPTConfig(vocab_size=65, d_model=512, n_heads=4, n_layers=4,
                    ctx_len=1024)
    params = init_gpt_params(cfg, seed=0)
    rng = np.random.default_rng(5)
    motif = rng.integers(0, 65, size=(24,)).astype(np.int32)
    prompt = np.tile(motif, 6)  # 144 tokens, heavily repetitive
    n_new, K = 512, 8

    def plain():
        import jax
        import jax.numpy as jnp

        logits, cache = gpt_prefill(params, jnp.asarray(prompt[None]), cfg)
        toks, _, _ = gpt_decode_chunk(params, cache, logits,
                                      jax.random.PRNGKey(0), cfg, n_new,
                                      1.0, 1, 0.0)
        return np.asarray(toks)

    plain()  # compile
    t0 = time.perf_counter()
    for _ in range(3):
        plain()
    base = n_new / ((time.perf_counter() - t0) / 3)

    def lookup():
        toks, rounds = gpt_generate_speculative(
            params, cfg, prompt, n_new, n_draft=K, top_k=1, seed=0)
        return rounds

    rounds = lookup()  # compile
    t0 = time.perf_counter()
    for _ in range(3):
        rounds = lookup()
    tps = n_new / ((time.perf_counter() - t0) / 3)
    _emit(f"speculative prompt-lookup K={K}, repetitive prompt, greedy "
          f"{n_new} tokens ({rounds} rounds vs {n_new} plain; plain decode "
          f"{base:.0f} tok/s)", tps, "tok/s", tps / max(base, 1.0))

    def selfdraft():
        toks, rounds = gpt_generate_speculative_draft(
            params, cfg, params, cfg, prompt, n_new, n_draft=4, top_k=1,
            seed=0)
        return rounds

    rounds = selfdraft()  # compile
    t0 = time.perf_counter()
    for _ in range(3):
        rounds = selfdraft()
    tps = n_new / ((time.perf_counter() - t0) / 3)
    _emit(f"speculative self-draft K=4 overhead row, greedy {n_new} "
          f"tokens ({rounds} rounds; plain {base:.0f} tok/s)",
          tps, "tok/s", tps / max(base, 1.0))


SECTIONS = {
    "attention": bench_attention,
    "train": bench_train,
    "train_big": bench_train_big,
    "moe": bench_moe,
    "sampler": bench_sampler,
    "serve": bench_serve,
    "spec_serve": bench_spec_serve,
    "admission": bench_admission,
    "paged": bench_paged,
    "paged_ab": bench_paged_ab,
    "lora": bench_lora,
    "speculative": bench_speculative,
    "quant": bench_quant,
    "gqa": bench_gqa,
    "prefix": bench_prefix,
    "page_cache": bench_page_cache,
    "stream": bench_stream,
    "qr": bench_qr,
}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--all", action="store_true",
                    help="run the whole committed bench surface "
                         "(headline last)")
    ap.add_argument("--only", type=str, default=None,
                    choices=sorted(SECTIONS),
                    help="run one section")
    args = ap.parse_args()
    if args.only:
        SECTIONS[args.only]()
    elif args.all:
        # headline (qr) LAST: the driver parses the final line
        for name in ("attention", "train", "train_big", "moe", "sampler",
                     "serve", "spec_serve", "admission", "paged",
                     "paged_ab", "lora", "speculative", "quant", "gqa",
                     "prefix", "page_cache", "stream", "qr"):
            SECTIONS[name]()
    else:
        bench_qr()


if __name__ == "__main__":
    main()
