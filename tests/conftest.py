"""Test configuration: CPU backend, 8 virtual devices, x64 enabled.

Linear-algebra correctness tests need float64 (reference tolerances of
1e-10/1e-12) and multi-device tests need a virtual mesh; both are CPU-side.
Environment must be set before the first jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# never write machine-feature-pinned CPU AOT entries into the shared cache
os.environ.setdefault("LINALG_TPU_NO_COMPILE_CACHE", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import gc  # noqa: E402

import jax  # noqa: E402
import pytest  # noqa: E402

# The axon sitecustomize force-registers the TPU backend and overwrites
# jax_platforms at interpreter start, so the env var alone is not enough —
# the config update below is what actually pins tests to CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


# Tiering (round-4 verdict item 10): the full suite is the round gate
# (~45-70 min); the local iteration loop is `pytest -m "not slow"`
# (~8-10 min on an idle host). Modules land here when they cost >~3 min
# under the pinned x64/8-device config (compile-heavy Pallas interpret
# runs, multi-device shard_map/pipeline compiles, walkthrough scripts,
# engine integration suites) — measured per-module wall times, round 5.
SLOW_MODULES = {
    "test_alibi", "test_examples", "test_flash", "test_fsdp", "test_gqa",
    "test_lora", "test_models", "test_moe_pipeline", "test_paged",
    "test_parallel", "test_qr_pallas", "test_quant", "test_serve",
    "test_spec_serve", "test_speculative", "test_trainer", "test_window",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    The full suite compiles thousands of XLA:CPU executables; letting them
    accumulate has produced a deterministic SIGSEGV inside
    ``backend_compile_and_load`` ~70% through the run (the dying test
    passes standalone). Modules rarely share jitted functions, so clearing
    per module costs little recompilation and keeps the process footprint
    bounded.
    """
    yield
    jax.clear_caches()
    gc.collect()
