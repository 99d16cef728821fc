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
