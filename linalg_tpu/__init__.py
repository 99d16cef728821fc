"""linalg_tpu — TPU-native linear algebra + transformer framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of the reference
project BrantleighBunting/linalg: a dense linear-algebra toolkit (QR, SVD,
Gaussian elimination, eigen methods, projections) and a modular transformer
stack with hand-derived backward passes (custom_vjp), culminating in a
character-level GPT trained on TinyShakespeare.

Public linear-algebra API mirrors the reference's ``linalg/__init__.py``
(/root/reference/linalg/__init__.py:41-96), with ``rref`` and ``pca``
additionally re-exported (public-and-tested in the reference's submodules
but left out of its ``__init__``). The NN stack lives in ``linalg_tpu.nn``
and models in ``linalg_tpu.models``.
"""

from .ops.eigen import matrix_power_binary, matrix_power_eig, power_iteration
from .ops.elimination import (
    back_substitute,
    forward_eliminate,
    gaussian_solve,
    nullspace_basis_elimination,
    rank_elimination,
    rref,
)
from .ops.matrix_functions import adj, det, rank_numpy
from .ops.projections import project_onto_colspace
from .ops.qr import (
    householder_qr,
    least_squares_householder_qr,
    least_squares_qr,
    qr,
)
from .ops.svd import pca, svd
from .utils.numerics import (
    EPS,
    permutation_sign,
    random_nonsingular_qr,
    random_nonsingular_upper,
    scale_tol,
)

__all__ = [
    # decompositions
    "qr",
    "householder_qr",
    "svd",
    "pca",
    # matrix utilities
    "det",
    "adj",
    "rank_numpy",
    "matrix_power_eig",
    "matrix_power_binary",
    # linear systems
    "gaussian_solve",
    "least_squares_qr",
    "least_squares_householder_qr",
    "forward_eliminate",
    "back_substitute",
    # iterative methods
    "power_iteration",
    # rank / null-space tools
    "rank_elimination",
    "nullspace_basis_elimination",
    "rref",
    # projections
    "project_onto_colspace",
    # utils
    "EPS",
    "scale_tol",
    "permutation_sign",
    "random_nonsingular_upper",
    "random_nonsingular_qr",
]

__version__ = "0.1.0"

import logging as _logging

_logging.getLogger(__name__).addHandler(_logging.NullHandler())


def _enable_compile_cache() -> None:
    """Point JAX's persistent compilation cache at a shared directory.

    Every fresh process otherwise pays 5-40 s of XLA recompiles for kernels
    an earlier process already built (ROADMAP "cross-process compile cache").
    Opt out with LINALG_TPU_NO_COMPILE_CACHE=1; override the location with
    JAX_COMPILATION_CACHE_DIR (jax honors that env var natively).
    """
    import os

    if os.environ.get("LINALG_TPU_NO_COMPILE_CACHE"):
        return
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # user already configured it; jax reads the env var itself
    try:
        import jax

        def _forced_cpu() -> bool:
            # CPU AOT cache entries are machine-feature-pinned and can
            # SIGILL when reloaded under a different feature set; the
            # cache's value is the slow TPU compiles, so skip it for
            # forced-CPU runs (tests, multichip dryruns). The env var alone
            # is not enough: the axon sitecustomize overwrites JAX_PLATFORMS
            # and tests force CPU via jax.config.update (conftest), so check
            # the live config value too.
            if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
                return True
            plat = getattr(jax.config, "jax_platforms", None) or ""
            return str(plat).startswith("cpu")

        if _forced_cpu():
            return
        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "linalg_tpu", "xla_cache"
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache everything that took meaningful compile time; tiny entries
        # are excluded to keep the directory small.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compile_cache()
