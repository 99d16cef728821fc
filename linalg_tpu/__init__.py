"""linalg_tpu — TPU-native linear algebra + transformer framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of the reference
project BrantleighBunting/linalg: a dense linear-algebra toolkit (QR, SVD,
Gaussian elimination, eigen methods, projections) and a modular transformer
stack with hand-derived backward passes (custom_vjp), culminating in a
character-level GPT trained on TinyShakespeare.

Public linear-algebra API mirrors the reference's ``linalg/__init__.py``
(/root/reference/linalg/__init__.py:41-96). The NN stack lives in
``linalg_tpu.nn`` and models in ``linalg_tpu.models``.
"""

from .ops.elimination import (
    back_substitute,
    forward_eliminate,
    gaussian_solve,
    nullspace_basis_elimination,
    rank_elimination,
    rref,
)
from .utils.numerics import (
    EPS,
    permutation_sign,
    random_nonsingular_qr,
    random_nonsingular_upper,
    scale_tol,
)

__all__ = [
    # linear systems / elimination
    "forward_eliminate",
    "back_substitute",
    "gaussian_solve",
    "rref",
    "rank_elimination",
    "nullspace_basis_elimination",
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
