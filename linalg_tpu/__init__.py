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
