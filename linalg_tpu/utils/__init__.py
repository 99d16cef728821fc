from .profiling import StepTimer, trace
from .transfer import pull_pytree, push_pytree
from .numerics import (
    EPS,
    eps_for,
    permutation_sign,
    random_nonsingular_qr,
    random_nonsingular_upper,
    scale_tol,
)

__all__ = [
    "trace",
    "StepTimer",
    "pull_pytree",
    "push_pytree",
    "EPS",
    "eps_for",
    "permutation_sign",
    "random_nonsingular_qr",
    "random_nonsingular_upper",
    "scale_tol",
]
