from .numerics import (
    EPS,
    eps_for,
    permutation_sign,
    random_nonsingular_qr,
    random_nonsingular_upper,
    scale_tol,
)

__all__ = [
    "EPS",
    "eps_for",
    "permutation_sign",
    "random_nonsingular_qr",
    "random_nonsingular_upper",
    "scale_tol",
]
