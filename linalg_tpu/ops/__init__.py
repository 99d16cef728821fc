from .elimination import (
    back_substitute,
    forward_eliminate,
    gaussian_solve,
    nullspace_basis_elimination,
    rank_elimination,
    rref,
)

__all__ = [
    "forward_eliminate",
    "back_substitute",
    "gaussian_solve",
    "rref",
    "rank_elimination",
    "nullspace_basis_elimination",
]
