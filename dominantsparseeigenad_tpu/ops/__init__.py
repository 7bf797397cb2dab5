from .operators import (
    LinearOperator,
    DenseOperator,
    MatrixFreeOperator,
    TransposedOperator,
    ShiftedOperator,
    DeflatedOperator,
    as_operator,
)
from .lanczos import lanczos, lanczos_eigh, power_iteration, LanczosResult
from .cg import cg, solve_spd, solve_deflated, solve_general
from .eigh import dominant_eigh, EighOptions
from .eig import dominant_eig, EigOptions
from .sparse import COOOperator, BellOperator, random_bell_operator
from .pallas_spmv import bell_spmv
from .decomp import eigh_safe, svd_safe

__all__ = [
    "LinearOperator", "DenseOperator", "MatrixFreeOperator",
    "TransposedOperator", "ShiftedOperator", "DeflatedOperator",
    "as_operator",
    "lanczos", "lanczos_eigh", "power_iteration", "LanczosResult",
    "cg", "solve_spd", "solve_deflated", "solve_general",
    "dominant_eigh", "EighOptions", "dominant_eig", "EigOptions",
    "COOOperator", "BellOperator", "random_bell_operator", "bell_spmv",
    "eigh_safe", "svd_safe",
]
