from .operators import (
    LinearOperator,
    DenseOperator,
    MatrixFreeOperator,
    TransposedOperator,
    ShiftedOperator,
    DeflatedOperator,
    SumOperator,
    ScaledOperator,
    ComposedOperator,
    as_operator,
)
from .lanczos import (lanczos, lanczos_adaptive, lanczos_eigh,
                      power_iteration, LanczosResult, LanczosInfo)
from .cg import (cg, cg_info, bicgstab, gmres, minres, solve_spd,
                 solve_symmetric, solve_deflated, solve_deflated_info,
                 solve_general)
from .eigh import (dominant_eigh, dominant_eigh_multi, EighOptions,
                   EighMultiOptions, refine_eigenpair)
from .lobpcg import lobpcg_eigh, lobpcg_eigh_general, LobpcgInfo
from .gen import dominant_eigh_gen, EighGenOptions, solve_deflated_pencil
from .eig import (dominant_eig, dominant_eig_multi, dominant_eig_pair,
                  dominant_eig_spectrum, spectrum_structure, EigOptions,
                  PowerInfo)
from .sparse import (COOOperator, CSROperator, BCOOOperator, BellOperator,
                     random_bell_operator)
from .pallas_spmv import bell_spmm, bell_spmv
from .decomp import (eigh_safe, eigh_safe_truncated, svd_safe,
                     svd_safe_truncated)
from .svd import dominant_svd
from .restart import (lanczos_restarted, RestartState, restart_init,
                      restart_cycle, restart_extract)
from .interior import interior_eigh
from .slicing import (spectral_slice, spectral_bounds, spectral_density,
                      trace_function, logdet, SliceInfo, SliceOptions)
from .observables import fidelity_susceptibility, energy_curvature
from .spectral import spectral_function
from .precond import (block_jacobi_precond, jacobi_precond,
                      operator_diagonal)

__all__ = [
    "LinearOperator", "DenseOperator", "MatrixFreeOperator",
    "TransposedOperator", "ShiftedOperator", "DeflatedOperator",
    "SumOperator", "ScaledOperator", "ComposedOperator",
    "as_operator",
    "lanczos", "lanczos_adaptive", "lanczos_eigh", "power_iteration",
    "LanczosResult", "LanczosInfo",
    "cg", "cg_info", "bicgstab", "gmres", "minres", "solve_spd",
    "solve_symmetric", "solve_deflated", "solve_deflated_info",
    "solve_general",
    "lobpcg_eigh", "lobpcg_eigh_general", "LobpcgInfo",
    "dominant_eigh_gen", "EighGenOptions", "solve_deflated_pencil",
    "dominant_eigh", "dominant_eigh_multi", "refine_eigenpair", "EighOptions",
    "EighMultiOptions", "dominant_eig", "dominant_eig_multi",
    "dominant_eig_pair", "dominant_eig_spectrum", "spectrum_structure",
    "EigOptions", "PowerInfo",
    "COOOperator", "CSROperator", "BCOOOperator", "BellOperator",
    "random_bell_operator",
    "bell_spmv", "bell_spmm",
    "eigh_safe", "eigh_safe_truncated", "svd_safe",
    "svd_safe_truncated", "dominant_svd",
    "lanczos_restarted", "RestartState", "restart_init",
    "restart_cycle", "restart_extract", "interior_eigh",
    "spectral_slice", "spectral_bounds", "spectral_density",
    "trace_function", "logdet",
    "SliceInfo", "SliceOptions",
    "fidelity_susceptibility", "energy_curvature", "spectral_function",
    "jacobi_precond", "block_jacobi_precond", "operator_diagonal",
]
