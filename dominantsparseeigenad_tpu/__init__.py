"""dominantsparseeigenad_tpu — TPU-native differentiable dominant
eigensolver framework.

Brand-new JAX/XLA/Pallas/pjit implementation with the capabilities of the
PyTorch reference ``buwantaiji/DominantSparseEigenAD`` (Xie, Liu & Wang,
PRB 101, 245139 (2020), arXiv:2001.04121): dominant eigenpairs of symmetric
and general square operators — dense, sparse, matrix-free, or sharded across
a TPU mesh — with implicit-function-theorem derivative rules that compose to
arbitrary order, so energies, fidelity susceptibilities and specific heats
differentiate exactly through the eigensolver.
"""

from .ops import (
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
    lanczos,
    lanczos_adaptive,
    lanczos_eigh,
    power_iteration,
    LanczosResult,
    LanczosInfo,
    cg,
    cg_info,
    bicgstab,
    gmres,
    minres,
    solve_spd,
    solve_symmetric,
    solve_deflated,
    solve_deflated_info,
    solve_general,
    dominant_eigh,
    dominant_eigh_multi,
    lobpcg_eigh,
    lobpcg_eigh_general,
    LobpcgInfo,
    dominant_eigh_gen,
    refine_eigenpair,
    EighOptions,
    EighMultiOptions,
    dominant_eig,
    dominant_eig_multi,
    EigOptions,
    PowerInfo,
    COOOperator,
    CSROperator,
    BCOOOperator,
    BellOperator,
    random_bell_operator,
    bell_spmv,
    eigh_safe,
    eigh_safe_truncated,
    svd_safe,
    svd_safe_truncated,
    dominant_svd,
    lanczos_restarted,
    interior_eigh,
    spectral_slice,
    spectral_bounds,
    spectral_density,
    trace_function,
    logdet,
    SliceInfo,
    fidelity_susceptibility,
    energy_curvature,
    spectral_function,
    RestartState,
)

__version__ = "0.1.0"
