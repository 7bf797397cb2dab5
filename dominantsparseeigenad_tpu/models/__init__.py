from .ising2d import (
    ising_vertex_tensor,
    onsager_free_energy,
    trg_free_energy,
    trg_step,
    ctmrg_environment,
    ctmrg_free_energy,
    transfer_operator,
    transfer_spectral_gap,
    correlation_length,
    ising_observables,
)
from .heisenberg import (
    heisenberg_operator,
    heisenberg_dense,
    heisenberg_ground_energy,
)
from .tfim import (
    tfim_operator,
    tfim_matvec,
    tfim_zz_diagonal,
    tfim_dense_hamiltonian,
    tfim_sharded_operator,
    tfim_exact_e0,
    tfim_energy_gap,
    tfim2d_operator,
    tfim2d_dense_hamiltonian,
    tfim2d_zz_diagonal,
    tfim_ground_energy,
    tfim_ground_state,
    fidelity_susceptibility,
    tfim_ed_observables,
    tfim_observables_sweep,
)

__all__ = [
    "tfim_operator", "tfim_matvec", "tfim_zz_diagonal",
    "tfim_dense_hamiltonian", "tfim_sharded_operator", "tfim_exact_e0",
    "tfim_energy_gap", "tfim2d_operator", "tfim2d_dense_hamiltonian",
    "tfim2d_zz_diagonal",
    "tfim_ground_energy", "tfim_ground_state", "fidelity_susceptibility",
    "tfim_ed_observables", "tfim_observables_sweep",
    "ising_vertex_tensor", "onsager_free_energy", "trg_free_energy",
    "trg_step", "ctmrg_environment", "ctmrg_free_energy",
    "transfer_operator", "transfer_spectral_gap", "correlation_length",
    "ising_observables",
    "heisenberg_operator", "heisenberg_dense", "heisenberg_ground_energy",
]
