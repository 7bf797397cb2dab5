from .tfim import (
    tfim_operator,
    tfim_matvec,
    tfim_zz_diagonal,
    tfim_dense_hamiltonian,
    tfim_sharded_operator,
    tfim_exact_e0,
    tfim_ground_energy,
    tfim_ground_state,
    fidelity_susceptibility,
    tfim_ed_observables,
)

__all__ = [
    "tfim_operator", "tfim_matvec", "tfim_zz_diagonal",
    "tfim_dense_hamiltonian", "tfim_sharded_operator", "tfim_exact_e0",
    "tfim_ground_energy", "tfim_ground_state", "fidelity_susceptibility",
    "tfim_ed_observables",
]
