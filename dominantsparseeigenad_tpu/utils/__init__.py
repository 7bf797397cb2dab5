from .timing import sync, timeit, trace, TimingResult
from .checkpoint import save_pytree, load_pytree, save_orbax, load_orbax
from .logging import JsonlLogger
from .diagnostics import (
    ritz_residual,
    orthogonality_loss,
    lanczos_health,
    cg_relative_residual,
    assert_converged,
    assert_converged_residual,
)

__all__ = [
    "sync", "timeit", "trace", "TimingResult",
    "save_pytree", "load_pytree", "save_orbax", "load_orbax",
    "JsonlLogger",
    "ritz_residual", "orthogonality_loss", "lanczos_health",
    "cg_relative_residual", "assert_converged",
    "assert_converged_residual",
]
