"""Differentiable spectral functions via resolvent solves.

North-star extension (no reference analogue): the local spectral function

    A_b(omega) = -(1/pi) Im <b| (omega + i eta - H)^{-1} |b>
               = (eta/pi) <b| [(H - omega)^2 + eta^2]^{-1} |b>,

i.e. the Lorentzian-broadened weighted eigenvalue density of a Hermitian
operator seen from a probe vector ``b`` (dynamic structure factors,
local densities of states).  The second identity keeps everything in
**real arithmetic**: one SPD solve of ``(H-omega)^2 + eta^2`` per
frequency — matrix-free (two matvecs per CG iteration), vmapped over the
frequency grid, differentiable to arbitrary order through
``custom_linear_solve`` like the rest of the framework.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .cg import solve_spd
from .operators import as_operator


def spectral_function(op, b: jax.Array, omegas: jax.Array, eta: float, *,
                      tol: float = 1e-8, maxiter: int | None = None
                      ) -> jax.Array:
    """A_b(omega) on a frequency grid for Hermitian ``op``.

    Parameters
    ----------
    op      : Hermitian LinearOperator (or dense symmetric matrix).
    b       : probe vector (need not be normalized).
    omegas  : (m,) frequency grid.
    eta     : Lorentzian broadening (> 0).

    Returns an (m,) array; integrates to ``<b|b>`` over omega as
    eta -> 0.  Differentiable w.r.t. the operator's pytree leaves, ``b``
    and ``omegas``.
    """
    op = as_operator(op)
    real_dtype = jnp.finfo(op.dtype).dtype
    eta = jnp.asarray(eta, dtype=real_dtype)
    # Pin the grid AND the probe to the operator's dtype: a wider grid or
    # probe (e.g. float64 numpy against an f32 operator under x64) would
    # promote the matvec output and break custom_linear_solve's dtype
    # contract inside solve_spd.
    omegas = jnp.asarray(omegas, dtype=real_dtype)
    b = jnp.asarray(b, dtype=op.dtype)

    def one(omega):
        def mv(x):
            hx = op.matvec(x) - omega * x
            return op.matvec(hx) - omega * hx + (eta * eta) * x

        y = solve_spd(mv, b, tol=tol, maxiter=maxiter)
        return (eta / jnp.pi) * jnp.real(jnp.vdot(b, y))

    return jax.vmap(one)(omegas)
