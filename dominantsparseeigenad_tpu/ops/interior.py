"""Interior eigenpairs via shift-invert — beyond the reference's extremal-
only API.

``interior_eigh(op, sigma)`` returns the eigenpair of a symmetric operator
closest to the shift ``sigma``:

* forward: Lanczos on the shift-inverted operator ``B = (A - sigma)^{-1}``
  (each matvec is an inner MINRES solve — MINRES because ``A - sigma`` is
  indefinite for interior shifts); the extremal eigenvalue of ``B`` with
  the largest magnitude maps back as ``lambda = sigma + 1/mu``;
* derivatives: the same implicit-function-theorem rule as
  :func:`~.eigh.dominant_eigh`, with the deflated solve run by MINRES
  (``solve_deflated(method="minres")``) since no sign makes the deflated
  restriction definite at an interior eigenvalue.  Composes to arbitrary
  order like the rest of the framework.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from .cg import minres, solve_deflated
from .lanczos import lanczos_eigh
from .operators import MatrixFreeOperator, as_operator, hdot


@dataclasses.dataclass(frozen=True)
class InteriorOptions:
    sigma: float = 0.0
    k: int = 64
    inner_tol: float = 1e-10
    inner_maxiter: int = 1000
    tol: float = 1e-8
    maxiter: int | None = None
    seed: int = 0
    # Optional SPD approximate inverse of (A - sigma) applied inside the
    # inner shift-invert MINRES solves AND the derivative's deflated
    # MINRES (e.g. ``jacobi_precond(diag=..., shift=sigma)``).  Static
    # aux data hashed by identity — pass a stable callable.
    precond: object = None


def _forward(op, opts: InteriorOptions):
    sigma = jnp.asarray(opts.sigma, dtype=jnp.finfo(op.dtype).dtype)

    def inv_matvec(inner_op, x):
        return minres(lambda y: inner_op.matvec(y) - sigma * y, x,
                      tol=opts.inner_tol, maxiter=opts.inner_maxiter,
                      precond=opts.precond)

    inv_op = MatrixFreeOperator(inv_matvec, op, dim=op.dim, dtype=op.dtype)
    key = jax.random.PRNGKey(opts.seed)
    k = min(opts.k, op.dim)
    mu_min, v_min, mu_max, v_max = lanczos_eigh(inv_op, k, extreme="both",
                                                key=key)
    take_max = jnp.abs(mu_max) >= jnp.abs(mu_min)
    v = jnp.where(take_max, v_max, v_min)
    v = v / jnp.linalg.norm(v)
    # Rayleigh quotient of A itself (more accurate than sigma + 1/mu).
    lam = jnp.real(hdot(v, op.matvec(v)))
    return lam, v


@partial(jax.custom_jvp, nondiff_argnums=(1,))
def _interior_eigh(op, opts: InteriorOptions):
    return _forward(op, opts)


@_interior_eigh.defjvp
def _interior_eigh_jvp(opts, primals, tangents):
    (op,) = primals
    (dop,) = tangents
    lam, v = _interior_eigh(op, opts)
    _, dAv = jax.jvp(lambda o: o.matvec(v), (op,), (dop,))
    dlam = hdot(v, dAv)
    if jnp.iscomplexobj(dlam) and not jnp.iscomplexobj(lam):
        dlam = jnp.real(dlam)
    rhs = -(dAv - dlam * v)
    dv = solve_deflated(op, lam, v, rhs, method="minres", tol=opts.tol,
                        maxiter=opts.maxiter, precond=opts.precond)
    # Complex phase-gauge correction (same rule as every other
    # eigenvector tangent in the package — this was the one JVP that
    # missed it when the fix landed, leaving phase-sensitive gradients
    # of complex operators silently off; real dtypes: no-op).
    from .eigh import _pivot_phase_project
    dv = _pivot_phase_project(v, dv)
    return (lam, v), (dlam, dv)


def interior_eigh(op, sigma: float, k: int = 64, *,
                  inner_tol: float = 1e-10, inner_maxiter: int = 1000,
                  tol: float = 1e-8, maxiter: int | None = None,
                  seed: int = 0, precond=None):
    """Eigenpair of a symmetric operator closest to ``sigma``.

    Differentiable to arbitrary order w.r.t. the operator's pytree leaves.
    ``sigma`` is an algorithmic (static) parameter.  ``precond`` is an
    optional SPD approximate inverse of ``A - sigma`` applied inside the
    inner shift-invert MINRES solves and the derivative solves —
    ``jacobi_precond(diag=..., shift=sigma)`` is the natural choice for
    diagonally dominated operators (pass a STABLE callable; it rides in
    the jit-static config keyed by identity).

    Returns ``(lam, v)``.
    """
    op = as_operator(op)
    opts = InteriorOptions(
        sigma=float(sigma), k=int(k), inner_tol=float(inner_tol),
        inner_maxiter=int(inner_maxiter), tol=float(tol),
        maxiter=None if maxiter is None else int(maxiter), seed=int(seed),
        precond=precond)
    return _interior_eigh(op, opts)
