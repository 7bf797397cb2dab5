"""Solver diagnostics — convergence and numerical-health metrics.

The reference exposes nothing of the kind (SURVEY.md §5: "metrics /
observability: absent").  These helpers compute, as jit-compatible array
programs, the quantities one watches on a Krylov solver:

* Ritz residuals ``||A v - lam v||`` — true convergence measure of an
  eigenpair (independent of the solver's internal tolerances);
* basis orthogonality loss ``||Q^T Q - I||_max`` — the classic Lanczos
  failure mode that full reorthogonalization is meant to suppress;
* CG residual ``||b - A x|| / ||b||`` for solution quality.

Feed the results to :class:`~.logging.JsonlLogger` host-side.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.lanczos import LanczosResult
from ..ops.operators import as_operator


def ritz_residual(op, lam, v) -> jax.Array:
    """||A v - lam v|| / max(1, |lam|) for an eigenpair estimate."""
    op = as_operator(op)
    r = op.matvec(v) - lam * v
    return jnp.linalg.norm(r) / jnp.maximum(1.0, jnp.abs(lam))


def orthogonality_loss(res: LanczosResult) -> jax.Array:
    """max |Q^H Q - I| over the Lanczos basis (0 = perfectly orthogonal).

    Conjugate transpose, not plain transpose: for the complex Hermitian
    bases the engine explicitly supports, Q^T Q of a perfectly
    orthonormal basis is far from identity and the health report would
    flag a healthy run as deorthogonalized (round-4 review)."""
    q = res.basis
    gram = q.conj().T @ q
    return jnp.max(jnp.abs(gram - jnp.eye(gram.shape[0], dtype=gram.dtype)))


def lanczos_health(op, res: LanczosResult) -> dict:
    """Bundle of Lanczos-run health metrics (all jit-compatible arrays)."""
    t = jnp.diag(res.alphas)
    if res.betas.shape[0]:
        t = t + jnp.diag(res.betas, 1) + jnp.diag(res.betas, -1)
    evals, evecs = jnp.linalg.eigh(t)
    vmin = res.basis @ evecs[:, 0]
    vmax = res.basis @ evecs[:, -1]
    return {
        "ortho_loss": orthogonality_loss(res),
        "ritz_residual_min": ritz_residual(op, evals[0], vmin),
        "ritz_residual_max": ritz_residual(op, evals[-1], vmax),
        "breakdowns": jnp.sum(res.betas == 0),
        "ritz_extremes": (evals[0], evals[-1]),
    }


def cg_relative_residual(matvec, b, x) -> jax.Array:
    """||b - A x|| / ||b|| for a linear-solve result."""
    return jnp.linalg.norm(b - matvec(x)) / jnp.linalg.norm(b)


def assert_converged(info, *, name: str = "eigensolver"):
    """``checkify`` guard on a solver's convergence report.

    ``info`` is the :class:`~..ops.lanczos.LanczosInfo` returned by
    ``dominant_eigh(..., with_info=True)`` / ``lanczos_adaptive``.  Wrap
    the calling function with ``jax.experimental.checkify.checkify`` and
    the error surfaces as a host-side exception (``err.throw()``) instead
    of a silently wrong result — the guard the reference never had
    (SURVEY.md §5 sanitizers row).
    """
    from jax.experimental import checkify

    checkify.check(
        info.converged > 0,
        name + " did not converge: residual {res} after {k} steps",
        res=info.residual, k=info.effective_k)


def assert_converged_residual(resid, tol: float, *,
                              name: str = "linear solve"):
    """``checkify`` guard for a residual-vs-tolerance check (e.g. the
    ``relative_residual`` from ``cg_info``/``solve_deflated_info`` — a
    maxiter-hit leaves it above ``tol``)."""
    from jax.experimental import checkify

    checkify.check(resid <= tol,
                   name + " residual {res} above tolerance {tol}",
                   res=resid, tol=jnp.asarray(tol, jnp.result_type(resid)))
