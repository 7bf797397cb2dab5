"""Differentiable generalized symmetric-definite eigensolver:
``A x = lam B x`` with Hermitian ``A`` and Hermitian-positive-definite
``B`` (overlap/mass-matrix problems).

North-star addition (the reference handles the standard problem only):
the forward is :func:`~.lobpcg.lobpcg_eigh_general` — B-metric LOBPCG,
one A- and one B-blocked matvec per iteration, optionally
preconditioned — and derivatives come from the implicit-function
theorem on the pencil, differentiable to arbitrary order w.r.t. the
parameters of BOTH operators.

IFT tangent rule (block, B-orthonormal ``V``: ``V^H B V = I``):

    d lam_i  = v_i^H (dA - lam_i dB) v_i
    in-block: c_ji = v_j^H (dA - lam_i dB) v_i / (lam_i - lam_j), j != i
              c_ii = -1/2 v_i^H dB v_i          (B-normalization gauge)
    out-of-block: (A - lam_i B) w_i = -(I - B V V^H)(dA - lam_i dB) v_i
              solved on the B-orthogonal complement of span(V) by a
              deflated CG (the pencil restriction is definite for
              extremal eigenvalues), wrapped in ``custom_linear_solve``
              so the rule composes to any derivative order.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from .cg import _hermitian_linear_solve, cg
from .lanczos import LanczosInfo
from .operators import as_operator, hmatmul as _mm, tol_floor


def solve_deflated_pencil(a, b, lam, v, bv, rhs, *, definite_sign=1.0,
                          tol: float = 1e-8, maxiter: int | None = None,
                          precond=None):
    """Differentiable solve of the B-deflated pencil system

        P_L (A - lam B) P_R x = P_L rhs,
        P_R = I - V (B V)^H  (B-orthogonal projector onto span(V)^perp_B),
        P_L = P_R^H = I - (B V) V^H,

    returning the unique solution with ``(B V)^H x = 0``.  The projected
    operator is Hermitian, and positive semidefinite (after
    ``definite_sign``) when ``lam`` is the extremal pencil eigenvalue,
    so plain CG applies.
    """
    sign = jnp.asarray(definite_sign, dtype=rhs.dtype)

    def proj_r(x):
        return x - _mm(v, _mm(bv.conj().T, x))

    def proj_l(y):
        return y - _mm(bv, _mm(v.conj().T, y))

    def mv(x):
        px = proj_r(x)
        y = a.matvec(px) - lam * b.matvec(px)
        return sign * proj_l(y)

    def solver(matvec, r):
        r = proj_l(r)
        kw = {}
        if precond is not None:
            # Deflated-PCG sandwich: keep the preconditioned residual in
            # the projected subspace.
            kw["precond"] = lambda rr: proj_r(precond(rr))
        return proj_r(cg(matvec, r, tol=tol, maxiter=maxiter, **kw))

    x = _hermitian_linear_solve(mv, sign * proj_l(rhs), solver)
    return proj_r(x)


@dataclasses.dataclass(frozen=True)
class EighGenOptions:
    """Static configuration for :func:`dominant_eigh_gen`."""

    r: int = 4
    maxiter: int = 200
    tol: float = 1e-8
    solve_tol: float = 1e-8
    solve_maxiter: int | None = None
    seed: int = 0
    gap_eps: float = 1e-12
    precond: object = None
    with_info: bool = False


def _gen_forward(a, b, extreme: str, opts: EighGenOptions):
    from .eigh import _columnwise
    from .lobpcg import lobpcg_eigh_general
    precond = opts.precond
    if precond is not None:
        # Public convention mirrors dominant_eigh_multi: VECTOR
        # preconditioners; the LOBPCG forward wants the (N, r) block.
        precond = partial(_columnwise, opts.precond)
    return lobpcg_eigh_general(
        a, b, opts.r, extreme=extreme, maxiter=opts.maxiter, tol=opts.tol,
        key=jax.random.PRNGKey(opts.seed), precond=precond,
        with_info=opts.with_info)


def _gen_tangents(a, b, da, db, lams, v, extreme, opts):
    """Block IFT tangents for the pencil; HIGHEST-precision contractions."""
    _, dav = jax.jvp(lambda o: o.matmat(v), (a,), (da,))
    _, dbv = jax.jvp(lambda o: o.matmat(v), (b,), (db,))
    lam_cols = lams[None, :].astype(v.dtype)
    m = _mm(v.conj().T, dav - dbv * lam_cols)   # m[j, i] = v_j^H (dA - lam_i dB) v_i
    dlams = jnp.diagonal(m)
    if jnp.iscomplexobj(dlams) and not jnp.iscomplexobj(lams):
        dlams = jnp.real(dlams)

    gap = lams[None, :] - lams[:, None]          # gap[j, i] = lam_i - lam_j
    f = gap / (gap * gap + opts.gap_eps ** 2)
    f = f * (1.0 - jnp.eye(opts.r, dtype=lams.dtype))
    c = f * m
    # B-normalization gauge: v^H B v = 1 fixes the diagonal coefficient.
    c = c + jnp.diag(-0.5 * jnp.diagonal(_mm(v.conj().T, dbv)))
    dv_in = _mm(v, c)

    bv = b.matmat(v)
    # (I - BV V^H) annihilates B v_i, so the dlam_i B v_i term of the
    # full tangent RHS drops out after the left projection.
    rhs = -(dav - dbv * lam_cols)
    sign = +1.0 if extreme == "min" else -1.0

    def one(lam_i, rhs_i):
        return solve_deflated_pencil(a, b, lam_i, v, bv, rhs_i,
                                     definite_sign=sign,
                                     tol=opts.solve_tol,
                                     maxiter=opts.solve_maxiter,
                                     precond=opts.precond)

    dv_out = jax.vmap(one, in_axes=(0, 1), out_axes=1)(lams, rhs)
    from .eigh import _pivot_phase_project
    return dlams, _pivot_phase_project(v, dv_in + dv_out)


@partial(jax.custom_jvp, nondiff_argnums=(2, 3))
def _dominant_eigh_gen(a, b, extreme: str, opts: EighGenOptions):
    return _gen_forward(a, b, extreme, opts)


@_dominant_eigh_gen.defjvp
def _dominant_eigh_gen_jvp(extreme, opts, primals, tangents):
    a, b = primals
    da, db = tangents
    out = _dominant_eigh_gen(a, b, extreme, opts)
    lams, v = out[0], out[1]
    dlams, dv = _gen_tangents(a, b, da, db, lams, v, extreme, opts)
    if opts.with_info:
        # Zero tangents with the EXACT pytree type of the primal info.
        dinfo = jax.tree.map(jnp.zeros_like, out[2])
        return out, (dlams, dv, dinfo)
    return out, (dlams, dv)


def dominant_eigh_gen(a, b, r: int = 4, *, extreme: str = "min",
                      maxiter: int = 200, tol: float = 1e-8,
                      solve_tol: float | None = None,
                      solve_maxiter: int | None = None, seed: int = 0,
                      gap_eps: float = 1e-12, precond=None,
                      with_info: bool = False):
    """Top-r extremal eigenpairs of the generalized pencil
    ``A x = lam B x`` (``B`` SPD), differentiable to arbitrary order
    w.r.t. the pytree parameters of BOTH operators.

    Parameters mirror :func:`~.eigh.dominant_eigh_multi`; ``maxiter`` is
    the LOBPCG iteration budget (each iteration = one ``A`` + one ``B``
    blocked matvec), ``precond`` an approximate inverse of
    ``(A - sigma B)`` in the VECTOR convention ``z = M^{-1} r`` (same as
    ``dominant_eigh_multi``; it is vmapped over the residual block for
    the forward) — used by the LOBPCG forward AND by the deflated
    tangent solves, so gradients get the same acceleration.  Pass a
    stable callable (jit-static, keyed by identity).

    Returns ``(lams, V)`` with ``V^H B V = I`` (B-orthonormal), plus a
    :class:`~.lanczos.LanczosInfo` when ``with_info=True`` (residual =
    ``max_i ||A v_i - lam_i B v_i|| / max(|lam_i|, 1)``, effective_k =
    LOBPCG iterations run).
    """
    a = as_operator(a)
    b = as_operator(b)
    if extreme not in ("min", "max"):
        raise ValueError(f"extreme must be min|max, got {extreme!r}")
    opts = EighGenOptions(
        r=int(r), maxiter=int(maxiter), tol=float(tol),
        solve_tol=float(tol if solve_tol is None else solve_tol),
        solve_maxiter=None if solve_maxiter is None else int(solve_maxiter),
        seed=int(seed), gap_eps=float(gap_eps), precond=precond,
        with_info=bool(with_info))
    out = _dominant_eigh_gen(a, b, extreme, opts)
    if with_info:
        lams, v, linfo = out
        return lams, v, LanczosInfo(effective_k=linfo.iterations,
                                    residual=linfo.residual,
                                    converged=linfo.converged)
    return out
