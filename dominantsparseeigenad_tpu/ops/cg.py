"""Differentiable (deflated) linear solves — the backward-pass workhorse.

Rebuild of the reference's ``CG.py``, which wraps conjugate-gradient in a
``torch.autograd.Function`` so that the IFT backward of the eigensolver is
itself differentiable (that is what makes the reference's second derivatives
— fidelity susceptibility, specific heat — work).

The TPU-native equivalent is ``jax.lax.custom_linear_solve``:

* gradients of the *solution* w.r.t. ``b`` and the operator parameters are
  computed by **additional solves with the same solver** (never by
  differentiating through the CG iterations), exactly mirroring the
  reference's trick where ``CG.backward`` calls CG again and emits the
  operator adjoint as a lazy rank-1 term;
* it is differentiable to **arbitrary order** and transpose-aware, which
  ``jax.custom_vjp`` is not — this is why the whole framework builds on
  JVP-style rules (see ``eigh.py``).

The inner iteration is a ``lax.while_loop`` (static shapes, early exit on
residual tolerance) — legal because no gradient ever traverses it.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from .operators import as_operator, tol_floor, hdot


def _project_out(V: jax.Array, x: jax.Array) -> jax.Array:
    """x - V <V, x>; V is (N,) or (N, r) with orthonormal columns
    (conjugating inner products, so complex Hermitian operators work)."""
    if V.ndim == 1:
        return x - V * hdot(V, x)
    return x - jnp.matmul(
        V, jnp.matmul(V.conj().T, x,
                      precision=jax.lax.Precision.HIGHEST),
        precision=jax.lax.Precision.HIGHEST)


def _cg_loop(matvec, b, x0, tol, atol, maxiter, precond):
    """Shared PCG while_loop: returns ``(x, iterations)`` — the single
    implementation behind :func:`cg` and :func:`cg_info` (they had
    drifted copies of this body before round 4)."""
    if maxiter is None:
        maxiter = 10 * b.shape[-1]
    x0 = jnp.zeros_like(b) if x0 is None else x0
    M = (lambda r: r) if precond is None else precond

    r0 = b - matvec(x0)
    z0 = M(r0)
    bnorm2 = hdot(b, b).real
    tol = tol_floor(tol, b.dtype)   # dtype-reachable target
    target2 = jnp.maximum(tol * tol * bnorm2, atol * atol)

    def cond(state):
        _, r, _, _, _, it = state
        return jnp.logical_and(hdot(r, r).real > target2, it < maxiter)

    def body(state):
        x, r, z, p, rz, it = state
        with jax.named_scope("cg_matvec"):
            ap = matvec(p)
        denom = hdot(p, ap).real
        alpha = rz / jnp.where(denom == 0, 1.0, denom)
        alpha = jnp.where(denom == 0, 0.0, alpha)
        x = x + alpha * p
        r = r - alpha * ap
        z = M(r)
        rz_new = hdot(r, z).real
        beta = rz_new / jnp.where(rz == 0, 1.0, rz)
        p = z + beta * p
        return (x, r, z, p, rz_new, it + 1)

    state0 = (x0, r0, z0, z0, hdot(r0, z0).real,
              jnp.zeros((), jnp.int32))
    x, _, _, _, _, it = lax.while_loop(cond, body, state0)
    return x, it


def cg(matvec: Callable, b: jax.Array, *, x0: jax.Array | None = None,
       tol: float = 1e-7, atol: float = 0.0, maxiter: int | None = None,
       precond: Callable | None = None) -> jax.Array:
    """(Preconditioned) conjugate gradient for SPD ``matvec``.

    Equivalent of the reference's ``CG_torch`` plain-solver function
    (reference ``CG.py``), with a ``lax.while_loop`` instead of a Python
    loop so it compiles to a single XLA computation.  ``precond`` is an
    optional SPD approximate-inverse application ``z = M^{-1} r`` (e.g. a
    Jacobi/diagonal preconditioner) — the reference has no preconditioning
    at all; near-critical spectra (small gaps) are where it pays.
    """
    x, _ = _cg_loop(matvec, b, x0, tol, atol, maxiter, precond)
    return x


def cg_info(matvec: Callable, b: jax.Array, *,
            x0: jax.Array | None = None, tol: float = 1e-7,
            atol: float = 0.0, maxiter: int | None = None,
            precond: Callable | None = None):
    """Like :func:`cg` but returns ``(x, iterations, relative_residual)``
    — observability the reference never exposes.  Forward-only (use the
    plain :func:`cg`/``solve_*`` wrappers inside differentiated code).
    Takes exactly :func:`cg`'s keyword signature."""
    x, it = _cg_loop(matvec, b, x0, tol, atol, maxiter, precond)
    res = jnp.linalg.norm(b - matvec(x)) / jnp.linalg.norm(b)
    return x, it, res


def minres(matvec: Callable, b: jax.Array, *, x0: jax.Array | None = None,
           tol: float = 1e-7, maxiter: int | None = None,
           precond: Callable | None = None) -> jax.Array:
    """MINRES for a symmetric (possibly **indefinite**) operator.

    Paige–Saunders: Lanczos recurrence + Givens-rotation QR of the
    tridiagonal, as a ``lax.while_loop``.  The eigensolver backward uses
    CG when the deflated restriction is definite (extremal eigenpairs);
    MINRES covers the indefinite cases (interior/shifted systems) the
    reference's CG-only backward cannot (SURVEY.md §7 design stance 2).

    ``precond`` is an SPD approximate-inverse application ``y = M^{-1} r``
    (the operator itself may stay indefinite): the standard
    preconditioned variant runs the Lanczos recurrence on the
    ``M^{-1}``-preconditioned residuals with ``beta = sqrt(r^H M^{-1} r)``
    and minimizes the residual in the ``M^{-1}`` norm — algebraically
    equivalent to MINRES on ``M^{-1/2} A M^{-1/2}``.  ``M^{-1}`` must be
    SPD (an indefinite preconditioner breaks ``sqrt(r^H M^{-1} r)``);
    the :mod:`~.precond` constructors are SPD by construction, including
    under indefinite shifts.  With ``precond=None`` this is EXACTLY the
    unpreconditioned recurrence (``M = I``).
    """
    if maxiter is None:
        maxiter = 10 * b.shape[-1]
    M = (lambda r: r) if precond is None else precond
    x0 = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x0)
    yv = M(r)
    beta1 = jnp.sqrt(jnp.maximum(jnp.real(hdot(r, yv)), 0.0))
    tol = tol_floor(tol, b.dtype)   # dtype-reachable target
    # Convergence in the M^{-1} norm phibar tracks; for M = I and
    # x0 = 0 this is the historical tol * ||b|| target exactly.
    target = tol * (jnp.linalg.norm(b) if precond is None else beta1)
    zero = jnp.zeros_like(beta1)

    # Carry: x, r1, r2 (scaled Lanczos vecs), yv = M^{-1} r2,
    #        w, w2 (update dirs), oldb, beta, dbar, epsln, cs, sn,
    #        phibar, it
    state0 = (x0, r, r, yv, jnp.zeros_like(b), jnp.zeros_like(b),
              zero, beta1, zero, zero, -jnp.ones_like(beta1), zero,
              beta1, jnp.zeros((), jnp.int32))

    def cond(s):
        phibar, it = s[-2], s[-1]
        return jnp.logical_and(phibar > target, it < maxiter)

    def body(s):
        (x, r1, r2, yv, w, w2, oldb, beta, dbar, epsln, cs, sn, phibar,
         it) = s
        v = yv / beta
        y = matvec(v)
        y = y - jnp.where(it >= 1, beta / jnp.where(oldb == 0, 1.0, oldb),
                          0.0) * r1
        # <v, A v> is real for symmetric/Hermitian operators; keep the
        # rotation state real so the carry dtypes stay stable.
        alfa = jnp.real(hdot(v, y))
        y = y - (alfa / beta) * r2
        r1, r2 = r2, y
        yv = M(y)
        oldb = beta
        beta_new = jnp.sqrt(jnp.maximum(jnp.real(hdot(y, yv)), 0.0))

        oldeps = epsln
        delta = cs * dbar + sn * alfa
        gbar = sn * dbar - cs * alfa
        epsln = sn * beta_new
        dbar = -cs * beta_new
        gamma = jnp.sqrt(gbar * gbar + beta_new * beta_new)
        gamma = jnp.maximum(gamma, jnp.finfo(b.dtype).tiny)
        cs = gbar / gamma
        sn = beta_new / gamma
        phi = cs * phibar
        phibar = sn * phibar

        w1, w2_new = w2, w
        w_new = (v - oldeps * w1 - delta * w2_new) / gamma
        x = x + phi * w_new
        return (x, r1, r2, yv, w_new, w2_new, oldb, beta_new, dbar,
                epsln, cs, sn, phibar, it + 1)

    out = lax.while_loop(cond, body, state0)
    return out[0]


def bicgstab(matvec: Callable, b: jax.Array, *,
             x0: jax.Array | None = None, tol: float = 1e-7,
             atol: float = 0.0, maxiter: int | None = None) -> jax.Array:
    """BiCGStab (van der Vorst) for a general square ``matvec``.

    Krylov solver for non-symmetric systems at κ(A) cost — unlike CGNR,
    which squares the condition number (VERDICT r1 weak #5: the
    transfer-matrix IFT systems at larger χ near criticality are not
    well-gapped enough for normal equations).  Needs only the forward
    matvec; two applications per iteration; ``lax.while_loop`` with
    residual-based exit and eps-scaled breakdown guards (near-zero ρ or
    ⟨r̂,v⟩ — not just exactly-zero — freezes the iteration instead of
    letting β/α overflow; a non-finite update is discarded and the last
    good iterate returned).
    """
    if maxiter is None:
        maxiter = 10 * b.shape[-1]
    x0 = jnp.zeros_like(b) if x0 is None else x0
    r0 = b - matvec(x0)
    tol = tol_floor(tol, b.dtype)   # dtype-reachable target
    target2 = jnp.maximum(tol * tol * hdot(b, b).real, atol * atol)
    one = jnp.ones((), b.dtype)
    # scipy-style near-breakdown threshold: |rho| <= eps*||rhat||*||r||
    # (exact-zero tests let |rho| ~ eps^2 slip through, beta ~ 1/rho
    # overflows, and NaN r would end the loop "successfully" with a
    # garbage x — fatal for the IFT tangent systems this backs).
    eps = jnp.finfo(jnp.finfo(b.dtype).dtype).eps
    rhat_norm = jnp.linalg.norm(r0)

    # carry: x, r, rhat, p, v, rho, alpha, omega, stop, it
    state0 = (x0, r0, r0, jnp.zeros_like(b), jnp.zeros_like(b),
              one, one, one, jnp.zeros((), jnp.bool_),
              jnp.zeros((), jnp.int32))

    def cond(s):
        _, r, *_, stop, it = s
        return jnp.logical_and(
            jnp.logical_and(hdot(r, r).real > target2, ~stop),
            it < maxiter)

    def body(s):
        x, r, rhat, p, v, rho, alpha, omega, stop, it = s
        rho_new = hdot(rhat, r)
        broke = jnp.abs(rho_new) <= eps * rhat_norm * jnp.linalg.norm(r)
        beta = jnp.where(broke, 0.0,
                         (rho_new / jnp.where(broke, one, rho))
                         * (alpha / jnp.where(omega == 0, one, omega)))
        p_new = r + beta * (p - omega * v)
        with jax.named_scope("bicgstab_matvec"):
            v_new = matvec(p_new)
        denom = hdot(rhat, v_new)
        broke = jnp.logical_or(
            broke,
            jnp.abs(denom) <= eps * rhat_norm * jnp.linalg.norm(v_new))
        alpha_new = jnp.where(broke, 0.0,
                              rho_new / jnp.where(broke, one, denom))
        ss = r - alpha_new * v_new
        with jax.named_scope("bicgstab_matvec"):
            t = matvec(ss)
        tt = hdot(t, t)
        omega_new = jnp.where(tt.real == 0, 0.0,
                              hdot(t, ss) / jnp.where(tt == 0, one, tt))
        x_new = x + alpha_new * p_new + omega_new * ss
        r_new = ss - omega_new * t
        # Non-finite step (overflow slipped past the guards): discard it
        # and stop on the last good iterate rather than letting
        # NaN > target2 = False end the loop with corrupted state.
        bad = ~jnp.isfinite(hdot(r_new, r_new).real)
        x_new = jnp.where(bad, x, x_new)
        r_new = jnp.where(bad, r, r_new)
        stop = jnp.logical_or(jnp.logical_or(broke, bad), omega_new == 0)
        return (x_new, r_new, rhat, p_new, v_new, rho_new, alpha_new,
                omega_new, stop, it + 1)

    x, *_ = lax.while_loop(cond, body, state0)
    return x


def gmres(matvec: Callable, b: jax.Array, *,
          x0: jax.Array | None = None, tol: float = 1e-7,
          atol: float = 0.0, restart: int = 32,
          maxiter: int | None = None) -> jax.Array:
    """Restarted GMRES(m) for a general square ``matvec``.

    Complements :func:`bicgstab` for non-symmetric systems: GMRES's
    residual is monotonically non-increasing within a cycle (no BiCGStab
    breakdown modes), at the cost of storing an ``(m+1, N)`` Krylov basis
    per cycle.  TPU-shaped: the Arnoldi orthogonalization is two batched
    matmuls against the full basis block per step (MXU work, like
    ``lanczos``'s reorthogonalization), the per-cycle least-squares
    problem is a static ``(m+1, m)`` ``lstsq``, and the outer restart
    loop is a ``lax.while_loop`` on the true residual.

    ``maxiter`` bounds the total number of inner (Arnoldi) steps; the
    default matches the other solvers' ``10 * N`` budget.
    """
    from .lanczos import arnoldi_step

    n = b.shape[-1]
    m = max(1, min(int(restart), n))
    if maxiter is None:
        maxiter = 10 * n
    max_cycles = -(-int(maxiter) // m)  # ceil
    x0 = jnp.zeros_like(b) if x0 is None else x0
    dtype = b.dtype
    real_dtype = jnp.finfo(dtype).dtype
    tol = tol_floor(tol, b.dtype)   # dtype-reachable target
    target2 = jnp.maximum(tol * tol * hdot(b, b).real, atol * atol)
    tiny = jnp.finfo(real_dtype).tiny

    def cond(s):
        _, r, it = s
        return jnp.logical_and(hdot(r, r).real > target2,
                               it < max_cycles)

    def body(s):
        x, r, it = s
        beta = jnp.linalg.norm(r)
        v0 = r / jnp.maximum(beta, tiny)
        basis0 = jnp.zeros((m + 1, n), dtype).at[0].set(v0)
        h0 = jnp.zeros((m + 1, m), dtype)

        def arnoldi(carry, j):
            return arnoldi_step(matvec, *carry, j), None

        (basis, h), _ = lax.scan(arnoldi, (basis0, h0), jnp.arange(m))
        rhs = jnp.zeros((m + 1,), dtype).at[0].set(beta.astype(dtype))
        y, *_ = jnp.linalg.lstsq(h, rhs)
        x = x + jnp.matmul(basis[:m].T, y,
                           precision=jax.lax.Precision.HIGHEST)
        # Residual via the Arnoldi relation A V_m y = V_{m+1} (H y):
        # no extra matvec per cycle (exact to the factorization's
        # round-off, which is where the residual lives anyway).
        r = r - jnp.matmul(basis.T, h @ y,
                           precision=jax.lax.Precision.HIGHEST)
        return x, r, it + 1

    x, _, _ = lax.while_loop(
        cond, body, (x0, b - matvec(x0), jnp.zeros((), jnp.int32)))
    return x


def _hermitian_linear_solve(matvec: Callable, b: jax.Array,
                            solver: Callable) -> jax.Array:
    """``custom_linear_solve`` for a Hermitian ``matvec``.

    Real dtypes use ``symmetric=True``.  Complex Hermitian operators have
    ``A^T = conj(A) != A``, so the transpose solves JAX issues for reverse
    -mode/higher-order AD need the identity
    ``A^T x = b  <=>  x = conj(A^{-1} conj(b))`` supplied explicitly —
    with ``symmetric=True`` the second derivative would be silently wrong.
    """
    if jnp.iscomplexobj(b):
        return lax.custom_linear_solve(
            matvec, b,
            solve=lambda mv, rhs: solver(matvec, rhs),
            transpose_solve=lambda mv, rhs: jnp.conj(
                solver(matvec, jnp.conj(rhs))))
    return lax.custom_linear_solve(
        matvec, b, solve=lambda mv, rhs: solver(mv, rhs), symmetric=True)


def solve_symmetric(matvec: Callable, b: jax.Array, *, tol: float = 1e-7,
                    maxiter: int | None = None) -> jax.Array:
    """Differentiable symmetric-indefinite solve: MINRES wrapped in
    ``custom_linear_solve`` (same arbitrary-order machinery as
    :func:`solve_spd`)."""
    solver = partial(minres, tol=tol, maxiter=maxiter)
    return _hermitian_linear_solve(matvec, b, lambda mv, rhs: solver(mv, rhs))


def solve_spd(matvec: Callable, b: jax.Array, *, tol: float = 1e-7,
              maxiter: int | None = None) -> jax.Array:
    """Differentiable SPD solve: CG wrapped in ``custom_linear_solve``.

    ``matvec`` must be linear in its argument; any closed-over arrays
    (operator parameters, shifts, deflation vectors) get gradients via
    ``custom_linear_solve``'s built-in JVP — to arbitrary order.
    """
    solver = partial(cg, tol=tol, maxiter=maxiter)
    return _hermitian_linear_solve(matvec, b, lambda mv, rhs: solver(mv, rhs))


def solve_deflated(op, lam: jax.Array, V: jax.Array, b: jax.Array, *,
                   definite_sign: float | jax.Array = 1.0,
                   tol: float = 1e-7, maxiter: int | None = None,
                   method: str = "cg",
                   precond: Callable | None = None) -> jax.Array:
    """Differentiable solve of ``P (A - lam I) P x = P b`` on ``span(V)^⊥``.

    This is the core operation of the eigensolver backward/JVP (reference
    ``CG.py``: CG on ``(I-vv^T)(A-λI)(I-vv^T)``).  ``V`` holds the
    eigenvector(s) being deflated — (N,) for the reference's rank-1 case,
    (N, r) for block deflation of clustered eigenvalues (our extension).

    ``definite_sign`` makes the restricted operator positive definite for
    CG: +1 when ``lam`` is the algebraic minimum (A - λI ⪰ 0 on V⊥),
    -1 when it is the maximum (solve λI - A instead).  The returned x still
    satisfies the original (unsigned) equation.

    ``method="minres"`` solves the (possibly indefinite) restriction with
    MINRES instead — needed when ``lam`` is an interior eigenvalue, where
    no sign makes the deflated operator definite.  ``definite_sign`` is
    then ignored.

    The solution is the unique one orthogonal to ``span(V)``.
    """
    if method not in ("cg", "minres"):
        raise ValueError(f"method must be cg|minres, got {method!r}")
    op = as_operator(op)
    if method == "minres":
        definite_sign = 1.0
    sign = jnp.asarray(definite_sign, dtype=b.dtype)

    def deflated_mv(x):
        px = _project_out(V, x)
        y = op.matvec(px) - lam * px
        return sign * _project_out(V, y)

    if precond is not None:
        # Project the preconditioner so it maps V-perp to V-perp (the
        # standard deflated sandwich P M P) — for BOTH solvers: the
        # projected M is PSD with null space exactly span(V), which the
        # deflated recurrences never touch, so CG's and preconditioned
        # MINRES's SPD-on-the-working-subspace contracts hold.
        base = cg if method == "cg" else minres

        def inner(mv, r, **kw):
            return base(mv, r,
                        precond=lambda rr: _project_out(V, precond(rr)),
                        **kw)
    else:
        inner = cg if method == "cg" else minres

    def solver(mv, r):
        # The deflated operator is singular on span(V).  The solves issued
        # by custom_linear_solve's JVP/transpose rules can receive an rhs
        # with a span(V) component (e.g. an eigenvector cotangent parallel
        # to v) — project it onto the range first, or CG divides by a
        # round-off-sized curvature and diverges.  Projecting implements
        # the pseudo-inverse restricted to span(V)^⊥, which is exactly the
        # IFT tangent space.
        r = _project_out(V, r)
        return _project_out(V, inner(mv, r, tol=tol, maxiter=maxiter))

    rhs = sign * _project_out(V, b)
    x = _hermitian_linear_solve(deflated_mv, rhs, solver)
    # Keep x exactly in V⊥ (CG preserves it in exact arithmetic; re-project
    # to stop round-off leaking a span(V) component into downstream grads).
    return _project_out(V, x)


def solve_deflated_info(op, lam: jax.Array, V: jax.Array, b: jax.Array, *,
                        definite_sign: float | jax.Array = 1.0,
                        tol: float = 1e-7, maxiter: int | None = None,
                        precond: Callable | None = None):
    """Forward-only :func:`solve_deflated` that also reports
    ``(iterations, relative_residual)`` of the inner CG — the
    observability hook for detecting a silent maxiter-hit in the IFT
    backward system (pair with
    :func:`~..utils.diagnostics.assert_converged_residual`).

    Returns ``(x, iterations, relative_residual)``.  Use the plain
    :func:`solve_deflated` inside differentiated code.
    """
    op = as_operator(op)
    sign = jnp.asarray(definite_sign, dtype=b.dtype)

    def deflated_mv(x):
        px = _project_out(V, x)
        y = op.matvec(px) - lam * px
        return sign * _project_out(V, y)

    M = None if precond is None else (
        lambda rr: _project_out(V, precond(rr)))
    rhs = sign * _project_out(V, b)
    x, iters, resid = cg_info(deflated_mv, rhs, tol=tol, maxiter=maxiter,
                              precond=M)
    return _project_out(V, x), iters, resid


def solve_general(matvec: Callable, rmatvec: Callable, b: jax.Array, *,
                  tol: float = 1e-7, maxiter: int | None = None,
                  method: str = "bicgstab") -> jax.Array:
    """Differentiable solve for a general (non-symmetric) operator.

    Used by the non-symmetric dominant eigensolver (``eig.py``) where the
    deflated systems involve ``(A - λI)`` and its transpose (reference
    ``eig.py`` backward).  Default solver is :func:`bicgstab` (κ(A) cost;
    the transpose solves ``custom_linear_solve`` issues for reverse-mode/
    higher-order AD run BiCGStab on ``rmatvec``).  ``method="cgnr"`` keeps
    CG on the normal equations ``A^T A x = A^T b`` — unconditionally
    applicable but at squared condition number, useful as a fallback when
    BiCGStab stagnates on wildly non-normal systems.
    """
    if method not in ("bicgstab", "cgnr", "gmres"):
        raise ValueError(
            f"method must be bicgstab|cgnr|gmres, got {method!r}")

    def _cgnr(mv, rmv, rhs):
        # CG needs the Hermitian PSD A^H A, not the complex-symmetric
        # A^T A: take the adjoint of the (bilinear-transpose) rmv.
        # Identity for real dtypes.
        def adj(x):
            return jnp.conj(rmv(jnp.conj(x)))

        def normal_mv(x):
            return adj(mv(x))
        return cg(normal_mv, adj(rhs), tol=tol, maxiter=maxiter)

    if method == "cgnr":
        fwd = lambda mv, rhs: _cgnr(matvec, rmatvec, rhs)
        bwd = lambda mv, rhs: _cgnr(rmatvec, matvec, rhs)
    elif method == "gmres":
        fwd = lambda mv, rhs: gmres(matvec, rhs, tol=tol, maxiter=maxiter)
        bwd = lambda mv, rhs: gmres(rmatvec, rhs, tol=tol, maxiter=maxiter)
    else:
        fwd = lambda mv, rhs: bicgstab(matvec, rhs, tol=tol,
                                       maxiter=maxiter)
        bwd = lambda mv, rhs: bicgstab(rmatvec, rhs, tol=tol,
                                       maxiter=maxiter)

    return lax.custom_linear_solve(matvec, b, solve=fwd,
                                   transpose_solve=bwd)
