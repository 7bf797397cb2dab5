"""Polynomial spectrum slicing: all eigenpairs of a symmetric operator
inside an interval [a, b], differentiable.

North-star addition (the reference computes one extremal pair; its only
interior capability is nothing — SURVEY.md §2.1).  EVSL-style recipe,
built TPU-first from pieces this framework already has:

1. **Bound** the spectrum with a short Lanczos run (+ safety margin —
   Chebyshev polynomials explode outside the mapped [-1, 1], so the
   margin errs outward; an over-wide window only weakens the filter).
2. **Filter**: apply ``p(A)`` where ``p`` is the degree-``m`` Chebyshev
   expansion of the indicator function of [a, b], Jackson-damped to kill
   Gibbs oscillation.  The coefficients are closed-form (no quadrature)
   and the apply is a three-term recurrence — ``m`` matvecs per
   application, all streaming/MXU work, no decompositions.
3. **Extract**: the slice's eigenvectors are ``p(A)``'s TOP eigenvectors
   (filter value ~1 inside, ~0 outside), so run the existing
   :func:`~.lobpcg.lobpcg_eigh` block iteration on the filtered operator
   with ``extreme="max"``.
4. **Rayleigh–Ritz on A** in the converged subspace: exact eigenvalues
   of A (the filter only shapes the subspace, never the reported
   values), sorted ascending, with a mask of which pairs actually fall
   inside [a, b].

Derivatives: the returned pairs satisfy ``A v = lam v`` exactly, so the
implicit-function-theorem rule is the interior-block analogue of
``dominant_eigh_multi``'s — identical tangent algebra, but the deflated
solves use MINRES (``(A - lam I)`` restricted to the block complement is
INDEFINITE for interior eigenvalues; no sign makes CG applicable).
Composes to arbitrary order like every other rule in the package.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .cg import solve_deflated
from .lanczos import _tridiagonal, lanczos
from .operators import hmatmul as _mm
from .operators import (MatrixFreeOperator, as_operator, pivot_gauge,
                        tol_floor)


class SliceInfo(NamedTuple):
    """Report for a :func:`spectral_slice` solve (floats/arrays with zero
    tangents — composes with jvp/grad).

    n_inside  : how many of the r returned pairs lie inside [a, b]
    residual  : max TRUE relative residual over the INSIDE pairs only —
                the outside slots are the block's buffer (they approach
                edge-adjacent eigenvalues and need not converge)
    residuals : (r,) per-pair residuals ``||A v_i - lam_i v_i|| /
                max(|lam_i|, 1)`` for individual inspection
    converged : 1.0 if there IS at least one inside pair and every
                inside pair meets ``tol`` (an empty slice is a
                failure, not a vacuous success)
    """

    n_inside: jax.Array
    residual: jax.Array
    residuals: jax.Array
    converged: jax.Array


def spectral_bounds(op, k: int = 30, *, key=None, margin: float = 0.1):
    """Safe enclosure [lo, hi] of the spectrum from a short Lanczos run.

    The extremal Ritz values underestimate the true extremes, so the
    window is padded by ``margin * spread`` plus the final Lanczos
    residual scale — for filtering, too wide is safe, too narrow is not.
    """
    op = as_operator(op)
    if key is None:
        key = jax.random.PRNGKey(1)
    res = lanczos(op, min(int(k), op.dim), key=key, reorth_passes=1)
    evals = jnp.linalg.eigvalsh(_tridiagonal(res.alphas, res.betas))
    lo, hi = evals[0], evals[-1]
    beta_last = (jnp.abs(res.betas[-1]) if res.betas.shape[0]
                 else jnp.abs(res.alphas[0]) * 0)
    pad = margin * (hi - lo) + beta_last + jnp.finfo(evals.dtype).eps
    return lo - pad, hi + pad


def _jackson_damping(degree: int, dtype):
    """Jackson damping factors g_0..g_degree (smooth the Gibbs overshoot
    of a truncated Chebyshev expansion) — shared by the slice filter and
    the KPM density estimator so the two kernels cannot drift apart."""
    m = degree + 1
    arg = jnp.pi / m
    j = jnp.arange(0, degree + 1, dtype=dtype)
    return ((m - j) * jnp.cos(j * arg)
            + jnp.sin(j * arg) / jnp.tan(arg)) / m


def _jackson_indicator_coeffs(a_hat, b_hat, degree: int):
    """Jackson-damped Chebyshev coefficients of the indicator of
    [a_hat, b_hat] ⊂ [-1, 1].  Closed form (EVSL/kernel-polynomial
    method): c_0 = (θa − θb)/π, c_j = 2(sin j·θa − sin j·θb)/(π j),
    with θ = arccos and θa ≥ θb.
    """
    a_hat = jnp.clip(a_hat, -1.0, 1.0)
    b_hat = jnp.clip(b_hat, -1.0, 1.0)
    theta_a = jnp.arccos(a_hat)   # larger angle (a_hat <= b_hat)
    theta_b = jnp.arccos(b_hat)
    j = jnp.arange(1, degree + 1, dtype=theta_a.dtype)
    c0 = (theta_a - theta_b) / jnp.pi
    cj = 2.0 * (jnp.sin(j * theta_a) - jnp.sin(j * theta_b)) / (jnp.pi * j)
    g = _jackson_damping(degree, theta_a.dtype)
    return jnp.concatenate([c0[None], cj]) * g


def _filtered_matvec(params, x):
    """y = p(A) x by the Chebyshev three-term recurrence (coeffs static
    length; A mapped affinely onto [-1, 1])."""
    op, lo, hi, coeffs = (params["op"], params["lo"], params["hi"],
                          params["coeffs"])
    center = (hi + lo) / 2.0
    halfwidth = (hi - lo) / 2.0

    def amap(v):  # Ã = (A - c I)/h
        return (op.matvec(v) - center * v) / halfwidth

    t_prev = x                       # T_0(Ã) x
    t_cur = amap(x)                  # T_1(Ã) x
    acc = coeffs[0] * t_prev + coeffs[1] * t_cur

    def body(jj, carry):
        t_prev, t_cur, acc = carry
        t_next = 2.0 * amap(t_cur) - t_prev
        acc = acc + coeffs[jj] * t_next
        return (t_cur, t_next, acc)

    degree = coeffs.shape[0] - 1
    _, _, acc = lax.fori_loop(2, degree + 1, body, (t_prev, t_cur, acc))
    return acc


@dataclasses.dataclass(frozen=True)
class SliceOptions:
    """Static configuration for :func:`spectral_slice`."""

    r: int = 8
    degree: int = 80
    maxiter: int = 150
    tol: float = 1e-8
    solve_tol: float = 1e-8
    solve_maxiter: int | None = None
    seed: int = 0
    bounds_k: int = 30
    gap_eps: float = 1e-12
    # Optional SPD approximate inverse used by the DERIVATIVE solves
    # only (the deflated (A - lam_i) MINRES systems; the LOBPCG forward
    # runs on the FILTERED operator, whose spectrum an A-based
    # preconditioner does not approximate).  Static aux data hashed by
    # identity — pass a stable callable, e.g.
    # ``jacobi_precond(op, shift=0.5 * (a + b))``.
    solve_precond: object = None


def _slice_forward(op, a: float, b: float, opts: SliceOptions):
    from .lobpcg import lobpcg_eigh

    dtype = op.dtype
    real_dtype = jnp.finfo(dtype).dtype
    lo, hi = spectral_bounds(op, opts.bounds_k,
                             key=jax.random.PRNGKey(opts.seed + 1))
    a_arr = jnp.asarray(a, real_dtype)
    b_arr = jnp.asarray(b, real_dtype)
    center = (hi + lo) / 2.0
    halfwidth = (hi - lo) / 2.0
    coeffs = _jackson_indicator_coeffs(
        (a_arr - center) / halfwidth, (b_arr - center) / halfwidth,
        opts.degree).astype(real_dtype)
    fop = MatrixFreeOperator(
        _filtered_matvec,
        {"op": op, "lo": lo, "hi": hi, "coeffs": coeffs.astype(dtype)},
        dim=op.dim, dtype=dtype, symmetric=True)

    # Top-r eigenvectors of p(A) span the slice (filter ~1 inside, ~0
    # outside).  The filtered residual target reuses the user's tol (floored by
    # lobpcg internally): the filter plateau is quasi-degenerate, so the
    # practical iteration control is ``maxiter`` — the block keeps
    # tightening until the budget runs out or the p-residuals converge,
    # and the TRUE A-residuals reported below are what to trust.
    _, v = lobpcg_eigh(fop, opts.r, extreme="max", maxiter=opts.maxiter,
                       tol=opts.tol, key=jax.random.PRNGKey(opts.seed))

    # Rayleigh-Ritz on A in span(v): exact eigenvalues, ascending.
    av = op.matmat(v)
    bmat = _mm(v.conj().T, av)
    bmat = 0.5 * (bmat + bmat.conj().T)
    theta, y = jnp.linalg.eigh(bmat)
    v = _mm(v, y)
    av = _mm(av, y)
    lams = theta.astype(real_dtype)
    # Pivot-phase gauge (shared helper; the tracked A v image gets the
    # same phase so the residual reports stay consistent).
    v, av = pivot_gauge(v, av)

    resids = jnp.linalg.norm(av - v * lams[None, :].astype(dtype),
                             axis=0).astype(real_dtype)
    resids = resids / jnp.maximum(jnp.abs(lams), 1.0)
    inside = (lams >= a_arr) & (lams <= b_arr)
    n_inside = jnp.sum(inside).astype(real_dtype)
    resid_in = jnp.max(jnp.where(inside, resids, 0.0))
    ref_tol = tol_floor(opts.tol, dtype)
    # An empty slice must NOT report success: converged requires at
    # least one inside pair (a mis-placed window / failed filter would
    # otherwise be vacuously "converged" at residual 0).
    ok = (n_inside > 0) & (resid_in <= ref_tol)
    info = SliceInfo(n_inside=n_inside, residual=resid_in, residuals=resids,
                     converged=ok.astype(real_dtype))
    return lams, v, info


@partial(jax.custom_jvp, nondiff_argnums=(1, 2, 3))
def _spectral_slice(op, a: float, b: float, opts: SliceOptions):
    return _slice_forward(op, a, b, opts)


@_spectral_slice.defjvp
def _spectral_slice_jvp(a, b, opts, primals, tangents):
    (op,) = primals
    (dop,) = tangents
    lams, v, info = _spectral_slice(op, a, b, opts)

    _, dav = jax.jvp(lambda o: o.matmat(v), (op,), (dop,))
    m = _mm(v.conj().T, dav)  # HIGHEST precision, like the forward's RR
    dlams = jnp.diagonal(m)
    if jnp.iscomplexobj(dlams) and not jnp.iscomplexobj(lams):
        dlams = jnp.real(dlams)

    # In-block rotations: Lorentzian-broadened gap inverses (finite on
    # multiplets), exactly as dominant_eigh_multi.
    gap = lams[None, :] - lams[:, None]
    f = gap / (gap * gap + opts.gap_eps ** 2)
    f = f * (1.0 - jnp.eye(opts.r, dtype=lams.dtype))
    dv_in = _mm(v, f * m)

    # Out-of-block: deflated MINRES — (A - lam_i I) is INDEFINITE on the
    # block complement for interior eigenvalues, so no CG sign exists.
    rhs = -(dav - _mm(v, m))

    def one(lam_i, b_i):
        return solve_deflated(op, lam_i, v, b_i, method="minres",
                              tol=opts.solve_tol,
                              maxiter=opts.solve_maxiter,
                              precond=opts.solve_precond)

    dv_out = jax.vmap(one, in_axes=(0, 1), out_axes=1)(lams, rhs)
    from .eigh import _pivot_phase_project
    dv = _pivot_phase_project(v, dv_in + dv_out)
    dinfo = SliceInfo(*(jnp.zeros_like(x) for x in info))
    return (lams, v, info), (dlams, dv, dinfo)


def spectral_slice(op, a: float, b: float, r: int = 8, *,
                   degree: int = 80, maxiter: int = 150,
                   tol: float = 1e-8, solve_tol: float | None = None,
                   solve_maxiter: int | None = None, seed: int = 0,
                   bounds_k: int = 30, gap_eps: float = 1e-12,
                   solve_precond=None):
    """The ``r`` eigenpairs of a symmetric operator nearest/inside the
    interval ``[a, b]``, differentiable to arbitrary order.

    Parameters
    ----------
    op      : LinearOperator (or dense symmetric array).
    a, b    : slice interval (STATIC floats — they shape the filter).
    r       : block size; choose r >= the expected eigenvalue count in
              [a, b] (check ``info.n_inside`` — if it equals r, the
              slice may hold more pairs than the block; enlarge r).
    degree  : Chebyshev filter degree (matvecs per filtered apply).
              Higher = sharper filter = fewer LOBPCG iterations; total
              matvecs ~ degree * iterations.
    maxiter : LOBPCG iteration cap on the filtered operator.
    tol     : convergence target for the TRUE A-residual (reported in
              ``info``; floored at 50*eps).
    solve_tol / solve_maxiter : deflated-MINRES controls for the
              derivative solves (default: ``tol``).
    solve_precond : optional SPD approximate inverse for the derivative
              solves (preconditioned deflated MINRES) — e.g.
              ``jacobi_precond(op, shift=0.5 * (a + b))``; pass a STABLE
              callable (jit-static, keyed by identity).  The filtered
              LOBPCG forward is unaffected.
    bounds_k: Lanczos steps for the spectral enclosure.

    Returns ``(lams, V, info)`` — ``lams`` (r,) ascending, ``V`` (N, r)
    orthonormal, :class:`SliceInfo` with the inside-count and the true
    max block residual.

    .. note:: like every slicing method, this wants slice edges in gaps
       of the spectrum: an edge through a degenerate multiplet makes the
       subspace ill-defined (the filter cannot separate equal
       eigenvalues).  ``r`` should cover whole multiplets.
    """
    op = as_operator(op)
    a, b = float(a), float(b)
    if not a < b:
        raise ValueError(f"need a < b, got [{a}, {b}]")
    r = int(r)
    if op.dim < 3 * r:
        raise ValueError(f"spectral_slice needs dim >= 3*r (LOBPCG "
                         f"subspace); got dim={op.dim}, r={r}")
    if int(degree) < 2:
        raise ValueError(f"filter degree must be >= 2, got {degree} "
                         f"(the recurrence reads T_0, T_1 and at least "
                         f"one higher moment)")
    opts = SliceOptions(
        r=r, degree=int(degree), maxiter=int(maxiter), tol=float(tol),
        solve_tol=float(tol if solve_tol is None else solve_tol),
        solve_maxiter=None if solve_maxiter is None else int(solve_maxiter),
        seed=int(seed), bounds_k=int(bounds_k), gap_eps=float(gap_eps),
        solve_precond=solve_precond)
    return _spectral_slice(op, a, b, opts)


def _chebyshev_moments(op, degree: int, n_probe: int, key, bounds,
                       bounds_k: int):
    """Hutchinson-estimated normalized Chebyshev moments
    ``mu_j = (1/N) Tr T_j(Ã)`` of the affinely-mapped operator, plus the
    enclosure (center, halfwidth) used for the map.  Shared by
    :func:`spectral_density` and :func:`trace_function`."""
    op = as_operator(op)
    dtype = op.dtype
    real_dtype = jnp.finfo(dtype).dtype
    if key is None:
        key = jax.random.PRNGKey(7)
    if bounds is None:
        lo, hi = spectral_bounds(op, bounds_k,
                                 key=jax.random.fold_in(key, 1))
    else:
        lo, hi = (jnp.asarray(bounds[0], real_dtype),
                  jnp.asarray(bounds[1], real_dtype))
    center = (hi + lo) / 2.0
    halfwidth = (hi - lo) / 2.0

    def amap(v):
        return (op.matmat(v) - center.astype(dtype) * v) / \
            halfwidth.astype(dtype)

    z = jax.random.rademacher(
        jax.random.fold_in(key, 2), (op.dim, int(n_probe)),
        dtype=real_dtype).astype(dtype)

    t_prev, t_cur = z, amap(z)

    def moment(t):  # (1/(N*s)) sum_z z^H T_j(Ã) z
        return jnp.real(jnp.sum(jnp.conj(z) * t)) / (op.dim * z.shape[1])

    def body(carry, _):
        t_prev, t_cur = carry
        t_next = 2.0 * amap(t_cur) - t_prev
        return (t_cur, t_next), moment(t_next)

    (_, _), mus_tail = lax.scan(body, (t_prev, t_cur),
                                None, length=int(degree) - 1)
    mus = jnp.concatenate([jnp.stack([moment(t_prev), moment(t_cur)]),
                           mus_tail]).astype(real_dtype)
    return mus, center, halfwidth


def spectral_density(op, energies, *, degree: int = 120,
                     n_probe: int = 16, key=None, bounds=None,
                     bounds_k: int = 30):
    """Smoothed density of states by the kernel polynomial method (KPM).

    Stochastic estimate of ``rho(E) = (1/N) Tr delta(E - A)``: Chebyshev
    moments ``mu_j = (1/N) Tr T_j(Ã)`` are estimated with Rademacher
    probe vectors (one three-term recurrence over a (N, n_probe) block —
    batched matvecs, MXU-friendly), Jackson-damped, and summed against
    the Chebyshev kernel at the requested energies.  Classic companion
    to :func:`spectral_slice`: run the cheap DOS scan first to place
    slice edges in spectral gaps and size ``r`` per slice.

    Fully differentiable by plain AD — the estimator is a fixed
    composition of matvecs (no iteration-to-convergence), so
    ``jax.grad`` of any functional of the DOS w.r.t. operator
    parameters just works; no custom rule needed.

    Parameters
    ----------
    op       : symmetric LinearOperator (or dense array).
    energies : (m,) evaluation energies.
    degree   : number of Chebyshev moments (resolution ~ spread/degree).
    n_probe  : Rademacher probe vectors (stochastic trace samples);
               variance falls as 1/(N * n_probe), so large operators
               need very few probes.
    bounds   : optional (lo, hi) spectral enclosure; estimated via
               :func:`spectral_bounds` when omitted.

    Returns ``rho`` with ``rho[i] ~ density at energies[i]``, normalized
    so that ``integral rho dE ~ 1``.
    """
    op = as_operator(op)
    real_dtype = jnp.finfo(op.dtype).dtype
    mus, center, halfwidth = _chebyshev_moments(op, int(degree),
                                                int(n_probe), key, bounds,
                                                int(bounds_k))

    # Jackson damping + Chebyshev kernel at the mapped energies.
    j = jnp.arange(int(degree) + 1, dtype=real_dtype)
    g = _jackson_damping(int(degree), real_dtype)
    e_hat = jnp.clip((jnp.asarray(energies, real_dtype) - center)
                     / halfwidth, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(e_hat)                       # (m_E,)
    tj = jnp.cos(theta[None, :] * j[:, None])       # T_j(e_hat)
    weights = jnp.where(j == 0, 1.0, 2.0) * g * mus
    rho_hat = (weights[None, :] @ tj)[0] / (jnp.pi * jnp.sqrt(1 - e_hat**2))
    return rho_hat / halfwidth                      # d(e_hat)/dE


def trace_function(op, f, *, degree: int = 120, n_probe: int = 16,
                   key=None, bounds=None, bounds_k: int = 30,
                   jackson: bool = True):
    """Stochastic Chebyshev estimate of ``Tr f(A)`` for symmetric ``A``.

    Kernel-polynomial / Hutchinson estimator: ``Tr f(A) ~
    N * sum_j g_j c_j mu_j`` with ``mu_j`` the Rademacher-probe moments
    of the mapped operator (shared with :func:`spectral_density`) and
    ``c_j`` the Chebyshev-interpolation coefficients of ``f`` on the
    spectral enclosure, computed by a DCT at the Chebyshev nodes —
    ``f`` only ever gets evaluated on scalars inside the enclosure, so
    ``f = jnp.log`` is safe for SPD operators whose enclosure stays
    positive (see :func:`logdet`).

    Fully differentiable by plain AD w.r.t. the operator parameters (a
    fixed composition of matvecs — no custom rule needed) and w.r.t.
    anything ``f`` closes over.

    Parameters mirror :func:`spectral_density`; ``jackson=False``
    disables the damping (plain Chebyshev interpolation — better for
    analytic ``f`` like exp, keep it on for kinky ``f``).

    Returns a scalar estimate of ``Tr f(A)``; variance falls as
    ``1/(N * n_probe)``.
    """
    op = as_operator(op)
    real_dtype = jnp.finfo(op.dtype).dtype
    degree = int(degree)
    mus, center, halfwidth = _chebyshev_moments(op, degree, int(n_probe),
                                                key, bounds, int(bounds_k))
    # Chebyshev coefficients of f on the enclosure by DCT-II at the
    # nodes x_k = cos(pi (k + 1/2) / M).
    m = degree + 1
    k = jnp.arange(m, dtype=real_dtype)
    theta_k = jnp.pi * (k + 0.5) / m
    x_k = jnp.cos(theta_k)
    f_k = f(center + halfwidth * x_k).astype(real_dtype)
    j = jnp.arange(m, dtype=real_dtype)
    cos_tbl = jnp.cos(j[:, None] * theta_k[None, :])      # (m, m)
    c = (2.0 / m) * (cos_tbl @ f_k)
    c = c.at[0].multiply(0.5)
    g = _jackson_damping(degree, real_dtype) if jackson else 1.0
    return op.dim * jnp.sum(g * c * mus)


def logdet(op, *, degree: int = 160, n_probe: int = 16, key=None,
           bounds=None, bounds_k: int = 30):
    """Stochastic ``log det A`` for a symmetric POSITIVE DEFINITE
    operator: ``Tr ln(A)`` via :func:`trace_function`.

    The spectral enclosure must stay positive, and for ``ln`` it should
    be TIGHT at the bottom (the interpolation error blows up as the
    interval approaches 0), so the auto-enclosure uses a 1% margin
    instead of :func:`spectral_bounds`' default 10% — the default pad
    on a well-conditioned operator would push ``lo`` negative and cost
    orders of magnitude of accuracy.  If ``lo`` still lands <= 0
    (barely-definite or genuinely indefinite operator), it is clamped
    to a small positive floor; results are then only as good as the
    degree allows — pass explicit ``bounds`` when you know the
    spectrum.

    Error budget: with tight bounds the Chebyshev interpolation of ln is
    exact to round-off (analytic f), so the estimate's error is purely
    the Hutchinson trace noise, ABSOLUTE scale ``~ ||ln A||_F *
    sqrt(2 / n_probe)`` — the RELATIVE error blows up when
    ``Tr ln A ~ 0`` by cancellation of +/- log terms.  Budget
    ``n_probe`` against the absolute accuracy you need.
    """
    from .eigh import dominant_eigh

    op = as_operator(op)
    real_dtype = jnp.finfo(op.dtype).dtype
    if bounds is None:
        # ln needs a TIGHT lower bound (interpolation error blows up as
        # the interval approaches 0), so don't use the padded Lanczos
        # enclosure — converge the extremal eigenvalues and widen by the
        # certified Ritz residual |lam - theta| <= ||A v - theta v||.
        lmin, _, i_lo = dominant_eigh(op, k=min(2 * bounds_k, op.dim),
                                      extreme="min", with_info=True)
        lmax, _, i_hi = dominant_eigh(op, k=min(2 * bounds_k, op.dim),
                                      extreme="max", with_info=True)
        pad_lo = i_lo.residual * jnp.maximum(jnp.abs(lmin), 1.0)
        pad_hi = i_hi.residual * jnp.maximum(jnp.abs(lmax), 1.0)
        # 1e-2 = the 1% safety margin the docstring promises (was 1e-3:
        # a true eigenvalue between 0.1% and 1% outside the enclosure
        # would have made the degree-160 Chebyshev moments blow up while
        # the doc said it was safe).
        lo = lmin - pad_lo - 1e-2 * jnp.abs(lmin)
        hi = lmax + pad_hi + 1e-2 * jnp.abs(lmax)
        floor = jnp.asarray(jnp.finfo(real_dtype).eps, real_dtype) * \
            jnp.abs(hi) * 10.0
        lo = jnp.maximum(lo, floor)
        bounds = (lo, hi)
    return trace_function(op, jnp.log, degree=degree, n_probe=n_probe,
                          key=key, bounds=bounds, bounds_k=bounds_k,
                          jackson=False)
