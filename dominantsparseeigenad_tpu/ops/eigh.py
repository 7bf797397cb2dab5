"""Differentiable dominant eigensolver for symmetric operators.

Rebuild of the reference's ``symeig.py`` (``DominantSymeig``,
``DominantSparseSymeig``, ``setDominantSparseSymeig`` — a
``torch.autograd.Function`` with a hand-written backward).  Same math,
different AD mechanism:

* the reference registers a custom **VJP**: given cotangents (λ̄, v̄), it
  assembles ``Ā = λ̄ v v^T + x v^T`` where ``x`` solves the deflated system
  ``(I-vv^T)(A-λI)(I-vv^T) x = -(I-vv^T) v̄`` via its differentiable CG;
* this framework registers a custom **JVP** (the transpose of the same
  implicit-function-theorem relations):

      dλ = v^T (dA) v
      (A - λI) dv = -(I - v v^T) (dA) v,   with v^T dv = 0,

  solved by the same deflated CG.  JAX derives reverse mode by transposing
  this (linear-in-tangents) rule, so first derivatives match the
  reference's backward *exactly*; and because the rule is built from
  differentiable, transposable pieces (``lax.custom_linear_solve``), it
  composes to **arbitrary derivative order** — ``jax.custom_vjp`` would
  stop at order one, which would break fidelity susceptibility and
  specific heat.

* the reference's matrix-free trick — never materializing
  ``Ā = (λ̄ v + x) v^T``, instead contracting it lazily into the scalar
  parameter via ``Aadjoint_to_gadjoint(u, w) = u^T (∂A/∂g) w`` — is
  subsumed by AD: ``dA v`` is computed as ``jax.jvp`` of the operator's
  matvec w.r.t. its pytree parameters, and reverse mode transposes that
  into exactly the u^T(∂A/∂θ)w contraction, at matvec cost, with no N×N
  matrix ever built.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from .cg import solve_deflated
from .lanczos import (LanczosInfo, _mm, lanczos, lanczos_adaptive,
                      lanczos_eigh)
from .operators import as_operator, pivot_gauge, tol_floor, hdot


@dataclasses.dataclass(frozen=True)
class EighOptions:
    """Static (hashable) configuration for :func:`dominant_eigh`."""

    k: int = 128
    tol: float = 1e-8
    maxiter: int | None = None
    seed: int = 0
    reorthogonalize: bool = True
    reorth_passes: int = 2
    reorth_chunks: int = 0
    restart_cycles: int = 0
    early_exit_tol: float | None = None
    # Storage dtype NAME ("bfloat16") for the Lanczos basis history, or
    # None for the operator's dtype — halves the dominant reorth HBM
    # traffic; the reconstructed Ritz vector is then polished by one
    # Newton step of refine_eigenpair (see _forward).  A string so the
    # frozen dataclass stays hashable/comparable for jit staticness.
    basis_dtype: str | None = None
    # Breakdown-restart mechanism ("cond"|"carry") — see
    # lanczos.lanczos.  "carry" is the vmap-friendly choice for batched
    # sweeps (under vmap both lax.cond branches execute every step,
    # charging every lane the lazy branch's RNG + full-basis
    # projection).
    restart_mode: str = "cond"
    # Optional SPD approximate inverse z = M^{-1} r applied inside the
    # deflated tangent solves (projected to span(V)^perp by cg).  Static
    # aux data: hashed by identity, so pass a stable callable (module
    # function / functools.partial held by the caller), not a fresh
    # lambda per call, or jit will re-trace.
    precond: object = None


def _columnwise(precond, r):
    """Apply a vector-convention preconditioner to each column of ``r``."""
    return jax.vmap(precond, in_axes=1, out_axes=1)(r)


def _pivot_phase_project(v, dv):
    """Complex gauge correction for eigenvector tangents.

    Every forward here gauges each eigenvector so its largest-magnitude
    entry is real positive.  A tangent consistent with that gauge must
    keep the pivot entry real: Im(dv_i[pivot_i]) = 0.  The raw IFT
    tangent satisfies the NORMALIZATION constraint instead
    (<v, dv> = 0 resp. the B-metric analogue), which over-constrains the
    phase and leaves an 11%-scale error in phase-sensitive gradients
    (Re/Im of components, overlaps with fixed vectors) for complex
    operators.  Shifting along the gauge direction i*v_i — which
    preserves every (real-part) normalization constraint — fixes it.
    ``v``: (N,) or (N, r); no-op for real dtypes.
    """
    if not jnp.iscomplexobj(v):
        return dv
    if v.ndim == 1:
        i_star = jnp.argmax(jnp.abs(v))
        alpha = -jnp.imag(dv[i_star]) / jnp.real(v[i_star])
        return dv + 1j * alpha * v
    idx = jnp.argmax(jnp.abs(v), axis=0)
    piv_v = jnp.real(jnp.take_along_axis(v, idx[None], axis=0)[0])
    piv_dv = jnp.take_along_axis(dv, idx[None], axis=0)[0]
    alpha = -jnp.imag(piv_dv) / piv_v
    return dv + 1j * alpha[None, :] * v


def _forward(op, extreme: str, opts: EighOptions):
    key = jax.random.PRNGKey(opts.seed)
    k = min(opts.k, op.dim)
    if opts.restart_cycles > 0 and extreme in ("min", "max"):
        # Bounded-memory forward: thick-restart Lanczos holds only a
        # (k+1, N) window — unlocks dimensions where the plain k-step
        # basis would not fit in HBM.  Derivatives are unchanged (the
        # IFT rule only needs the converged eigenpair).
        from .restart import lanczos_restarted
        lam, v, _ = lanczos_restarted(op, k, n_restarts=opts.restart_cycles,
                                      extreme=extreme, key=key,
                                      reorth_passes=opts.reorth_passes)
        return lam, v
    if opts.early_exit_tol is not None and extreme in ("min", "max"):
        lam, v, _ = lanczos_adaptive(op, k, extreme=extreme,
                                     tol=opts.early_exit_tol, key=key,
                                     reorthogonalize=opts.reorthogonalize,
                                     reorth_passes=opts.reorth_passes)
        return lam, v
    out = lanczos_eigh(op, k, extreme=extreme, key=key,
                       reorthogonalize=opts.reorthogonalize,
                       reorth_passes=opts.reorth_passes,
                       reorth_chunks=opts.reorth_chunks,
                       basis_dtype=opts.basis_dtype,
                       restart_mode=opts.restart_mode)
    if opts.basis_dtype is None or \
            jnp.dtype(opts.basis_dtype) == jnp.dtype(op.dtype):
        return out
    # Narrowed basis storage: the reconstructed Ritz vector carries the
    # storage rounding (~eps_bf16/sqrt(3) ≈ 4e-3 in norm).  One Newton
    # polish — Rayleigh quotient + one deflated solve against the
    # full-precision operator — restores working-precision accuracy at a
    # few matvecs' cost (quadratic convergence: 4e-3 -> ~1e-6 residual,
    # then the IFT tangents inherit the clean pair).  Re-gauge afterwards:
    # refine_eigenpair normalizes but does not re-apply the pivot phase.
    def _polish(lam, v, def_sign):
        lam, v = refine_eigenpair(op, lam, v, iters=1, tol=opts.tol,
                                  maxiter=opts.maxiter,
                                  definite_sign=def_sign)
        pivot = v[jnp.argmax(jnp.abs(v))]
        return lam, v * jnp.conj(jnp.sign(pivot))

    if extreme == "both":
        lmin, vmin, lmax, vmax = out
        lmin, vmin = _polish(lmin, vmin, +1.0)
        lmax, vmax = _polish(lmax, vmax, -1.0)
        return lmin, vmin, lmax, vmax
    lam, v = out
    return _polish(lam, v, +1.0 if extreme == "min" else -1.0)


def _forward_info(op, extreme: str, opts: EighOptions):
    """Forward pass that also reports convergence (``LanczosInfo``)."""
    key = jax.random.PRNGKey(opts.seed)
    k = min(opts.k, op.dim)
    ref_tol = opts.early_exit_tol if opts.early_exit_tol is not None else \
        opts.tol
    ref_tol = tol_floor(ref_tol, op.dtype)  # f32-reachable convergence bar
    if opts.early_exit_tol is not None and opts.restart_cycles == 0:
        return lanczos_adaptive(op, k, extreme=extreme, tol=ref_tol,
                                key=key,
                                reorthogonalize=opts.reorthogonalize,
                                reorth_passes=opts.reorth_passes)
    lam, v = _forward(op, extreme, opts)
    # True Ritz residual via one extra matvec — the unconditional
    # convergence check the reference never performs: a too-small k
    # otherwise returns a plausible-but-wrong eigenpair silently.
    resid = jnp.linalg.norm(op.matvec(v) - lam * v) / jnp.maximum(
        jnp.abs(lam), jnp.finfo(v.dtype).tiny)
    resid = jnp.real(resid).astype(jnp.finfo(v.dtype).dtype)
    conv = (resid <= ref_tol).astype(resid.dtype)
    # effective_k = steps actually EXECUTED (the LanczosInfo contract):
    # the restart tier runs one plain k-step cycle plus (k - num_kept)
    # recurrence steps per restart (restart.py: restart_init retains
    # num_kept = max(1, k // 4) Ritz vectors).
    steps = float(k)
    if opts.restart_cycles > 0 and extreme in ("min", "max"):
        steps = float(k + opts.restart_cycles * (k - max(1, k // 4)))
    info = LanczosInfo(
        effective_k=jnp.asarray(steps, resid.dtype),
        residual=resid, converged=conv)
    return lam, v, info


def _pair_jvp(op, dop, lam, v, sign, opts):
    """IFT tangents (dλ, dv) of one eigenpair for operator tangent ``dop``."""
    _, dAv = jax.jvp(lambda o: o.matvec(v), (op,), (dop,))
    dlam = hdot(v, dAv)
    if jnp.iscomplexobj(dlam) and not jnp.iscomplexobj(lam):
        # Hermitian operator: <v, dA v> is real; the eigenvalue primal is
        # real (from the real tridiagonal), so the tangent must be too.
        dlam = jnp.real(dlam)
    rhs = -(dAv - dlam * v)  # = -(I - vv^T) dA v
    dv = solve_deflated(op, lam, v, rhs, definite_sign=sign,
                        tol=opts.tol, maxiter=opts.maxiter,
                        precond=opts.precond)
    return dlam, _pivot_phase_project(v, dv)


@partial(jax.custom_jvp, nondiff_argnums=(1, 2))
def _dominant_eigh(op, extreme: str, opts: EighOptions):
    return _forward(op, extreme, opts)


@_dominant_eigh.defjvp
def _dominant_eigh_jvp(extreme, opts, primals, tangents):
    (op,) = primals
    (dop,) = tangents
    out = _dominant_eigh(op, extreme, opts)  # recursive -> higher order OK
    if extreme == "both":
        lmin, vmin, lmax, vmax = out
        dlmin, dvmin = _pair_jvp(op, dop, lmin, vmin, +1.0, opts)
        dlmax, dvmax = _pair_jvp(op, dop, lmax, vmax, -1.0, opts)
        return out, (dlmin, dvmin, dlmax, dvmax)
    lam, v = out
    sign = +1.0 if extreme == "min" else -1.0
    dlam, dv = _pair_jvp(op, dop, lam, v, sign, opts)
    return out, (dlam, dv)


@partial(jax.custom_jvp, nondiff_argnums=(1, 2))
def _dominant_eigh_info(op, extreme: str, opts: EighOptions):
    return _forward_info(op, extreme, opts)


@_dominant_eigh_info.defjvp
def _dominant_eigh_info_jvp(extreme, opts, primals, tangents):
    (op,) = primals
    (dop,) = tangents
    lam, v, info = _dominant_eigh_info(op, extreme, opts)
    sign = +1.0 if extreme == "min" else -1.0
    dlam, dv = _pair_jvp(op, dop, lam, v, sign, opts)
    # The convergence report is observational: zero tangents (all fields
    # are float scalars precisely so this is legal).
    dinfo = LanczosInfo(*(jnp.zeros_like(f) for f in info))
    return (lam, v, info), (dlam, dv, dinfo)


@dataclasses.dataclass(frozen=True)
class EighMultiOptions:
    """Static configuration for :func:`dominant_eigh_multi`."""

    r: int = 4
    k: int = 128
    tol: float = 1e-8
    maxiter: int | None = None
    seed: int = 0
    reorth_passes: int = 2
    gap_eps: float = 1e-12
    reorth_chunks: int = 0
    method: str = "lanczos"
    # SPD approximate inverse used BOTH by the LOBPCG forward (on the
    # residual block) and by the deflated tangent solves.  Static aux
    # data keyed by identity — pass a stable callable (see EighOptions).
    precond: object = None


def _multi_forward(op, extreme: str, opts: EighMultiOptions):
    key = jax.random.PRNGKey(opts.seed)
    k = min(opts.k, op.dim)
    if opts.method == "lobpcg":
        from .lobpcg import lobpcg_eigh
        precond = opts.precond
        if precond is not None:
            # lobpcg preconditions the (N, r) residual BLOCK; user
            # preconditioners here follow the vector convention of
            # EighOptions.precond, so vmap over columns.
            precond = partial(_columnwise, opts.precond)
        # Unlike Lanczos steps, LOBPCG iterations are NOT bounded by the
        # operator dimension (each refines the same (N, 3r) subspace), so
        # the budget is opts.k unclamped.
        return lobpcg_eigh(op, opts.r, extreme=extreme, maxiter=opts.k,
                           tol=opts.tol, key=key, precond=precond)
    res = lanczos(op, k, key=key, reorth_passes=opts.reorth_passes,
                  reorth_chunks=opts.reorth_chunks)
    t = jnp.diag(res.alphas)
    if res.betas.shape[0]:
        t = t + jnp.diag(res.betas, 1) + jnp.diag(res.betas, -1)
    evals, evecs = jnp.linalg.eigh(t)
    idx = (jnp.arange(opts.r) if extreme == "min"
           else k - 1 - jnp.arange(opts.r))
    lams = evals[idx]
    v = _mm(res.basis, evecs[:, idx])
    # Deterministic per-vector phase gauge (shared pivot_gauge helper:
    # pivot entry real positive, matching lanczos_eigh._pair and the
    # tangent rules' _pivot_phase_project).
    return lams, pivot_gauge(v)


def _multi_forward_info(op, extreme: str, opts: EighMultiOptions):
    """Forward that also reports block convergence (``LanczosInfo`` with
    the max-over-block TRUE Ritz residual, normalized by
    ``max(|lam|, 1)`` — the SAME convention as the LOBPCG stopping test,
    so the report cannot contradict the solver's own convergence
    decision for near-zero eigenvalues)."""
    real_dtype = jnp.finfo(op.dtype).dtype
    ref_tol = tol_floor(opts.tol, op.dtype)
    if opts.method == "lobpcg":
        # LOBPCG already tracks its true block residual and iteration
        # count — reuse them (effective_k = iterations actually run, not
        # the budget; recomputing the residual would just duplicate it).
        from .lobpcg import lobpcg_eigh
        precond = opts.precond
        if precond is not None:
            precond = partial(_columnwise, opts.precond)
        lams, v, linfo = lobpcg_eigh(op, opts.r, extreme=extreme,
                                     maxiter=opts.k, tol=opts.tol,
                                     key=jax.random.PRNGKey(opts.seed),
                                     precond=precond, with_info=True)
        info = LanczosInfo(effective_k=linfo.iterations,
                           residual=linfo.residual,
                           converged=linfo.converged)
        return lams, v, info
    lams, v = _multi_forward(op, extreme, opts)
    av = op.matmat(v)
    resid = jnp.linalg.norm(av - v * lams[None, :].astype(v.dtype),
                            axis=0).astype(real_dtype)
    resid = jnp.max(resid / jnp.maximum(jnp.abs(lams).astype(real_dtype),
                                        1.0))
    info = LanczosInfo(
        effective_k=jnp.asarray(float(min(opts.k, op.dim)), real_dtype),
        residual=resid, converged=(resid <= ref_tol).astype(real_dtype))
    return lams, v, info


def _multi_pair_tangents(op, dop, lams, v, extreme, opts):
    """Block IFT tangents (dlams, dv) for converged pairs (lams, v).

    Shared by the plain and the info-carrying rule (the latter must NOT
    recompute the forward).  All tangent contractions run at HIGHEST
    precision (``_mm``/``hdot`` policy) — gradients deserve the same
    digits the precision-pinned forward earns.
    """
    _, dav = jax.jvp(lambda o: o.matmat(v), (op,), (dop,))
    m = _mm(v.conj().T, dav)                   # (r, r): <V, dA V>
    dlams = jnp.diagonal(m)
    if jnp.iscomplexobj(dlams) and not jnp.iscomplexobj(lams):
        dlams = jnp.real(dlams)

    # In-block eigenvector rotations: same Lorentzian-broadened gap
    # inverses as ops.decomp.eigh_safe — finite on multiplets, exact for
    # separated pairs.
    gap = lams[None, :] - lams[:, None]        # gap[j, i] = lam_i - lam_j
    f = gap / (gap * gap + opts.gap_eps ** 2)
    f = f * (1.0 - jnp.eye(opts.r, dtype=lams.dtype))
    dv_in = _mm(v, f * m)

    # Out-of-block component: for each pair i, solve the block-deflated
    # system (A - lam_i) x_i = -(I - V V^T) dA v_i on span(V)^perp —
    # well-conditioned because the whole near-degenerate cluster is
    # deflated (the reference deflates rank 1 only; SURVEY.md §7 hard
    # part 2).
    sign = +1.0 if extreme == "min" else -1.0
    rhs = -(dav - _mm(v, m))

    def one(lam_i, b_i):
        return solve_deflated(op, lam_i, v, b_i, definite_sign=sign,
                              tol=opts.tol, maxiter=opts.maxiter,
                              precond=opts.precond)

    dv_out = jax.vmap(one, in_axes=(0, 1), out_axes=1)(lams, rhs)
    return dlams, _pivot_phase_project(v, dv_in + dv_out)


@partial(jax.custom_jvp, nondiff_argnums=(1, 2))
def _dominant_eigh_multi(op, extreme: str, opts: EighMultiOptions):
    return _multi_forward(op, extreme, opts)


@_dominant_eigh_multi.defjvp
def _dominant_eigh_multi_jvp(extreme, opts, primals, tangents):
    (op,) = primals
    (dop,) = tangents
    lams, v = _dominant_eigh_multi(op, extreme, opts)
    dlams, dv = _multi_pair_tangents(op, dop, lams, v, extreme, opts)
    return (lams, v), (dlams, dv)


@partial(jax.custom_jvp, nondiff_argnums=(1, 2))
def _dominant_eigh_multi_info(op, extreme: str, opts: EighMultiOptions):
    return _multi_forward_info(op, extreme, opts)


@_dominant_eigh_multi_info.defjvp
def _dominant_eigh_multi_info_jvp(extreme, opts, primals, tangents):
    (op,) = primals
    (dop,) = tangents
    lams, v, info = _dominant_eigh_multi_info(op, extreme, opts)
    dlams, dv = _multi_pair_tangents(op, dop, lams, v, extreme, opts)
    dinfo = LanczosInfo(*(jnp.zeros_like(f) for f in info))
    return (lams, v, info), (dlams, dv, dinfo)


def dominant_eigh_multi(op, r: int = 4, k: int = 128, *,
                        extreme: str = "min", tol: float = 1e-8,
                        maxiter: int | None = None, seed: int = 0,
                        reorth_passes: int = 2, reorth_chunks: int = 0,
                        gap_eps: float = 1e-12,
                        method: str = "lanczos", precond=None,
                        with_info: bool = False):
    """Top-r extremal eigenpairs of a symmetric operator, differentiable.

    Block extension of :func:`dominant_eigh` (the reference computes one
    pair at a time): one Krylov forward yields the r algebraically
    smallest ("min") or largest ("max") eigenpairs, and the derivative
    rule combines block deflation (robust under clustering) with
    broadened in-block rotation terms.  Intended for
    truncated-decomposition users like CTMRG that keep a whole spectral
    cluster.

    ``method`` selects the forward engine (the derivative rule is
    identical — it only needs the converged pairs):

    * ``"lanczos"`` — one k-step Lanczos sweep (default; best when a
      single sweep of modest k converges the whole cluster);
    * ``"lobpcg"`` — :func:`~.lobpcg.lobpcg_eigh` block iteration with up
      to ``k`` iterations (O(N*3r) memory instead of the (N, k) basis,
      and the only path that PRECONDITIONS the forward — pass
      ``precond``).

    ``precond`` (optional, SPD approximate inverse ``z = M^{-1} r``,
    vector convention) is used by the LOBPCG forward and by the deflated
    tangent solves of both methods.  Pass a stable callable — it rides in
    the jit-static config, keyed by identity.

    Returns ``(lams, V)`` with ``lams`` shape (r,) and ``V`` shape (N, r)
    orthonormal; with ``with_info=True``, ``(lams, V, info)`` where
    ``info`` is a :class:`~.lanczos.LanczosInfo` whose ``residual`` is the
    max-over-block TRUE Ritz residual ``||A v - lam v|| / max(|lam|, 1)``
    (the LOBPCG stopping convention, so report and solver agree even for
    near-zero eigenvalues; zero tangents, so it composes with jvp/grad)
    — the silent-wrong-block guard for truncation users.  For
    ``method="lobpcg"``, ``effective_k`` is the iteration count actually
    run; for ``"lanczos"`` it is the sweep length and the residual costs
    one extra width-r matmat.
    """
    op = as_operator(op)
    if extreme not in ("min", "max"):
        raise ValueError(f"extreme must be min|max, got {extreme!r}")
    if method not in ("lanczos", "lobpcg"):
        raise ValueError(f"method must be lanczos|lobpcg, got {method!r}")
    r = int(r)
    k = int(min(k, op.dim)) if method == "lanczos" else int(k)
    if r > k:
        raise ValueError(f"need k >= r, got k={k} < r={r}")
    opts = EighMultiOptions(
        r=r, k=k, tol=float(tol),
        maxiter=None if maxiter is None else int(maxiter),
        seed=int(seed), reorth_passes=int(reorth_passes),
        reorth_chunks=int(reorth_chunks),
        gap_eps=float(gap_eps), method=method, precond=precond)
    if with_info:
        return _dominant_eigh_multi_info(op, extreme, opts)
    return _dominant_eigh_multi(op, extreme, opts)


def dominant_eigh(op, k: int = 128, *, extreme: str = "min",
                  tol: float = 1e-8, maxiter: int | None = None,
                  seed: int = 0, reorthogonalize: bool = True,
                  reorth_passes: int = 2, reorth_chunks: int = 0,
                  restart_cycles: int = 0,
                  early_exit_tol: float | None = None,
                  with_info: bool = False, precond=None,
                  basis_dtype=None, restart_mode: str = "cond"):
    """Extremal eigenpair(s) of a symmetric operator, differentiable to all
    orders w.r.t. the operator's pytree parameters.

    Drop-in functional replacement for the reference's
    ``DominantSymeig.apply(A, k)`` (dense) *and*
    ``DominantSparseSymeig.apply(g, k, dim)`` (matrix-free): pass a
    :class:`DenseOperator`/array for the former, a
    :class:`MatrixFreeOperator` for the latter — no global setter functions.

    Parameters
    ----------
    op      : LinearOperator (or dense symmetric array).
    k       : Lanczos steps (clamped to ``op.dim``).
    extreme : "min" (ground state; the reference's default use), "max",
              or "both".
    tol     : relative residual tolerance of the backward's deflated CG.
    seed    : seed for Lanczos start/restart vectors (deterministic).
    reorth_chunks : C > 1 reads only the written basis chunks during
              reorthogonalization (exact triangular HBM traffic,
              ~(1+1/C)/2 of the full-basis cost) — see
              :func:`~.lanczos.lanczos`.
    early_exit_tol : when set (and extreme is "min"/"max"), the forward
              runs :func:`~.lanczos.lanczos_adaptive` — staged scan
              segments that stop once the Ritz residual estimate drops
              below this relative tolerance, so a conservative ``k`` pays
              only the matvecs it needs.
    precond : optional SPD approximate inverse ``z = M^{-1} r`` used by
              the deflated CG in every derivative solve (projected to the
              deflation complement automatically) — e.g. a Jacobi inverse
              for diagonally dominant Hamiltonians.  Pass a STABLE
              callable (module function or a partial the caller keeps
              alive): it rides in the jit-static config, keyed by
              identity.
    basis_dtype : storage dtype for the Lanczos basis history (e.g.
              ``jnp.bfloat16`` on an f32 operator) — halves the dominant
              reorthogonalization HBM traffic; the eigenvalue comes from
              the full-precision tridiagonal, and the eigenvector is
              polished back to working precision by ONE Newton step of
              :func:`refine_eigenpair` (a few extra matvecs).  Intended
              for the large-N bandwidth-bound regime (N ≳ 10^5); real
              dtypes only, plain fixed-k forward only.
    with_info : also return a :class:`~.lanczos.LanczosInfo` convergence
              report (effective k, Ritz residual, converged flag — zero
              tangents, so it composes with jvp/grad).  Without
              ``early_exit_tol`` the residual costs one extra matvec but
              is the TRUE ``||Av - λv||/|λ|``.  Requires extreme
              "min"/"max".

    Returns ``(lam, v)``, ``(lam, v, info)`` with ``with_info=True``, or
    ``(lmin, vmin, lmax, vmax)`` for "both".
    """
    op = as_operator(op)
    if restart_cycles and extreme == "both":
        raise ValueError("restart_cycles requires extreme='min' or 'max'")
    if restart_cycles and early_exit_tol is not None:
        raise ValueError("early_exit_tol is not supported with "
                         "restart_cycles (the restart loop has its own "
                         "convergence control)")
    if int(reorth_chunks) > 1 and (restart_cycles
                                   or early_exit_tol is not None):
        raise ValueError("reorth_chunks is only implemented for the "
                         "plain fixed-k forward; it would be silently "
                         "ignored with restart_cycles/early_exit_tol")
    if (with_info or early_exit_tol is not None) and extreme == "both":
        raise ValueError("with_info/early_exit_tol require extreme='min' "
                         "or 'max'")
    if basis_dtype is not None and (restart_cycles
                                    or early_exit_tol is not None):
        raise ValueError("basis_dtype is only implemented for the plain "
                         "fixed-k forward (it would be silently ignored "
                         "with restart_cycles/early_exit_tol)")
    if restart_mode != "cond" and (restart_cycles
                                   or early_exit_tol is not None):
        raise ValueError("restart_mode is only implemented for the plain "
                         "fixed-k forward (it would be silently ignored "
                         "with restart_cycles/early_exit_tol)")
    opts = EighOptions(k=int(k), tol=float(tol),
                       maxiter=None if maxiter is None else int(maxiter),
                       seed=int(seed), reorthogonalize=bool(reorthogonalize),
                       reorth_passes=int(reorth_passes),
                       reorth_chunks=int(reorth_chunks),
                       restart_cycles=int(restart_cycles),
                       early_exit_tol=None if early_exit_tol is None
                       else float(early_exit_tol), precond=precond,
                       basis_dtype=None if basis_dtype is None
                       else jnp.dtype(basis_dtype).name,
                       restart_mode=str(restart_mode))
    if with_info:
        return _dominant_eigh_info(op, extreme, opts)
    return _dominant_eigh(op, extreme, opts)


def refine_eigenpair(op, lam, v, *, iters: int = 2, tol: float = 1e-12,
                     maxiter: int | None = None,
                     definite_sign: float | None = None):
    """Mixed-precision Newton refinement of a symmetric eigenpair.

    The TPU recipe (SURVEY.md §7 hard part 6): run the Krylov forward in
    the hardware's fast precision (f32/bf16), then polish the pair
    against a HIGHER-precision operator with a handful of Newton steps —
    each iteration is one Rayleigh-quotient update plus one deflated
    solve of

        (A - λ I) dv = -(A v - λ v)   on  v⊥,

    converging quadratically, so ``iters=2`` takes an f32-accurate pair
    (residual ~1e-6) to f64 round-off at the cost of ~2 deflated solves
    in the expensive precision instead of a full f64 Krylov run.

    Parameters
    ----------
    op   : the operator in the TARGET precision (e.g. rebuilt with
           ``dtype=jnp.float64``); ``lam``/``v`` are cast to its dtype.
    definite_sign : +1 if ``lam`` is the algebraic minimum, -1 for the
           maximum (enables CG on the deflated system); ``None`` uses
           MINRES, valid for any (also interior) eigenvalue.
    iters : Newton steps (static; each is a ``lax``-free python loop —
           gradients flow straight through if differentiated, though
           the intended use is a forward-only accuracy upgrade).

    Returns ``(lam, v)`` in the operator's dtype, ``||v|| = 1``.
    """
    op = as_operator(op)
    dtype = op.dtype
    v = jnp.asarray(v, dtype)
    v = v / jnp.linalg.norm(v)
    lam = jnp.real(jnp.asarray(lam)).astype(jnp.finfo(dtype).dtype)
    method = "minres" if definite_sign is None else "cg"
    sign = 1.0 if definite_sign is None else float(definite_sign)
    for _ in range(int(iters)):
        av = op.matvec(v)
        lam = jnp.real(hdot(v, av)).astype(lam.dtype)  # Rayleigh
        r = av - lam * v
        dv = solve_deflated(op, lam, v, -r, definite_sign=sign,
                            method=method, tol=tol, maxiter=maxiter)
        v = v + dv
        v = v / jnp.linalg.norm(v)
    av = op.matvec(v)
    lam = jnp.real(hdot(v, av)).astype(lam.dtype)
    return lam, v
