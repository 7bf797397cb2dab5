"""2D classical Ising model: TRG and CTMRG with differentiable free energy.

Rebuild of the reference's third application (``examples/CTMRG`` / TRG,
SURVEY.md §2.2 A3; the paper's Fig. 4): contract the square-lattice Ising
partition function with tensor renormalization, differentiate ``ln Z``
through the *truncated eigendecompositions* once (energy) and twice
(specific heat), and validate against Onsager's exact solution.

Differences from the reference by design:

* the degenerate-spectrum hazard of differentiating eigendecompositions
  (corner spectra carry symmetry multiplets) is handled by
  :func:`~..ops.decomp.eigh_safe` — Lorentzian-broadened gap inverses —
  instead of hoping the spectrum stays simple;
* the renormalization loops are Python-unrolled over a static step count
  (each step changes tensor shapes, so XLA compiles each once); gradients
  flow through the whole contraction sequence like the reference's
  autograd does, but with O(steps · χ²D²) tiny intermediates — cheap;
* the converged CTMRG environment feeds the framework's *non-symmetric*
  dominant eigensolver (``dominant_eig``) through the row-to-row transfer
  operator, mirroring the reference's ``DominantEig`` transfer-matrix use.

Conventions: vertex tensor ``T[u, r, d, l]`` (up, right, down, left); the
Ising coupling is J = 1, inverse temperature ``beta``.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from ..ops.decomp import eigh_safe, eigh_safe_truncated, svd_safe
from ..ops.eig import dominant_eig
from ..ops.observables import value_d1_d2 as _value_d1_d2
from ..ops.operators import DenseOperator

_EPS = 1e-12


# ---------------------------------------------------------------------------
# Vertex tensor and exact (Onsager) oracle
# ---------------------------------------------------------------------------

def ising_vertex_tensor(beta, dtype=jnp.float64) -> jax.Array:
    """T[u,r,d,l] = sum_s W[s,u] W[s,r] W[s,d] W[s,l], W = sqrt(bond matrix).

    The bond matrix M[s,s'] = exp(beta * s * s') has eigenpairs
    (2cosh(beta), [1,1]/sqrt2), (2sinh(beta), [1,-1]/sqrt2); W = M^{1/2}
    built from them keeps everything differentiable in beta.
    """
    beta = jnp.asarray(beta, dtype=dtype)
    cp = jnp.sqrt(jnp.cosh(beta))
    sm = jnp.sqrt(jnp.sinh(beta))
    isq2 = 1.0 / jnp.sqrt(jnp.asarray(2.0, dtype))
    # W = P diag(sqrt(2cosh), sqrt(2sinh)) P^T with P = [[1,1],[1,-1]]/sqrt2
    # => W = [[cp+sm, cp-sm], [cp-sm, cp+sm]] / sqrt(2); check W @ W.T = M.
    w = jnp.stack([
        jnp.stack([cp + sm, cp - sm]),
        jnp.stack([cp - sm, cp + sm]),
    ]) * isq2
    return jnp.einsum("su,sr,sd,sl->urdl", w, w, w, w)


def onsager_free_energy(beta, n_quad: int = 64):
    """Exact thermodynamic-limit ln Z per site via Onsager's double integral,

        lnZ/N = ln(2) + (1/(8 pi^2)) ∮∮ ln[cosh^2(2b)
                 - sinh(2b)(cos t1 + cos t2)] dt1 dt2

    (sanity anchors: beta -> 0 gives ln 2; at beta_c the value is
    ln(2)/2 + 2G/pi ≈ 0.9296953, G = Catalan).  Evaluated with
    Gauss-Legendre quadrature in jnp, so it is itself differentiable —
    supplying exact energy and specific-heat oracles too.
    """
    beta = jnp.asarray(beta)
    x, wq = np.polynomial.legendre.leggauss(n_quad)
    t = jnp.asarray((x + 1.0) * np.pi)          # [0, 2pi]
    wq = jnp.asarray(wq * np.pi)
    c2 = jnp.cosh(2 * beta) ** 2
    s2 = jnp.sinh(2 * beta)
    integrand = jnp.log(c2 - s2 * (jnp.cos(t)[:, None] + jnp.cos(t)[None, :]))
    integral = jnp.einsum("i,j,ij->", wq, wq, integrand)
    return jnp.log(2.0) + integral / (8.0 * jnp.pi ** 2)


# ---------------------------------------------------------------------------
# TRG (Levin–Nave)
# ---------------------------------------------------------------------------

def _split(m, chi, eps=_EPS, method: str = "gram"):
    """Factor m ≈ F1 @ F2.T keeping the top-chi singular values:
    F1 = U sqrt(s), F2 = V sqrt(s).  After the first coarse-graining the
    plaquette matrices are non-symmetric, so this must be a true SVD (an
    eigendecomposition split silently symmetrizes and biases ln Z).

    ``method="gram"`` (default) computes the SVD through the symmetric
    eigendecomposition of the Gram matrix ``M M^T = U Σ² U^T`` with
    ``V = M^T U Σ^{-1}`` — ~2x faster than a dense SVD, and the squared
    spectrum's accuracy loss only touches singular values far below the
    truncation threshold.  ``method="full"`` uses the dense
    degeneracy-safe SVD.  ``method="subspace"`` uses the randomized
    subspace-sketch truncated SVD (:func:`~..ops.decomp
    .svd_safe_truncated`) — matmul-only forward, the fast AND accurate
    f32/TPU tier (see :func:`trg_free_energy`).  ``method="lanczos"``
    uses the framework's truncated :func:`~..ops.svd.dominant_svd`
    (block Lanczos on the Hermitian embedding) — only advantageous when
    the kept cluster is small AND separated; at TRG's rapidly-decaying
    spectra the truncation-boundary quasi-degeneracy makes its backward
    solves expensive, so it is opt-in.
    """
    if method == "gram":
        w_top, u_top = eigh_safe_truncated(m @ m.T, chi, eps)  # desc s^2
        # Exact zero modes (rank-deficient early steps) must be masked
        # with the both-branches-safe where() pattern: sqrt at 0 has an
        # infinite derivative, and a plain clamp still back-propagates it.
        w_max = jnp.maximum(w_top[0], jnp.finfo(m.dtype).tiny)
        # Relative cutoff: 1e-24 suits f64; in f32 it underflows against
        # w_max, keeping near-zero modes whose second sqrt-derivative
        # (~w^-1.5) overflows — floor it at machine-eps².
        keep = w_top > w_max * max(1e-24, float(jnp.finfo(m.dtype).eps) ** 2)
        wc = jnp.where(keep, w_top, w_max)
        s = jnp.where(keep, jnp.sqrt(wc), 0.0)
        sq = jnp.where(keep, jnp.sqrt(jnp.sqrt(wc)), 0.0)
        v = (m.T @ u_top) / jnp.where(keep, jnp.sqrt(wc), 1.0)[None, :]
        v = v * keep[None, :]
        return u_top * sq[None, :], v * sq[None, :]
    # The truncated path needs sigma_chi to be a genuine (nonzero)
    # singular value: with chi == dim the kept set would include the
    # exact zero modes of the rank-deficient early-step matrices, whose
    # singular subspaces are not differentiable.  Untruncated splits are
    # cheap dense ops anyway.
    if method == "lanczos" and chi < m.shape[0]:
        from ..ops.svd import dominant_svd
        k = min(m.shape[0] * 2, 2 * chi + 40)
        u, s, v = dominant_svd(m, r=chi, k=k, gap_eps=eps)
        sq = jnp.sqrt(s)
        return u * sq[None, :], v * sq[None, :]
    # Randomized subspace sketch: matmul-only forward (MXU-friendly; the
    # TPU path's fast tier once chi << dim).  Falls through to the dense
    # SVD when the window is not actually truncating.
    if method == "subspace" and 2 * chi <= m.shape[0]:
        from ..ops.decomp import svd_safe_truncated
        u, s, vt = svd_safe_truncated(m, chi, eps)
        s_ref = jnp.maximum(s[0], jnp.finfo(m.dtype).tiny)
        keep = s > s_ref * jnp.finfo(m.dtype).eps
        sq = jnp.where(keep, jnp.sqrt(jnp.where(keep, s, s_ref)), 0.0)
        return u * sq[None, :], vt.T * sq[None, :]
    u, s, vt = svd_safe(m, eps)
    # Rank-deficient early-step matrices carry EXACT zero singular values
    # inside the kept window (TPU's f32 svd returns true zeros where
    # LAPACK leaves ~1e-12 dust): sqrt has an infinite derivative at 0,
    # so guard with the both-branches-safe where() pattern, mirroring the
    # gram path above.
    s_top = s[:chi]
    s_ref = jnp.maximum(s[0], jnp.finfo(m.dtype).tiny)
    keep = s_top > s_ref * jnp.finfo(m.dtype).eps
    sq = jnp.where(keep, jnp.sqrt(jnp.where(keep, s_top, s_ref)), 0.0)
    return u[:, :chi] * sq[None, :], vt[:chi].T * sq[None, :]


def trg_step(t, chi, eps=_EPS, method: str = "gram"):
    """One Levin–Nave coarse-graining step: 2 plaquette sites -> 1 site.

    Even sublattice splits (u,r)|(d,l), odd splits (l,u)|(r,d); the four
    inward-facing half-tensors of each alternate plaquette contract into
    the new tensor, whose legs are the old sites' split bonds.
    """
    d = t.shape[0]
    chi_eff = min(chi, d * d)
    ma = t.reshape(d * d, d * d)                      # (u,r) x (d,l)
    mb = jnp.moveaxis(t, 3, 0).reshape(d * d, d * d)  # (l,u) x (r,d)
    f1, f2 = _split(ma, chi_eff, eps, method)
    f3, f4 = _split(mb, chi_eff, eps, method)
    f1 = f1.reshape(d, d, -1)   # [u, r, k]
    f2 = f2.reshape(d, d, -1)   # [d, l, k]
    f3 = f3.reshape(d, d, -1)   # [l, u, k]
    f4 = f4.reshape(d, d, -1)   # [r, d, k]
    # Plaquette contraction; new legs (u,r,d,l) = (k of F2, F3, F1, F4).
    return jnp.einsum("wxa,xyb,yzc,zwd->cbad", f1, f3, f2, f4)


def trg_free_energy(beta, *, chi: int = 24, n_steps: int = 24,
                    eps: float = _EPS, dtype=jnp.float64,
                    split_method: str = "auto", unroll: bool = False):
    """ln Z per site of the 2D Ising model via TRG; differentiable in beta.

    After ``n_steps`` halvings the residual lattice of N/2^n sites is
    closed with the single-site torus trace.

    ``split_method="auto"`` resolves by dtype: ``"gram"`` in f64 (2x
    faster on CPU), ``"subspace"`` in f32 — squaring the plaquette
    matrix pushes the kept tail of the spectrum below f32 roundoff once
    chi ≳ 20 (σ_chi/σ_1 ~ 1e-8 squares to 1e-16 < f32 eps) so the Gram
    split reconstructs noise there, while the randomized-sketch
    truncated SVD (:func:`~..ops.decomp.svd_safe_truncated`) is both
    the fastest TPU tier (matmul-only forward: 80 ms vs 1.04 s for the
    full-SVD flow at chi=30) and the most f32-accurate (its reductions
    ride HIGHEST-precision matmuls instead of the TPU svd's internal
    f32 QR sweeps: lnZ err 3e-5 vs 3e-4).

    ``unroll=True`` replaces the shape-stable ``lax.scan`` over
    renormalization steps with a Python loop.  This exists for ONE
    reason: transposing a ``lax.scan`` at second order drops the nested
    custom eigh/svd rules and falls back to the builtin derivative,
    which divides by the TRG matrices' exact-degenerate gaps — so
    ``jax.grad(jax.grad(trg_free_energy))`` over the scanned flow is
    NaN.  Supported order-2 routes: (a) nested forward mode
    (:func:`ising_observables` — jvp-of-jvp never transposes the scan),
    or (b) ``unroll=True``, which keeps reverse-over-reverse intact at
    the cost of O(n_steps) longer traces/compiles.
    """
    # Canonicalize FIRST: with x64 disabled (the TPU configuration) the
    # default f64 request silently truncates to f32, and resolving "auto"
    # from the *requested* dtype then picks the f64-only "gram" split,
    # whose squared spectrum reconstructs noise in f32 — second
    # derivatives NaN (caught by the real-chip test lane).
    # (dtype-level canonicalization, not jnp.zeros, so no array is
    # created and no truncation UserWarning is emitted per call.)
    dtype = jax.dtypes.canonicalize_dtype(jnp.dtype(dtype))
    if split_method == "auto":
        split_method = "gram" if jnp.finfo(dtype).bits >= 64 else "subspace"
    # TPU's default matmul precision is bf16 (MXU passthrough), which
    # costs ~3e-3 absolute in lnZ through the iterated contractions;
    # these matrices are tiny (<= chi^2 square), so full-f32 multiply
    # passes are free.  No-op on CPU f64.
    with jax.default_matmul_precision("highest"):
        return _trg_free_energy_impl(beta, chi=chi, n_steps=n_steps, eps=eps,
                                     dtype=dtype, split_method=split_method,
                                     unroll=unroll)


def _trg_free_energy_impl(beta, *, chi, n_steps, eps, dtype, split_method,
                          unroll=False):
    t = ising_vertex_tensor(beta, dtype=dtype)
    logz = jnp.zeros((), dtype=dtype)
    # Growth phase: the bond dimension doubles-then-caps (2 -> 4 -> 16 ->
    # chi), so each of these few steps has a distinct shape and is
    # Python-unrolled.  Once d == min(chi, d*d) the step is shape-stable
    # and the remaining flow runs as ONE lax.scan body — compile time is
    # O(1) in n_steps instead of O(n_steps) svd compilations (the TPU
    # backend pays ~40 s per distinct decomposition shape).
    used = 0
    while used < n_steps and t.shape[0] != min(chi, t.shape[0] ** 2):
        norm = jnp.max(jnp.abs(t))
        t = t / norm
        logz = logz + jnp.log(norm) / (2 ** used)
        t = trg_step(t, chi, eps, split_method)
        used += 1

    if used < n_steps:
        def scan_body(carry, _):
            t, logz, w = carry
            norm = jnp.max(jnp.abs(t))
            t = t / norm
            logz = logz + jnp.log(norm) * w
            return (trg_step(t, chi, eps, split_method), logz, w * 0.5), None

        w0 = jnp.asarray(1.0 / (2 ** used), dtype)
        if unroll:
            carry = (t, logz, w0)
            for _ in range(n_steps - used):
                carry, _ = scan_body(carry, None)
            t, logz, _ = carry
        else:
            (t, logz, _), _ = jax.lax.scan(
                scan_body, (t, logz, w0), None, length=n_steps - used)
    norm = jnp.max(jnp.abs(t))
    t = t / norm
    logz = logz + jnp.log(norm) / (2 ** n_steps)
    trace = jnp.einsum("urur->", t)
    return logz + jnp.log(trace) / (2 ** n_steps)


# ---------------------------------------------------------------------------
# CTMRG (symmetric, single corner/edge — exploits the full symmetry of T)
# ---------------------------------------------------------------------------

def ctmrg_environment(beta, *, chi: int = 32, n_steps: int = 40,
                      eps: float = _EPS, dtype=jnp.float64,
                      eigh_solver: str = "truncated", lanczos_k: int = 0):
    """Converged (C, E, T): corner (chi, chi) and edge (chi, D, chi).

    Each step absorbs a row+column into the corner, diagonalizes the
    enlarged corner with the **framework's own truncated dominant
    eigensolver**, truncates to the top chi eigenvectors, and
    renormalizes the edge with the same isometry — the reference's CTMRG
    loop runs through the package solver the same way (SURVEY.md §3.3),
    differentiable end-to-end.

    ``eigh_solver`` selects the renormalization decomposition:

    * ``"truncated"`` (default): :func:`~..ops.decomp.eigh_safe_truncated`
      — full dense ``eigh`` forward, tangents assembled only for the kept
      columns (O(n²χ) instead of O(n³) derivative cost);
    * ``"lanczos"``: :func:`~..ops.eigh.dominant_eigh_multi` — the block
      Krylov solver with block-deflated IFT tangents (the matrix-free
      tier; ``lanczos_k`` overrides its k budget, default 2χ+16);
    * ``"full"``: :func:`~..ops.decomp.eigh_safe` + explicit
      magnitude-sort truncation (round-1 behavior, kept as the oracle).

    The corner fixed point is PSD (it is a Gram-like object of the
    positive Boltzmann weight), so top-by-algebraic-value truncation
    ("truncated"/"lanczos") and top-by-magnitude ("full") keep the same
    subspace; the tests assert the free energies agree.
    """
    if eigh_solver not in ("truncated", "lanczos", "full"):
        raise ValueError(f"unknown eigh_solver {eigh_solver!r}")
    t = ising_vertex_tensor(beta, dtype=dtype)
    d = t.shape[0]
    # Free-boundary initialization.  Conventions (NW corner, top edge):
    #   C[a, b]   : a = down chi-leg, b = right chi-leg (symmetric).
    #   E[p, m, q]: p = left chi-leg, m = down D-leg, q = right chi-leg
    #               (the same tensor serves every side by symmetry).
    c = jnp.einsum("urdl->dr", t)
    e = jnp.einsum("urdl->ldr", t)

    def step(c, e):
        chi_c = c.shape[0]
        chi_eff = min(chi, chi_c * d)
        # Absorb one row+column into the corner:
        # C'[(p, i), (q, j)] = sum C[a,b] E_left[a,l,p] E_top[b,u,q] T[u,j,i,l]
        cp = jnp.einsum("ab,alp,buq,ujil->piqj", c, e, e, t)
        cp = cp.reshape(chi_c * d, chi_c * d)
        cp = (cp + cp.T) / 2
        if eigh_solver == "truncated":
            wk, p = eigh_safe_truncated(cp, chi_eff, eps)
        elif eigh_solver == "lanczos":
            from ..ops.eigh import dominant_eigh_multi
            k = lanczos_k or min(cp.shape[0], 2 * chi_eff + 16)
            wk, p = dominant_eigh_multi(
                DenseOperator(cp), r=chi_eff, k=k, extreme="max",
                gap_eps=max(eps, 1e-12))
        else:
            w, v = eigh_safe(cp, eps)
            order = jnp.argsort(-jnp.abs(w))[:chi_eff]
            wk = w[order]
            p = v[:, order]                  # isometry ((chi*d), chi_eff)
        scale = jnp.max(jnp.abs(wk))
        c_new = jnp.diag(wk / scale)
        # Renormalize edge: E'[k, d, k'] =
        #   sum P[(a,l),k] E[a,u,b] T[u,r,d,l] P[(b,r),k']
        p3 = p.reshape(chi_c, d, chi_eff)
        ep = jnp.einsum("alk,aub,urdl,brq->kdq", p3, e, t, p3)
        return c_new, ep / jnp.max(jnp.abs(ep))

    # Growth phase: the environment dimension changes shape every step
    # until it saturates at chi, so these steps are Python-unrolled (each
    # compiles once); the remaining fixed-shape steps run as one
    # lax.scan body — O(1) compile regardless of n_steps.
    used = 0
    while used < n_steps and c.shape[0] < chi:
        c, e = step(c, e)
        used += 1

    if used < n_steps:
        def scan_body(carry, _):
            return step(*carry), None

        (c, e), _ = jax.lax.scan(scan_body, (c, e), None,
                                 length=n_steps - used)
    return c, e, t


def ctmrg_free_energy(beta, *, chi: int = 32, n_steps: int = 40,
                      eps: float = _EPS, dtype=jnp.float64,
                      eigh_solver: str = "truncated"):
    """ln Z per site from the converged CTMRG environment.

    kappa = A * B / (N_h * N_v): A is the 3x3 network with T in the
    center, B the 2x2 corner trace, N_h/N_v the half networks with one
    edge pair — the standard corner-transfer expression, invariant under
    the C/E normalizations.
    """
    # Full-f32 multiply passes on TPU (see trg_free_energy for why).
    with jax.default_matmul_precision("highest"):
        c, e, t = ctmrg_environment(beta, chi=chi, n_steps=n_steps, eps=eps,
                                    dtype=dtype, eigh_solver=eigh_solver)
        # A: corners at NW,NE,SE,SW with edges between, T in the center
        # (clockwise; each edge's D-leg contracts the matching T leg).
        a = jnp.einsum("ab,buc,cd,dre,ef,fvg,gh,hla,urvl->",
                       c, e, c, e, c, e, c, e, t)
        b = jnp.trace(c @ c @ c @ c)
        nh = jnp.einsum("ab,buc,cd,de,euf,fa->", c, e, c, c, e, c)
        return jnp.log(a) + jnp.log(b) - 2.0 * jnp.log(nh)


def transfer_operator(c, e, t) -> DenseOperator:
    """Row-to-row transfer operator on the (chi, D, chi) boundary space.

    M[(a,u,b),(c2,v,d2)] = sum_{m,n} E[a,m,c2] T[m,v,n,u] E[b,n,d2] —
    the object whose dominant eigenpair the reference computes with
    ``DominantEig`` (reference ``eig.py`` application; SURVEY.md §3.4).
    """
    chi_c, d = e.shape[0], e.shape[1]
    m = jnp.einsum("amc,mvnu,bnd->aubcvd", e, t, e)
    dim = chi_c * d * chi_c
    return DenseOperator(m.reshape(dim, dim))


def transfer_spectral_gap(beta, *, chi: int = 16, n_steps: int = 30,
                          num_iters: int = 400, dtype=jnp.float64,
                          method: str = "arnoldi"):
    """Dominant transfer eigenvalue via the framework's non-symmetric
    eigensolver on the converged environment; differentiable in beta.

    Defaults to the Arnoldi-seeded forward: near criticality the
    transfer spectrum is nearly degenerate and plain power iteration
    converges at the O(1/gap) rate this function exists to measure."""
    c, e, t = ctmrg_environment(beta, chi=chi, n_steps=n_steps, dtype=dtype)
    op = transfer_operator(c, e, t)
    lam, l, r = dominant_eig(op, num_iters=num_iters, method=method,
                             arnoldi_k=min(48, op.dim))
    return lam


def correlation_length(beta, *, chi: int = 16, n_steps: int = 30,
                       num_iters: int = 600, dtype=jnp.float64):
    """Correlation length xi = 1 / ln(lam1/|lam2|) from the two leading
    transfer eigenvalues via :func:`~..ops.eig.dominant_eig_multi`
    (m=2 Wielandt deflation, Arnoldi-seeded — both solves face the
    near-degenerate spectra this observable exists to probe), so the
    whole chain (CTMRG environment -> top-2 eigentriples -> xi) is
    differentiable in beta.  Valid in the disordered phase (simple
    Perron root); in the ordered phase the top pair degenerates, the
    numerical gap shrinks to round-off and can even go negative, so it
    is clamped at machine epsilon — xi then saturates at a huge
    POSITIVE value (~1/eps), signaling divergence instead of returning
    a nonsense negative length.
    """
    from ..ops.eig import dominant_eig_multi

    c, e, t = ctmrg_environment(beta, chi=chi, n_steps=n_steps, dtype=dtype)
    op = transfer_operator(c, e, t)
    lams, _, _ = dominant_eig_multi(op, m=2, num_iters=num_iters,
                                    arnoldi_k=min(48, op.dim))
    gap = jnp.log(lams[0] / jnp.abs(lams[1]))
    return 1.0 / jnp.maximum(gap, jnp.finfo(jnp.asarray(lams).dtype).eps)


# ---------------------------------------------------------------------------
# Observables (differentiate lnZ through the contraction)
# ---------------------------------------------------------------------------

# (value, f', f'') in one pass: shared nested-forward helper
# (ops.observables.value_d1_d2, imported at the top).


def ising_observables(beta, *, method: str = "trg", chi: int = 24,
                      n_steps: int = 24, dtype=jnp.float64):
    """(lnZ/N, energy per site, specific heat per site) at ``beta``.

        u = -d(lnZ)/d(beta),     c_v = beta^2 d^2(lnZ)/d(beta)^2,

    computed by differentiating through the full renormalization flow —
    the reference's flagship second-derivative application (SURVEY.md
    §3.3).
    """
    f = {"trg": trg_free_energy, "ctmrg": ctmrg_free_energy}[method]
    lnz_fn = lambda b: f(b, chi=chi, n_steps=n_steps, dtype=dtype)
    beta = jnp.asarray(beta, dtype=dtype)
    # Forward-over-forward, NOT grad(grad(...)): the flows scan over
    # renormalization steps whose bodies call the degeneracy-safe
    # decompositions (custom_jvp rules that nest another custom_jvp call
    # in their tangent body).  Transposing a lax.scan at second order
    # silently DROPS such nested custom rules and falls back to the
    # builtin eigh/svd derivative, which divides by exact-degenerate
    # gaps -> NaN (TRG plaquette matrices carry exact symmetry
    # multiplets).  Pure jvp-of-jvp never transposes the scan, keeps the
    # nested rules, and is also the efficient mode for scalar->scalar.
    lnz, d1, d2lnz = _value_d1_d2(lnz_fn, beta)
    return lnz, -d1, beta ** 2 * d2lnz
