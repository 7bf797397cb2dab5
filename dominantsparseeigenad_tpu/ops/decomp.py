"""Degeneracy-safe differentiable full eigendecomposition.

The TRG/CTMRG application (reference ``examples/CTMRG``; SURVEY.md §2.2 A3)
differentiates the free energy through *truncated* eigendecompositions of
symmetric corner/plaquette matrices.  Those spectra carry exact symmetry
multiplets, and the textbook eigh derivative divides by eigenvalue gaps
``1/(λi - λj)`` — NaN at degeneracy (SURVEY.md §7 hard part 2).

The standard cure from the differentiable-tensor-network literature is a
**Lorentzian broadening** of the gap inverse,

    F_ij = (λj - λi) / ((λj - λi)^2 + ε²),   F_ii = 0,

which leaves non-degenerate pairs untouched (ε² ≈ 1e-24 in f64) and sends
the *intra-multiplet* rotation modes to zero instead of ∞.  Physical
observables (free energy, energy, specific heat) are invariant under
intra-multiplet gauge rotations, so dropping those modes is exact for
them; this is the same regularization the autodiff-TRG papers use
(PAPERS.md: Liao, Liu, Wang & Xiang, "Differentiable Programming Tensor
Networks", PRX 9, 031041 (2019)).

Implemented as a ``jax.custom_jvp`` whose tangent rule is built from
plain linear algebra on the primal eigenbasis — so it transposes (reverse
mode) and re-differentiates (second derivatives for the specific heat)
like everything else in this framework.

.. warning:: **lax.scan + second-order reverse mode.**  Each rule below
   re-enters its own protected decomposition (e.g. ``_eigh_safe_jvp``
   calls ``eigh_safe``) so that *re-differentiating the rule* stays
   degeneracy-safe.  JAX currently drops such *nested* custom_jvp rules
   when it transposes a ``lax.scan`` whose body contains them — verified
   empirically (2026-08, jax 0.6-era): ``grad(grad(scan(body)))`` falls
   back to the builtin eigh/svd tangent (``1/gap`` — NaN at exact
   degeneracy) while the unrolled loop honors the nested rule.  Pure
   forward-over-forward (``jvp`` of ``jvp``) never transposes the scan
   and keeps the rules; use it for second derivatives of scanned
   renormalization flows (see ``models/ising2d.py:_value_d1_d2``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Derivative-rule GEMMs are pinned to HIGHEST precision (shared policy,
# operators.hmatmul): on TPU the DEFAULT (n,n)@(n,r) matmul is one bf16
# pass (~2.5e-3 relative — chip-measured in ops/operators.py), and these
# matmuls directly set GRADIENT digits of the TRG/CTMRG flows.  The
# FORWARD decompositions keep the caller's dtype/precision choice — the
# compute tier is the user's knob, the rule's accuracy is not.
from .operators import hmatmul as _mm


def _eps_floor(eps: float, dtype) -> float:
    """Dtype-aware broadening floor.

    Second-order AD of the Lorentzian factor evaluates up to
    ``(gap² + eps²)³`` in the working dtype: the default f64 scale
    (1e-12) underflows that denominator in f32 (1e-72 -> 0 -> 0/0 NaN).
    8x the machine epsilon keeps eps⁶ above the smallest normal in both
    f32 (~1e-6 -> 1e-36 > 1.2e-38) and f64 (where it is ~1.8e-15, below
    the 1e-12 default, i.e. a no-op).
    """
    return max(float(eps), 8.0 * float(np.finfo(dtype).eps))


@partial(jax.custom_jvp, nondiff_argnums=(1,))
def eigh_safe(a: jax.Array, eps: float = 1e-12):
    """Full symmetric eigendecomposition with degeneracy-safe derivatives.

    Returns ``(w, v)`` like ``jnp.linalg.eigh`` (ascending eigenvalues,
    orthonormal columns).  ``eps`` is the Lorentzian broadening scale: a
    gap ``|λi - λj| >> eps`` gives the exact derivative; gaps ``<< eps``
    (true multiplets) contribute ~0 instead of NaN.
    """
    w, v = jnp.linalg.eigh((a + a.T.conj()) / 2)
    return w, v  # plain tuple: the JVP rule's output structure must match


@eigh_safe.defjvp
def _eigh_safe_jvp(eps, primals, tangents):
    (a,) = primals
    (da,) = tangents
    eps = _eps_floor(eps, a.dtype)
    w, v = eigh_safe(a, eps)
    da = (da + da.T.conj()) / 2
    vt_da_v = _mm(_mm(v.T.conj(), da), v)
    dw = jnp.real(jnp.diag(vt_da_v))
    # dv_i = sum_{j != i} v_j (v_j^T dA v_i) / (λi - λj): with
    # gap[j, i] = λi - λj, the coefficient matrix is f ∘ (V^T dA V).
    gap = w[None, :] - w[:, None]
    f = gap / (gap * gap + eps * eps)
    f = f * (1.0 - jnp.eye(w.shape[0], dtype=w.dtype))
    dv = _mm(v, f * vt_da_v)
    return (w, v), (dw, dv)


@partial(jax.custom_jvp, nondiff_argnums=(1, 2))
def eigh_safe_truncated(a: jax.Array, r: int, eps: float = 1e-12):
    """Top-r (largest) eigenpairs of a symmetric matrix with
    degeneracy-safe derivatives, computed by a full ``eigh`` forward but
    with tangents evaluated **only for the kept columns** — the tangent
    matmuls scale as O(n² r) instead of O(n³), which dominates
    reverse-mode cost when r << n (e.g. truncated renormalization steps).

    Returns ``(w, v)`` with ``w`` (r,) descending and ``v`` (n, r).
    """
    w, v = jnp.linalg.eigh((a + a.T.conj()) / 2)
    return w[::-1][:r], v[:, ::-1][:, :r]


@eigh_safe_truncated.defjvp
def _eigh_safe_truncated_jvp(r, eps, primals, tangents):
    (a,) = primals
    (da,) = tangents
    eps = _eps_floor(eps, a.dtype)
    da = (da + da.T.conj()) / 2
    # eigh_safe (not raw eigh): second-order AD differentiates THIS rule's
    # body, so the inner decomposition needs safe derivatives too.
    w_full, v_full = eigh_safe(a, eps)
    w = w_full[::-1][:r]
    v = v_full[:, ::-1][:, :r]
    da_v = _mm(da, v)                           # (n, r)
    m = _mm(v_full.T.conj(), da_v)              # (n, r): basis coeffs
    dw = jnp.real(jnp.einsum("ni,ni->i", v.conj(), da_v))
    # dv_i = sum_{j != i} v_j <v_j, dA v_i> / (lam_i - lam_j), broadened.
    gap = w[None, :] - w_full[:, None]          # (n, r): lam_i - lam_j
    f = gap / (gap * gap + eps * eps)
    # Zero out the self terms: kept column i corresponds to full index
    # n-1-i after the descending reorder.
    n = w_full.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, r), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, r), 1)
    f = jnp.where(rows == n - 1 - cols, 0.0, f)
    dv = _mm(v_full, f * m)
    return (w, v), (dw, dv)


@partial(jax.custom_jvp, nondiff_argnums=(1, 2, 3, 4))
def svd_safe_truncated(a: jax.Array, r: int, eps: float = 1e-12,
                       oversample: int = 16, power_iters: int = 2):
    """Top-r SVD of a (possibly rectangular) matrix via randomized
    subspace iteration, with degeneracy-safe derivatives.

    The forward is Halko-Martinsson-Tropp: sketch ``Y = (A Aᵀ)^q A Ω``
    with a fixed-seed Gaussian ``Ω (m, r+p)``, orthonormalize, and take
    the exact SVD of the small ``(r+p, m)`` projection.  Everything
    except one small QR and one small SVD is a matmul — on TPU this
    replaces the O(n³) sequential full SVD with MXU work; rapidly
    decaying spectra (TRG/CTMRG renormalization matrices) are the
    best case for the sketch's error bound (~σ_{r+p}).

    The JVP is the *truncated* SVD tangent rule: kept-block rotations
    through the Lorentzian-broadened ``1/(σ_j² - σ_i²)`` (as
    :func:`svd_safe`) plus the orthogonal-complement terms
    ``(I - UUᵀ) dA V Σ⁻¹`` / ``(I - VVᵀ) dAᵀ U Σ⁻¹`` — it needs only
    the kept factors, so the tangent cost is O(n m r).

    Returns ``(u, s, vt)`` with ``u (n, r)``, ``s (r,)`` descending,
    ``vt (r, m)``.
    """
    n, m = a.shape
    k = min(r + oversample, min(n, m))
    # Fixed-key Gaussian sketch: deterministic, and small enough that
    # XLA constant-folding it is harmless (n*k floats).
    omega = jax.random.normal(jax.random.PRNGKey(0x5eed), (m, k), a.dtype)
    y = a @ omega
    for _ in range(power_iters):
        # Re-orthonormalize between passes for numerical stability of
        # the power iteration (subspace, not values, so cheap QR).
        q, _ = jnp.linalg.qr(y)
        y = a @ (a.T.conj() @ q)
    q, _ = jnp.linalg.qr(y)                      # (n, k) orthonormal
    b = q.T.conj() @ a                           # (k, m) small projection
    ub, s, vt = jnp.linalg.svd(b, full_matrices=False)
    u = q @ ub
    return u[:, :r], s[:r], vt[:r]


@svd_safe_truncated.defjvp
def _svd_safe_truncated_jvp(r, eps, oversample, power_iters,
                            primals, tangents):
    (a,) = primals
    (da,) = tangents
    eps = _eps_floor(eps, a.dtype)
    n, m = a.shape
    k = min(r + oversample, min(n, m))
    # Recompute the SKETCH-WINDOW factors (k = r+p triplets): rotations
    # are then exact (broadened) for couplings to everything the sketch
    # resolved, and the 1/σ complement approximation only covers modes
    # below σ_k ~ σ_1·O(1e-8) — without this, quasi-degenerate pairs
    # straddling the r-cut (TRG truncation boundaries) cost ~1% in
    # second derivatives.
    uk, sk, vtk = svd_safe_truncated(a, k, eps, 0, power_iters)
    vk = vtk.T.conj()
    u, s, v = uk[:, :r], sk[:r], vk[:, :r]
    da_v = _mm(da, v)                           # (n, r)
    dat_u = _mm(da.conj().T, u)                 # (m, r)
    p1 = _mm(uk.T.conj(), da_v)                 # (k, r): <u_j, dA v_i>
    p2 = _mm(vk.T.conj(), dat_u)                # (k, r): <v_j, dAᵀ u_i>
    ds = jnp.real(jnp.diagonal(p1[:r]))
    gap = s[None, :] ** 2 - sk[:, None] ** 2    # gap[j, i] = σ_i² - σ_j²
    f = gap / (gap * gap + eps * eps)
    rows = jax.lax.broadcasted_iota(jnp.int32, (k, r), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (k, r), 1)
    f = jnp.where(rows == cols, 0.0, f)
    du = _mm(uk, f * (p1 * s[None, :] + sk[:, None] * p2))
    dv = _mm(vk, f * (p2 * s[None, :] + sk[:, None] * p1))
    # Orthogonal-complement terms for modes beyond the sketch window;
    # guard σ⁻¹ against (near-)zero kept values.
    s_ref = jnp.maximum(s[0], jnp.finfo(s.dtype).tiny)
    ok = s > s_ref * jnp.finfo(s.dtype).eps
    sinv = jnp.where(ok, 1.0 / jnp.where(ok, s, 1.0), 0.0)
    du = du + (da_v - _mm(uk, _mm(uk.T.conj(), da_v))) * sinv[None, :]
    dv = dv + (dat_u - _mm(vk, _mm(vk.T.conj(), dat_u))) * sinv[None, :]
    if jnp.iscomplexobj(a):
        # Complex diagonal coupling: Im<u_i, dA v_i> fixes the RELATIVE
        # phase tangent of (u_i, v_i) — α_i - β_i = Im(P_ii)/σ_i with
        # u_i^H du_i = iα_i, v_i^H dv_i = iβ_i; only the common phase is
        # gauge.  Dropping it (the old rule) gave O(||dA||)-wrong
        # tangents for any functional mixing u and v (round-4 review,
        # FD-verified 0.13 absolute error).  Convention follows the
        # upstream jax svd rule: the whole term rides on dU (β_i = 0).
        du = du + u * (1j * jnp.imag(jnp.diagonal(p1[:r]))
                       * sinv)[None, :]
    return (u, s, v.conj().T), (du, ds, dv.conj().T)


@partial(jax.custom_jvp, nondiff_argnums=(1,))
def svd_safe(a: jax.Array, eps: float = 1e-12):
    """SVD of a *square* matrix with degeneracy-safe derivatives.

    Returns ``(u, s, vt)`` with descending singular values.  Same
    Lorentzian-broadening idea as :func:`eigh_safe`, applied to the
    ``1/(s_j^2 - s_i^2)`` factors of the SVD tangent rule; the
    orthogonal-complement terms of the general rule vanish because the
    economy SVD of a square matrix is complete.  Needed by TRG: after one
    coarse-graining the plaquette matrices are genuinely non-symmetric,
    so an eigendecomposition split is wrong — the reference's TRG uses
    ``torch.svd`` for the same reason.
    """
    if a.shape[0] != a.shape[1]:
        raise ValueError("svd_safe expects a square matrix")
    u, s, vt = jnp.linalg.svd(a, full_matrices=False)
    return u, s, vt  # plain tuple to match the JVP rule's structure


@svd_safe.defjvp
def _svd_safe_jvp(eps, primals, tangents):
    (a,) = primals
    (da,) = tangents
    eps = _eps_floor(eps, a.dtype)
    u, s, vt = svd_safe(a, eps)
    # Conjugate-aware throughout (real dtypes: all conj are no-ops).
    # The old real-only form (v = vt.T, dp.T, complex ds) returned a
    # complex tangent for the real s — a hard TypeError under jvp — and
    # the wrong adjoint for complex factors (round-4 review).
    v = vt.conj().T
    dp = _mm(_mm(u.conj().T, da), v)        # U^H dA V
    ds = jnp.real(jnp.diagonal(dp))
    s2 = s * s
    gap = s2[None, :] - s2[:, None]         # gap[i, j] = s_j^2 - s_i^2
    f = gap / (gap * gap + eps * eps)
    f = f * (1.0 - jnp.eye(s.shape[0], dtype=s.dtype))
    # dU = U (F ∘ (dP Σ + Σ dP^H)),  dV = V (F ∘ (Σ dP + dP^H Σ)).
    du = _mm(u, f * (dp * s[None, :] + s[:, None] * dp.conj().T))
    dv = _mm(v, f * (s[:, None] * dp + dp.conj().T * s[None, :]))
    if jnp.iscomplexobj(a):
        # Relative-phase diagonal coupling (see the truncated rule):
        # Im(P_ii)/σ_i rides on dU, jax-convention.
        tiny = jnp.finfo(s.dtype).tiny
        du = du + u * (1j * jnp.imag(jnp.diagonal(dp))
                       / jnp.maximum(s, tiny))[None, :]
    return (u, s, vt), (du, ds, dv.conj().T)
