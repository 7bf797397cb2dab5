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
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


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
    w, v = eigh_safe(a, eps)
    da = (da + da.T.conj()) / 2
    vt_da_v = v.T.conj() @ da @ v
    dw = jnp.real(jnp.diag(vt_da_v))
    # dv_i = sum_{j != i} v_j (v_j^T dA v_i) / (λi - λj): with
    # gap[j, i] = λi - λj, the coefficient matrix is f ∘ (V^T dA V).
    gap = w[None, :] - w[:, None]
    f = gap / (gap * gap + eps * eps)
    f = f * (1.0 - jnp.eye(w.shape[0], dtype=w.dtype))
    dv = v @ (f * vt_da_v)
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
    da = (da + da.T.conj()) / 2
    # eigh_safe (not raw eigh): second-order AD differentiates THIS rule's
    # body, so the inner decomposition needs safe derivatives too.
    w_full, v_full = eigh_safe(a, eps)
    w = w_full[::-1][:r]
    v = v_full[:, ::-1][:, :r]
    da_v = da @ v                               # (n, r)
    m = v_full.T.conj() @ da_v                  # (n, r): basis coeffs
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
    dv = v_full @ (f * m)
    return (w, v), (dw, dv)


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
    u, s, vt = svd_safe(a, eps)
    v = vt.T
    dp = u.T @ da @ v                       # U^T dA V
    ds = jnp.diagonal(dp)
    s2 = s * s
    gap = s2[None, :] - s2[:, None]         # gap[i, j] = s_j^2 - s_i^2
    f = gap / (gap * gap + eps * eps)
    f = f * (1.0 - jnp.eye(s.shape[0], dtype=s.dtype))
    # dU = U (F ∘ (dP Σ + Σ dP^T)),  dV = V (F ∘ (Σ dP + dP^T Σ)).
    du = u @ (f * (dp * s[None, :] + s[:, None] * dp.T))
    dv = v @ (f * (s[:, None] * dp + dp.T * s[None, :]))
    return (u, s, vt), (du, ds, dv.T)
