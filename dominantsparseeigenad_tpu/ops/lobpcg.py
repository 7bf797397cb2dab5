"""LOBPCG block forward engine for extremal eigenpairs.

Locally Optimal Block Preconditioned Conjugate Gradient (Knyazev 2001) —
an alternative Krylov forward to :func:`~.lanczos.lanczos_eigh` /
:func:`~.eigh.dominant_eigh_multi`'s single Lanczos sweep.  The reference
library has no block solver at all (its ``Lanczos.py`` computes one
extremal pair; SURVEY.md §2.1 C1), so this is a north-star addition, and
it is the *TPU-shaped* one:

* every iteration is ONE blocked matvec of width ``r`` (``A @ [W]``) plus
  a handful of (N, 3r) x (3r, 3r) GEMMs — all MXU work, no length-k
  sequential scan;
* it accepts an SPD **preconditioner** in the iteration itself (Lanczos
  cannot), which is where ill-conditioned Hamiltonians win big;
* memory is O(N * 3r) regardless of how many iterations convergence
  takes — no (N, k) basis to store or re-orthogonalize.

Numerical scheme (static shapes throughout, jit/`lax.while_loop` safe):
the search subspace ``S = [X, W, P]`` (current block, preconditioned
residuals, previous update directions) is orthonormalized by a
symmetric-eigendecomposition whitening of the 3r x 3r Gram matrix with
**masked dropping**: near-null Gram directions are zeroed and their
Rayleigh-Ritz eigenvalues pushed just above the spectrum so the
static-shape Ritz selection never picks them — the fixed-shape analogue
of scipy/Knyazev's basis dropping.  ``A S`` is tracked through the same linear transforms,
so orthonormalization and Rayleigh-Ritz cost no extra matvecs.

Differentiability: this module is forward-only (like every Krylov engine
here — gradients come from the implicit-function-theorem rule in
``eigh.py``).  Use ``dominant_eigh_multi(..., method="lobpcg")`` for the
differentiable version.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

# All basis-hygiene GEMMs run at HIGHEST precision (shared policy in
# operators.hmatmul): the TPU bf16 default breaks Gram orthonormality.
from .operators import (as_operator, hmatmul as _mm, pivot_gauge,
                        tol_floor)

class LobpcgInfo(NamedTuple):
    """Convergence report (float scalars — safe as custom_jvp outputs).

    iterations : LOBPCG iterations executed
    residual   : final max over the block of
                 ``||A x - lam x|| / max(|lam|, 1)``
    converged  : 1.0 if the residual test passed before ``maxiter``
    """

    iterations: jax.Array
    residual: jax.Array
    converged: jax.Array


def _colnormalize(blocks):
    """Scale columns of the first block to unit norm, applying the same
    scale to the companion blocks (A*/B*-images).  Shared by the
    standard and the generalized loop — keep the two in lockstep (the
    B=I parity test pins their equivalence)."""
    m = blocks[0]
    real_dtype = jnp.finfo(m.dtype).dtype
    nrm = jnp.linalg.norm(m, axis=0)
    scl = jnp.where(nrm > jnp.finfo(real_dtype).tiny,
                    1.0 / jnp.maximum(nrm, jnp.finfo(real_dtype).tiny),
                    0.0).astype(m.dtype)
    return tuple(b * scl[None, :] for b in blocks)


def _whiten_metric(S, MS, companions, drop_tol):
    """Orthonormalize the columns of ``S`` in the metric whose image is
    ``MS`` (Euclidean: MS = S; B-metric: MS = B S) by Gram whitening,
    applying the same linear transform to every companion block;
    near-dependent directions are dropped by masking (columns zeroed,
    mask returned) instead of shrinking shapes.  ONE definition of the
    numerically subtle part shared by the standard and the generalized
    loop."""
    g = _mm(S.conj().T, MS)
    g = 0.5 * (g + g.conj().T)
    d, u = jnp.linalg.eigh(g)
    keep = d > drop_tol * jnp.maximum(d[-1], jnp.finfo(d.dtype).tiny)
    scale = jnp.where(keep, lax.rsqrt(jnp.maximum(d, jnp.finfo(d.dtype).tiny)),
                      0.0).astype(S.dtype)
    t = u * scale[None, :]
    # t is ALSO returned: it maps whitened-basis coefficients back to the
    # original [X, W, P] block coordinates (S_white = S t), which the
    # conjugate-direction update needs — block structure does not survive
    # the whitening.
    return tuple(_mm(c, t) for c in companions), keep, t


def _whiten(S, AS, drop_tol):
    """Euclidean-metric whitening of ``(S, AS)``."""
    (so, aso), keep, t = _whiten_metric(S, S, (S, AS), drop_tol)
    return so, aso, keep, t


def _rayleigh_ritz(So, ASo, keep, r):
    """Ritz pairs of the (masked-)orthonormal basis ``So``; dropped
    directions get an eigenvalue just above the spectrum so the ascending
    top-r never selects them.  The penalty is DYNAMIC (~2·||T||_F), not a
    huge constant: eigh's absolute eigenvalue error scales with the
    matrix norm, so a 1/eps-sized penalty would cost O(||A||·eps/eps) = O(1)
    accuracy in the wanted eigenvalues — observed as divergence in f32."""
    t = _mm(So.conj().T, ASo)
    t = 0.5 * (t + t.conj().T)
    real_dtype = jnp.finfo(t.dtype).dtype
    big = 2.0 * jnp.linalg.norm(t).astype(real_dtype) + 1.0
    penalty = jnp.where(keep, 0.0, big).astype(real_dtype)
    t = t + jnp.diag(penalty).astype(t.dtype)
    evals, evecs = jnp.linalg.eigh(t)
    return evals[:r], evecs[:, :r]


def lobpcg_eigh(op, r: int = 4, *, extreme: str = "min",
                maxiter: int = 200, tol: float = 1e-8, key=None,
                precond=None, with_info: bool = False):
    """Top-``r`` extremal eigenpairs of a symmetric/Hermitian operator by
    preconditioned block iteration (LOBPCG).

    Parameters
    ----------
    op      : LinearOperator (or dense symmetric array); needs ``matmat``.
    r       : block size = number of eigenpairs returned.
    extreme : "min" (algebraically smallest, ascending) or "max"
              (largest, descending — matches ``dominant_eigh_multi``).
    maxiter : static iteration cap (each = 1 width-``r`` blocked matvec).
    tol     : relative residual target ``max_i ||A x_i - lam_i x_i|| /
              max(|lam_i|, 1)`` — floored at 50*eps of the dtype.
    key     : PRNG key for the random start block (default PRNGKey(0)).
    precond : optional SPD approximate inverse applied to the residual
              block, ``W = M^{-1} R``; called with an (N, r) array.
    with_info : also return a :class:`LobpcgInfo`.

    Returns ``(lams, X)`` — ``lams`` (r,) real, ``X`` (N, r) orthonormal
    with the same deterministic pivot-phase gauge as the Lanczos engines —
    or ``(lams, X, info)``.

    .. note:: convergence rate is governed by the spectral gap at the
       BLOCK BOUNDARY, ``lam_{r+1} - lam_r``.  Choose ``r`` so the block
       covers whole degenerate multiplets (e.g. the momentum doublets of
       a periodic spin chain): an ``r`` that splits one has a zero
       boundary gap and converges an order of magnitude slower.  Check
       ``with_info=True`` / ``info.converged`` when in doubt.
    """
    op = as_operator(op)
    if extreme not in ("min", "max"):
        raise ValueError(f"extreme must be min|max, got {extreme!r}")
    r = int(r)
    n = op.dim
    if n < 3 * r:
        raise ValueError(
            f"LOBPCG needs dim >= 3*r for its [X, W, P] subspace; got "
            f"dim={n}, r={r} — use dominant_eigh_multi(method='lanczos')")
    if key is None:
        key = jax.random.PRNGKey(0)
    dtype = op.dtype
    real_dtype = jnp.finfo(dtype).dtype
    sign = 1.0 if extreme == "min" else -1.0
    tol = tol_floor(tol, dtype)
    eps = jnp.finfo(real_dtype).eps
    # Whitening drop threshold: directions this far below the dominant
    # Gram eigenvalue are numerically dependent at working precision.
    drop_tol = 50.0 * eps

    def amat(X):
        return sign * op.matmat(X)

    x0 = jax.random.normal(key, (n, r), real_dtype).astype(dtype)
    zeros = jnp.zeros((n, r), dtype)
    # A random (n, r) block is full rank at working precision, so the
    # whitening mask is all-keep here; AS is tracked from the next matmat.
    x0, _, _, _ = _whiten(x0, zeros, drop_tol)
    ax0 = amat(x0)
    lams0 = jnp.real(jnp.einsum("ni,ni->i", x0.conj(), ax0,
                                 precision=jax.lax.Precision.HIGHEST)).astype(real_dtype)

    def resid_norm(x, ax, lams):
        rblk = ax - x * lams[None, :].astype(dtype)
        nrm = jnp.linalg.norm(rblk, axis=0).astype(real_dtype)
        return rblk, jnp.max(nrm / jnp.maximum(jnp.abs(lams), 1.0))

    _, res0 = resid_norm(x0, ax0, lams0)

    def cond(state):
        _, _, _, _, _, res, it = state
        return (it < maxiter) & (res > tol)

    def body(state):
        x, ax, p, ap, lams, _, it = state
        rblk = ax - x * lams[None, :].astype(dtype)
        w = precond(rblk) if precond is not None else rblk
        # Basis hygiene (Duersch–Shao–Yang 2018): project W off span(X)
        # (twice — "twice is enough") and unit-normalize every column so
        # the 3r x 3r Gram is well-scaled; otherwise the whitening eigh
        # loses the shrinking residual directions against the O(1) X/P
        # columns and the iteration stagnates around sqrt(eps).
        for _pass in range(2):
            w = w - _mm(x, _mm(x.conj().T, w))
        aw = amat(w)
        w, aw = _colnormalize((w, aw))
        s = jnp.concatenate([x, w, p], axis=1)
        a_s = jnp.concatenate([ax, aw, ap], axis=1)
        so, aso, keep, t = _whiten(s, a_s, drop_tol)
        lams_new, y = _rayleigh_ritz(so, aso, keep, r)
        x_new = _mm(so, y)
        ax_new = _mm(aso, y)
        # Next conjugate directions: the W/P contribution to the update,
        # removed in the ORIGINAL [X, W, P] block coordinates.  The
        # whitening mixes the blocks (S_white = S t), so zeroing rows of
        # y would leave an X component inside P — the subspace then
        # collapses towards [X, W] and the method degrades to (slow)
        # block steepest descent: measured 10x the iterations at
        # condition 1e2 and non-convergence at 1e4 (round-4 review,
        # numpy-replicated).  Zero the X rows of t @ y instead — and then
        # orthonormalize the block (Duersch–Shao–Yang "ortho" variant):
        # when the subspace Gram is ill-conditioned (late-stage filter
        # plateaus) t carries rsqrt-of-tiny factors and s @ c_wp is a
        # difference of near-parallel vectors, so a bare column
        # normalization would amplify its round-off garbage into the
        # next basis (observed: Ritz values exploding to 1e63 inside
        # spectral_slice).  Dropped columns zero out harmlessly.
        c_wp = _mm(t, y).at[:r, :].set(0)
        p_raw = _mm(s, c_wp)
        p_raw = p_raw - _mm(x_new, _mm(x_new.conj().T, p_raw))
        (p_new,), _, _ = _whiten_metric(p_raw, p_raw, (p_raw,), drop_tol)
        # A P is RE-APPLIED, not tracked: c_wp carries rsqrt-of-tiny
        # whitening factors near ill-conditioning, so the tracked image
        # a_s @ c_wp loses all consistency to cancellation (observed as
        # Ritz values exploding to 1e79 on filter plateaus).  One extra
        # blocked matvec per iteration buys unconditional stability —
        # cheap against the ~10x iteration savings of the block-correct
        # P update.
        ap_new = amat(p_new)
        _, res = resid_norm(x_new, ax_new, lams_new)
        return (x_new, ax_new, p_new, ap_new,
                lams_new.astype(real_dtype), res, it + 1)

    state0 = (x0, ax0, zeros, zeros, lams0, res0,
              jnp.zeros((), jnp.int32))
    x, ax, _, _, lams, res, it = lax.while_loop(cond, body, state0)

    lams = (sign * lams).astype(real_dtype)
    # Deterministic pivot-phase gauge (shared helper — one definition
    # for every forward engine).
    x = pivot_gauge(x)
    if not with_info:
        return lams, x
    info = LobpcgInfo(
        iterations=it.astype(real_dtype),
        residual=res.astype(real_dtype),
        converged=(res <= tol).astype(real_dtype))
    return lams, x, info


def lobpcg_eigh_general(a, b, r: int = 4, *, extreme: str = "min",
                        maxiter: int = 200, tol: float = 1e-8, key=None,
                        precond=None, with_info: bool = False):
    """Extremal eigenpairs of the generalized symmetric-definite pencil
    ``A x = lam B x`` (``B`` Hermitian positive definite) by LOBPCG with
    B-inner products.

    Same scheme as :func:`lobpcg_eigh`, with the Gram whitening taken in
    the B metric (the Rayleigh-Ritz basis is B-orthonormal, so the small
    projected problem stays standard) and the residual
    ``R = A X - B X Λ``.  Costs one ``A`` and one ``B`` blocked matvec
    per iteration.  The returned block satisfies ``X^H B X = I``.

    Returns ``(lams, X)`` (ascending for "min", descending for "max")
    or ``(lams, X, info)``; ``info.residual`` is
    ``max_i ||A x_i - lam_i B x_i|| / max(|lam_i|, 1)``.
    """
    a = as_operator(a)
    b = as_operator(b)
    if extreme not in ("min", "max"):
        raise ValueError(f"extreme must be min|max, got {extreme!r}")
    if a.dim != b.dim:
        raise ValueError(f"pencil dims differ: A {a.dim} vs B {b.dim}")
    r = int(r)
    n = a.dim
    if n < 3 * r:
        raise ValueError(f"LOBPCG needs dim >= 3*r; got dim={n}, r={r}")
    if key is None:
        key = jax.random.PRNGKey(0)
    dtype = a.dtype
    real_dtype = jnp.finfo(dtype).dtype
    sign = 1.0 if extreme == "min" else -1.0
    tol = tol_floor(tol, dtype)
    drop_tol = 50.0 * jnp.finfo(real_dtype).eps

    def amat(X):
        return sign * a.matmat(X)

    def _whiten_b(S, AS, BS):
        # B-metric whitening: G = S^H (B S); same shared core.
        (so, aso, bso), keep, t = _whiten_metric(S, BS, (S, AS, BS),
                                                 drop_tol)
        return so, aso, bso, keep, t

    x0 = jax.random.normal(key, (n, r), real_dtype).astype(dtype)
    # B(S t) = (B S) t, so the transformed B-block returned by the
    # whitening IS B x0 for the whitened x0 — no extra matmat needed.
    x0, _, bx0, _, _ = _whiten_b(x0, jnp.zeros((n, r), dtype),
                                 b.matmat(x0))
    ax0 = amat(x0)
    lams0 = jnp.real(jnp.einsum(
        "ni,ni->i", x0.conj(), ax0,
        precision=jax.lax.Precision.HIGHEST)).astype(real_dtype)
    zeros = jnp.zeros((n, r), dtype)

    def resid_norm(x, ax, bx, lams):
        rblk = ax - bx * lams[None, :].astype(dtype)
        nrm = jnp.linalg.norm(rblk, axis=0).astype(real_dtype)
        return rblk, jnp.max(nrm / jnp.maximum(jnp.abs(lams), 1.0))

    _, res0 = resid_norm(x0, ax0, bx0, lams0)

    def cond(state):
        return (state[-1] < maxiter) & (state[-2] > tol)

    def body(state):
        x, ax, bx, p, ap, bp, lams, _, it = state
        rblk = ax - bx * lams[None, :].astype(dtype)
        w = precond(rblk) if precond is not None else rblk
        # B-project W off span(X) twice, then column-normalize.
        for _pass in range(2):
            w = w - _mm(x, _mm(bx.conj().T, w))
        aw = amat(w)
        bw = b.matmat(w)
        w, aw, bw = _colnormalize((w, aw, bw))
        s = jnp.concatenate([x, w, p], axis=1)
        a_s = jnp.concatenate([ax, aw, ap], axis=1)
        b_s = jnp.concatenate([bx, bw, bp], axis=1)
        so, aso, bso, keep, t = _whiten_b(s, a_s, b_s)
        lams_new, y = _rayleigh_ritz(so, aso, keep, r)
        x_new, ax_new, bx_new = _mm(so, y), _mm(aso, y), _mm(bso, y)
        # W/P contribution in ORIGINAL block coordinates, then
        # B-orthonormalized against X and within the block (see the
        # standard loop: zeroing rows of y leaves an X component in P,
        # and a bare normalization of s @ c_wp amplifies round-off when
        # the subspace Gram is ill-conditioned).
        c_wp = _mm(t, y).at[:r, :].set(0)
        p_raw = _mm(s, c_wp)
        # B-project off X (X is B-orthonormal; bx_new tracks through the
        # bounded y combination, so it is consistent), then Euclidean-
        # whiten for scale and RE-APPLY both operators — the tracked
        # a_s/b_s @ c_wp images lose consistency to cancellation exactly
        # like the standard loop.
        p_raw = p_raw - _mm(x_new, _mm(bx_new.conj().T, p_raw))
        (p_new,), _, _ = _whiten_metric(p_raw, p_raw, (p_raw,), drop_tol)
        ap_new = amat(p_new)
        bp_new = b.matmat(p_new)
        _, res = resid_norm(x_new, ax_new, bx_new, lams_new)
        return (x_new, ax_new, bx_new, p_new, ap_new, bp_new,
                lams_new.astype(real_dtype), res, it + 1)

    state0 = (x0, ax0, bx0, zeros, zeros, zeros, lams0, res0,
              jnp.zeros((), jnp.int32))
    out = lax.while_loop(cond, body, state0)
    x, lams, res, it = out[0], out[6], out[7], out[8]

    lams = (sign * lams).astype(real_dtype)
    x = pivot_gauge(x)
    if not with_info:
        return lams, x
    info = LobpcgInfo(iterations=it.astype(real_dtype),
                      residual=res.astype(real_dtype),
                      converged=(res <= tol).astype(real_dtype))
    return lams, x, info
