"""Truncated differentiable SVD — dominant singular triplets.

North-star extension (no direct reference analogue; the reference's TRG
uses full ``torch.svd``): the top-r singular triplets of a (possibly
rectangular, possibly matrix-free) operator, computed by running the
block Lanczos eigensolver on the **Hermitian embedding**

    H = [[0, A], [A^T, 0]],   H (u; v) = (A v; A^T u),

whose top-r eigenpairs are (sigma_i, (u_i; v_i)/sqrt(2)).  All
differentiation — including second order and degenerate-cluster safety —
is inherited from :func:`~.eigh.dominant_eigh_multi`'s hybrid IFT rule;
this module only builds the embedding and unpacks the halves.

For square symmetric inputs prefer :func:`~.eigh.dominant_eigh_multi`
directly; for small dense matrices needing the full spectrum use
:func:`~.decomp.svd_safe`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .eigh import dominant_eigh_multi
from .operators import (LinearOperator, MatrixFreeOperator, as_operator,
                        hmatmul as _mm)


def _embed(op: LinearOperator, m: int, n: int) -> MatrixFreeOperator:
    is_complex = jnp.issubdtype(jnp.dtype(op.dtype), jnp.complexfloating)

    def matvec(params, w):
        inner, = params
        u, v = w[:m], w[m:]
        if is_complex:
            # The embedding must be [[0, A], [A^H, 0]] (HERMITIAN), not the
            # complex-symmetric [[0, A], [A^T, 0]] — the operator protocol's
            # rmatvec is the plain transpose, so build the adjoint as
            # A^H u = conj(A^T conj(u)).  With the transpose the Lanczos
            # solve silently returns wrong singular values for complex A.
            down = jnp.conj(inner.rmatvec(jnp.conj(u)))
        else:
            down = inner.rmatvec(u)
        return jnp.concatenate([inner.matvec(v), down])

    return MatrixFreeOperator(matvec, (op,), dim=m + n, dtype=op.dtype)


def dominant_svd(a, r: int = 4, k: int = 128, *, tol: float = 1e-8,
                 maxiter: int | None = None, seed: int = 0,
                 reorth_passes: int = 2, gap_eps: float = 1e-12,
                 method: str = "lanczos", with_info: bool = False):
    """Top-r singular triplets of a matrix or LinearOperator.

    Returns ``(u, s, v)``: ``u`` (m, r) and ``v`` (n, r) with orthonormal
    columns, ``s`` (r,) descending, such that ``A v_i = s_i u_i``.
    Differentiable to arbitrary order w.r.t. the operator's pytree leaves
    (dense entries, sparse values, physical parameters).

    ``method`` selects the embedding eigensolver forward ("lanczos" or
    "lobpcg" — see :func:`~.eigh.dominant_eigh_multi`); ``with_info=True``
    appends the block convergence report, ``(u, s, v, info)``.

    .. note:: triplets beyond ``rank(A)`` (``s_i ~ 0``) are NOT singular
       triplets: the corresponding embedding eigenvectors are arbitrary
       mixtures of left/right null vectors, so ``u_i``/``v_i`` are unit
       null-space vectors but ``A v_i = s_i u_i`` need not hold between
       them.  Check ``s_i`` against round-off before using such columns.
    """
    if isinstance(a, LinearOperator):
        op = a
        m = n = op.dim
    else:
        a = jnp.asarray(a)
        if a.ndim != 2:
            raise ValueError(f"expected a matrix, got shape {a.shape}")
        m, n = a.shape
        if m == n:
            op = as_operator(a)
        else:
            op = _RectOperator(a)

    emb = _embed(op, m, n)
    # dominant_eigh_multi clamps k itself per method (lanczos: <= dim).
    out = dominant_eigh_multi(emb, r=r, k=k,
                              extreme="max", tol=tol, maxiter=maxiter,
                              seed=seed, reorth_passes=reorth_passes,
                              gap_eps=gap_eps, method=method,
                              with_info=with_info)
    lams, w = out[0], out[1]
    # For a genuine sigma_i > 0 the halves of w_i = (u_i; v_i)/sqrt(2)
    # have EQUAL norm 1/sqrt(2), so per-half normalization is exactly the
    # *sqrt(2) unpacking.  Past rank(A) the ~0 embedding eigenvalues have
    # arbitrary null-space mixtures as eigenvectors — halves of unequal
    # norm, for which a blanket *sqrt(2) returned non-unit columns; the
    # explicit normalization keeps every returned column unit (see the
    # rank note in the docstring), and the ~0 eigenvalue is clamped so a
    # round-off-negative "singular value" can't leak out.
    def _colunit(b):
        nrm = jnp.linalg.norm(b, axis=0)
        tiny = jnp.finfo(jnp.finfo(b.dtype).dtype).tiny
        return b / jnp.maximum(nrm, tiny)[None, :]

    u = _colunit(w[:m])
    v = _colunit(w[m:])
    lams = jnp.maximum(lams, 0.0)
    if with_info:
        return u, lams, v, out[2]
    return u, lams, v


@jax.tree_util.register_pytree_node_class
class _RectOperator(LinearOperator):
    """Rectangular dense matrix exposed through the (square-oriented)
    LinearOperator matvec/rmatvec protocol for embedding purposes."""

    def __init__(self, a):
        self.a = a

    def matvec(self, x):     # (n,) -> (m,)
        return _mm(self.a, x)

    def rmatvec(self, x):    # (m,) -> (n,)
        return _mm(self.a.T, x)

    @property
    def dim(self):           # unused by the embedding
        return max(self.a.shape)

    @property
    def dtype(self):
        return self.a.dtype

    def tree_flatten(self):
        return (self.a,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.a, = children
        return obj
