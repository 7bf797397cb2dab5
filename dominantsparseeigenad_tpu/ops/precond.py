"""Preconditioner constructors for the shipped operator formats.

The hooks have existed since round 2 (``dominant_eigh(precond=...)``,
``lobpcg_eigh(precond=...)``, ``cg(precond=...)``) but accepted only a
user-written callable, which left the feature inert for every shipped
operator type unless the user wrote TPU-savvy code themselves.  This
module ships the constructors:

* :func:`operator_diagonal` — ``diag(A)`` for dense / COO / CSR / BELL
  operators and their shift/scale/sum composites;
* :func:`jacobi_precond` — the classic diagonal approximate inverse
  ``z = r / |diag(A) - shift|`` (one elementwise multiply per apply —
  bandwidth-free next to the matvec it accelerates);
* :func:`block_jacobi_precond` — batched (bs, bs) diagonal-block
  inverses for :class:`~.sparse.BellOperator` (whose diagonal blocks
  are sitting in ``vals`` already) and for dense operators at a chosen
  block size.  The block inverses are built by one BATCHED ``eigh`` —
  (nb, bs, bs) Hermitian eigendecompositions are MXU-batch-friendly —
  with eigenvalue magnitudes floored, so the result is symmetric
  positive definite even when ``A - shift·I`` is indefinite (the CG
  precondition contract).

The reference has no preconditioning at all (reference ``CG.py`` is a
plain CG); SURVEY.md §7 build-plan phase 2 and the round-4 review both
name the missing constructors.  The returned callables close over
arrays only (no operator object), so they are stable jit-static
payloads per the ``dominant_eigh(precond=...)`` contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .operators import (DenseOperator, LinearOperator, ScaledOperator,
                        ShiftedOperator, SumOperator, as_operator)
from .sparse import BCOOOperator, BellOperator, COOOperator, CSROperator


def operator_diagonal(op) -> jax.Array:
    """``diag(A)`` extracted structurally from a shipped operator format.

    Supports :class:`DenseOperator`, :class:`COOOperator`,
    :class:`CSROperator`, :class:`BCOOOperator`, :class:`BellOperator`,
    and the shift/scale/sum composites over them.  Matrix-free
    operators have no structural diagonal — pass an explicit ``diag``
    array to the precondition constructors instead (for physics
    operators it is usually known analytically, e.g. the TFIM zz term).
    """
    op = as_operator(op)
    if isinstance(op, DenseOperator):
        return jnp.diagonal(op.a)
    if isinstance(op, COOOperator):
        contrib = jnp.where(op.rows == op.cols, op.vals, 0)
        return jax.ops.segment_sum(contrib, op.rows, num_segments=op.n)
    if isinstance(op, CSROperator):
        contrib = jnp.where(op._rows == op.indices, op.data, 0)
        return jax.ops.segment_sum(contrib, op._rows, num_segments=op.n)
    if isinstance(op, BCOOOperator):
        rows, cols = op.mat.indices[:, 0], op.mat.indices[:, 1]
        contrib = jnp.where(rows == cols, op.mat.data, 0)
        return jax.ops.segment_sum(contrib, rows, num_segments=op.dim)
    if isinstance(op, BellOperator):
        # Diagonal blocks: slots with cols[i, j] == i (padded slots
        # point at column 0 with all-zero blocks, so block-row 0's
        # padding contributes nothing).  (nb, bs, bs) -> (nb, bs) diag.
        d_blocks = _bell_diag_blocks(op)
        return jnp.diagonal(d_blocks, axis1=1, axis2=2).reshape(-1)
    if isinstance(op, ShiftedOperator):
        # ShiftedOperator is A - shift*I (the resolvent convention of
        # the IFT backward), NOT A + shift*I.
        return operator_diagonal(op.op) - op.shift
    if isinstance(op, ScaledOperator):
        return op.c * operator_diagonal(op.op)
    if isinstance(op, SumOperator):
        return operator_diagonal(op.a) + operator_diagonal(op.b)
    raise TypeError(
        f"no structural diagonal for {type(op).__name__}; pass an "
        "explicit diag= array to the preconditioner constructor")


def _bell_diag_blocks(op: BellOperator) -> jax.Array:
    """(nb, bs, bs) diagonal blocks of a BELL operator, in compute
    dtype (narrow-stored values are upcast once — the preconditioner is
    built once, applied many times)."""
    nb = op.vals.shape[0]
    on_diag = (op.cols == jnp.arange(nb, dtype=op.cols.dtype)[:, None])
    vals = op.vals.astype(op.compute_dtype)
    return jnp.einsum("ij,ijab->iab", on_diag.astype(vals.dtype), vals)


def _apply_columns(f):
    """Lift a vector->vector apply to also broadcast over (n, m) blocks
    (LOBPCG hands the preconditioner a residual BLOCK)."""
    def apply(r):
        if r.ndim == 2:
            return jax.vmap(f, in_axes=1, out_axes=1)(r)
        return f(r)

    return apply


def jacobi_precond(op=None, *, diag=None, shift=0.0, floor_rel=None):
    """Diagonal (Jacobi) preconditioner ``z = r / max(|d - shift|, floor)``.

    ``d`` is taken structurally from ``op`` (:func:`operator_diagonal`)
    or passed explicitly as ``diag`` (matrix-free operators; analytic
    diagonals).  ``shift`` targets shifted systems — pass (an estimate
    of) the eigenvalue when preconditioning the eigensolver's deflated
    ``(A - lam)`` derivative solves or an interior shift-invert.

    The absolute value plus relative floor (default ``sqrt(eps)`` of
    the apply dtype) keeps the preconditioner SPD even when
    ``A - shift`` is indefinite, which is what CG's convergence theory
    requires of M — at the cost of leaving the near-singular components
    unaccelerated (exactly the components the deflation projector
    removes in the eigensolver solves).

    Effective when the diagonal carries the conditioning (diagonally
    dominant operators: lattice Hamiltonians with strong fields,
    shifted Laplacians, mass-spring chains with disparate stiffness);
    useless when the ill-conditioning lives off-diagonal — measure with
    ``cg_info`` before relying on it.
    """
    if diag is None:
        if op is None:
            raise ValueError("need an operator or an explicit diag=")
        diag = operator_diagonal(op)
    d = jnp.abs(jnp.asarray(diag) - shift)
    if floor_rel is None:
        floor_rel = float(jnp.sqrt(jnp.finfo(d.dtype).eps))
    scale = jnp.max(d)
    # All-zero shifted diagonal (e.g. a purely off-diagonal operator at
    # shift 0): there is nothing to precondition with — degrade to the
    # identity instead of 1/tiny = inf poisoning the solve.
    inv = jnp.where(scale > 0,
                    1.0 / jnp.maximum(d, floor_rel * scale
                                      + jnp.finfo(d.dtype).tiny),
                    jnp.ones_like(d))

    return _apply_columns(lambda r: inv.astype(r.dtype) * r)


def block_jacobi_precond(op=None, *, blocks=None, bs: int | None = None,
                         shift=0.0, floor_rel=None):
    """Block-Jacobi preconditioner from (bs, bs) diagonal blocks.

    ``z_i = |D_i - shift|^{-1} r_i`` per block-row ``i``, with the
    blocks taken from a :class:`~.sparse.BellOperator` (they are sitting
    in ``vals`` already), sliced out of a :class:`DenseOperator` at a
    chosen ``bs``, or passed explicitly as an (nb, bs, bs) ``blocks``
    array.  Captures in-block coupling Jacobi cannot (e.g. the intra-
    cell stiffness of a discretized PDE), at one batched (nb, bs, bs)
    ``eigh`` build cost and an (nb, bs, bs) x (nb, bs, m) batched-matmul
    apply — both MXU-shaped.

    SPD by construction: the blocks are symmetrized, eigendecomposed
    (batched), and rebuilt from floored eigenvalue MAGNITUDES —
    ``V |w|^{-1} V^T`` — so indefinite shifted blocks cannot break CG.
    """
    if blocks is None:
        if op is None:
            raise ValueError("need an operator or explicit blocks=")
        op = as_operator(op)
        if isinstance(op, BellOperator):
            blocks = _bell_diag_blocks(op)
        elif isinstance(op, DenseOperator):
            if bs is None:
                raise ValueError("dense block-Jacobi needs bs=")
            n = op.dim
            if n % bs:
                raise ValueError(f"dim {n} not divisible by bs={bs}")
            nb = n // bs
            idx = jnp.arange(nb)
            blocks = op.a.reshape(nb, bs, nb, bs)[idx, :, idx, :]
        else:
            raise TypeError(
                f"no structural diagonal blocks for {type(op).__name__};"
                " pass explicit blocks=")
    blocks = jnp.asarray(blocks)
    nb, bsz, _ = blocks.shape
    eye = jnp.eye(bsz, dtype=blocks.dtype)
    d = blocks - shift * eye
    d = (d + jnp.swapaxes(d, 1, 2).conj()) / 2
    w, v = jnp.linalg.eigh(d)                      # batched (nb, bs)
    if floor_rel is None:
        floor_rel = float(jnp.sqrt(jnp.finfo(w.dtype).eps))
    aw = jnp.abs(w)
    scale = jnp.max(aw)
    # Same all-zero-blocks degradation to identity as jacobi_precond.
    inv_w = jnp.where(scale > 0,
                      1.0 / jnp.maximum(aw, floor_rel * scale
                                        + jnp.finfo(w.dtype).tiny),
                      jnp.ones_like(aw))
    minv = jnp.einsum("nij,nj,nkj->nik", v, inv_w, v.conj())

    def apply_vec(r):
        rb = r.reshape(nb, bsz)
        z = jnp.einsum("nij,nj->ni", minv.astype(r.dtype), rb)
        return z.reshape(r.shape)

    return _apply_columns(apply_vec)
