"""Sparse operators: COO (XLA fallback) and blocked-ELL (Pallas TPU kernel).

The reference has no sparse-matrix storage at all — its "sparse" path is a
matvec closure (reference ``Lanczos.py`` ``sparse=True`` +
``setDominantSparseSymeig``).  Explicit sparse formats are a north-star
addition (SURVEY.md §2.4): the SpMV inside the Krylov loop is the hot op
the BASELINE "nnz/s/chip" metric measures, so it gets a native-tier Pallas
kernel, with a pure-XLA path as fallback/oracle.

Formats
-------
* :class:`COOOperator` — (rows, cols, vals) triplets; matvec is a
  ``segment_sum`` gather/scatter — compiles everywhere, the correctness
  oracle and CPU path.
* :class:`BellOperator` — **blocked ELLPACK**, the TPU-native layout:
  the matrix is tiled into (bs, bs) blocks; each block-row stores a fixed
  number of blocks (padded with zero blocks, index 0) —

      vals : (n_br, max_blk, bs, bs)   dense block data
      cols : (n_br, max_blk) int32     block-column indices (0 for pads)

  Static shapes, dense (bs, bs) tiles: every block lands on the MXU, and
  the Pallas kernel streams block-rows through VMEM.  Irregular scalar
  sparsity (CSR-style) is hostile to the TPU's tiling model — blocks with
  padding are the realistic fast path (SURVEY.md §7 hard part 4).

Both are :class:`LinearOperator` pytrees, so they drop into
``dominant_eigh`` / ``dominant_eig`` / distributed wrappers unchanged, and
their values are differentiable leaves.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .operators import LinearOperator


# ---------------------------------------------------------------------------
# COO — XLA fallback / oracle
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class COOOperator(LinearOperator):
    """COO sparse operator; matvec via gather + segment_sum (pure XLA)."""

    rows: jax.Array  # (nnz,) int32
    cols: jax.Array  # (nnz,) int32
    vals: jax.Array  # (nnz,)
    n: int

    def matvec(self, x):
        return jax.ops.segment_sum(self.vals * x[self.cols], self.rows,
                                   num_segments=self.n)

    def rmatvec(self, x):
        return jax.ops.segment_sum(self.vals * x[self.rows], self.cols,
                                   num_segments=self.n)

    @property
    def dim(self):
        return self.n

    @property
    def dtype(self):
        return self.vals.dtype

    @property
    def nnz(self):
        return self.vals.shape[0]

    def to_dense(self):
        return jnp.zeros((self.n, self.n), self.dtype).at[
            self.rows, self.cols].add(self.vals)

    def tree_flatten(self):
        return (self.rows, self.cols, self.vals), self.n

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux)

    @classmethod
    def from_dense(cls, a, *, tol: float = 0.0):
        a = np.asarray(a)
        rows, cols = np.nonzero(np.abs(a) > tol)
        return cls(jnp.asarray(rows, jnp.int32),
                   jnp.asarray(cols, jnp.int32),
                   jnp.asarray(a[rows, cols]), a.shape[0])


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class CSROperator(LinearOperator):
    """CSR sparse operator (``indptr``/``indices``/``data``).

    Completes the SURVEY §2 checklist's CSR/COO/BSR triple (BELL is the
    BSR stand-in on TPU — see PARITY.md).  On TPU, scalar-irregular CSR
    has no better lowering than the same gather + ``segment_sum`` COO
    uses, so the matvec precomputes an explicit per-entry row index at
    construction (static, non-differentiable aux data) and shares COO's
    path; the format's value is CSR-shaped interoperability (scipy,
    external pipelines) and O(1) row slicing on the host, not a distinct
    kernel.  ``data`` is a differentiable pytree leaf like COO's
    ``vals``; the performance tier remains :class:`BellOperator`.
    """

    indptr: jax.Array   # (n+1,) int32 — CSR row pointers
    indices: jax.Array  # (nnz,) int32 — column indices
    data: jax.Array     # (nnz,)
    n: int
    _rows: jax.Array = None  # (nnz,) int32, derived from indptr at build

    def __post_init__(self):
        if self._rows is None:
            # Tracer-safe (constructing the operator under jit/vmap must
            # not hit numpy): row of entry j is the number of row
            # boundaries at or before j, i.e. searchsorted on indptr.
            nnz = self.indices.shape[0]
            rows = jnp.searchsorted(
                jnp.asarray(self.indptr, jnp.int32),
                jnp.arange(nnz, dtype=jnp.int32), side="right",
            ).astype(jnp.int32) - 1
            object.__setattr__(self, "_rows", rows)

    def matvec(self, x):
        return jax.ops.segment_sum(self.data * x[self.indices],
                                   self._rows, num_segments=self.n)

    def rmatvec(self, x):
        return jax.ops.segment_sum(self.data * x[self._rows],
                                   self.indices, num_segments=self.n)

    @property
    def dim(self):
        return self.n

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def nnz(self):
        return self.data.shape[0]

    def to_dense(self):
        return jnp.zeros((self.n, self.n), self.dtype).at[
            self._rows, self.indices].add(self.data)

    def to_coo(self) -> COOOperator:
        return COOOperator(self._rows, self.indices, self.data, self.n)

    def tree_flatten(self):
        # Index arrays ride as (integer-dtype) leaves like COO's
        # rows/cols — AD gives them symbolic-zero tangents; only ``data``
        # is differentiable in practice.
        return (self.indptr, self.indices, self.data, self._rows), self.n

    @classmethod
    def tree_unflatten(cls, aux, children):
        indptr, indices, data, rows = children
        return cls(indptr, indices, data, aux, rows)

    @classmethod
    def from_dense(cls, a, *, tol: float = 0.0):
        a = np.asarray(a)
        rows, cols = np.nonzero(np.abs(a) > tol)
        order = np.lexsort((cols, rows))  # CSR invariant: row-major
        rows, cols = rows[order], cols[order]
        n = a.shape[0]
        indptr = np.zeros(n + 1, np.int64)
        np.add.at(indptr, rows + 1, 1)
        indptr = np.cumsum(indptr)
        return cls(jnp.asarray(indptr, jnp.int32),
                   jnp.asarray(cols, jnp.int32),
                   jnp.asarray(a[rows, cols]), n,
                   jnp.asarray(rows, jnp.int32))

    @classmethod
    def from_scipy(cls, m):
        """From any scipy.sparse matrix (converted to canonical CSR)."""
        if m.shape[0] != m.shape[1]:
            # The LinearOperator protocol is square-only; a rectangular
            # CSR would gather out-of-range (JAX clamps silently) and
            # return wrong results with no exception.
            raise ValueError(f"CSROperator is square-only, got {m.shape}")
        m = m.tocsr()
        m.sum_duplicates()
        return cls(jnp.asarray(m.indptr, jnp.int32),
                   jnp.asarray(m.indices, jnp.int32),
                   jnp.asarray(m.data), m.shape[0])


@jax.tree_util.register_pytree_node_class
class BCOOOperator(LinearOperator):
    """Operator backed by ``jax.experimental.sparse.BCOO`` (the library
    CSR/COO tier): XLA's native batched-COO matvec with AD support.
    Complements :class:`COOOperator` (hand-rolled segment_sum) and
    :class:`BellOperator` (Pallas); useful when interoperating with code
    that already produces BCOO matrices."""

    def __init__(self, mat):
        from jax.experimental import sparse as jsparse
        if not isinstance(mat, jsparse.BCOO):
            mat = jsparse.BCOO.fromdense(mat)
        self.mat = mat

    def matvec(self, x):
        return self.mat @ x

    def rmatvec(self, x):
        return self.mat.T @ x

    def to_dense(self):
        return self.mat.todense()

    @property
    def dim(self):
        return self.mat.shape[0]

    @property
    def dtype(self):
        return self.mat.dtype

    @property
    def nnz(self):
        return self.mat.nse

    def tree_flatten(self):
        return (self.mat,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.mat, = children
        return obj


# ---------------------------------------------------------------------------
# Blocked-ELL — the TPU-native format
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
class BellOperator(LinearOperator):
    """Blocked-ELLPACK sparse operator with a Pallas TPU SpMV kernel.

    ``vals[i, j]`` is the dense (bs, bs) block at block-row ``i``,
    block-column ``cols[i, j]``; slots past a row's real block count are
    zero blocks pointing at column 0 (always safe to multiply).

    ``use_pallas=None`` auto-selects: Pallas on TPU backends, XLA einsum
    elsewhere (the two paths are numerically identical up to f32 summation
    order and are cross-checked in the tests).

    Narrow-values tier (``vals`` stored bfloat16)
    --------------------------------------------
    The SpMV is **values-stream-bound**: per (bs, bs) block it moves
    bs² value bytes against bs vector bytes, so at bs=128 the vals
    stream is ~99% of HBM traffic and halving it with bf16 storage
    nearly doubles nnz/s/chip.  Pass bf16 ``vals`` (or use
    :meth:`astype_vals`); vectors stay in ``compute_dtype`` (default
    f32) end to end, and the blocks are upcast to f32 *on-core* at the
    dot (XLA fuses the convert; the Pallas kernel converts in VMEM), so
    the HBM read is bf16 but the multiply and accumulation are full f32.

    Error budget (mirrors ``basis_dtype``'s in ``ops/lanczos.py``):
    the ONLY rounding is storage — the operator is perturbed by
    ``||δA|| ≤ eps_bf16 ||A||`` (eps_bf16 = 2⁻⁸ ≈ 3.9e-3) once, at
    write time.  Matvecs are exact-in-f32 applications of A+δA
    (~4e-3 relative), eigenvalues carry ≤ eps_bf16·||A|| absolute
    error (Weyl), eigenvectors ~eps_bf16/gap.  Use it when 2–3-digit
    spectra suffice (coarse spectral densities, warm starts), or
    recover full f32 accuracy by polishing against an f32 operator
    with ``refine_eigenpair`` exactly as the bf16 Lanczos basis does.
    """

    def __init__(self, vals, cols, n: int, *, symmetric: bool = False,
                 use_pallas: bool | None = None, interpret: bool = False,
                 compute_dtype=None, slot_plan="auto"):
        self.vals = vals          # (n_br, max_blk, bs, bs)
        self.cols = cols          # (n_br, max_blk) int32
        self.n = int(n)
        self.symmetric = bool(symmetric)
        self.use_pallas = use_pallas
        self.interpret = bool(interpret)
        if slot_plan == "auto":
            # Static banded-slot detection (one slab DMA replaces G
            # row gathers in the Pallas kernel — see
            # pallas_spmv.detect_slot_plan).  Needs concrete column
            # indices; constructing under jit keeps the generic path.
            slot_plan = None
            if not isinstance(cols, jax.core.Tracer):
                from .pallas_spmv import detect_slot_plan
                slot_plan = detect_slot_plan(cols, vals.shape[0])
        self.slot_plan = slot_plan
        if compute_dtype is None:
            # bf16 storage is a STORAGE format, not a compute precision:
            # Krylov vectors/reductions default to f32.
            compute_dtype = (jnp.float32
                             if jnp.dtype(vals.dtype) == jnp.bfloat16
                             else vals.dtype)
        self.compute_dtype = jnp.dtype(compute_dtype)

    # -- construction --------------------------------------------------------

    @classmethod
    def from_dense(cls, a, bs: int = 128, *, tol: float = 0.0,
                   symmetric: bool = False, use_pallas=None,
                   interpret: bool = False):
        a = np.asarray(a)
        n = a.shape[0]
        if n % bs:
            raise ValueError(f"dim {n} not divisible by block size {bs}")
        nb = n // bs
        blocks = a.reshape(nb, bs, nb, bs).transpose(0, 2, 1, 3)
        keep = np.abs(blocks).max(axis=(2, 3)) > tol       # (nb, nb)
        max_blk = max(int(keep.sum(axis=1).max()), 1)
        vals = np.zeros((nb, max_blk, bs, bs), a.dtype)
        cols = np.zeros((nb, max_blk), np.int32)
        for i in range(nb):
            js = np.nonzero(keep[i])[0]
            vals[i, : len(js)] = blocks[i, js]
            cols[i, : len(js)] = js
        return cls(jnp.asarray(vals), jnp.asarray(cols), n,
                   symmetric=symmetric, use_pallas=use_pallas,
                   interpret=interpret)

    # -- matvec paths ---------------------------------------------------------

    def _xla_matvec(self, x):
        nb, max_blk, bs, _ = self.vals.shape
        xb = x.reshape(nb, bs)
        gathered = xb[self.cols]                      # (nb, max_blk, bs)
        # Narrow-stored values are upcast AT the dot (XLA fuses the
        # convert, so the HBM read stays bf16): the error budget is
        # storage rounding only, matching the Pallas kernel.  HIGHEST
        # precision — without it, TPU's DEFAULT matmul precision rounds
        # f32 operands to bf16, silently degrading the f32 tier to the
        # narrow tier's accuracy (caught by the bench's error check
        # reading exactly 0 between the two tiers).
        y = jnp.einsum("ijab,ijb->ia", self.vals.astype(x.dtype), gathered,
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=x.dtype)
        return y.reshape(-1)

    def _pallas_matvec(self, x):
        from .pallas_spmv import bell_spmv
        return bell_spmv(self.vals, self.cols, x, self.interpret,
                         self.slot_plan)

    def matvec(self, x):
        use = self.use_pallas
        if use is None:
            use = jax.default_backend() == "tpu"
        return self._pallas_matvec(x) if use else self._xla_matvec(x)

    def matmat(self, X):
        """A @ X for an (N, r) block — the SpMM tier.  One kernel pass
        streams the values ONCE for all r vectors and turns the block
        GEMV into (bs, bs) x (bs, r) MXU matmuls; this is what the
        block solvers (lobpcg / dominant_eigh_multi) call."""
        use = self.use_pallas
        if use is None:
            use = jax.default_backend() == "tpu"
        if use:
            from .pallas_spmv import bell_spmm
            return bell_spmm(self.vals, self.cols, X, self.interpret,
                             self.slot_plan)
        nb, _, bs, _ = self.vals.shape
        xb = X.reshape(nb, bs, X.shape[-1])
        y = jnp.einsum("ijab,ijbr->iar", self.vals.astype(X.dtype),
                       xb[self.cols],
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=X.dtype)
        return y.reshape(-1, X.shape[-1])

    def rmatmat(self, X):
        if self.symmetric:
            return self.matmat(X)
        return super().rmatmat(X)

    def rmatvec(self, x):
        if self.symmetric:
            return self.matvec(x)
        # A^T x: scatter-transpose via the XLA path (Pallas transpose
        # kernel is future work; rmatvec is off the hot Lanczos loop).
        nb, max_blk, bs, _ = self.vals.shape
        xb = x.reshape(nb, bs)
        contrib = jnp.einsum("ijab,ia->ijb", self.vals.astype(x.dtype), xb,
                             precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=x.dtype)
        y = jnp.zeros((nb, bs), x.dtype).at[self.cols].add(contrib)
        return y.reshape(-1)

    # -- misc ----------------------------------------------------------------

    def astype_vals(self, dtype):
        """Copy with the block values cast to ``dtype`` (e.g. bf16 for
        the narrow-values tier); Krylov vectors keep ``compute_dtype``."""
        return self.with_vals(self.vals.astype(dtype))

    def with_vals(self, vals):
        """Copy with new block values on the SAME sparsity pattern —
        mirrors ``RowShardedBellOperator.with_vals`` so parameterized
        sparse entries (optimization over couplings) use one idiom on
        both tiers, carrying every construction knob (compute_dtype,
        slot_plan, kernel choice) instead of hand-rebuilding."""
        return type(self)(vals, self.cols, self.n,
                          symmetric=self.symmetric,
                          use_pallas=self.use_pallas,
                          interpret=self.interpret,
                          compute_dtype=self.compute_dtype,
                          slot_plan=self.slot_plan)

    @property
    def dim(self):
        return self.n

    @property
    def dtype(self):
        # The dtype the rest of the framework sees (Lanczos vectors,
        # reductions): the COMPUTE dtype, not the storage dtype.
        return self.compute_dtype

    @property
    def block_size(self):
        return self.vals.shape[-1]

    @property
    def nnz(self):
        """Stored entries (incl. explicit zeros in padded blocks)."""
        return int(np.prod(self.vals.shape))

    def tree_flatten(self):
        # compute_dtype rides in aux as its NAME string so the aux tuple
        # stays hashable/comparable for jit staticness (like
        # EighOptions.basis_dtype); slot_plan is already a hashable
        # static tuple (or None).
        aux = (self.n, self.symmetric, self.use_pallas, self.interpret,
               self.compute_dtype.name, self.slot_plan)
        return (self.vals, self.cols), aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        n, symmetric, use_pallas, interpret, compute_dtype, slot_plan = aux
        return cls(*children, n, symmetric=symmetric,
                   use_pallas=use_pallas, interpret=interpret,
                   compute_dtype=compute_dtype, slot_plan=slot_plan)


def random_bell_operator(key, n: int, bs: int, blocks_per_row: int, *,
                         dtype=jnp.float32, vals_dtype=None,
                         use_pallas=None,
                         interpret: bool = False) -> BellOperator:
    """Synthetic symmetric block-banded BELL operator (BASELINE config #5).

    Block-circulant band structure: the diagonal block plus pairs of bands
    at offsets ±o.  Symmetry is built in exactly — the diagonal block is
    symmetrized, and the block at (i, i-o) is the transpose of the block
    stored at (i-o, i) — so Lanczos sees a genuinely symmetric operator.
    ``blocks_per_row`` must be odd (diagonal + pairs).
    """
    if blocks_per_row % 2 == 0:
        raise ValueError("blocks_per_row must be odd (diag + ± band pairs)")
    nb = n // bs
    if nb * bs != n:
        raise ValueError(f"dim {n} not divisible by block size {bs}")
    n_off = (blocks_per_row - 1) // 2
    rng = np.random.default_rng(7)
    offs = (rng.permutation(np.arange(1, nb))[:n_off]
            if nb > 1 else np.zeros(0, np.int64))
    n_off = len(offs)

    kd, kb = jax.random.split(key)
    # Plain python float: an np.float64 scalar here silently promotes the
    # requested-f32 values to f64 when x64 is enabled (weak typing only
    # applies to python scalars).
    scale = float(1.0 / np.sqrt((1 + 2 * n_off) * bs))
    diag = jax.random.normal(kd, (nb, bs, bs), dtype) * scale
    diag = (diag + jnp.swapaxes(diag, -1, -2)) / 2
    bands = jax.random.normal(kb, (n_off, nb, bs, bs), dtype) * scale

    i = np.arange(nb)
    slots = [diag[:, None]]          # (nb, 1, bs, bs) at col i
    cols = [i[:, None]]
    for o_idx, o in enumerate(offs):
        # +o band: block B_i at (i, (i+o) % nb)
        slots.append(bands[o_idx][:, None])
        cols.append(((i + o) % nb)[:, None])
        # -o band: block at (i, (i-o) % nb) = B_{(i-o) % nb}^T
        src = (i - o) % nb
        slots.append(jnp.swapaxes(bands[o_idx][src], -1, -2)[:, None])
        cols.append(src[:, None])
    vals = jnp.concatenate(slots, axis=1)
    cols = jnp.asarray(np.concatenate(cols, axis=1), jnp.int32)
    op = BellOperator(vals, cols, n, symmetric=True,
                      use_pallas=use_pallas, interpret=interpret)
    if vals_dtype is not None:
        # Narrow-values storage tier (e.g. bf16); ``dtype`` stays the
        # compute dtype of the Krylov vectors.
        op = op.astype_vals(vals_dtype)
    return op
