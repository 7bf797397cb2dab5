"""Row-sharded blocked-ELL sparse operator — BASELINE config #5 as written.

The reference has no sparse storage and no distribution (SURVEY.md §2.4/
§2.5: its "sparse" path is a single-device matvec closure); this module is
the north-star tier the survey mandates: a **row/block-partitioned sparse
matrix** whose SpMV runs per-shard on the MXU while the needed vector
block-columns move over ICI.

Layout
------
The global blocked-ELL matrix (see :class:`...ops.sparse.BellOperator`)

    vals : (nb, max_blk, bs, bs)   cols : (nb, max_blk) GLOBAL block-cols

is partitioned by **block-rows** over the mesh axis: device d owns block-
rows [d*nb_l, (d+1)*nb_l) and the matching segment of every vector
(``P(axis)``).  Column indices stay global; each device's panel is a
*rectangular* BELL matrix (nb_l block-rows x nb block-cols).

Communication modes
-------------------
* ``mode="all_gather"`` (default): ``all_gather`` the vector over ICI
  (N*4 bytes — negligible next to the nnz*4 bytes of block values the
  local SpMV must stream from HBM), then one local rectangular BELL SpMV
  (Pallas kernel on TPU, gather-einsum elsewhere).  For any matrix with
  more than a few stored blocks per row this is bandwidth-optimal: the
  gather is amortized ``avg_blocks_per_row * bs``-fold against the value
  stream.
* ``mode="ring"``: the vector segment hops shard-to-shard with
  ``ppermute`` while each device multiplies the slots whose block-columns
  live in the segment currently in hand — communication overlaps local
  compute, and no device ever materializes the full vector.  Slots are
  re-bucketed **by source-shard offset** at construction (host-side, from
  the concrete ``cols``); only offsets that actually occur are visited,
  and the segment jumps straight between active offsets (one ``ppermute``
  hop of the full stride), so a block-banded matrix with halo structure
  pays exactly its halo width in hops — the moral analogue of ring
  attention for this workload.  The hop contract is exposed
  (``ring_offsets`` / ``ring_hops``) and asserted down to the compiled
  HLO's collective-permute count
  (``test_sharded_sparse.py::test_ring_hop_accounting_banded``).

Decision rule (measured)
------------------------
``all_gather`` is the THROUGHPUT default, full stop.  Measured on the
8-virtual-device mesh (n=2^16, bs=128, f32): block-tridiagonal halo-1 —
ring 0.62x the all_gather rate despite only 2 hops (the per-offset
bucket gather re-reads its ``vals`` slice and loses the single fused
panel kernel); random 17-band — ring 0.91x with 7 hops.  The gather
moves only N·4 bytes per matvec against ``nnz·4`` bytes of values
(amortized ``avg_blocks_per_row·bs``-fold), so no band structure makes
ring win on bandwidth.  ``ring`` is the **memory niche**: per-device
peak vector residency is N/p instead of N (the full gathered vector),
which matters only when the vector itself approaches per-device HBM —
i.e. extreme-scale 2^N state vectors on many chips.  Reach for it then,
and only then; its SpMM (:meth:`_mm_ring`) shares each offset's bucket
gather across all r vectors so the niche does not forfeit the block
tier.

Differentiability
-----------------
``vals`` is the pytree leaf; both modes are built from gathers, einsums
and collectives that JAX can transpose and re-differentiate, and
``shard_map`` is transparent to JVP/VJP — so ``dominant_eigh`` /
``dominant_eigh_multi`` IFT gradients (orders 1 and 2) flow through the
sharded SpMV unchanged.  (The Pallas local kernel routes its tangents
through the XLA path via ``bell_spmv``'s ``custom_jvp``.)
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.operators import LinearOperator
from ..ops.pallas_spmv import bell_spmm, bell_spmv, _bell_spmv_xla
from .mesh import SHARD_AXIS


def _bucket_by_offset(cols: np.ndarray, keep: np.ndarray, p: int):
    """Re-bucket ELL slots by source-shard ring offset.

    Returns ``{offset: (slot_idx, local_col, mask)}`` with per-offset
    arrays of shape (nb, m_o): ``slot_idx`` indexes into the original
    ``max_blk`` slots, ``local_col`` is the block-column *within* the
    source shard, ``mask`` is 0.0 on bucket padding.  EVERY stored slot
    participates (``keep`` is all-True from the caller): the format
    cannot distinguish its pad convention (block-column 0, zero block)
    from a genuine stored block that happens to be zero at construction
    — e.g. a coupling initialized at 0 for optimization, or a zeroed
    wrap band at column 0 — and value-based dropping silently lost such
    slots from ``with_vals``/JVP tangents (round-4 review; the modes
    then disagreed).  Cost of keeping pads: extra ring hops only for
    matrices that are actually row-padded — the bandwidth-optimal
    default ``all_gather`` mode is unaffected.  Static host-side
    preprocessing — requires concrete ``cols``.
    """
    nb, max_blk = cols.shape
    nb_l = nb // p
    owner = np.arange(nb)[:, None] // nb_l          # (nb, 1)
    src = cols // nb_l
    offset = (src - owner) % p                      # (nb, max_blk)

    buckets = {}
    for o in range(p):
        sel = (offset == o) & keep                  # (nb, max_blk)
        counts = sel.sum(axis=1)
        m_o = int(counts.max()) if nb else 0
        if m_o == 0:
            continue
        slot_idx = np.zeros((nb, m_o), np.int32)
        local_col = np.zeros((nb, m_o), np.int32)
        mask = np.zeros((nb, m_o), np.float32)
        for i in range(nb):
            js = np.nonzero(sel[i])[0]
            slot_idx[i, : len(js)] = js
            local_col[i, : len(js)] = cols[i, js] % nb_l
            mask[i, : len(js)] = 1.0
        buckets[o] = (slot_idx, local_col, mask)
    return buckets


@jax.tree_util.register_pytree_node_class
class RowShardedBellOperator(LinearOperator):
    """Blocked-ELL sparse operator with block-rows sharded over a mesh axis.

    Parameters
    ----------
    vals : (nb, max_blk, bs, bs) global block values (placed row-sharded).
    cols : (nb, max_blk) int32 — GLOBAL block-column indices.  Must be
        concrete (host) values when ``mode="ring"`` (static bucketing).
    n    : global dimension (= nb * bs).
    mesh : device mesh containing ``axis``.
    mode : "all_gather" | "ring" (see module docstring).
    symmetric : if True, ``rmatvec`` aliases ``matvec``.
    use_pallas : force the local-panel kernel choice (None = auto:
        Pallas on TPU backends, XLA gather-einsum elsewhere).
    """

    def __init__(self, vals, cols, n: int, mesh: Mesh, *,
                 axis: str = SHARD_AXIS, mode: str = "all_gather",
                 symmetric: bool = False, use_pallas: bool | None = None,
                 interpret: bool = False, compute_dtype=None):
        if mode not in ("all_gather", "ring"):
            raise ValueError(f"unknown mode {mode!r}")
        nb, max_blk, bs, bs2 = vals.shape
        if bs != bs2:
            raise ValueError(f"blocks must be square, got ({bs}, {bs2})")
        if nb * bs != n:
            raise ValueError(f"nb*bs = {nb * bs} != n = {n}")
        p = mesh.shape[axis]
        if nb % p != 0:
            raise ValueError(f"{nb} block-rows not divisible by {p} shards")
        self.n = int(n)
        self.mesh = mesh
        self.axis = axis
        self.mode = mode
        self.symmetric = bool(symmetric)
        self.use_pallas = use_pallas
        self.interpret = bool(interpret)
        if compute_dtype is None:
            # Same narrow-values tier as BellOperator: bf16 block
            # storage, f32 Krylov vectors/reductions (see the error
            # budget in ops/sparse.py).
            compute_dtype = (jnp.float32
                             if jnp.dtype(vals.dtype) == jnp.bfloat16
                             else vals.dtype)
        self.compute_dtype = jnp.dtype(compute_dtype)

        if mode == "ring":
            # Static bucketing needs concrete host values: construct the
            # operator OUTSIDE jit when mode="ring" (the resulting pytree
            # then traces fine; only __init__ is host-side).
            cols_np = np.asarray(jax.device_get(cols))
            # Every slot participates — value-based pad dropping loses
            # genuine zero-valued blocks (see _bucket_by_offset).
            keep = np.ones(cols_np.shape, bool)
            buckets = _bucket_by_offset(cols_np, keep, p)
            self._offsets = tuple(sorted(buckets))
            rs = NamedSharding(mesh, P(axis, None))
            self._slot_idx = tuple(
                jax.device_put(jnp.asarray(buckets[o][0]), rs)
                for o in self._offsets)
            self._local_col = tuple(
                jax.device_put(jnp.asarray(buckets[o][1]), rs)
                for o in self._offsets)
            self._mask = tuple(
                jax.device_put(jnp.asarray(buckets[o][2]), rs)
                for o in self._offsets)
        else:
            self._offsets = ()
            self._slot_idx = self._local_col = self._mask = ()

        self.vals = jax.device_put(
            vals, NamedSharding(mesh, P(axis, None, None, None)))
        self.cols = jax.device_put(
            jnp.asarray(cols, jnp.int32), NamedSharding(mesh, P(axis, None)))

    # -- local-panel kernels ---------------------------------------------------

    def _panel_spmv(self, vals_blk, cols_blk, x_full):
        """Local rectangular panel times a full vector (x_full (N,)) or
        block (x_full (N, r)) — one backend dispatch for both tiers."""
        use = self.use_pallas
        if use is None:
            use = jax.default_backend() == "tpu"
        if use:
            kernel = bell_spmv if x_full.ndim == 1 else bell_spmm
            return kernel(vals_blk, cols_blk, x_full, self.interpret)
        return _bell_spmv_xla(vals_blk, cols_blk, x_full)

    # -- shard_map bodies --------------------------------------------------------

    def _mv_all_gather(self, vals_blk, cols_blk, x_blk):
        x_full = lax.all_gather(x_blk, self.axis, tiled=True)
        return self._panel_spmv(vals_blk, cols_blk, x_full)

    def _mv_ring(self, vals_blk, bucket_blks, x_blk):
        # Single-vector case of the ring SpMM: one source of truth for
        # the offset walk / ppermute schedule / bucket-gather semantics
        # (the hop contract is asserted down to the compiled HLO, so it
        # must not live in two copies that could drift).
        return self._mm_ring(vals_blk, bucket_blks,
                             x_blk[:, None]).reshape(-1)

    def _mm_ring(self, vals_blk, bucket_blks, x_blk):
        # Ring walk over the (static, usually few) active offsets;
        # between consecutive active offsets the segment jumps the full
        # stride in one ppermute (shard s's segment moves to device
        # (s - delta) mod p, so the data from source (me + o) mod p
        # lands here), and XLA's async collectives overlap the hop with
        # the in-hand bucket's einsum.  The bucket gather (the `vals`
        # re-read that dominates the mode's overhead) happens ONCE per
        # offset and is contracted against all r vectors in one einsum
        # — the ring analogue of the all_gather tier's amortized value
        # stream.  The gather is a static differentiable slot
        # permutation of the vals leaf; mask zeroes the per-row
        # padding; narrow-stored values upcast at the dot
        # (storage-rounding-only error budget, same as the kernels).
        axis = self.axis
        p = lax.axis_size(axis)
        nb_l = vals_blk.shape[0]
        bs = vals_blk.shape[-1]
        r = x_blk.shape[-1]
        acc = jnp.zeros((nb_l, bs, r), x_blk.dtype)
        seg = x_blk
        prev = 0
        for o, (slot_idx, local_col, mask) in zip(self._offsets, bucket_blks):
            delta = o - prev
            if delta:
                perm = [(s, (s - delta) % p) for s in range(p)]
                seg = lax.ppermute(seg, axis, perm)
            prev = o
            rv = jnp.take_along_axis(
                vals_blk, slot_idx[:, :, None, None], axis=1)
            rv = rv.astype(acc.dtype) * mask[:, :, None, None]
            xb = seg.reshape(nb_l, bs, r)
            acc = acc + jnp.einsum(
                "ijab,ijbr->iar", rv, xb[local_col],
                precision=lax.Precision.HIGHEST,
                preferred_element_type=acc.dtype)
        return acc.reshape(-1, r)

    def _rmv(self, vals_blk, cols_blk, x_blk):
        # y = A^T x: local rows scatter into global block-columns, then the
        # partials reduce-scatter back to the row sharding.
        nb_l, _, bs, _ = vals_blk.shape
        nb = self.n // bs
        contrib = jnp.einsum("ijab,ia->ijb", vals_blk.astype(x_blk.dtype),
                             x_blk.reshape(nb_l, bs),
                             precision=lax.Precision.HIGHEST,
                             preferred_element_type=x_blk.dtype)
        y_full = jnp.zeros((nb, bs), x_blk.dtype).at[cols_blk].add(contrib)
        return lax.psum_scatter(y_full.reshape(-1), self.axis, tiled=True)

    # -- LinearOperator interface -------------------------------------------------

    def matvec(self, x):
        # Fully-manual shard_map (every mesh axis in axis_names): a Pallas
        # kernel cannot sit in a region that any mesh axis could still
        # auto-partition, and check_vma=False because the kernel's out
        # ShapeDtypeStruct carries no varying-mesh-axes info.
        ax = self.axis
        manual = set(self.mesh.axis_names)
        if self.mode == "all_gather":
            return shard_map(
                self._mv_all_gather, mesh=self.mesh, axis_names=manual,
                in_specs=(P(ax, None, None, None), P(ax, None), P(ax)),
                out_specs=P(ax), check_vma=False)(self.vals, self.cols, x)
        buckets = tuple(zip(self._slot_idx, self._local_col, self._mask))
        spec3 = tuple((P(ax, None),) * 3 for _ in buckets)
        return shard_map(
            self._mv_ring, mesh=self.mesh, axis_names=manual,
            in_specs=(P(ax, None, None, None), spec3, P(ax)),
            out_specs=P(ax), check_vma=False)(self.vals, buckets, x)

    def rmatvec(self, x):
        if self.symmetric:
            return self.matvec(x)
        ax = self.axis
        return shard_map(
            self._rmv, mesh=self.mesh, axis_names=set(self.mesh.axis_names),
            in_specs=(P(ax, None, None, None), P(ax, None), P(ax)),
            out_specs=P(ax))(self.vals, self.cols, x)

    # -- block-of-vectors (SpMM) tier -----------------------------------------

    def _mm_all_gather(self, vals_blk, cols_blk, x_blk):
        x_full = lax.all_gather(x_blk, self.axis, tiled=True)
        return self._panel_spmv(vals_blk, cols_blk, x_full)

    def matmat(self, X):
        """A @ X for an (N, r) row-sharded block — the distributed SpMM
        tier the block solvers ride: each shard's panel runs ONE
        bell_spmm over the gathered block (``all_gather``) or one
        bucket-einsum per active offset over the hopping segment block
        (``ring``, :meth:`_mm_ring`), so the value stream — panel read
        or bucket gather — is amortized over all r vectors in both
        modes."""
        ax = self.axis
        manual = set(self.mesh.axis_names)
        if self.mode != "all_gather":
            buckets = tuple(zip(self._slot_idx, self._local_col,
                                self._mask))
            spec3 = tuple((P(ax, None),) * 3 for _ in buckets)
            return shard_map(
                self._mm_ring, mesh=self.mesh, axis_names=manual,
                in_specs=(P(ax, None, None, None), spec3, P(ax, None)),
                out_specs=P(ax, None), check_vma=False)(
                    self.vals, buckets, X)
        return shard_map(
            self._mm_all_gather, mesh=self.mesh, axis_names=manual,
            in_specs=(P(ax, None, None, None), P(ax, None), P(ax, None)),
            out_specs=P(ax, None), check_vma=False)(
                self.vals, self.cols, X)

    def rmatmat(self, X):
        if self.symmetric:
            return self.matmat(X)
        return super().rmatmat(X)

    @property
    def ring_offsets(self) -> tuple:
        """Active source-shard offsets of ``mode="ring"`` (static, from
        the bucketing): offset ``o`` means some stored block reads the
        segment owned by shard ``(me + o) mod p``.  A halo-banded
        matrix has exactly its halo's offsets here; a dense-column
        pattern has all ``p``."""
        return self._offsets

    @property
    def ring_hops(self) -> int:
        """``ppermute`` hops per ring matvec/matmat: one per transition
        between consecutive active offsets (offset 0 — the local bucket
        — is free).  This is the traffic contract the tests assert: a
        halo-width-h banded operator pays exactly its active-offset
        count, never p-1."""
        return len([o for o in self._offsets if o != 0])

    @property
    def dim(self):
        return self.n

    @property
    def dtype(self):
        # Compute dtype (what Lanczos vectors/reductions use), not the
        # block-storage dtype — they differ in the bf16 values tier.
        return self.compute_dtype

    @property
    def block_size(self):
        return self.vals.shape[-1]

    @property
    def nnz(self):
        """Stored entries (incl. explicit zeros in padded blocks)."""
        return int(np.prod(self.vals.shape))

    # -- construction helpers -------------------------------------------------

    def with_vals(self, vals):
        """Copy of this operator with the ``vals`` leaf replaced.

        ``mode="ring"`` bucketing is static (host-side, from ``cols``), so
        the operator itself must be constructed with concrete values; to
        differentiate a loss w.r.t. the matrix entries, build once outside
        the traced function and swap the (traced) values in with this —
        the sparsity pattern is reused, only the leaf changes.
        """
        leaves, aux = self.tree_flatten()
        return type(self).tree_unflatten(aux, (vals,) + tuple(leaves[1:]))

    @classmethod
    def from_bell(cls, op, mesh: Mesh, **kw):
        """Shard a single-device :class:`BellOperator` over ``mesh``."""
        kw.setdefault("symmetric", op.symmetric)
        kw.setdefault("use_pallas", op.use_pallas)
        kw.setdefault("interpret", op.interpret)
        kw.setdefault("compute_dtype", op.compute_dtype)
        return cls(op.vals, op.cols, op.n, mesh, **kw)

    # -- pytree -----------------------------------------------------------------

    def tree_flatten(self):
        leaves = (self.vals, self.cols, self._slot_idx, self._local_col,
                  self._mask)
        aux = (self.n, self.mesh, self.axis, self.mode, self.symmetric,
               self.use_pallas, self.interpret, self._offsets,
               self.compute_dtype.name)
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        obj = cls.__new__(cls)
        (obj.vals, obj.cols, obj._slot_idx, obj._local_col,
         obj._mask) = leaves
        (obj.n, obj.mesh, obj.axis, obj.mode, obj.symmetric,
         obj.use_pallas, obj.interpret, obj._offsets) = aux[:8]
        obj.compute_dtype = jnp.dtype(aux[8])
        return obj
