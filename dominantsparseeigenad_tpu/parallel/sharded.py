"""Row-partitioned distributed operators via ``shard_map`` + XLA collectives.

The reference has no distribution at all (SURVEY.md §2.5: no
``torch.distributed``, no NCCL/MPI; single process, single device).  This
module is the TPU-native scaling layer the new framework adds on top of the
same eigensolver math:

* the operator's rows (equivalently, the 2^N-dimensional Hilbert space) are
  block-partitioned over the ``"shards"`` mesh axis;
* vectors live sharded over the same axis; Lanczos/CG dots, norms and
  reorthogonalizations reduce over the mesh with ``psum`` (inserted by
  GSPMD since the arrays are sharded);
* the matvec itself is an explicit ``shard_map``:

  - ``mode="all_gather"``: gather the vector over ICI, one big local
    (N/p, N) x (N,) matmul on the MXU — best when the gather is cheap
    relative to the matmul (moderate p, fat rows);
  - ``mode="ring"``: ring SpMV — the vector segment hops neighbor-to-
    neighbor with ``ppermute`` while each device multiplies the matching
    (N/p, N/p) column block, so communication overlaps compute across
    ring steps (the moral analogue of ring attention for this workload —
    neighbor exchange over ICI, compute on the block in hand).

Everything is differentiable: ``shard_map`` is transparent to JVP/VJP, so
the implicit-function-theorem rules of ``ops.eigh``/``ops.eig`` and the
``custom_linear_solve``-based CG compose with sharding unchanged — a
distributed eigenpair gradient is just ``jax.grad`` of a sharded program.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.operators import LinearOperator, hmatmul as _mm
from .mesh import SHARD_AXIS, row_sharding


def shard_vector(x: jax.Array, mesh: Mesh, axis: str = SHARD_AXIS):
    """Place a global vector with its leading axis sharded over ``axis``."""
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


@jax.tree_util.register_pytree_node_class
class RowShardedOperator(LinearOperator):
    """Dense square operator with rows block-partitioned over a mesh axis.

    Distributed counterpart of :class:`~...ops.operators.DenseOperator`
    (the reference's dense path, ``Lanczos.py`` ``sparse=False``), scaled
    the TPU way: ``a`` is stored sharded ``P(axis, None)``; ``matvec``
    consumes and produces vectors sharded ``P(axis)``.

    Parameters
    ----------
    a    : (N, N) array (will be placed row-sharded on ``mesh``).
    mesh : the device mesh; must contain ``axis``.
    axis : mesh axis name to partition rows over.
    mode : "all_gather" | "ring" — communication strategy (see module doc).
    """

    def __init__(self, a, mesh: Mesh, *, axis: str = SHARD_AXIS,
                 mode: str = "all_gather"):
        if mode not in ("all_gather", "ring"):
            raise ValueError(f"unknown mode {mode!r}")
        n = a.shape[0]
        p = mesh.shape[axis]
        if n % p != 0:
            raise ValueError(f"dim {n} not divisible by {p} shards "
                             f"(pad the operator)")
        self.a = jax.device_put(a, NamedSharding(mesh, P(axis, None)))
        self.mesh = mesh
        self.axis = axis
        self.mode = mode

    # -- shard_map bodies ---------------------------------------------------

    # Panel applications at HIGHEST precision, matching DenseOperator:
    # the distributed tier must not silently carry bf16 (~2.5e-3) matmul
    # rounding where its single-device counterpart runs full f32 — the
    # parity tests are CPU-only and could never catch the chip-side gap
    # (round-4 review).
    def _mv_all_gather(self, a_blk, x_blk):
        x_full = lax.all_gather(x_blk, self.axis, tiled=True)
        return _mm(a_blk, x_full)

    def _mv_ring(self, a_blk, x_blk):
        # a_blk: (nl, N) local rows; x_blk: (nl,) local segment.
        axis = self.axis
        p = lax.axis_size(axis)
        me = lax.axis_index(axis)
        nl = x_blk.shape[0]
        perm = [(s, (s + 1) % p) for s in range(p)]

        def step(t, carry):
            acc, seg = carry
            # Segment in hand originated on device (me - t) mod p, i.e. it
            # is global columns [src*nl, (src+1)*nl).
            src = ((me - t) % p).astype(jnp.int32)
            blk = lax.dynamic_slice(
                a_blk, (jnp.int32(0), src * jnp.int32(nl)), (nl, nl))
            acc = acc + _mm(blk, seg)
            # Pass the segment to the next device; XLA's async collectives
            # overlap this ppermute with the next iteration's matmul.
            seg = lax.ppermute(seg, axis, perm)
            return acc, seg

        acc0 = jnp.zeros_like(x_blk)
        acc, _ = lax.fori_loop(0, p, step, (acc0, x_blk))
        return acc

    def _rmv(self, a_blk, x_blk):
        # y = A^T x = sum_s A_blk_s^T x_s: local (N,) partial, then
        # reduce_scatter back to P(axis).
        partial_full = _mm(a_blk.T, x_blk)
        return lax.psum_scatter(partial_full, self.axis, tiled=True)

    # -- LinearOperator interface -------------------------------------------

    def matvec(self, x):
        body = (self._mv_all_gather if self.mode == "all_gather"
                else self._mv_ring)
        return shard_map(
            body, mesh=self.mesh, axis_names={self.axis},
            in_specs=(P(self.axis, None), P(self.axis)),
            out_specs=P(self.axis))(self.a, x)

    def rmatvec(self, x):
        return shard_map(
            self._rmv, mesh=self.mesh, axis_names={self.axis},
            in_specs=(P(self.axis, None), P(self.axis)),
            out_specs=P(self.axis))(self.a, x)

    def to_dense(self):
        return self.a

    @property
    def dim(self):
        return self.a.shape[0]

    @property
    def dtype(self):
        return self.a.dtype

    def tree_flatten(self):
        return (self.a,), (self.mesh, self.axis, self.mode)

    @classmethod
    def tree_unflatten(cls, aux, children):
        mesh, axis, mode = aux
        obj = cls.__new__(cls)
        obj.a, = children
        obj.mesh, obj.axis, obj.mode = mesh, axis, mode
        return obj


@jax.tree_util.register_pytree_node_class
class ShardedMatrixFreeOperator(LinearOperator):
    """Matrix-free operator whose matvec runs inside ``shard_map``.

    ``local_matvec(params, x_local) -> y_local`` is written against the
    *local* vector shard and may use collectives (``ppermute``,
    ``all_gather``, ``psum``) over ``axis`` — e.g. the sharded TFIM matvec
    in ``models.tfim`` exchanges whole shards between XOR-partner devices
    for the high-bit spin flips.

    Distributed counterpart of the reference's matvec-closure path
    (``setDominantSparseSymeig``); the reference has no analogue of the
    distribution itself.
    """

    def __init__(self, local_matvec, params, dim: int, mesh: Mesh, *,
                 dtype=jnp.float32, axis: str = SHARD_AXIS,
                 param_specs=None, local_rmatvec=None,
                 symmetric: bool = True):
        if local_rmatvec is None and not symmetric:
            raise ValueError("non-symmetric operator requires local_rmatvec")
        self.local_matvec = local_matvec
        self.params = params
        self._dim = int(dim)
        self.mesh = mesh
        self._dtype = jnp.dtype(dtype)
        self.axis = axis
        # PartitionSpec pytree matching `params` (how each parameter leaf is
        # laid out across the mesh inside the shard_map body); default:
        # everything replicated.
        if param_specs is None:
            param_specs = jax.tree.map(lambda _: P(), params)
        self.param_specs = param_specs
        self.local_rmatvec = local_rmatvec
        self.symmetric = bool(symmetric)

    def _run(self, fn, x):
        body = lambda params, x_blk: fn(params, x_blk)
        # Manual only over the shard axis: other mesh axes (e.g. the data-
        # parallel "batch" axis) stay automatic, so vmapped/batched callers
        # can shard their batch dimension over them with plain GSPMD.
        return shard_map(
            body, mesh=self.mesh, axis_names={self.axis},
            in_specs=(self.param_specs, P(self.axis)),
            out_specs=P(self.axis))(self.params, x)

    def matvec(self, x):
        return self._run(self.local_matvec, x)

    def rmatvec(self, x):
        if self.local_rmatvec is not None:
            return self._run(self.local_rmatvec, x)
        return self._run(self.local_matvec, x)

    @property
    def dim(self):
        return self._dim

    @property
    def dtype(self):
        return self._dtype

    def tree_flatten(self):
        aux = (self.local_matvec, self._dim, self.mesh, self._dtype,
               self.axis, _HashableSpecs(self.param_specs),
               self.local_rmatvec, self.symmetric)
        return (self.params,), aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        (local_matvec, dim, mesh, dtype, axis, specs, local_rmatvec,
         symmetric) = aux
        obj = cls.__new__(cls)
        obj.local_matvec = local_matvec
        obj.params = children[0]
        obj._dim = dim
        obj.mesh = mesh
        obj._dtype = dtype
        obj.axis = axis
        obj.param_specs = specs.specs
        obj.local_rmatvec = local_rmatvec
        obj.symmetric = symmetric
        return obj


class _HashableSpecs:
    """Hashable/equatable wrapper so a PartitionSpec pytree can ride in the
    static aux_data of a pytree node (JAX requires aux to be hashable)."""

    def __init__(self, specs):
        self.specs = specs
        self._key = tuple(jax.tree.leaves(
            jax.tree.map(lambda s: s, specs,
                         is_leaf=lambda s: isinstance(s, P))))

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return (isinstance(other, _HashableSpecs)
                and self._key == other._key)
