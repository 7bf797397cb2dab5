"""Device-mesh helpers.

The reference (`buwantaiji/DominantSparseEigenAD`) is single-process /
single-device and has no distribution layer at all (SURVEY.md §2.5); this
module is the TPU-native substrate the new framework scales on: a
`jax.sharding.Mesh` over the chips of a slice, with named axes

* ``"shards"`` — operator rows / Hilbert-space dimension partitioning
  (the moral analogue of tensor/sequence parallelism for this workload:
  the "big dimension" is the 2^N operator dimension, not a sequence), and
* ``"batch"``  — data parallelism over independent problem instances
  (many couplings g, many RHS).

Collectives ride ICI within a slice; multi-host meshes extend over DCN via
``jax.distributed.initialize`` (call :func:`init_distributed` once per
process before any mesh construction).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SHARD_AXIS = "shards"
BATCH_AXIS = "batch"


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize the multi-host JAX runtime (no-op on a single host).

    Multi-host equivalent of what the reference never had: each host calls
    this once, then every host sees the global device set and participates
    in DCN/ICI collectives emitted by ``shard_map``/GSPMD.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)


def make_mesh(n_shards: int | None = None, n_batch: int = 1,
              devices=None) -> Mesh:
    """Build a ``(batch, shards)`` mesh over the available devices.

    ``n_shards`` defaults to all devices (pure operator-row sharding).
    """
    if devices is None:
        devices = jax.devices()
    if n_shards is None:
        n_shards = len(devices) // n_batch
    if n_shards * n_batch > len(devices):
        raise ValueError(
            f"mesh {n_batch}x{n_shards} needs {n_batch * n_shards} devices, "
            f"have {len(devices)}")
    grid = np.asarray(devices[: n_batch * n_shards]).reshape(
        n_batch, n_shards)
    return Mesh(grid, (BATCH_AXIS, SHARD_AXIS))


def row_sharding(mesh: Mesh, ndim: int = 1,
                 axis: str = SHARD_AXIS) -> NamedSharding:
    """Sharding that partitions the leading axis over ``axis``."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
