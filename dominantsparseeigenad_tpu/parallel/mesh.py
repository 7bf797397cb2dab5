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
    """Initialize the multi-host JAX runtime.

    Multi-host equivalent of what the reference never had: each host calls
    this once, then every host sees the global device set and participates
    in DCN/ICI collectives emitted by ``shard_map``/GSPMD.

    With EXPLICIT arguments they are passed straight through.  With no
    arguments, defers to ``jax.distributed.initialize()``'s environment
    auto-detection — the standard pattern on TPU pods, where the runtime
    publishes coordinator/process info; a host where nothing can be
    auto-detected is treated as single-process (warned, not raised).
    The old behavior silently skipped initialization unless
    ``num_processes > 1`` was passed, which defeated auto-detection and
    left multi-host runs on partial local meshes (round-4 review).
    Pass ``num_processes=1`` to skip explicitly.
    """
    if num_processes == 1:
        return
    if coordinator_address is not None or num_processes is not None \
            or process_id is not None:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)
        return
    try:
        jax.distributed.initialize()
    except (RuntimeError, ValueError) as exc:
        import warnings
        warnings.warn(
            "init_distributed(): no multi-host environment auto-detected "
            f"({exc}); continuing single-process. Pass explicit "
            "coordinator_address/num_processes/process_id for manual "
            "setup, or num_processes=1 to silence this warning.")


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
