"""Checkpoint / resume for long iterative runs.

The reference never checkpoints (runs are seconds–minutes; SURVEY.md §5).
For long distributed Lanczos runs this module saves solver state — any
pytree of arrays, e.g. a :class:`~..ops.lanczos.LanczosResult` (basis Q,
alpha/beta coefficients) or CG state — and restores it deterministically.

Two backends:

* ``.npz`` (numpy) — zero extra dependencies, single-host;
* ``orbax`` — multi-host-safe sharded checkpointing when available
  (arrays keep their ``NamedSharding`` on restore).
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def save_pytree(path: str, tree) -> None:
    """Save a pytree of arrays to ``<path>.npz`` + ``<path>.tree.json``."""
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    np.savez(path + ".npz", **arrays)
    with open(path + ".tree.json", "w") as f:
        json.dump({"n_leaves": len(leaves), "treedef": str(treedef)}, f)


def load_pytree(path: str, like):
    """Restore a pytree saved by :func:`save_pytree`.

    ``like`` provides the tree structure (and target shardings: each
    restored leaf is ``device_put`` with the corresponding leaf's
    sharding when it has one).
    """
    data = np.load(path + ".npz")
    leaves_like, treedef = jax.tree.flatten(like)
    leaves = []
    for i, ref in enumerate(leaves_like):
        arr = data[f"leaf_{i}"]
        sharding = getattr(ref, "sharding", None)
        leaves.append(jax.device_put(arr, sharding) if sharding is not None
                      else jax.numpy.asarray(arr))
    return jax.tree.unflatten(treedef, leaves)


def save_orbax(path: str, tree) -> None:
    """Multi-host sharded checkpoint via orbax (npz when not installed).

    The fallback triggers ONLY on ImportError: a genuine orbax save
    failure (bad path, unserializable leaf, multi-host sync error) must
    surface, not silently switch formats — for multi-host sharded arrays
    the npz fallback is wrong by construction (it would save only the
    local shard), and masking the error could strand a long run with an
    unusable checkpoint (round-4 review).
    """
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        save_pytree(path, tree)
        return
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()


def load_orbax(path: str, like):
    """Restore a :func:`save_orbax` checkpoint (npz when orbax is not
    installed).  Like the save side, only ImportError falls back — a
    real restore failure must not silently load a stale npz from an
    earlier run and resume from the wrong state."""
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        return load_pytree(path, like)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), like)
