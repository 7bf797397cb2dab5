"""Multi-host rehearsal worker — run by test_multihost.py, one process
per "host".

Executes the DCN-path entry point the single-process suite can't reach:
``jax.distributed.initialize`` via ``parallel.mesh.init_distributed``,
then one sharded Lanczos + IFT-gradient step on a mesh spanning BOTH
processes, asserted against a process-local dense oracle.  Everything
each process runs is identical (SPMD); the collectives inside shard_map
cross the process boundary exactly as they would cross DCN on a
multi-host pod.

Usage: python multihost_worker.py <coordinator> <num_procs> <proc_id>
"""

import os
import sys

# 4 virtual CPU devices per process -> an 8-device global mesh across 2
# processes.  XLA_FLAGS is read at first backend init, so setting it here
# (before any jax array op) works; the PLATFORM cannot be chosen via env
# in this environment — sitecustomize force-registers a TPU plugin before
# this script runs — so it is pinned through jax.config below, before
# distributed init or any backend touch.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np


def main():
    coord, num_procs, proc_id = (sys.argv[1], int(sys.argv[2]),
                                 int(sys.argv[3]))
    from dominantsparseeigenad_tpu.parallel import (
        RowShardedOperator, init_distributed, make_mesh, shard_vector)

    # The hook under rehearsal (parallel/mesh.py): wires this process
    # into the global runtime; afterwards jax.devices() is GLOBAL.
    init_distributed(coord, num_procs, proc_id)
    assert jax.process_count() == num_procs, jax.process_count()
    assert jax.process_index() == proc_id
    n_global = len(jax.devices())
    assert n_global == 4 * num_procs, n_global
    assert len(jax.local_devices()) == 4

    from dominantsparseeigenad_tpu import dominant_eigh

    # Identical (replicated) problem data on every process — the
    # device_put inside RowShardedOperator then lays the rows out over
    # the global mesh, local shards from local hosts.
    n, k = 256, 60
    rng = np.random.default_rng(123)
    a = rng.standard_normal((n, n))
    a = jnp.asarray((a + a.T) / 2)

    mesh = make_mesh()          # (1, 8) over BOTH processes
    assert mesh.devices.size == n_global
    op = RowShardedOperator(a, mesh)

    def lam_of(ai):
        lam, _ = dominant_eigh(RowShardedOperator(ai, mesh), k=k,
                               extreme="min")
        return lam

    lam, grad = jax.jit(jax.value_and_grad(lam_of))(op.a)
    # Scalars/gradients come back replicated; pull only addressable data.
    lam = float(lam)
    gnorm = float(jnp.linalg.norm(grad))

    # Process-local oracle: dense eigh.  d lambda / dA = v v^T (symmetric
    # input => the framework symmetrizes the cotangent), ||v v^T||_F = 1.
    evals = np.linalg.eigvalsh(np.asarray(a))
    assert abs(lam - evals[0]) < 1e-10 * max(1.0, abs(evals[0])), \
        (lam, evals[0])
    assert abs(gnorm - 1.0) < 1e-8, gnorm

    # One explicit cross-process collective sanity check: psum over the
    # sharded axis counts every global device, not just local ones.
    from jax.sharding import PartitionSpec as P
    from dominantsparseeigenad_tpu.parallel import SHARD_AXIS
    total = jax.jit(jax.shard_map(
        lambda x: jax.lax.psum(x, SHARD_AXIS), mesh=mesh,
        in_specs=P(SHARD_AXIS), out_specs=P()))(
            shard_vector(jnp.ones((n_global,)), mesh))
    assert float(total[0]) == float(n_global), total

    # SPARSE tier over the SAME cross-process mesh: the row-sharded
    # blocked-ELL operator's all-gather SpMV and its matrix-entry
    # gradient must match the process-local dense oracle — the one
    # distribution tier the dense check above does not reach.
    from dominantsparseeigenad_tpu import random_bell_operator
    from dominantsparseeigenad_tpu.parallel import RowShardedBellOperator

    bop = random_bell_operator(jax.random.PRNGKey(7), n=n, bs=16,
                               blocks_per_row=5, dtype=jnp.float64,
                               use_pallas=False)
    sbop = RowShardedBellOperator.from_bell(bop, mesh)

    def lam_sparse(vals, o):
        # o passed as an ARGUMENT: closing over an operator whose leaves
        # span non-addressable devices is rejected by jit.
        lam, _ = dominant_eigh(o.with_vals(vals), k=k, extreme="min")
        return lam

    lam_s, grad_s = jax.jit(jax.value_and_grad(lam_sparse))(sbop.vals,
                                                            sbop)
    dense = np.zeros((n, n))
    cols_np = np.asarray(bop.cols)
    vals_np = np.asarray(bop.vals)
    for i in range(cols_np.shape[0]):
        for j in range(cols_np.shape[1]):
            c = int(cols_np[i, j])
            dense[i * 16:(i + 1) * 16, c * 16:(c + 1) * 16] += vals_np[i, j]
    ev_s = np.linalg.eigvalsh(dense)
    assert abs(float(lam_s) - ev_s[0]) < 1e-9 * max(1.0, abs(ev_s[0])), \
        (float(lam_s), ev_s[0])
    gs = float(jnp.linalg.norm(grad_s))
    assert np.isfinite(gs) and 0.0 < gs <= 1.0 + 1e-8, gs

    print(f"OK proc={proc_id} lam={lam:.12f} gnorm={gnorm:.2e} "
          f"lam_sparse={float(lam_s):.12f} devices={n_global}")


if __name__ == "__main__":
    main()
