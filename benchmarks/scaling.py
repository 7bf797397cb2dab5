"""Device-count scaling of the distributed Lanczos eigensolver.

BASELINE config #5: row-partitioned operator, p-device mesh, scaling
efficiency.  Real multi-chip hardware is not reachable from this
environment, so the default run measures *strong scaling on virtual CPU
devices* (collective correctness + surplus-work accounting), which is
how JAX multi-host code is rehearsed; on a real pod slice the same code
runs unchanged over ICI.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     JAX_PLATFORMS=cpu python benchmarks/scaling.py --n 18

``--sparse`` switches the operator from the matrix-free TFIM to the
explicit row-sharded blocked-ELL tier (`RowShardedBellOperator`) — the
"row-partitioned synthetic sparse operator" of BASELINE config #5 as
written — and the gradient to the full matrix-entry adjoint (one
deflated-CG solve + lazy outer-product contraction per shard).
"""

import argparse
import json
import os
import sys
import time

# Runnable from a source checkout without installation: put the repo
# root ahead of the script dir on sys.path.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from dominantsparseeigenad_tpu import dominant_eigh
from dominantsparseeigenad_tpu.models import tfim_sharded_operator
from dominantsparseeigenad_tpu.ops.sparse import random_bell_operator
from dominantsparseeigenad_tpu.parallel import RowShardedBellOperator
from dominantsparseeigenad_tpu.parallel.mesh import BATCH_AXIS, SHARD_AXIS


def _tfim_timer(args, mesh):
    """value+grad w.r.t. the coupling g through the sharded TFIM."""
    def solve(g):
        op = tfim_sharded_operator(args.n, g, mesh, dtype=jnp.float32)
        lam, _ = dominant_eigh(op, k=args.k, extreme="min", tol=1e-5,
                               maxiter=150, reorth_passes=1)
        return lam

    # Jit the WHOLE value_and_grad (like the sparse path): an un-jitted
    # AD wrapper around an inner jit re-runs the linearize/transpose
    # machinery on every timed repeat — fixed host overhead inside the
    # timing that does not shrink with p, deflating the reported
    # strong-scaling efficiency.
    val_grad = jax.jit(jax.value_and_grad(solve))

    def run(i):
        out = val_grad(jnp.float32(args.g + i * 1e-6))
        return tuple(float(x) for x in out)
    return run


def _sparse_timer(args, mesh):
    """value+grad w.r.t. the MATRIX ENTRIES through the row-sharded
    blocked-ELL operator — distributed Lanczos forward + one deflated-CG
    adjoint solve + the lazy per-shard outer-product contraction."""
    op0 = random_bell_operator(jax.random.PRNGKey(0), n=1 << args.n,
                               bs=args.bs, blocks_per_row=args.bpr,
                               dtype=jnp.float32, use_pallas=None)
    sop = RowShardedBellOperator.from_bell(op0, mesh, mode="all_gather")

    @jax.jit
    def val_grad(vals):
        def loss(v):
            lam, _ = dominant_eigh(sop.with_vals(v), k=args.k,
                                   extreme="min", tol=1e-5, maxiter=150,
                                   reorth_passes=1)
            return lam
        return jax.value_and_grad(loss)(vals)

    def run(i):
        val, grad = val_grad(sop.vals * (1.0 + i * 1e-6))
        return float(val), float(jnp.linalg.norm(grad.ravel()))
    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16,
                    help="log2 of the operator dimension")
    ap.add_argument("--k", type=int, default=60)
    ap.add_argument("--g", type=float, default=1.2)
    ap.add_argument("--sparse", action="store_true",
                    help="row-sharded blocked-ELL operator instead of the "
                         "matrix-free TFIM (BASELINE config #5 as written)")
    ap.add_argument("--bs", type=int, default=64,
                    help="sparse block size (--sparse)")
    ap.add_argument("--bpr", type=int, default=5,
                    help="stored blocks per block-row, odd (--sparse)")
    args = ap.parse_args()

    devices = jax.devices()
    counts = [p for p in (1, 2, 4, 8, 16) if p <= len(devices)]
    label = "sparse" if args.sparse else "lanczos"
    results = {}
    for p in counts:
        mesh = Mesh(np.asarray(devices[:p]).reshape(1, p),
                    (BATCH_AXIS, SHARD_AXIS))
        run = (_sparse_timer if args.sparse else _tfim_timer)(args, mesh)

        _ = run(0)  # compile + warm
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            _ = run(i)
            ts.append(time.perf_counter() - t0)
        results[p] = min(ts)
        eff = results[counts[0]] / (results[p] * p / counts[0])
        print(f"# p={p}: {min(ts)*1e3:8.1f} ms   "
              f"strong-scaling eff vs p={counts[0]}: {eff:5.2f}",
              file=sys.stderr)

    p_max = counts[-1]
    speedup = results[counts[0]] / results[p_max]
    print(json.dumps({
        "metric": f"distributed_{label}_speedup_{p_max}dev",
        "value": round(speedup, 3),
        "unit": "x",
        "vs_baseline": round(speedup / p_max, 3),
    }))


if __name__ == "__main__":
    main()
