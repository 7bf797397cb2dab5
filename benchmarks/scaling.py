"""Device-count scaling of the distributed Lanczos eigensolver.

BASELINE config #5: row-partitioned operator, p-device mesh, scaling
efficiency.  Real multi-chip hardware is not reachable from this
environment, so the default run measures *strong scaling on virtual CPU
devices* (collective correctness + surplus-work accounting), which is
how JAX multi-host code is rehearsed; on a real pod slice the same code
runs unchanged over ICI.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     JAX_PLATFORMS=cpu python benchmarks/scaling.py --n 18
"""

import argparse
import json
import os
import sys
import time

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from dominantsparseeigenad_tpu import dominant_eigh
from dominantsparseeigenad_tpu.models import tfim_sharded_operator
from dominantsparseeigenad_tpu.parallel.mesh import BATCH_AXIS, SHARD_AXIS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--k", type=int, default=60)
    ap.add_argument("--g", type=float, default=1.2)
    args = ap.parse_args()

    devices = jax.devices()
    counts = [p for p in (1, 2, 4, 8, 16) if p <= len(devices)]
    results = {}
    for p in counts:
        mesh = Mesh(np.asarray(devices[:p]).reshape(1, p),
                    (BATCH_AXIS, SHARD_AXIS))

        @jax.jit
        def solve(g):
            op = tfim_sharded_operator(args.n, g, mesh,
                                       dtype=jnp.float32)
            lam, _ = dominant_eigh(op, k=args.k, extreme="min", tol=1e-5,
                                   maxiter=150, reorth_passes=1)
            return lam

        val, grad = jax.value_and_grad(solve)(jnp.float32(args.g))
        _ = (float(val), float(grad))
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            out = jax.value_and_grad(solve)(jnp.float32(args.g + i * 1e-6))
            _ = tuple(float(x) for x in out)
            ts.append(time.perf_counter() - t0)
        results[p] = min(ts)
        eff = results[counts[0]] / (results[p] * p / counts[0])
        print(f"# p={p}: {min(ts)*1e3:8.1f} ms   "
              f"strong-scaling eff vs p={counts[0]}: {eff:5.2f}",
              file=sys.stderr)

    p_max = counts[-1]
    speedup = results[counts[0]] / results[p_max]
    print(json.dumps({
        "metric": f"distributed_lanczos_speedup_{p_max}dev",
        "value": round(speedup, 3),
        "unit": "x",
        "vs_baseline": round(speedup / p_max, 3),
    }))


if __name__ == "__main__":
    main()
