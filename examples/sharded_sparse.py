"""Row-sharded sparse-format eigensolver driver — BASELINE config #5 as
written: a row/block-partitioned blocked-ELL matrix whose SpMV runs
per-shard while the needed vector segments move over ICI, with the
dominant eigenpair and its MATRIX-ENTRY gradient computed through the
distributed Lanczos forward and the deflated-CG implicit backward.

No reference analogue (the reference is single-device and has no sparse
storage at all — SURVEY.md §2.4/§2.5); the single-device oracle here is
this framework's own `BellOperator` path, printed side by side.

On a real pod slice this uses every chip over ICI; on a dev machine run
with virtual devices:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        JAX_PLATFORMS=cpu python examples/sharded_sparse.py --n 4096
"""

import argparse
import os

import sys
# Examples are runnable from a source checkout without installation:
# put the repo root ahead of the script dir on sys.path.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

_plat = os.environ.get("JAX_PLATFORMS", "")
if _plat not in ("", "axon"):  # baked-in axon is not a user override
    jax.config.update("jax_platforms", _plat)
else:
    # A distributed driver needs a multi-device mesh; this environment
    # exposes ONE tunneled TPU chip, so default to an 8-virtual-device
    # CPU mesh — the same sharded program a pod slice would run.
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    jax.config.update("jax_platforms", "cpu")


def main():
    import numpy as np
    from dominantsparseeigenad_tpu import dominant_eigh
    from dominantsparseeigenad_tpu.ops.sparse import random_bell_operator
    from dominantsparseeigenad_tpu.parallel import (
        RowShardedBellOperator, make_mesh)

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096, help="matrix dimension")
    ap.add_argument("--bs", type=int, default=32, help="block size")
    ap.add_argument("--bpr", type=int, default=5,
                    help="stored blocks per block-row (odd)")
    ap.add_argument("--k", type=int, default=60, help="Lanczos steps")
    ap.add_argument("--mode", choices=("all_gather", "ring"),
                    default="all_gather",
                    help="vector-segment exchange strategy over ICI")
    args = ap.parse_args()

    mesh = make_mesh()
    p = mesh.devices.size
    print(f"mesh: {p} devices, exchange mode: {args.mode}")

    # Synthetic symmetric block-banded operator (the config-#5 shape),
    # then its row-sharded twin on the mesh.
    op = random_bell_operator(jax.random.PRNGKey(0), n=args.n, bs=args.bs,
                              blocks_per_row=args.bpr, dtype=jnp.float32,
                              use_pallas=False)
    sop = RowShardedBellOperator.from_bell(op, mesh, mode=args.mode)
    nnz = op.nnz
    print(f"operator: n={args.n}, {nnz:,} stored entries "
          f"({nnz / args.n**2:.2%} dense)")

    # Eigenvalue + full matrix-entry gradient: d lambda_min / d A_ij is
    # the rank-1 outer product v v^T restricted to the sparsity pattern —
    # exact, and computed WITHOUT materializing anything dense (the IFT
    # backward contracts the adjoint lazily into the vals leaf).
    def lam_of(vals, operator):
        lam, _ = dominant_eigh(operator.with_vals(vals) if operator is sop
                               else type(op)(vals, op.cols, op.n,
                                             symmetric=True,
                                             use_pallas=False),
                               k=args.k, extreme="min")
        return lam

    lam_s, grad_s = jax.jit(
        jax.value_and_grad(lambda v: lam_of(v, sop)))(sop.vals)
    lam_l, grad_l = jax.jit(
        jax.value_and_grad(lambda v: lam_of(v, op)))(op.vals)

    print(f"lambda_min  sharded: {float(lam_s):+.8f}")
    print(f"lambda_min  local  : {float(lam_l):+.8f}")
    gdiff = float(jnp.max(jnp.abs(grad_s - grad_l)))
    print(f"matrix-entry gradient: max |sharded - local| = {gdiff:.2e}")
    print(f"||d lambda / d vals|| = {float(jnp.linalg.norm(grad_s)):.6f}"
          "  (= ||v v^T on the pattern|| <= 1)")


if __name__ == "__main__":
    main()
