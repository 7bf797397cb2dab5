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

# A distributed driver needs a multi-device mesh.  Default to an
# 8-virtual-device CPU mesh — the same sharded program a pod slice would
# run — unless the user explicitly picks a platform with --platform
# (e.g. ``--platform tpu`` on a real slice).  Gating on an explicit flag
# rather than on environment sentinels keeps the example portable: on a
# single-device setup the environment's platform would otherwise build a
# trivial 1-device "mesh".  This must be decided before jax initializes
# its backend, hence the manual argv peek ahead of argparse.
_platform = None
for _i, _a in enumerate(sys.argv):
    if _a == "--platform" and _i + 1 < len(sys.argv):
        _platform = sys.argv[_i + 1]
    elif _a.startswith("--platform="):
        _platform = _a.split("=", 1)[1]
if _platform is None:
    _platform = os.environ.get("JAX_PLATFORMS") or None
if _platform is None:
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    jax.config.update("jax_platforms", "cpu")
else:
    # Honor an explicit environment choice exactly like the sibling
    # distributed_lanczos.py — JAX_PLATFORMS=tpu on a real slice must
    # not be silently overridden onto 8 virtual CPU devices.
    jax.config.update("jax_platforms", _platform)


def main():
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
    ap.add_argument("--platform", default=None,
                    help="explicit JAX platform (default: 8-virtual-device"
                         " CPU mesh)")
    args = ap.parse_args()

    mesh = make_mesh()
    p = mesh.devices.size
    print(f"mesh: {p} devices, exchange mode: {args.mode}")
    if p < 2:
        print("note: only one device visible — the sharded and local "
              "paths below run the same single-device program")

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
        # Both tiers share the with_vals idiom (same pattern, new
        # entries — all construction knobs carried along).
        lam, _ = dominant_eigh(operator.with_vals(vals),
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
    # Hard parity gate (not just a print): a silent divergence between
    # the sharded and local gradient paths must fail, including in the
    # examples smoke test.  f32 + different reduction orders bound the
    # legitimate gap well under this threshold.
    tol = 1e-4 * max(1.0, float(jnp.linalg.norm(grad_l)))
    if not (gdiff <= tol and
            abs(float(lam_s) - float(lam_l)) <= 1e-4 * abs(float(lam_l))):
        raise SystemExit(
            f"PARITY FAILURE: sharded vs local gradient max-diff {gdiff:.2e}"
            f" exceeds {tol:.2e}")


if __name__ == "__main__":
    main()
