"""Distributed Lanczos driver — row-sharded TFIM ground state over a
device mesh (no reference analogue: the reference is single-device;
SURVEY.md §2.5; BASELINE config #5 flavor).

On a real pod slice this uses every chip over ICI; on a dev machine, run
with virtual devices:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        JAX_PLATFORMS=cpu python examples/distributed_lanczos.py --n 12
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
    # A distributed driver needs a multi-device mesh.  This environment
    # exposes ONE tunneled TPU chip (whose compile service also rejects
    # the degenerate 1-device all-reduce), so without an explicit
    # platform choice fall back to an 8-virtual-device CPU mesh — the
    # same sharded program a pod slice would run, minus the ICI.
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=12)
    ap.add_argument("--g", type=float, default=1.0)
    ap.add_argument("--k", type=int, default=80)
    ap.add_argument("--dtype", choices=["f32", "f64"], default="f64")
    args = ap.parse_args()

    if args.dtype == "f64":
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float64 if args.dtype == "f64" else jnp.float32

    from dominantsparseeigenad_tpu import dominant_eigh
    from dominantsparseeigenad_tpu.models import (
        tfim_exact_e0, tfim_sharded_operator)
    from dominantsparseeigenad_tpu.parallel import make_mesh
    from dominantsparseeigenad_tpu.utils import timeit

    mesh = make_mesh()
    print(f"# mesh: {dict(mesh.shape)} over {len(jax.devices())} "
          f"{jax.default_backend()} devices")

    @jax.jit
    def solve(g):
        op = tfim_sharded_operator(args.n, g, mesh, dtype=dtype)
        lam, v = dominant_eigh(op, k=args.k, extreme="min",
                               tol=1e-10 if args.dtype == "f64" else 1e-5)
        return lam

    val, grad = jax.value_and_grad(solve)(jnp.asarray(args.g, dtype))
    exact = float(tfim_exact_e0(args.n, args.g))
    print(f"E0 = {float(val):.8f}  (exact {exact:.8f}, "
          f"err {abs(float(val)-exact):.1e})")
    print(f"dE0/dg = {float(grad):.8f}")
    t = timeit(solve, jnp.asarray(args.g, dtype), repeats=3)
    print(f"steady-state: {t.best*1e3:.1f} ms")


if __name__ == "__main__":
    main()
