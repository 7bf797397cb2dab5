"""TFIM matrix-free driver — fidelity susceptibility at large N
(reference ``examples/TFIM`` sparse scripts; SURVEY.md §2.2 A2; BASELINE
config #3; the paper's flagship figure).

The 2^N-dimensional Hamiltonian is never materialized: Lanczos forward +
deflated-CG implicit tangents give chi_F(g) = ||dpsi/dg||^2 per sweep
point.  On TPU, run with --dtype f32 (the default dtype is f64 for CPU
ground-truth runs).

Run: python examples/tfim_sparse.py --n 16 --points 21
"""

import argparse
import os

import sys
# Examples are runnable from a source checkout without installation:
# put the repo root ahead of the script dir on sys.path.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--points", type=int, default=11)
    ap.add_argument("--gmin", type=float, default=0.5)
    ap.add_argument("--gmax", type=float, default=1.5)
    ap.add_argument("--k", type=int, default=100, help="Lanczos steps")
    ap.add_argument("--dtype", choices=["f32", "f64"], default="f64")
    ap.add_argument("--log", type=str, default=None)
    ap.add_argument("--batched", action="store_true",
                    help="compute the whole chi_F(g) curve in ONE "
                         "vmapped dispatch (tfim_observables_sweep) "
                         "instead of a Python loop — on a remote TPU "
                         "the per-dispatch host round-trip is paid "
                         "once per curve instead of once per point")
    args = ap.parse_args()

    if args.dtype == "f64":
        if os.environ.get("JAX_PLATFORMS", "axon") in ("", "axon"):
            # f64 on the TPU backend is emulated and NaN-prone; validate
            # in f64 on CPU (f32 stays on the accelerator).  The image
            # bakes JAX_PLATFORMS=axon in; that's not a user override.
            jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float64 if args.dtype == "f64" else jnp.float32

    from dominantsparseeigenad_tpu import dominant_eigh
    from dominantsparseeigenad_tpu.models import tfim_operator, tfim_exact_e0
    from dominantsparseeigenad_tpu.utils import JsonlLogger, timeit

    tol = 1e-10 if args.dtype == "f64" else 1e-5

    @jax.jit
    def observables(g):
        def ground(g):
            op = tfim_operator(args.n, g, dtype=dtype)
            return dominant_eigh(op, k=args.k, extreme="min", tol=tol,
                                 maxiter=400)
        (lam, v), (dlam, dv) = jax.jvp(ground, (g,),
                                       (jnp.ones((), dtype),))
        return lam, dlam, jnp.vdot(dv, dv)

    log = JsonlLogger(args.log)
    print(f"# TFIM sparse  N={args.n}  dim={1 << args.n}  "
          f"backend={jax.default_backend()}  dtype={args.dtype}  "
          f"{'batched' if args.batched else 'pointwise'}")
    print(f"# {'g':>6} {'E0/N':>12} {'dE0/dg':>12} {'chi_F':>12} "
          f"{'err(E0)':>9}")
    gs = jnp.linspace(args.gmin, args.gmax, args.points)
    if args.batched:
        from dominantsparseeigenad_tpu.models import tfim_observables_sweep
        import numpy as np
        sweep = jax.jit(lambda z: tfim_observables_sweep(
            args.n, z, k=args.k, tol=tol, maxiter=400, dtype=dtype))
        rows = np.asarray(sweep(jnp.asarray(gs, dtype)))
        for g, (lam, dlam, chi) in zip(np.asarray(gs), rows):
            exact = float(tfim_exact_e0(args.n, float(g)))
            print(f"  {float(g):6.3f} {lam/args.n:12.8f} {dlam:12.6f} "
                  f"{chi:12.6f} {abs(lam-exact)/abs(exact):9.1e}")
            log.log("tfim_sparse", g=float(g), e0=float(lam),
                    de0=float(dlam), chi=float(chi))
        t = timeit(sweep, jnp.asarray(gs, dtype), repeats=3)
        print(f"# steady-state per point (whole-curve dispatch): "
              f"{t.best/args.points*1e3:.1f} ms")
        return
    for g in gs:
        g = jnp.asarray(g, dtype)
        lam, dlam, chi = (float(x) for x in observables(g))
        exact = float(tfim_exact_e0(args.n, float(g)))
        print(f"  {float(g):6.3f} {lam/args.n:12.8f} {dlam:12.6f} "
              f"{chi:12.6f} {abs(lam-exact)/abs(exact):9.1e}")
        log.log("tfim_sparse", g=float(g), e0=lam, de0=dlam, chi=chi)

    t = timeit(observables, jnp.asarray(1.0, dtype), repeats=3)
    print(f"# steady-state per point: {t.best*1e3:.1f} ms")


if __name__ == "__main__":
    main()
