"""2D classical Ising driver — free energy, energy and specific heat via
TRG or CTMRG, differentiated through the renormalization flow (reference
``examples/CTMRG``; SURVEY.md §2.2 A3; BASELINE config #4), validated
against Onsager.

Run: python examples/ising2d.py --method ctmrg --chi 30
"""

import argparse

import os

import jax
import jax.numpy as jnp

# The environment force-registers a TPU PJRT plugin before main() runs, so
# JAX_PLATFORMS from the shell is only honored if applied in-process:
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import sys
# Examples are runnable from a source checkout without installation:
# put the repo root ahead of the script dir on sys.path.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dominantsparseeigenad_tpu.models import (
    ising_observables, onsager_free_energy)
from dominantsparseeigenad_tpu.utils import JsonlLogger


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", choices=["trg", "ctmrg"], default="ctmrg")
    ap.add_argument("--chi", type=int, default=30)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--points", type=int, default=11)
    ap.add_argument("--bmin", type=float, default=0.30)
    ap.add_argument("--bmax", type=float, default=0.60)
    ap.add_argument("--log", type=str, default=None)
    ap.add_argument("--f32", action="store_true",
                    help="run the flow in f32 (the TPU-native dtype; "
                         "tracks f64 to ~1e-4 via the subspace split and "
                         "HIGHEST-precision matmuls)")
    ap.add_argument("--vmap", action="store_true",
                    help="batch all beta points through jax.vmap — ONE "
                         "compiled program evaluates the whole curve "
                         "(lnZ, u, c_v at order 2) in parallel on the "
                         "device; a 16-point chi=24 TRG sweep runs in "
                         "~1.1 s on one v5e chip")
    args = ap.parse_args()
    # x64 everywhere except --f32 runs: mixing x64 mode with the f32 flow
    # crashes the experimental TPU plugin, and the Onsager oracle is
    # smooth enough that f32 differentiation still resolves the ~1e-4
    # truncation errors being reported.
    if not args.f32:
        if os.environ.get("JAX_PLATFORMS", "axon") in ("", "axon"):
            # f64 flows validate on CPU (the baked-in JAX_PLATFORMS=axon
            # is not a user override); --f32 is the accelerator path.
            jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float32 if args.f32 else jnp.float64

    ex = lambda b: onsager_free_energy(b, n_quad=256)
    ex_u = jax.grad(ex)
    ex_c = jax.grad(ex_u)

    log = JsonlLogger(args.log)
    print(f"# 2D Ising {args.method}  chi={args.chi}  steps={args.steps}")
    print(f"# {'beta':>7} {'lnZ/N':>12} {'u':>10} {'c_v':>10} "
          f"{'err(lnZ)':>9} {'err(u)':>9} {'err(c_v)':>9}")
    betas = jnp.linspace(args.bmin, args.bmax, args.points)

    if args.vmap:
        obs = lambda b: jnp.stack(ising_observables(
            b, method=args.method, chi=args.chi, n_steps=args.steps,
            dtype=dtype))
        rows = jax.jit(jax.vmap(obs))(betas.astype(dtype))
        results = [(float(b), *map(float, row))
                   for b, row in zip(betas, rows)]
    else:
        results = []
        for b in betas:
            lnz, u, cv = ising_observables(float(b), method=args.method,
                                           chi=args.chi,
                                           n_steps=args.steps, dtype=dtype)
            results.append((float(b), float(lnz), float(u), float(cv)))

    for b, lnz, u, cv in results:
        bx = jnp.asarray(b)  # f64 when x64 is on, f32 otherwise
        lnz_e = float(ex(b))
        u_e = -float(ex_u(bx))
        cv_e = b ** 2 * float(ex_c(bx))
        print(f"  {b:7.4f} {lnz:12.8f} {u:10.6f} "
              f"{cv:10.6f} {abs(lnz-lnz_e):9.1e} "
              f"{abs(u-u_e):9.1e} {abs(cv-cv_e):9.1e}")
        log.log("ising2d", beta=b, lnz=lnz, u=u, cv=cv)


if __name__ == "__main__":
    main()
