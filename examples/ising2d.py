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
jax.config.update("jax_enable_x64", True)

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
    args = ap.parse_args()
    dtype = jnp.float32 if args.f32 else jnp.float64

    ex = lambda b: onsager_free_energy(b, n_quad=256)
    ex_u = jax.grad(ex)
    ex_c = jax.grad(ex_u)

    log = JsonlLogger(args.log)
    print(f"# 2D Ising {args.method}  chi={args.chi}  steps={args.steps}")
    print(f"# {'beta':>7} {'lnZ/N':>12} {'u':>10} {'c_v':>10} "
          f"{'err(lnZ)':>9} {'err(u)':>9} {'err(c_v)':>9}")
    for b in jnp.linspace(args.bmin, args.bmax, args.points):
        lnz, u, cv = ising_observables(float(b), method=args.method,
                                       chi=args.chi, n_steps=args.steps,
                                       dtype=dtype)
        lnz_e = float(ex(float(b)))
        u_e = -float(ex_u(jnp.float64(b)))
        cv_e = float(b) ** 2 * float(ex_c(jnp.float64(b)))
        print(f"  {float(b):7.4f} {float(lnz):12.8f} {float(u):10.6f} "
              f"{float(cv):10.6f} {abs(float(lnz)-lnz_e):9.1e} "
              f"{abs(float(u)-u_e):9.1e} {abs(float(cv)-cv_e):9.1e}")
        log.log("ising2d", beta=float(b), lnz=float(lnz), u=float(u),
                cv=float(cv))


if __name__ == "__main__":
    main()
