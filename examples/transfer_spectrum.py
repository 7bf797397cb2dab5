"""2D Ising transfer-matrix spectrum driver — gap and correlation length
across the phase transition, fully differentiable (reference analogue:
``examples/CTMRG``'s DominantEig application; the multi-eigenvalue sweep
and d(xi)/dbeta are north-star extensions).

The top-m transfer eigenvalues come from ``dominant_eig_multi``
(Arnoldi-seeded Wielandt deflation) on the converged CTMRG environment;
xi = 1/ln(lam1/|lam2|) diverges at beta_c ~ 0.4407.

Run: python examples/transfer_spectrum.py --points 7
"""

import argparse
import os

import jax
import jax.numpy as jnp

# f64 drive: default to the CPU backend (TPU f64 is emulated and slow;
# the baked-in JAX_PLATFORMS=axon is not a user override).
_plat = os.environ.get("JAX_PLATFORMS", "")
jax.config.update("jax_platforms", "cpu" if _plat in ("", "axon") else _plat)
jax.config.update("jax_enable_x64", True)

import numpy as np

import sys
# Examples are runnable from a source checkout without installation:
# put the repo root ahead of the script dir on sys.path.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dominantsparseeigenad_tpu.models import (
    correlation_length, ctmrg_environment, transfer_operator)
from dominantsparseeigenad_tpu.ops.eig import dominant_eig_multi
from dominantsparseeigenad_tpu.utils import JsonlLogger


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chi", type=int, default=12)
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--m", type=int, default=3, help="eigenvalues to track")
    ap.add_argument("--points", type=int, default=7)
    ap.add_argument("--bmin", type=float, default=0.30)
    ap.add_argument("--bmax", type=float, default=0.42)
    ap.add_argument("--log", type=str, default=None)
    args = ap.parse_args()

    def spectrum(beta):
        c, e, t = ctmrg_environment(beta, chi=args.chi, n_steps=args.steps)
        lams, _, _ = dominant_eig_multi(transfer_operator(c, e, t),
                                        m=args.m)
        return lams

    xi = jax.jit(lambda b: correlation_length(b, chi=args.chi,
                                              n_steps=args.steps))
    dxi = jax.jit(jax.grad(lambda b: correlation_length(
        b, chi=args.chi, n_steps=args.steps)))
    spec = jax.jit(spectrum)

    log = JsonlLogger(args.log)
    print(f"# 2D Ising transfer spectrum  chi={args.chi}  "
          f"(beta_c = {0.5 * np.log(1 + np.sqrt(2)):.6f})")
    print(f"# {'beta':>7} {'lam1':>12} {'lam2/lam1':>10} {'lam3/lam1':>10}"
          f" {'xi':>10} {'dxi/dbeta':>11}")
    for b in jnp.linspace(args.bmin, args.bmax, args.points):
        lams = np.asarray(spec(jnp.float64(b)))
        x, dx = float(xi(jnp.float64(b))), float(dxi(jnp.float64(b)))
        row = [float(b), lams[0], lams[1] / lams[0],
               (lams[2] / lams[0]) if args.m > 2 else float("nan"), x, dx]
        print(f"  {row[0]:7.4f} {row[1]:12.6f} {row[2]:10.6f} "
              f"{row[3]:10.6f} {row[4]:10.4f} {row[5]:11.4f}")
        log.log("transfer_spectrum", beta=row[0], lam1=row[1],
                ratio2=row[2], ratio3=row[3], xi=row[4], dxi=row[5])


if __name__ == "__main__":
    main()
