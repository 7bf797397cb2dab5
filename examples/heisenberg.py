"""XXZ / Heisenberg chain driver — ground energy and its anisotropy
derivatives through the eigensolver (second model family; no reference
analogue).

Run: python examples/heisenberg.py --n 14 --points 7
"""

import argparse
import os

import jax
import jax.numpy as jnp

# f64 drive: default to the CPU backend (TPU f64 is emulated, slow and
# NaN-prone; SURVEY hard part 6 — validate in f64 on CPU, run perf in
# f32 on TPU).  This image bakes JAX_PLATFORMS=axon into the shell, so
# that ambient value is NOT a user override; anything else is.
_plat = os.environ.get("JAX_PLATFORMS", "")
jax.config.update("jax_platforms", "cpu" if _plat in ("", "axon") else _plat)
jax.config.update("jax_enable_x64", True)

import numpy as np

import sys
# Examples are runnable from a source checkout without installation:
# put the repo root ahead of the script dir on sys.path.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dominantsparseeigenad_tpu.models import heisenberg_ground_energy
from dominantsparseeigenad_tpu.utils import JsonlLogger


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=12)
    ap.add_argument("--points", type=int, default=7)
    ap.add_argument("--zmin", type=float, default=-1.5)
    ap.add_argument("--zmax", type=float, default=1.5)
    ap.add_argument("--k", type=int, default=150)
    ap.add_argument("--log", type=str, default=None)
    args = ap.parse_args()

    e0 = jax.jit(lambda jz: heisenberg_ground_energy(
        args.n, 1.0, jz, k=args.k))
    d1 = jax.jit(jax.grad(lambda jz: heisenberg_ground_energy(
        args.n, 1.0, jz, k=args.k)))

    log = JsonlLogger(args.log)
    print(f"# XXZ chain N={args.n}  (isotropic thermo limit "
          f"E0/N -> 1/4 - ln2 = {0.25 - np.log(2):.6f})")
    print(f"# {'Jz':>7} {'E0/N':>12} {'d(E0/N)/dJz':>13}")
    for jz in jnp.linspace(args.zmin, args.zmax, args.points):
        val = float(e0(jnp.float64(jz))) / args.n
        dv = float(d1(jnp.float64(jz))) / args.n
        print(f"  {float(jz):7.3f} {val:12.8f} {dv:13.8f}")
        log.log("xxz", jz=float(jz), e0_per_site=val, de0=dv)


if __name__ == "__main__":
    main()
