"""TFIM exact diagonalization driver (reference ``examples/TFIM`` ED
scripts; SURVEY.md §2.2 A1; BASELINE config #2).

Sweeps the transverse field g, computing the ground energy and its first
and second derivatives **through the dominant eigensolver's implicit
derivative rules**, and compares against the exact Jordan-Wigner values.

Run: python examples/tfim_ed.py --n 10 --points 21
"""

import argparse

import os

import jax
import jax.numpy as jnp

# The environment force-registers a TPU PJRT plugin before main() runs, so
# JAX_PLATFORMS from the shell is only honored if applied in-process:
# f64 drive: default to the CPU backend (TPU f64 is emulated, slow and
# NaN-prone; SURVEY hard part 6 — validate in f64 on CPU, run perf in
# f32 on TPU).  This image bakes JAX_PLATFORMS=axon into the shell, so
# that ambient value is NOT a user override; anything else is.
_plat = os.environ.get("JAX_PLATFORMS", "")
jax.config.update("jax_platforms", "cpu" if _plat in ("", "axon") else _plat)
jax.config.update("jax_enable_x64", True)

import sys
# Examples are runnable from a source checkout without installation:
# put the repo root ahead of the script dir on sys.path.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dominantsparseeigenad_tpu import DenseOperator, dominant_eigh
from dominantsparseeigenad_tpu.models import (
    tfim_dense_hamiltonian, tfim_exact_e0)
from dominantsparseeigenad_tpu.utils import JsonlLogger


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10, help="number of spins")
    ap.add_argument("--points", type=int, default=21)
    ap.add_argument("--gmin", type=float, default=0.2)
    ap.add_argument("--gmax", type=float, default=1.8)
    ap.add_argument("--log", type=str, default=None, help="JSONL path")
    args = ap.parse_args()

    def e0(g):
        h = tfim_dense_hamiltonian(args.n, g)
        lam, _ = dominant_eigh(DenseOperator(h), k=min(120, 1 << args.n),
                               extreme="min", tol=1e-12)
        return lam

    e0 = jax.jit(e0)
    d1 = jax.jit(jax.grad(e0))
    d2 = jax.jit(jax.grad(jax.grad(e0)))
    exact_d1 = jax.grad(lambda g: tfim_exact_e0(args.n, g))
    exact_d2 = jax.grad(exact_d1)

    log = JsonlLogger(args.log)
    print(f"# TFIM ED  N={args.n}   E0/dE0/d2E0 vs exact Jordan-Wigner")
    print(f"# {'g':>6} {'E0':>12} {'dE0/dg':>12} {'d2E0/dg2':>12} "
          f"{'err(E0)':>9} {'err(d1)':>9} {'err(d2)':>9}")
    for g in jnp.linspace(args.gmin, args.gmax, args.points):
        val, dv, ddv = e0(g), d1(g), d2(g)
        ev = tfim_exact_e0(args.n, g)
        ed, edd = exact_d1(g), exact_d2(g)
        print(f"  {float(g):6.3f} {float(val):12.6f} {float(dv):12.6f} "
              f"{float(ddv):12.6f} {abs(float(val-ev)):9.1e} "
              f"{abs(float(dv-ed)):9.1e} {abs(float(ddv-edd)):9.1e}")
        log.log("tfim_ed", g=float(g), e0=float(val), de0=float(dv),
                d2e0=float(ddv))


if __name__ == "__main__":
    main()
