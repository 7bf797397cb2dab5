"""Dynamic structure factor of the TFIM via differentiable resolvent
solves (north-star capability; no reference analogue).

Computes S(omega) = -(1/pi) Im <psi0| O (omega+E0+i eta - H)^{-1} O |psi0>
for the transverse probe O = sum_i sigma^x_i, on the matrix-free
Hamiltonian — one real SPD solve per frequency.

Run: python examples/spectral.py --n 12 --points 25
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

import sys
# Examples are runnable from a source checkout without installation:
# put the repo root ahead of the script dir on sys.path.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dominantsparseeigenad_tpu import dominant_eigh, spectral_function
from dominantsparseeigenad_tpu.models import tfim_operator
from dominantsparseeigenad_tpu.models.tfim import flip_sum
from dominantsparseeigenad_tpu.utils import JsonlLogger


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=12)
    ap.add_argument("--g", type=float, default=1.2)
    ap.add_argument("--eta", type=float, default=0.2)
    ap.add_argument("--points", type=int, default=25)
    ap.add_argument("--wmax", type=float, default=12.0)
    ap.add_argument("--log", type=str, default=None)
    args = ap.parse_args()

    op = tfim_operator(args.n, args.g)
    e0, psi0 = dominant_eigh(op, k=min(150, 1 << args.n), extreme="min",
                             tol=1e-10)
    probe = flip_sum(psi0, args.n)          # sum_i sx_i |psi0>
    # Frequencies measured from the ground state: omega_abs = E0 + omega.
    omegas = float(e0) + jnp.linspace(0.0, args.wmax, args.points)
    s = spectral_function(op, probe, omegas, args.eta, tol=1e-10)

    log = JsonlLogger(args.log)
    print(f"# TFIM N={args.n} g={args.g}: S(omega) for O = sum sx_i  "
          f"(eta={args.eta})")
    print(f"# {'omega-E0':>9} {'S(omega)':>12}")
    for w, sv in zip(omegas, s):
        rel = float(w) - float(e0)
        print(f"  {rel:9.4f} {float(sv):12.6f}")
        log.log("spectral", omega=rel, s=float(sv))


if __name__ == "__main__":
    main()
