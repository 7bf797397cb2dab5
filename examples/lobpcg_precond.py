"""Preconditioned block eigensolve of the TFIM with LOBPCG.

North-star capability (the reference's `Lanczos.py` has neither blocks
nor preconditioning): in the weak-field regime the TFIM Hamiltonian is
diagonally dominant in the z-basis, so a Jacobi preconditioner
``z = r / (H_zz - sigma)`` approximates ``(H - sigma)^{-1}`` well and
cuts LOBPCG's iteration count several-fold.  The same ``precond`` hook
also accelerates the deflated-CG tangent solves of the differentiable
wrapper, so derivatives of the spectrum (here: dE0/dg) reuse it.

Run: python examples/lobpcg_precond.py --n 12 --g 0.2
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

from dominantsparseeigenad_tpu import (dominant_eigh_multi, jacobi_precond,
                                       lobpcg_eigh)
from dominantsparseeigenad_tpu.models import tfim_operator
from dominantsparseeigenad_tpu.models.tfim import (tfim_dense_hamiltonian,
                                                   tfim_zz_diagonal)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=12)
    ap.add_argument("--g", type=float, default=0.2)
    ap.add_argument("--r", type=int, default=2)
    ap.add_argument("--maxiter", type=int, default=400)
    ap.add_argument("--tol", type=float, default=1e-9)
    args = ap.parse_args()

    n, g, r = args.n, args.g, args.r
    op = tfim_operator(n, jnp.float64(g))

    # Library constructor (ops/precond.py): the TFIM operator is
    # matrix-free, so its analytic diagonal (the zz term) is passed
    # explicitly; the shift sits below the spectrum (min(H_zz) minus
    # the field-strength bound).  ONE stable callable serves the block
    # solver, the tangent solves, and the multi wrapper below.
    diag = tfim_zz_diagonal(n)
    precond = jacobi_precond(diag=diag,
                             shift=float(jnp.min(diag)) - abs(g) * n)

    lams_p, _, info_p = lobpcg_eigh(op, r, tol=args.tol,
                                    maxiter=args.maxiter,
                                    precond=precond,
                                    with_info=True)
    lams_0, _, info_0 = lobpcg_eigh(op, r, tol=args.tol,
                                    maxiter=args.maxiter, with_info=True)
    print(f"TFIM n={n} g={g}: lowest {r} eigenvalues")
    print("  preconditioned:", np.asarray(lams_p),
          f"({int(info_p.iterations)} iters, converged="
          f"{bool(info_p.converged)})")
    print("  plain:         ", np.asarray(lams_0),
          f"({int(info_0.iterations)} iters, converged="
          f"{bool(info_0.converged)})")

    # Differentiable ground energy through the preconditioned solver
    # (in the ordered phase the E1-E0 doublet splitting is exponentially
    # small — a great preconditioning demo, a hopeless FD target — so
    # the derivative check is on E0).
    def e0(gv):
        opg = tfim_operator(n, gv)
        ls, _ = dominant_eigh_multi(opg, r=2, k=args.maxiter,
                                    method="lobpcg", tol=args.tol,
                                    precond=precond)
        return ls[0]

    gv = jnp.float64(g)
    e0_val, de0 = jax.value_and_grad(e0)(gv)
    print(f"  E0 = {float(e0_val):.12f}, dE0/dg = {float(de0):.10f}, "
          f"doublet splitting = {float(lams_p[1] - lams_p[0]):.3e}")

    if n <= 12:  # dense oracle
        ew = np.linalg.eigh(np.asarray(tfim_dense_hamiltonian(n, g)))[0]
        np.testing.assert_allclose(np.asarray(lams_p), ew[:r], rtol=1e-8)
        eps = 1e-5
        ewp = np.linalg.eigh(
            np.asarray(tfim_dense_hamiltonian(n, g + eps)))[0][0]
        ewm = np.linalg.eigh(
            np.asarray(tfim_dense_hamiltonian(n, g - eps)))[0][0]
        fd = (ewp - ewm) / (2 * eps)
        np.testing.assert_allclose(float(de0), fd, rtol=1e-6)
        print(f"  checked vs dense ED (eigenvalues rtol 1e-8, "
              f"dE0/dg vs FD {fd:.10f})")


if __name__ == "__main__":
    main()
