"""Interior spectrum workflow: KPM density-of-states scan, then a
differentiable polynomial slice of the TFIM excitation band.

North-star capability (the reference computes one extremal pair): the
cheap stochastic DOS locates the spectral gaps, `spectral_slice` then
extracts every eigenpair in the chosen window with exact eigenvalues
and arbitrary-order derivatives (interior-block deflated-MINRES IFT).

Run: python examples/spectrum_slice.py --n 10 --g 0.3
"""

import argparse
import os

import jax
import jax.numpy as jnp

# f64 drive: default to the CPU backend (TPU f64 is emulated, slow and
# NaN-prone).  The baked-in JAX_PLATFORMS=axon is not a user override.
_plat = os.environ.get("JAX_PLATFORMS", "")
jax.config.update("jax_platforms", "cpu" if _plat in ("", "axon") else _plat)
jax.config.update("jax_enable_x64", True)

import numpy as np

import sys
# Examples are runnable from a source checkout without installation:
# put the repo root ahead of the script dir on sys.path.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dominantsparseeigenad_tpu import (dominant_eigh, spectral_bounds,
                                       spectral_density, spectral_slice)
from dominantsparseeigenad_tpu.models import tfim_operator
from dominantsparseeigenad_tpu.models.tfim import tfim_dense_hamiltonian


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10)
    ap.add_argument("--g", type=float, default=0.3)
    ap.add_argument("--r", type=int, default=14)
    ap.add_argument("--degree", type=int, default=200)
    ap.add_argument("--dos-points", type=int, default=40)
    ap.add_argument("--maxiter", type=int, default=300)
    args = ap.parse_args()

    n, g = args.n, args.g
    op = tfim_operator(n, jnp.float64(g))

    # 1. Cheap DOS scan: where do the states live?
    lo, hi = (float(x) for x in spectral_bounds(op))
    es = jnp.linspace(lo * 0.98, hi * 0.98, args.dos_points)
    rho = np.asarray(spectral_density(op, es, degree=100, n_probe=16,
                                      bounds=(lo, hi)))
    peak = es[int(np.argmax(rho))]
    print(f"TFIM n={n} g={g}: spectrum in [{lo:.2f}, {hi:.2f}], "
          f"DOS peak near E={float(peak):.2f}")

    # 2. Slice the single-flip excitation band (first cluster above the
    # ground doublet).  Anchor the window to the library's own E0; the
    # offsets put both edges inside the weak-field spectral gaps (the
    # 2.9-wide gap above the doublet, and the gap after the lower band
    # half at ~E0+3.37 for g=0.3).
    e0, _ = dominant_eigh(op, k=80, extreme="min", tol=1e-10)
    e0 = float(e0)
    lo_e, hi_e = e0 + 1.5, e0 + 3.37
    lams, v, info = spectral_slice(op, lo_e, hi_e, r=args.r,
                                   degree=args.degree,
                                   maxiter=args.maxiter, tol=1e-9)
    inside = (np.asarray(lams) >= lo_e) & (np.asarray(lams) <= hi_e)
    print(f"slice [{lo_e:.2f}, {hi_e:.2f}]: {int(info.n_inside)} states, "
          f"max residual {float(info.residual):.2e}, "
          f"converged={bool(info.converged)}")
    print("  band energies:", np.asarray(lams)[inside].round(6))

    # 3. Differentiate the band centroid w.r.t. the transverse field.
    def centroid(gv):
        ls, _, inf = spectral_slice(tfim_operator(n, gv), lo_e, hi_e,
                                    r=args.r, degree=args.degree,
                                    maxiter=args.maxiter, tol=1e-9)
        msk = (ls >= lo_e) & (ls <= hi_e)
        return jnp.sum(jnp.where(msk, ls, 0.0)) / jnp.maximum(
            jnp.sum(msk), 1)

    c, dc = jax.value_and_grad(centroid)(jnp.float64(g))
    print(f"  band centroid {float(c):.8f}, d(centroid)/dg = "
          f"{float(dc):.8f}")

    if n <= 10:  # dense oracle
        ew = np.linalg.eigh(np.asarray(tfim_dense_hamiltonian(n, g)))[0]
        truth = ew[(ew >= lo_e) & (ew <= hi_e)]
        assert int(info.n_inside) == len(truth), (int(info.n_inside),
                                                  len(truth))
        np.testing.assert_allclose(np.sort(np.asarray(lams)[inside]),
                                   truth, rtol=1e-8)
        eps = 1e-5

        def oracle(gv):
            e = np.linalg.eigh(
                np.asarray(tfim_dense_hamiltonian(n, gv)))[0]
            sel = e[(e >= lo_e) & (e <= hi_e)]
            return sel.mean()

        fd = (oracle(g + eps) - oracle(g - eps)) / (2 * eps)
        np.testing.assert_allclose(float(dc), fd, rtol=1e-5)
        print(f"  checked vs dense ED (band rtol 1e-8, FD {fd:.8f})")


if __name__ == "__main__":
    main()
