"""Vibrational normal modes of a mass-spring chain: the generalized
pencil ``K x = omega^2 M x`` solved with the differentiable
B-metric LOBPCG solver, with mode-frequency sensitivities d(omega^2)/dm.

North-star capability (the reference solves standard problems only).
The natural preconditioner for the LOW modes is the static stiffness
solve ``K^{-1}`` — Jacobi is useless on a Laplacian-like K.

Run: python examples/vibrational_modes.py --n 150
"""

import argparse
import os

import jax
import jax.numpy as jnp

# f64 drive: default to the CPU backend (TPU f64 is emulated).
_plat = os.environ.get("JAX_PLATFORMS", "")
jax.config.update("jax_platforms", "cpu" if _plat in ("", "axon") else _plat)
jax.config.update("jax_enable_x64", True)

import numpy as np

import sys
# Examples are runnable from a source checkout without installation:
# put the repo root ahead of the script dir on sys.path.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dominantsparseeigenad_tpu import DenseOperator, dominant_eigh_gen

_PREC = {}


def stiffness_precond(v):
    """Static response K^{-1} r, vector convention (the solver vmaps it
    over residual blocks) — module-level (jit-static, stable id)."""
    return _PREC["kinv"] @ v


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=150)
    ap.add_argument("--r", type=int, default=3)
    ap.add_argument("--maxiter", type=int, default=100)
    args = ap.parse_args()

    n, r = args.n, args.r
    rng = np.random.default_rng(0)
    # Fixed-end chain: spring constants k_i, masses m_i.
    ks = 1.0 + rng.random(n + 1)
    K = (np.diag(ks[:-1] + ks[1:]) - np.diag(ks[1:-1], 1)
         - np.diag(ks[1:-1], -1))
    masses = 0.5 + rng.random(n)
    _PREC["kinv"] = jnp.asarray(np.linalg.inv(K))

    def modes(mvec):
        lams, v, info = dominant_eigh_gen(
            DenseOperator(jnp.asarray(K)), DenseOperator(jnp.diag(mvec)),
            r=r, maxiter=args.maxiter, tol=1e-12,
            precond=stiffness_precond, with_info=True)
        return lams, info

    mj = jnp.asarray(masses)
    lams, info = modes(mj)
    print(f"chain n={n}: lowest {r} omega^2 =", np.asarray(lams),
          f"({int(info.effective_k)} LOBPCG iters, "
          f"converged={bool(info.converged)})")
    print("  frequencies omega =", np.sqrt(np.asarray(lams)))

    # Sensitivity of the fundamental to every mass (one reverse pass).
    grad = jax.grad(lambda m: modes(m)[0][0])(mj)
    j_star = int(np.argmin(np.asarray(grad)))
    print(f"  d(omega0^2)/dm peaks at site {j_star} "
          f"(value {float(grad[j_star]):.3e}) — the fundamental's "
          f"antinode")

    if n <= 200:  # oracle
        import scipy.linalg
        ew = scipy.linalg.eigh(K, np.diag(masses), eigvals_only=True)
        np.testing.assert_allclose(np.asarray(lams), ew[:r], rtol=1e-9)
        eps = 1e-4
        mp = masses.copy(); mp[j_star] += eps
        mm = masses.copy(); mm[j_star] -= eps
        fd = (scipy.linalg.eigh(K, np.diag(mp), eigvals_only=True)[0]
              - scipy.linalg.eigh(K, np.diag(mm),
                                  eigvals_only=True)[0]) / (2 * eps)
        np.testing.assert_allclose(float(grad[j_star]), fd, rtol=1e-5)
        print(f"  checked vs scipy.linalg.eigh (values rtol 1e-9, "
              f"sensitivity vs FD {fd:.3e})")


if __name__ == "__main__":
    main()
