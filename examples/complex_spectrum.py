"""Complex transfer-spectrum driver — incommensurate (oscillating)
correlations from a REAL non-symmetric operator, via
``dominant_eig_spectrum``.

No reference analogue: the reference's ``DominantEig`` assumes a real
simple dominant eigenvalue (Perron setting) and cannot represent the
complex-conjugate pairs that real transfer operators develop when
detailed balance is broken.  Physically, a complex pair λ = |λ|e^{±iθ}
below the dominant eigenvalue means correlations decay as
``(|λ|/λ₁)^x cos(θ x)`` — a decay length AND a modulation wavelength
2π/θ.  This driver builds a minimal non-reversible transfer operator
whose bias rotates the sub-dominant pair, extracts the top-m mixed
real/complex spectrum, reports ξ = 1/ln(λ₁/|λ₂|) and the modulation
wavelength, and differentiates the modulation phase θ(bias) w.r.t. the
bias through the fixed-structure cascade (exact answer: dθ/db = 1).

Run: python examples/complex_spectrum.py --n 64 --m 5
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# f64 drive on CPU (the baked-in JAX_PLATFORMS=axon is not a user
# override; TPU f64 is emulated).
_plat = os.environ.get("JAX_PLATFORMS", "")
jax.config.update("jax_platforms", "cpu" if _plat in ("", "axon") else _plat)
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np


def biased_transfer(n: int, bias, seed=0):
    """Minimal model of a non-reversible transfer operator with
    well-separated moduli (power-type solvers need modulus gaps; a
    plain biased ring has a ~cos(k) spectrum whose moduli cluster):
    a real Perron root above a sub-dominant block that the BIAS rotates
    into a complex-conjugate pair — at bias=0 the block is symmetric
    (two real eigenvalues), any bias > 0 breaks detailed balance and
    λ₂ picks up a phase θ = bias (modulation wavelength 2π/θ)."""
    rng = np.random.default_rng(seed)
    blk = np.zeros((n, n))
    blk[0, 0] = 2.0                                   # Perron root
    c, s = jnp.cos(bias), jnp.sin(bias)
    sub = 1.5 * jnp.array([[c, -s], [s, c]])          # pair λ₂ = 1.5e^±ib
    blk[3, 3] = 1.05                                  # next real level
    blk[4:, 4:] = np.diag(0.6 * rng.random(n - 4))
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    a = jnp.asarray(blk)
    a = a.at[1:3, 1:3].set(sub)
    return jnp.asarray(q) @ a @ jnp.asarray(q.T)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--m", type=int, default=5)
    ap.add_argument("--bias", type=float, default=0.25)
    args = ap.parse_args()

    from dominantsparseeigenad_tpu import dominant_eig_spectrum

    a = biased_transfer(args.n, args.bias)
    lams, ls, rs, structure = dominant_eig_spectrum(
        a, m=args.m, num_iters=1500, power_tol=1e-12)
    print(f"stage structure: {structure}")
    w = np.linalg.eigvals(np.asarray(a))
    # lams can carry m+1 entries when the m-th slot lands on the first
    # member of a conjugate pair (the solver never splits a pair);
    # compare over the actual returned length.
    m_got = len(lams)
    w = w[np.argsort(-np.abs(w))][:m_got]
    for j in range(m_got):
        lam = complex(lams[j])
        ref = w[j]
        print(f"lam_{j} = {lam.real:+.6f}{lam.imag:+.6f}i  |lam| = "
              f"{abs(lam):.6f}  (numpy {ref.real:+.6f}{ref.imag:+.6f}i)")
    lam1 = complex(lams[0])
    lam2 = complex(lams[1])
    xi = 1.0 / np.log(abs(lam1) / abs(lam2))
    print(f"correlation length xi = {xi:.4f}")
    if abs(lam2.imag) > 1e-10:
        print(f"modulation wavelength 2*pi/arg(lam2) = "
              f"{2 * np.pi / abs(np.angle(lam2)):.4f} sites")

    # Differentiate the modulation PHASE through the FIXED structure
    # (the construction makes theta(bias) = bias exactly, so the IFT
    # gradient has a closed-form answer: 1).
    def phase(b):
        lams_b, _, _, _ = dominant_eig_spectrum(
            biased_transfer(args.n, b), m=args.m, num_iters=1500,
            power_tol=1e-12, structure=structure)
        lam2 = lams_b[1]
        return jnp.arctan2(jnp.abs(jnp.imag(lam2)), jnp.real(lam2))

    b0 = jnp.float64(args.bias)
    g = float(jax.grad(phase)(b0))
    print(f"d(theta)/d(bias) = {g:+.8f}  (exact +1)")
    if abs(g - 1.0) > 1e-6:
        raise SystemExit("GRADIENT PARITY FAILURE vs exact d(theta)/db")
    # Spectrum parity gate for the smoke test.
    if not np.allclose(np.sort_complex(np.asarray(lams)),
                       np.sort_complex(w), rtol=1e-6):
        raise SystemExit("SPECTRUM PARITY FAILURE vs numpy")


if __name__ == "__main__":
    main()
