"""Differentiable spectral functions via real-arithmetic resolvent solves
(north-star extension): Lorentzian-weighted spectral density vs dense ED,
with gradients through the resolvent."""

import jax
import jax.numpy as jnp
import numpy as np

from dominantsparseeigenad_tpu import DenseOperator, spectral_function
from dominantsparseeigenad_tpu.models import tfim_operator
from dominantsparseeigenad_tpu.models.tfim import (flip_sum,
                                                   tfim_dense_hamiltonian)


def test_spectral_function_vs_ed():
    rng = np.random.default_rng(0)
    n = 48
    a = rng.standard_normal((n, n))
    a = jnp.asarray((a + a.T) / 2)
    b = jnp.asarray(rng.standard_normal(n))
    evals, evecs = np.linalg.eigh(np.asarray(a))
    w = np.asarray(evecs.T @ np.asarray(b)) ** 2
    omegas = jnp.linspace(-8, 8, 15)
    eta = 0.4
    A = spectral_function(DenseOperator(a), b, omegas, eta, tol=1e-12)
    A_exact = np.array([
        np.sum(w * eta / np.pi / ((float(o) - evals) ** 2 + eta ** 2))
        for o in np.asarray(omegas)])
    np.testing.assert_allclose(A, A_exact, rtol=1e-10)


def test_spectral_gradient():
    rng = np.random.default_rng(1)
    n = 32
    a = rng.standard_normal((n, n))
    a = jnp.asarray((a + a.T) / 2)
    h1 = rng.standard_normal((n, n))
    h1 = jnp.asarray((h1 + h1.T) / 2)
    b = jnp.asarray(rng.standard_normal(n))
    omegas = jnp.linspace(-3, 3, 4)

    def f(g):
        return jnp.sum(spectral_function(DenseOperator(a + g * h1), b,
                                         omegas, 0.5, tol=1e-12))

    val, grad = jax.value_and_grad(f)(jnp.float64(0.2))
    eps = 1e-6
    num = (f(jnp.float64(0.2 + eps)) - f(jnp.float64(0.2 - eps))) / (2 * eps)
    np.testing.assert_allclose(grad, num, rtol=1e-6)


def test_tfim_dynamic_structure_factor():
    """S(omega) for the transverse-field probe sum_i sx_i |psi0> on the
    matrix-free TFIM — cross-checked against the dense spectral sum."""
    from dominantsparseeigenad_tpu import dominant_eigh
    n, g, eta = 8, 1.3, 0.3
    op = tfim_operator(n, g)
    _, psi0 = dominant_eigh(op, k=1 << n, extreme="min", tol=1e-12)
    probe = flip_sum(psi0, n)      # ~ sum_i sx_i |psi0>
    omegas = jnp.linspace(-16.0, -4.0, 9)
    s = spectral_function(op, probe, omegas, eta, tol=1e-12)

    evals, evecs = np.linalg.eigh(np.asarray(tfim_dense_hamiltonian(n, g)))
    w = np.asarray(evecs.T @ np.asarray(probe)) ** 2
    s_exact = np.array([
        np.sum(w * eta / np.pi / ((float(o) - evals) ** 2 + eta ** 2))
        for o in np.asarray(omegas)])
    np.testing.assert_allclose(s, s_exact, rtol=1e-8)


def test_spectral_function_accepts_wider_omega_grid():
    """Regression (round-4 review): a float64 numpy frequency grid
    against an f32 operator (the natural call under x64) promoted the
    matvec inside the resolvent solve and broke custom_linear_solve's
    dtype contract; the grid must be pinned to the operator dtype."""
    n = 24
    rng = np.random.default_rng(3)
    h = rng.standard_normal((n, n)).astype(np.float32)
    h = jnp.asarray((h + h.T) / 2)              # f32 operator
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    omegas = np.linspace(-3.0, 3.0, 7)          # float64 grid
    out = spectral_function(h, b, omegas, eta=0.3, tol=1e-5)
    assert out.shape == (7,)
    assert np.isfinite(np.asarray(out)).all()
