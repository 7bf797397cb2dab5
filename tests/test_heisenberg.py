"""Spin-1/2 XXZ / Heisenberg chain (second model family; no reference
analogue): matrix-free matvec vs dense ED, eigensolver + derivatives."""

import jax
import jax.numpy as jnp
import numpy as np

from dominantsparseeigenad_tpu.models import (
    heisenberg_dense, heisenberg_ground_energy, heisenberg_operator)
from dominantsparseeigenad_tpu.models.heisenberg import _zz_diagonal


def test_matvec_matches_dense():
    for n, jz in [(5, 1.0), (8, 0.5), (10, -0.3)]:
        op = heisenberg_operator(n, 1.0, jz)
        h = heisenberg_dense(n, 1.0, jz)
        x = jnp.asarray(np.random.default_rng(n).standard_normal(1 << n))
        np.testing.assert_allclose(op.matvec(x), h @ x, atol=1e-12)


def test_ground_energy_and_derivatives():
    n = 8
    e0 = lambda jz: heisenberg_ground_energy(n, 1.0, jz, k=1 << n)
    val, grad = jax.jit(jax.value_and_grad(e0))(jnp.float64(1.0))
    evals, evecs = np.linalg.eigh(np.asarray(heisenberg_dense(n)))
    np.testing.assert_allclose(val, evals[0], rtol=1e-11)
    v0 = evecs[:, 0]
    hf = np.sum(_zz_diagonal(n, np.float64) * v0 ** 2)
    np.testing.assert_allclose(grad, hf, rtol=1e-9)

    # second derivative vs sum-over-states
    d2 = jax.jit(jax.grad(jax.grad(e0)))(jnp.float64(1.0))
    dz = _zz_diagonal(n, np.float64)
    me = evecs[:, 1:].T @ (dz * v0)
    d2_exact = 2 * np.sum(me ** 2 / (evals[0] - evals[1:]))
    np.testing.assert_allclose(d2, d2_exact, rtol=1e-7)


def test_isotropic_limit_value():
    # E0/n approaches 1/4 - ln 2 (Bethe) from finite size.
    e = float(heisenberg_ground_energy(12, 1.0, 1.0, k=180)) / 12
    assert abs(e - (0.25 - np.log(2))) < 0.02
