"""Thick-restart Lanczos: bounded-memory convergence, checkpoint/resume."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from dominantsparseeigenad_tpu import lanczos_restarted
from dominantsparseeigenad_tpu.models import tfim_operator, tfim_exact_e0


def test_restarted_beats_single_shot():
    """With the same window size, restarting converges where a single
    k-step run cannot."""
    from dominantsparseeigenad_tpu import lanczos_eigh
    n = 12
    op = tfim_operator(n, 1.0)
    exact = float(tfim_exact_e0(n, 1.0))
    lam_single, _ = lanczos_eigh(op, 20, extreme="min")
    lam_rest, v, res = lanczos_restarted(op, k=20, n_restarts=10,
                                         extreme="min")
    err_single = abs(float(lam_single) - exact)
    err_rest = abs(float(lam_rest) - exact)
    assert err_rest < 1e-10
    assert err_rest < err_single / 100
    assert float(jnp.linalg.norm(op.matvec(v) - lam_rest * v)) < 1e-9


def test_restarted_dense_max():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((256, 256))
    a = jnp.asarray((a + a.T) / 2)
    lam, v, _ = lanczos_restarted(a, k=28, n_restarts=8, extreme="max")
    evals = np.linalg.eigvalsh(np.asarray(a))
    np.testing.assert_allclose(lam, evals[-1], rtol=1e-11)


def test_restarted_jit_and_deterministic():
    op = tfim_operator(10, 0.8)
    f = jax.jit(lambda: lanczos_restarted(op, k=16, n_restarts=6)[0])
    a, b = float(f()), float(f())
    assert a == b
