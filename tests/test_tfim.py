"""TFIM application tests — BASELINE configs #2 and #3.

The reference validates its sparse path against dense ED and analytic
results (examples/TFIM); same strategy here, as actual unit tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dominantsparseeigenad_tpu.models import (
    tfim_operator, tfim_dense_hamiltonian, tfim_exact_e0,
    tfim_ground_energy, tfim_ground_state, fidelity_susceptibility,
    tfim_ed_observables,
)
from dominantsparseeigenad_tpu import dominant_eigh


@pytest.mark.parametrize("n,g", [(8, 0.5), (8, 1.0), (10, 1.3)])
def test_dense_vs_matrix_free_vs_jw(n, g):
    """Three-way consistency: dense ED == matrix-free Lanczos == JW exact."""
    h = tfim_dense_hamiltonian(n, g)
    e_ed = jnp.linalg.eigvalsh(h)[0]
    e_mf = jax.jit(lambda gg: tfim_ground_energy(n, gg, k=80))(g)
    e_jw = tfim_exact_e0(n, g)
    np.testing.assert_allclose(e_mf, e_ed, atol=1e-9)
    np.testing.assert_allclose(e_jw, e_ed, atol=1e-9)


def test_energy_derivatives_vs_jw_exact():
    """BASELINE config #2: dE0/dg (and d2E0/dg2) via implicit backward vs
    the analytic (Jordan-Wigner) result, N=10."""
    n, g = 10, 0.7
    e_fn = jax.jit(lambda g: tfim_ground_energy(n, g, k=80, tol=1e-12))
    jw_fn = lambda g: tfim_exact_e0(n, g)
    g = jnp.asarray(g, dtype=jnp.float64)

    np.testing.assert_allclose(e_fn(g), jw_fn(g), atol=1e-9)
    np.testing.assert_allclose(jax.jit(jax.grad(e_fn))(g),
                               jax.grad(jw_fn)(g), atol=1e-8)
    np.testing.assert_allclose(jax.jit(jax.grad(jax.grad(e_fn)))(g),
                               jax.grad(jax.grad(jw_fn))(g), atol=1e-6)


def test_fidelity_susceptibility_vs_ed():
    """chi_F through the eigensolver AD vs the sum-over-states ED oracle."""
    n, g = 8, 0.9
    chi_ad = jax.jit(lambda gg: fidelity_susceptibility(
        n, gg, k=80, tol=1e-12))(jnp.float64(g))
    _, _, _, chi_ed = tfim_ed_observables(n, g)
    np.testing.assert_allclose(chi_ad, chi_ed, rtol=1e-7)


def test_ed_observables_vs_ad_derivatives():
    """Cross-check the ED oracle's d2E against AD through the eigensolver."""
    n, g = 8, 1.1
    g = jnp.asarray(g, dtype=jnp.float64)
    _, de_ed, d2e_ed, _ = tfim_ed_observables(n, g)
    e_fn = jax.jit(lambda g: tfim_ground_energy(n, g, k=80, tol=1e-12))
    np.testing.assert_allclose(jax.jit(jax.grad(e_fn))(g), de_ed,
                               atol=1e-8)
    np.testing.assert_allclose(jax.jit(jax.grad(jax.grad(e_fn)))(g),
                               d2e_ed, atol=1e-6)


def test_ground_state_is_eigenvector():
    n, g = 10, 1.0
    lam, v = tfim_ground_state(n, g, k=80)
    op = tfim_operator(n, g)
    resid = op.matvec(v) - lam * v
    assert jnp.linalg.norm(resid) < 1e-8
    np.testing.assert_allclose(jnp.linalg.norm(v), 1.0, atol=1e-12)


@pytest.mark.slow
def test_n16_matrix_free_vs_jw():
    """Larger matrix-free run (dim 65536) against the JW exact energy."""
    n, g = 16, 1.0
    e = jax.jit(lambda gg: tfim_ground_energy(n, gg, k=120, tol=1e-10))(jnp.float64(g))
    np.testing.assert_allclose(e, tfim_exact_e0(n, g), atol=1e-8)


def test_energy_gap():
    """E1 - E0 via the block eigensolver vs dense ED; gradient finite and
    matching finite differences (gap closes toward g=1)."""
    from dominantsparseeigenad_tpu.models import (tfim_dense_hamiltonian,
                                                  tfim_energy_gap)
    n, g = 8, 1.4
    gap_fn = jax.jit(lambda gg: tfim_energy_gap(n, gg, k=1 << n))
    gap = gap_fn(jnp.float64(g))
    evals = np.linalg.eigvalsh(np.asarray(tfim_dense_hamiltonian(n, g)))
    np.testing.assert_allclose(gap, evals[1] - evals[0], rtol=1e-9)

    dgap = jax.jit(jax.grad(gap_fn))(jnp.float64(g))
    eps = 1e-6
    num = (gap_fn(jnp.float64(g + eps))
           - gap_fn(jnp.float64(g - eps))) / (2 * eps)
    np.testing.assert_allclose(dgap, num, rtol=1e-5)


def test_tfim2d_matches_ed():
    """2D quantum TFIM (periodic square lattice; beyond the 1D-only
    reference): matvec vs dense ED, E0 + Hellmann-Feynman gradient."""
    from dominantsparseeigenad_tpu.models import (tfim2d_dense_hamiltonian,
                                                  tfim2d_operator)
    from dominantsparseeigenad_tpu.models.tfim import flip_sum
    lx, ly, g = 3, 3, 3.0
    n = lx * ly
    op = tfim2d_operator(lx, ly, g)
    h = tfim2d_dense_hamiltonian(lx, ly, g)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(1 << n))
    np.testing.assert_allclose(op.matvec(x), h @ x, atol=1e-12)

    e0 = lambda gg: dominant_eigh(tfim2d_operator(lx, ly, gg), k=1 << n,
                                  extreme="min", tol=1e-12)[0]
    val, grad = jax.jit(jax.value_and_grad(e0))(jnp.float64(g))
    evals, evecs = np.linalg.eigh(np.asarray(h))
    np.testing.assert_allclose(val, evals[0], rtol=1e-12)
    v0 = jnp.asarray(evecs[:, 0])
    hf = -float(jnp.vdot(v0, flip_sum(v0, n)))
    np.testing.assert_allclose(grad, hf, rtol=1e-10)


def test_small_lattice_pbc_guards():
    """Regression (round-4 review): PBC double-counts bonds below 3
    sites per ring dimension (n=2 visits its single bond from both ends;
    n=1 self-bonds) and the shared dense oracle inherited the same
    factor, so only an explicit guard can catch it — mirroring the
    heisenberg_operator guard."""
    from dominantsparseeigenad_tpu.models import (tfim_operator,
                                                  tfim2d_operator)
    for bad_n in (1, 2):
        with pytest.raises(ValueError, match="PBC double-counts"):
            tfim_operator(bad_n, 1.0)
    with pytest.raises(ValueError, match="double-counts"):
        tfim2d_operator(2, 3, 1.0)
    with pytest.raises(ValueError, match="double-counts"):
        tfim2d_operator(3, 1, 1.0)


def test_observables_sweep_matches_pointwise():
    """The batched g-sweep (one vmapped program) must reproduce the
    pointwise E0 / dE0/dg / chi_F results bit-for-tolerance — the sweep
    exists to amortize device dispatch, not to change the math."""
    from dominantsparseeigenad_tpu.models import tfim_observables_sweep

    n, k = 8, 60
    gs = jnp.asarray([0.6, 1.0, 1.35], dtype=jnp.float64)
    out = jax.jit(lambda z: tfim_observables_sweep(
        n, z, k=k, tol=1e-12, reorth_chunks=2))(gs)
    assert out.shape == (3, 3)

    e_fn = lambda gg: tfim_ground_energy(n, gg, k=k, tol=1e-12)
    for i, g in enumerate(gs):
        e, de = jax.value_and_grad(e_fn)(g)
        chi = fidelity_susceptibility(n, g, k=k, tol=1e-12)
        np.testing.assert_allclose(out[i, 0], e, rtol=1e-10)
        np.testing.assert_allclose(out[i, 1], de, rtol=1e-8)
        np.testing.assert_allclose(out[i, 2], chi, rtol=1e-6)


def test_observables_sweep_forwards_restart_engines():
    """Forwarding restart_cycles/early_exit_tol through the sweep must
    not trip dominant_eigh's restart_mode guard on the "carry" default
    the sweep injects for its own vmap friendliness (round-5 review):
    the user never passed restart_mode, so no error may blame it."""
    from dominantsparseeigenad_tpu.models import tfim_observables_sweep

    n = 6
    gs = jnp.asarray([0.8, 1.3], dtype=jnp.float64)
    out = jax.jit(lambda z: tfim_observables_sweep(
        n, z, k=12, tol=1e-12, restart_cycles=2))(gs)
    assert out.shape == (2, 3)
    for i, g in enumerate(gs):
        e = tfim_ground_energy(n, g, k=24, tol=1e-12)
        np.testing.assert_allclose(out[i, 0], e, rtol=1e-8)
