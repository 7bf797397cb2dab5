"""Multi-device tests on the 8-virtual-device CPU mesh (conftest.py forces
``--xla_force_host_platform_device_count=8``) — sharded operators must agree
with their single-device counterparts in values AND gradients.

The reference has no distributed code to compare against (SURVEY.md §2.5);
the oracle is this framework's own single-device path, which is itself
validated against dense eigh / analytic TFIM results elsewhere.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dominantsparseeigenad_tpu import DenseOperator, dominant_eigh
from dominantsparseeigenad_tpu.parallel import (
    RowShardedOperator, make_mesh, shard_vector)
from dominantsparseeigenad_tpu.models import (
    tfim_operator, tfim_sharded_operator, tfim_exact_e0)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()  # (1, 8): all devices on the "shards" axis


def _random_sym(n, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n))
    return jnp.asarray((a + a.T) / 2)


@pytest.mark.parametrize("mode", ["all_gather", "ring"])
def test_row_sharded_matvec_matches_dense(mesh, mode):
    n = 64
    a = _random_sym(n)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(n))
    op = RowShardedOperator(a, mesh, mode=mode)
    xs = shard_vector(x, mesh)
    np.testing.assert_allclose(op.matvec(xs), a @ x, rtol=1e-12)
    np.testing.assert_allclose(op.rmatvec(xs), a.T @ x, rtol=1e-12)


@pytest.mark.parametrize("mode", ["all_gather", "ring"])
def test_row_sharded_eigh_and_grad(mesh, mode):
    """Sharded dominant eigenpair + gradient == dense-path result."""
    n = 64
    a = _random_sym(n)

    def loss_dense(a):
        lam, v = dominant_eigh(DenseOperator(a), k=n, extreme="min")
        return lam + jnp.sum(v ** 4)

    def loss_sharded(a):
        op = RowShardedOperator(a, mesh, mode=mode)
        lam, v = dominant_eigh(op, k=n, extreme="min")
        return lam + jnp.sum(v ** 4)

    v0, g0 = jax.jit(jax.value_and_grad(loss_dense))(a)
    v1, g1 = jax.jit(jax.value_and_grad(loss_sharded))(a)
    np.testing.assert_allclose(v1, v0, rtol=1e-9)
    np.testing.assert_allclose(g1, g0, rtol=1e-6, atol=1e-9)


def test_sharded_tfim_matvec_matches_local(mesh):
    n, g = 6, 0.7
    op_local = tfim_operator(n, g)
    op_shard = tfim_sharded_operator(n, g, mesh)
    x = jnp.asarray(np.random.default_rng(2).standard_normal(1 << n))
    y_local = op_local.matvec(x)
    y_shard = op_shard.matvec(shard_vector(x, mesh))
    np.testing.assert_allclose(y_shard, y_local, rtol=1e-12)


def test_sharded_tfim_energy_and_derivatives(mesh):
    """E0 and dE0/dg through the sharded eigensolver vs Jordan-Wigner."""
    n, g = 8, 0.9

    def e0(g):
        op = tfim_sharded_operator(n, g, mesh)
        lam, _ = dominant_eigh(op, k=60, extreme="min")
        return lam

    val, grad = jax.jit(jax.value_and_grad(e0))(jnp.float64(g))
    exact_val, exact_grad = jax.value_and_grad(
        lambda gg: tfim_exact_e0(n, gg))(jnp.float64(g))
    np.testing.assert_allclose(val, exact_val, rtol=1e-9)
    np.testing.assert_allclose(grad, exact_grad, rtol=1e-7)


def test_sharded_tfim_second_derivative(mesh):
    """d2E0/dg2 — double differentiation through shard_map + ppermute."""
    n, g = 6, 1.2

    def e0(g):
        op = tfim_sharded_operator(n, g, mesh)
        lam, _ = dominant_eigh(op, k=1 << n, extreme="min")
        return lam

    d2 = jax.jit(jax.grad(jax.grad(e0)))(jnp.float64(g))
    d2_exact = jax.grad(jax.grad(
        lambda gg: tfim_exact_e0(n, gg)))(jnp.float64(g))
    np.testing.assert_allclose(d2, d2_exact, rtol=1e-6)


def test_sharded_multi_eigensolver(mesh):
    """Top-r block eigensolver on a sharded operator: the multi-pair IFT
    rule (vmapped deflated solves) composes with shard_map."""
    from dominantsparseeigenad_tpu import dominant_eigh_multi
    n, g = 6, 0.9
    op_s = tfim_sharded_operator(n, g, mesh)
    op_l = tfim_operator(n, g)
    lams_s, vs = dominant_eigh_multi(op_s, r=3, k=1 << n)
    lams_l, _ = dominant_eigh_multi(op_l, r=3, k=1 << n)
    np.testing.assert_allclose(lams_s, lams_l, rtol=1e-10)

    def gap(gg):
        lams, _ = dominant_eigh_multi(tfim_sharded_operator(n, gg, mesh),
                                      r=2, k=1 << n)
        return lams[1] - lams[0]

    g_sharded = jax.jit(jax.grad(gap))(jnp.float64(g))
    def gap_local(gg):
        lams, _ = dominant_eigh_multi(tfim_operator(n, gg), r=2, k=1 << n)
        return lams[1] - lams[0]
    g_local = jax.jit(jax.grad(gap_local))(jnp.float64(g))
    np.testing.assert_allclose(g_sharded, g_local, rtol=1e-8)


def test_sharded_lobpcg_matches_dense(mesh):
    """LOBPCG forward on a row-sharded operator (blocked matvec -> vmap of
    shard_map) must reproduce the dense-path block eigenpairs and their
    gradients through the shared IFT rule."""
    from dominantsparseeigenad_tpu import dominant_eigh_multi

    n, r = 64, 2
    a = _random_sym(n, seed=7)

    def lams_of(op_builder):
        def f(mat):
            l, _ = dominant_eigh_multi(op_builder(mat), r=r, k=400,
                                       method="lobpcg", tol=1e-11)
            return l
        return f

    dense = lams_of(DenseOperator)
    sharded = lams_of(lambda mat: RowShardedOperator(mat, mesh))
    np.testing.assert_allclose(sharded(a), dense(a), rtol=1e-9)

    gd = jax.jit(jax.grad(
        lambda m: jnp.sum(dense(m) * jnp.arange(1.0, r + 1))))(a)
    gs = jax.jit(jax.grad(
        lambda m: jnp.sum(sharded(m) * jnp.arange(1.0, r + 1))))(a)
    np.testing.assert_allclose(gs, gd, rtol=1e-7, atol=1e-10)


def test_sharded_spectral_slice_matches_dense(mesh):
    """Interior slicing on a row-sharded operator: the Chebyshev filter
    recurrence and LOBPCG matmat run through vmap-of-shard_map; values
    and interior-block MINRES gradients must match the dense path."""
    from dominantsparseeigenad_tpu import spectral_slice

    n, r = 64, 3
    a = _random_sym(n, seed=11)
    ew = np.linalg.eigh(np.asarray(a))[0]
    lo_e = float((ew[30] + ew[29]) / 2)
    hi_e = float((ew[32] + ew[31]) / 2)  # 2 eigenvalues inside, 1 buffer

    def band(op_builder):
        def f(mat):
            lams, _, _ = spectral_slice(op_builder(mat), lo_e, hi_e, r=r,
                                        degree=80, maxiter=200, tol=1e-10)
            inside = (lams >= lo_e) & (lams <= hi_e)
            return jnp.sum(jnp.where(inside, lams, 0.0))
        return jax.jit(f)

    dense = band(DenseOperator)
    sharded = band(lambda m: RowShardedOperator(m, mesh))
    np.testing.assert_allclose(sharded(a), dense(a), rtol=1e-9)
    gd = jax.jit(jax.grad(dense))(a)
    gs = jax.jit(jax.grad(sharded))(a)
    np.testing.assert_allclose(gs, gd, rtol=1e-6, atol=1e-9)


def test_sharded_generalized_pencil_matches_dense(mesh):
    """Generalized pencil with a row-sharded A (B dense): B-metric LOBPCG
    matmat through vmap-of-shard_map; values and the two-operator IFT
    gradients must match the dense path."""
    from dominantsparseeigenad_tpu import dominant_eigh_gen

    n, r = 64, 2
    a = _random_sym(n, seed=13) + 2.0 * jnp.diag(
        jnp.arange(1.0, n + 1))
    rng = np.random.default_rng(13)
    c = rng.standard_normal((n, n)) / np.sqrt(4 * n)
    b = jnp.asarray(c @ c.T + np.eye(n))

    def low(a_builder):
        def f(amat, bmat):
            lams, _ = dominant_eigh_gen(a_builder((amat + amat.T) / 2),
                                        DenseOperator((bmat + bmat.T) / 2),
                                        r=r, maxiter=300, tol=1e-11)
            return jnp.sum(lams * jnp.arange(1.0, r + 1))
        return jax.jit(f)

    dense = low(DenseOperator)
    sharded = low(lambda m: RowShardedOperator(m, mesh))
    np.testing.assert_allclose(sharded(a, b), dense(a, b), rtol=1e-9)
    gd = jax.jit(jax.grad(dense, argnums=(0, 1)))(a, b)
    gs = jax.jit(jax.grad(sharded, argnums=(0, 1)))(a, b)
    for x, y in zip(gs, gd):
        np.testing.assert_allclose(x, y, rtol=1e-6, atol=1e-9)


def test_sharded_restart_cycles_value_and_grad(mesh):
    """Cross-tier combination: bounded-memory thick restart
    (restart_cycles) THROUGH the row-sharded matrix-free TFIM operator —
    the memory-scaling story composed with the distribution story.
    Value + IFT gradient vs the exact Jordan-Wigner oracle."""
    from dominantsparseeigenad_tpu.models import (tfim_exact_e0,
                                                  tfim_sharded_operator)

    n = 12

    def e0(g):
        op = tfim_sharded_operator(n, g, mesh)
        lam, _ = dominant_eigh(op, k=24, restart_cycles=6, extreme="min")
        return lam

    val, grad = jax.jit(jax.value_and_grad(e0))(jnp.float64(1.0))
    ex = float(tfim_exact_e0(n, 1.0))
    exg = float(jax.grad(lambda g: tfim_exact_e0(n, g))(jnp.float64(1.0)))
    np.testing.assert_allclose(float(val), ex, rtol=1e-10)
    np.testing.assert_allclose(float(grad), exg, rtol=1e-8)


def test_sharded_complex_hermitian_eigh(mesh):
    """Cross-tier combination: a COMPLEX Hermitian matrix row-sharded
    over the mesh — eigenvalue and parameter gradient vs the dense
    oracle (the complex machinery and the distribution machinery
    composed, which no single-tier test exercises)."""
    n = 256
    rng = np.random.default_rng(12)
    h0 = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    h0 = (h0 + h0.conj().T) / 2
    h1 = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    h1 = jnp.asarray((h1 + h1.conj().T) / 2)
    h0j = jnp.asarray(h0)

    def lam_of(t):
        op = RowShardedOperator(h0j + t * h1, mesh)
        lam, _ = dominant_eigh(op, k=60, extreme="min")
        return lam

    val, grad = jax.jit(jax.value_and_grad(lam_of))(jnp.float64(0.0))
    ev, evec = np.linalg.eigh(h0)
    np.testing.assert_allclose(float(val), ev[0], rtol=1e-10)
    v0 = evec[:, 0]
    exg = float(np.real(v0.conj() @ (np.asarray(h1) @ v0)))
    np.testing.assert_allclose(float(grad), exg, rtol=1e-8)
