"""Lanczos / power-iteration forward tests.

Mirrors the reference's ``tests/test_Lanczos.py`` strategy: random small
symmetric matrices in float64, eigenpairs checked against the full dense
eigendecomposition, on both the dense and the matvec-closure (matrix-free)
paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dominantsparseeigenad_tpu import (
    DenseOperator, MatrixFreeOperator, lanczos, lanczos_eigh, power_iteration,
)


def random_symmetric(n, key, scale=1.0):
    a = jax.random.normal(key, (n, n), dtype=jnp.float64)
    return scale * (a + a.T) / 2


@pytest.mark.parametrize("n,k,vec_atol", [(20, 20, 1e-10), (64, 40, 1e-7),
                                          (300, 80, 1e-5)])
def test_lanczos_eigh_dense_matches_eigh(n, k, vec_atol):
    a = random_symmetric(n, jax.random.PRNGKey(n))
    evals = jnp.linalg.eigvalsh(a)
    lmin, vmin, lmax, vmax = lanczos_eigh(DenseOperator(a), k, extreme="both")
    np.testing.assert_allclose(lmin, evals[0], rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(lmax, evals[-1], rtol=1e-9, atol=1e-9)
    # Eigenvector residuals (Ritz residual ~ sqrt(eigenvalue error))
    np.testing.assert_allclose(a @ vmin, lmin * vmin, atol=vec_atol)
    np.testing.assert_allclose(a @ vmax, lmax * vmax, atol=vec_atol)
    np.testing.assert_allclose(jnp.linalg.norm(vmin), 1.0, atol=1e-12)


def test_lanczos_matrix_free_matches_dense():
    n, k = 64, 40
    a = random_symmetric(n, jax.random.PRNGKey(7))
    op = MatrixFreeOperator(lambda p, x: p @ x, a, dim=n, dtype=jnp.float64)
    l1, v1 = lanczos_eigh(DenseOperator(a), k, extreme="min")
    l2, v2 = lanczos_eigh(op, k, extreme="min")
    np.testing.assert_allclose(l1, l2, atol=1e-10)
    np.testing.assert_allclose(v1, v2, atol=1e-8)


def test_lanczos_basis_orthonormal():
    n, k = 50, 30
    a = random_symmetric(n, jax.random.PRNGKey(3))
    res = lanczos(DenseOperator(a), k)
    q = res.basis
    np.testing.assert_allclose(q.T @ q, np.eye(k), atol=1e-10)


def test_lanczos_breakdown_restart():
    # Rank-deficient matrix with tiny Krylov space from a special start:
    # A = diag(1, 2, 0, 0, ...); v0 = e1 -> invariant after 1 step.
    n, k = 16, 8
    d = jnp.zeros(n, dtype=jnp.float64).at[0].set(1.0).at[1].set(2.0)
    a = jnp.diag(d)
    v0 = jnp.zeros(n, dtype=jnp.float64).at[0].set(1.0)
    lmin, vmin, lmax, vmax = lanczos_eigh(
        DenseOperator(a), k, extreme="both", v0=v0)
    # Despite the breakdown, restarts must find the true extremes.
    np.testing.assert_allclose(lmax, 2.0, atol=1e-9)
    np.testing.assert_allclose(lmin, 0.0, atol=1e-9)


def test_lanczos_under_jit_and_vmap():
    n, k = 32, 20
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    mats = jnp.stack([random_symmetric(n, kk) for kk in keys])

    @jax.jit
    def smallest(a):
        lam, _ = lanczos_eigh(DenseOperator(a), k, extreme="min")
        return lam

    got = jax.vmap(smallest)(mats)
    want = jnp.stack([jnp.linalg.eigvalsh(m)[0] for m in mats])
    np.testing.assert_allclose(got, want, atol=1e-8)


def test_power_iteration():
    n = 40
    a = random_symmetric(n, jax.random.PRNGKey(11))
    # Shift so the dominant |λ| is the algebraic max.
    a = a + 3.0 * jnp.linalg.norm(a, 2) * jnp.eye(n)
    lam, v = power_iteration(DenseOperator(a), num_iters=500)
    want = jnp.linalg.eigvalsh(a)[-1]
    np.testing.assert_allclose(lam, want, rtol=1e-8)
    np.testing.assert_allclose(a @ v, lam * v, atol=1e-5)


def test_chunked_reorth_matches_full():
    """reorth_chunks reads only written basis chunks — must be exactly the
    masked full-basis projection up to f.p. reassociation, including at
    k values that don't tile the chunk count (buffer padding)."""
    import numpy as np
    from dominantsparseeigenad_tpu import DenseOperator
    from dominantsparseeigenad_tpu.ops.lanczos import lanczos

    rng = np.random.default_rng(3)
    for n, k, c in [(160, 60, 4), (120, 37, 5), (96, 9, 4)]:
        a = rng.standard_normal((n, n))
        a = jnp.asarray((a + a.T) / 2)
        r0 = lanczos(DenseOperator(a), k)
        r1 = lanczos(DenseOperator(a), k, reorth_chunks=c)
        np.testing.assert_allclose(r1.alphas, r0.alphas, rtol=1e-12,
                                   atol=1e-13)
        np.testing.assert_allclose(r1.betas, r0.betas, rtol=1e-12,
                                   atol=1e-13)
        ortho = np.abs(np.asarray(r1.basis.T @ r1.basis) - np.eye(k)).max()
        assert ortho < 1e-12
        assert r1.basis.shape == (n, k)


def test_reorth_chunks_rejected_with_other_engines():
    """reorth_chunks would be silently ignored by the restart/adaptive
    forwards — dominant_eigh must reject the combination loudly."""
    from dominantsparseeigenad_tpu import DenseOperator, dominant_eigh

    op = DenseOperator(jnp.eye(16))
    with pytest.raises(ValueError, match="reorth_chunks"):
        dominant_eigh(op, k=8, reorth_chunks=4, early_exit_tol=1e-6)
    with pytest.raises(ValueError, match="reorth_chunks"):
        dominant_eigh(op, k=8, reorth_chunks=4, restart_cycles=2)


def test_restart_mode_carry_matches_cond():
    """restart_mode='carry' (the vmap-friendly carried restart
    direction) must (a) equal the 'cond' path bit-for-tolerance when no
    breakdown occurs, (b) recover the true extremes through a single
    breakdown, and (c) keep the basis orthonormal in both cases."""
    # (a) generic matrix, no breakdown.
    n, k = 50, 30
    a = random_symmetric(n, jax.random.PRNGKey(5))
    r_cond = lanczos(DenseOperator(a), k, restart_mode="cond")
    r_carry = lanczos(DenseOperator(a), k, restart_mode="carry")
    np.testing.assert_allclose(r_carry.alphas, r_cond.alphas, atol=1e-12)
    np.testing.assert_allclose(r_carry.betas, r_cond.betas, atol=1e-12)
    np.testing.assert_allclose(r_carry.basis, r_cond.basis, atol=1e-12)

    # (b) breakdown after 2 steps from a special start (invariant
    # subspace {e1, e2}); the carried direction must restart cleanly.
    n, k = 16, 8
    d = jnp.zeros(n, dtype=jnp.float64).at[0].set(1.0).at[1].set(2.0)
    a = jnp.diag(d)
    v0 = jnp.zeros(n, dtype=jnp.float64).at[0].set(1.0)
    lmin, vmin, lmax, vmax = lanczos_eigh(
        DenseOperator(a), k, extreme="both", v0=v0,
        restart_mode="carry")
    np.testing.assert_allclose(lmax, 2.0, atol=1e-9)
    np.testing.assert_allclose(lmin, 0.0, atol=1e-9)
    # (c) basis THROUGH the breakdowns: carry mode handles ONE restart
    # exactly; later breakdowns cascade clean ZERO rows (never junk).
    # The Gram matrix must be orthonormal on the written rows and
    # exactly zero on the rest.
    res = lanczos(DenseOperator(a), k, v0=v0, restart_mode="carry")
    q = np.asarray(res.basis)
    alive = np.linalg.norm(q, axis=0) > 0.5
    assert alive[:3].all()          # start + first restart survived
    gram = q.T @ q
    np.testing.assert_allclose(gram[np.ix_(alive, alive)],
                               np.eye(int(alive.sum())), atol=1e-10)
    np.testing.assert_allclose(q[:, ~alive], 0.0, atol=0.0)


def test_restart_mode_carry_under_vmap_with_breakdown():
    """The whole point of 'carry': vmapped lanes — some breaking down,
    some not — must match their pointwise solves."""
    n, k = 16, 16  # full Krylov: the generic lane is then exact
    d = jnp.zeros(n, dtype=jnp.float64).at[0].set(1.0).at[1].set(2.0)
    a_break = jnp.diag(d)
    a_generic = random_symmetric(n, jax.random.PRNGKey(9))
    mats = jnp.stack([a_break, a_generic])
    v0 = jnp.zeros(n, dtype=jnp.float64).at[0].set(1.0)

    def smallest(a):
        lam, _ = lanczos_eigh(DenseOperator(a), k, extreme="min", v0=v0,
                              restart_mode="carry")
        return lam

    got = jax.vmap(smallest)(mats)
    want = jnp.stack([smallest(m) for m in mats])
    np.testing.assert_allclose(got, want, atol=1e-10)
    np.testing.assert_allclose(
        got, jnp.stack([jnp.linalg.eigvalsh(m)[0] for m in mats]),
        atol=1e-8)


def test_restart_mode_validation():
    a = random_symmetric(12, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="restart_mode"):
        lanczos(DenseOperator(a), 4, restart_mode="bogus")
