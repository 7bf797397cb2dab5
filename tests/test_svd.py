"""Truncated differentiable SVD (Hermitian-embedding + block Lanczos)."""

import jax
import jax.numpy as jnp
import numpy as np

from dominantsparseeigenad_tpu import DenseOperator, dominant_svd
from dominantsparseeigenad_tpu.ops.operators import MatrixFreeOperator


def test_values_square():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((40, 40)))
    u, s, v = dominant_svd(a, r=5, k=80)
    su, sv, svt = np.linalg.svd(np.asarray(a))
    np.testing.assert_allclose(s, sv[:5], rtol=1e-9)
    np.testing.assert_allclose(a @ v, u * s[None, :], atol=1e-7)
    np.testing.assert_allclose(u.T @ u, np.eye(5), atol=1e-8)
    np.testing.assert_allclose(v.T @ v, np.eye(5), atol=1e-8)


def test_values_rectangular():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((50, 30)))
    u, s, v = dominant_svd(a, r=4, k=80)
    sv = np.linalg.svd(np.asarray(a), compute_uv=False)
    np.testing.assert_allclose(s, sv[:4], rtol=1e-9)
    np.testing.assert_allclose(a @ v, u * s[None, :], atol=1e-7)


def test_values_complex():
    """Complex input: the embedding must use the adjoint A^H, not the
    transpose — with A^T the embedded matrix is complex-symmetric (not
    Hermitian) and the singular values come out silently wrong."""
    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.standard_normal((32, 32))
                    + 1j * rng.standard_normal((32, 32)))
    u, s, v = dominant_svd(a, r=4, k=64)
    sv = np.linalg.svd(np.asarray(a), compute_uv=False)
    np.testing.assert_allclose(s, sv[:4], rtol=1e-9)
    np.testing.assert_allclose(a @ v, u * s[None, :], atol=1e-7)
    np.testing.assert_allclose(u.conj().T @ u, np.eye(4), atol=1e-8)
    np.testing.assert_allclose(v.conj().T @ v, np.eye(4), atol=1e-8)


def test_gradients():
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.standard_normal((24, 24)))

    def loss(a):
        u, s, v = dominant_svd(a, r=3, k=48, tol=1e-12)
        return jnp.sum(s ** 2) + jnp.sum((u @ v.T) ** 3)

    loss = jax.jit(loss)
    g = jax.grad(loss)(a)
    eps = 1e-6
    for i, j in [(0, 0), (5, 17)]:
        da = jnp.zeros_like(a).at[i, j].set(eps)
        num = (loss(a + da) - loss(a - da)) / (2 * eps)
        np.testing.assert_allclose(g[i, j], num, rtol=5e-4, atol=1e-7)


def test_matrix_free_operator_param_gradient():
    """sigma_max of a parameterized matrix-free operator, d/dtheta."""
    rng = np.random.default_rng(3)
    b0 = jnp.asarray(rng.standard_normal((20, 20)))
    b1 = jnp.asarray(rng.standard_normal((20, 20)))

    def smax(t):
        op = MatrixFreeOperator(
            lambda p, x: (b0 + p * b1) @ x, t, dim=20,
            dtype=jnp.float64, symmetric=False,
            rmatvec_fn=lambda p, x: (b0 + p * b1).T @ x)
        _, s, _ = dominant_svd(op, r=1, k=40, tol=1e-12)
        return s[0]

    t0 = jnp.float64(0.3)
    smax = jax.jit(smax)
    val, grad = jax.value_and_grad(smax)(t0)
    sv = np.linalg.svd(np.asarray(b0 + 0.3 * b1), compute_uv=False)
    np.testing.assert_allclose(val, sv[0], rtol=1e-10)
    eps = 1e-6
    num = (smax(t0 + eps) - smax(t0 - eps)) / (2 * eps)
    np.testing.assert_allclose(grad, num, rtol=1e-6)


def test_svd_with_info_and_lobpcg_method():
    """with_info reports the embedding block residual; method='lobpcg'
    matches the Lanczos forward on the same triplets."""
    rng = np.random.default_rng(6)
    a = jnp.asarray(rng.standard_normal((60, 40)))
    sv = np.linalg.svd(np.asarray(a), compute_uv=False)

    u, s, v, info = dominant_svd(a, r=3, k=100, tol=1e-10, with_info=True)
    assert float(info.converged) == 1.0
    np.testing.assert_allclose(s, sv[:3], rtol=1e-9)

    u2, s2, v2 = dominant_svd(a, r=3, k=600, tol=1e-10, method="lobpcg")
    np.testing.assert_allclose(s2, sv[:3], rtol=1e-8)
    # Reconstruction: A v_i = s_i u_i for both forwards.
    np.testing.assert_allclose(np.asarray(a @ v2),
                               np.asarray(u2 * s2[None, :]), atol=1e-7)

    _, _, _, starved = dominant_svd(a, r=3, k=4, tol=1e-10,
                                    method="lobpcg", with_info=True)
    assert float(starved.converged) == 0.0


def test_dominant_svd_past_rank_returns_unit_columns():
    """Regression (round-4 review): for r > rank(A) the embedding's ~0
    eigenvectors are arbitrary null-space mixtures whose halves have
    UNEQUAL norms — the old blanket *sqrt(2) unpacking returned
    non-unit (even near-zero-norm) columns and occasionally negative
    'singular values'.  Columns must now be unit and s clamped >= 0;
    the genuine leading triplet stays exact."""
    rng = np.random.default_rng(5)
    x = rng.standard_normal(50)
    y = rng.standard_normal(30)
    a = jnp.asarray(np.outer(x, y))            # rank 1
    u, s, v = dominant_svd(a, r=3, k=40)
    s_np = np.asarray(s)
    assert (s_np >= 0).all()
    np.testing.assert_allclose(
        s_np[0], np.linalg.norm(x) * np.linalg.norm(y), rtol=1e-10)
    assert s_np[1] < 1e-8 and s_np[2] < 1e-8
    np.testing.assert_allclose(np.linalg.norm(np.asarray(u), axis=0),
                               1.0, atol=1e-8)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(v), axis=0),
                               1.0, atol=1e-8)
    # The genuine triplet still satisfies A v = s u.
    np.testing.assert_allclose(
        np.asarray(a) @ np.asarray(v[:, 0]),
        s_np[0] * np.asarray(u[:, 0]), atol=1e-8)
