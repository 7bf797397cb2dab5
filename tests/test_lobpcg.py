"""LOBPCG block forward engine (north-star addition — the reference has
no block or preconditioned eigensolver; SURVEY.md §2.1 C1 is a single-pair
Lanczos).  Validates values vs LAPACK, preconditioner effectiveness, the
matrix-free path, and order-2 derivatives through the shared IFT rule of
``dominant_eigh_multi(method="lobpcg")``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

from dominantsparseeigenad_tpu import (
    DenseOperator, MatrixFreeOperator, dominant_eigh_multi, lobpcg_eigh,
    lobpcg_eigh_general)


def _sym(n, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n))
    return jnp.asarray((a + a.T) / 2)


def test_values_match_eigh_min_and_max():
    n, r = 150, 4
    a = _sym(n)
    ew, ev = np.linalg.eigh(np.asarray(a))
    op = DenseOperator(a)

    lams, x, info = lobpcg_eigh(op, r, tol=1e-9, maxiter=600, with_info=True)
    assert float(info.converged) == 1.0
    np.testing.assert_allclose(lams, ew[:r], rtol=1e-8)
    # Same subspace: projector onto the true lowest-r space reproduces x.
    proj = ev[:, :r] @ (ev[:, :r].T @ np.asarray(x))
    np.testing.assert_allclose(np.asarray(x), proj, atol=1e-5)
    # Orthonormal block.
    np.testing.assert_allclose(np.asarray(x.T @ x), np.eye(r), atol=1e-9)

    lams_max, _ = lobpcg_eigh(op, r, extreme="max", tol=1e-9, maxiter=600)
    np.testing.assert_allclose(lams_max, ew[::-1][:r], rtol=1e-8)


def test_preconditioner_cuts_iterations():
    """Jacobi preconditioning on a diagonally dominant SPD matrix must
    converge dramatically faster — the capability Lanczos doesn't have."""
    n, r = 200, 3
    rng = np.random.default_rng(1)
    d = np.abs(rng.standard_normal(n)) * 100 + 1
    a = np.asarray(_sym(n, seed=1)) * 0.5 + np.diag(d)
    op = DenseOperator(jnp.asarray(a))
    dinv = jnp.asarray(1.0 / d)

    _, _, plain = lobpcg_eigh(op, r, tol=1e-8, maxiter=500, with_info=True)
    _, _, prec = lobpcg_eigh(op, r, tol=1e-8, maxiter=500, with_info=True,
                             precond=lambda R: dinv[:, None] * R)
    assert float(prec.converged) == 1.0
    assert float(prec.iterations) < 0.5 * float(plain.iterations)
    ew = np.linalg.eigh(a)[0]
    lams, _ = lobpcg_eigh(op, r, tol=1e-10, maxiter=500,
                          precond=lambda R: dinv[:, None] * R)
    np.testing.assert_allclose(lams, ew[:r], rtol=1e-9)


def test_matrix_free_operator():
    n, r = 96, 3
    a = _sym(n, seed=2)

    def mv(params, v):
        return params["mat"] @ v

    op = MatrixFreeOperator(mv, {"mat": a}, dim=n, dtype=a.dtype)
    lams, _ = lobpcg_eigh(op, r, tol=1e-9, maxiter=400)
    np.testing.assert_allclose(lams, np.linalg.eigh(np.asarray(a))[0][:r],
                               rtol=1e-8)


def test_dim_guard():
    op = DenseOperator(_sym(8))
    with pytest.raises(ValueError, match="dim >= 3"):
        lobpcg_eigh(op, 4)


def test_multi_method_parity_and_order2_grads():
    """dominant_eigh_multi(method='lobpcg') must agree with the Lanczos
    forward (same IFT rule) and stay twice-differentiable."""
    n, r = 48, 3
    a = _sym(n, seed=3)
    l_lo, v_lo = dominant_eigh_multi(DenseOperator(a), r=r, k=300,
                                     method="lobpcg", tol=1e-11)
    l_la, v_la = dominant_eigh_multi(DenseOperator(a), r=r, k=n,
                                     method="lanczos")
    np.testing.assert_allclose(l_lo, l_la, rtol=1e-9)
    np.testing.assert_allclose(np.abs(np.asarray(v_lo.T @ v_la)),
                               np.eye(r), atol=1e-5)

    def f(mat):
        l, v = dominant_eigh_multi(DenseOperator((mat + mat.T) / 2), r=r,
                                   k=300, method="lobpcg", tol=1e-12)
        return jnp.sum(l * jnp.arange(1.0, r + 1.0)) + jnp.sum(v[0] ** 2)

    m0 = jnp.asarray(np.random.default_rng(4).standard_normal((32, 32)))
    check_grads(jax.jit(f), (m0,), order=2, modes=("fwd", "rev"),
                atol=1e-3, rtol=1e-3)


def test_multi_with_info_flags_underconvergence():
    """dominant_eigh_multi(with_info=True): true block residual report —
    converged solves report converged=1, a deliberately starved LOBPCG
    budget is FLAGGED (never silent), and the info composes with grad."""
    n, r = 64, 2
    a = _sym(n, seed=5)
    op = DenseOperator(a)

    lams, v, info = dominant_eigh_multi(op, r=r, k=n, tol=1e-8,
                                        with_info=True)
    assert float(info.converged) == 1.0
    assert float(info.residual) < 1e-8

    _, _, starved = dominant_eigh_multi(op, r=r, k=5, tol=1e-10,
                                        method="lobpcg", with_info=True)
    assert float(starved.converged) == 0.0
    assert float(starved.residual) > 1e-10

    def f(mat):
        l, _, inf = dominant_eigh_multi(DenseOperator((mat + mat.T) / 2),
                                        r=r, k=n, with_info=True)
        return jnp.sum(l) + 0.0 * inf.residual

    g = jax.grad(f)(a)
    evals, evecs = np.linalg.eigh(np.asarray(a))
    # d(sum lams)/dmat = sym-projection of sum_i v_i v_i^T, which is
    # already symmetric.
    expected = sum(np.outer(evecs[:, i], evecs[:, i]) for i in range(r))
    np.testing.assert_allclose(g, expected, atol=1e-7)


def test_lobpcg_conditioned_spectrum_converges_fast():
    """Regression (round-4 review, numpy-replicated): the conjugate
    direction P was formed by zeroing Ritz-coefficient rows in the
    WHITENED basis, which leaves an X component inside P (whitening
    mixes the [X, W, P] blocks) — the method then degrades to block
    steepest descent: 10x the iterations at condition 1e2 and
    non-convergence in 2000 iterations at 1e4.  The block-correct
    update must converge in a few hundred."""
    n, r = 300, 4
    rng = np.random.default_rng(1)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    d = np.linspace(1, 1e4, n)
    a = jnp.asarray(q @ np.diag(d) @ q.T)
    lams, x, info = lobpcg_eigh(a, r=r, maxiter=2000, tol=1e-8,
                                with_info=True)
    assert float(info.converged) == 1.0
    assert float(info.iterations) < 500, float(info.iterations)
    np.testing.assert_allclose(np.asarray(lams), np.sort(d)[:r], rtol=1e-8)

    db = np.linspace(1.0, 3.0, n)
    b = jnp.asarray(q @ np.diag(db) @ q.T)
    lg, xg, ig = lobpcg_eigh_general(a, b, r=r, maxiter=2000, tol=1e-8,
                                     with_info=True)
    assert float(ig.converged) == 1.0
    assert float(ig.iterations) < 500, float(ig.iterations)
    import scipy.linalg as sla
    ref = sla.eigh(np.asarray(a), np.asarray(b), eigvals_only=True)[:r]
    np.testing.assert_allclose(np.asarray(lg), ref, rtol=1e-7)
