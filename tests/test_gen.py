"""Generalized symmetric-definite eigenproblem A x = lam B x (north-star
addition — the reference handles the standard problem only): B-metric
LOBPCG forward + pencil IFT derivative rule, differentiable w.r.t. BOTH
operators.  Oracles: scipy.linalg.eigh(a, b) and finite differences.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg
from jax.test_util import check_grads

from dominantsparseeigenad_tpu import (
    DenseOperator, dominant_eigh_gen, lobpcg_eigh_general)


def _pencil(n, seed=0, diag_scale=2.0, noise=0.3):
    rng = np.random.default_rng(seed)
    a = np.diag(np.arange(1.0, n + 1) * diag_scale)
    s = rng.standard_normal((n, n))
    a = a + noise * (s + s.T) / 2
    c = rng.standard_normal((n, n)) / np.sqrt(4 * n)
    b = c @ c.T + np.eye(n)
    return a, b


def test_forward_matches_scipy_min_and_max():
    n, r = 120, 3
    a, b = _pencil(n, seed=0)
    ew = scipy.linalg.eigh(a, b, eigvals_only=True)
    dinv = jnp.asarray(1.0 / (np.diag(a) + 1.0))

    lams, v, info = lobpcg_eigh_general(
        jnp.asarray(a), jnp.asarray(b), r, tol=1e-11, maxiter=300,
        precond=lambda R: dinv[:, None] * R, with_info=True)
    assert float(info.converged) == 1.0
    np.testing.assert_allclose(lams, ew[:r], rtol=1e-10)
    # B-orthonormal block.
    np.testing.assert_allclose(np.asarray(v).T @ b @ np.asarray(v),
                               np.eye(r), atol=1e-10)

    lmax, _ = lobpcg_eigh_general(jnp.asarray(a), jnp.asarray(b), r,
                                  extreme="max", tol=1e-10, maxiter=500)
    np.testing.assert_allclose(lmax, ew[::-1][:r], rtol=1e-8)


def test_identity_b_matches_standard():
    from dominantsparseeigenad_tpu import lobpcg_eigh

    n, r = 80, 3
    a, _ = _pencil(n, seed=1)
    aj = jnp.asarray(a)
    l0, v0 = lobpcg_eigh(aj, r, tol=1e-10, maxiter=250)
    l1, v1 = lobpcg_eigh_general(aj, jnp.eye(n), r, tol=1e-10, maxiter=250)
    np.testing.assert_allclose(l1, l0, rtol=1e-12)
    np.testing.assert_allclose(v1, v0, atol=1e-12)


def test_gradients_both_operators_match_fd():
    n, r = 100, 3
    a, b = _pencil(n, seed=1)
    dinv = jnp.asarray(1.0 / (np.diag(a) + 2.0))

    def prec(v):  # VECTOR convention (mirrors dominant_eigh_multi)
        return dinv * v

    def f(am, bm):
        ls, vv = dominant_eigh_gen(DenseOperator((am + am.T) / 2),
                                   DenseOperator((bm + bm.T) / 2),
                                   r=r, maxiter=300, tol=1e-12,
                                   precond=prec)
        return jnp.sum(ls * jnp.arange(1.0, r + 1.0)) + jnp.sum(vv[0] ** 2)

    aj, bj = jnp.asarray(a), jnp.asarray(b)
    ga, gb = jax.grad(f, argnums=(0, 1))(aj, bj)
    eps = 1e-6
    for (i, j) in [(3, 7), (0, 0)]:
        fd_a = (f(aj.at[i, j].add(eps), bj)
                - f(aj.at[i, j].add(-eps), bj)) / (2 * eps)
        fd_b = (f(aj, bj.at[i, j].add(eps))
                - f(aj, bj.at[i, j].add(-eps))) / (2 * eps)
        np.testing.assert_allclose(float(ga[i, j]), float(fd_a),
                                   rtol=1e-5, atol=1e-12)
        np.testing.assert_allclose(float(gb[i, j]), float(fd_b),
                                   rtol=1e-5, atol=1e-12)


def test_order2_grads():
    # n=24 keeps the order-2 check_grads probes cheap (n=36/maxiter=400
    # cost 48 s of suite budget); the pencil's 1..n diagonal keeps the
    # target pair well separated at any n here.
    n, r = 24, 2
    a, b = _pencil(n, seed=2, diag_scale=1.0, noise=0.2)
    aj, bj = jnp.asarray(a), jnp.asarray(b)
    dinv = jnp.asarray(1.0 / (np.diag(a) + 1.0))

    def prec(v):  # VECTOR convention
        return dinv * v

    def fa(am):
        ls, vv = dominant_eigh_gen(DenseOperator((am + am.T) / 2),
                                   DenseOperator(bj), r=r, maxiter=250,
                                   tol=1e-13, precond=prec)
        return jnp.sum(ls) + jnp.sum(vv[0] ** 2)

    check_grads(jax.jit(fa), (aj,), order=2, modes=("fwd", "rev"),
                atol=1e-3, rtol=1e-3)

    def fb(bm):
        ls, _ = dominant_eigh_gen(DenseOperator(aj),
                                  DenseOperator((bm + bm.T) / 2), r=r,
                                  maxiter=250, tol=1e-13, precond=prec)
        return jnp.sum(ls * jnp.asarray([1.0, 2.0]))

    check_grads(jax.jit(fb), (bj,), order=2, modes=("fwd", "rev"),
                atol=1e-3, rtol=1e-3)


def test_with_info_flags_starved_budget():
    n, r = 90, 3
    a, b = _pencil(n, seed=3)
    _, _, info = dominant_eigh_gen(DenseOperator(jnp.asarray(a)),
                                   DenseOperator(jnp.asarray(b)), r=r,
                                   maxiter=5, tol=1e-12, with_info=True)
    assert float(info.converged) == 0.0
    assert float(info.effective_k) == 5.0


def test_guards():
    a, b = _pencil(30)
    with pytest.raises(ValueError, match="extreme"):
        dominant_eigh_gen(DenseOperator(jnp.asarray(a)),
                          DenseOperator(jnp.asarray(b)), extreme="mid")
    with pytest.raises(ValueError, match="dims differ"):
        lobpcg_eigh_general(jnp.asarray(a), jnp.eye(10), 2)


def test_complex_hermitian_pencil():
    """Complex Hermitian A with real SPD B: values vs scipy, forward
    B-orthonormality in the complex inner product."""
    from dominantsparseeigenad_tpu import lobpcg_eigh_general

    rng = np.random.default_rng(4)
    n, r = 80, 2
    h = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    a = (h + h.conj().T) / 2 + np.diag(np.arange(1.0, n + 1))
    c = rng.standard_normal((n, n)) / np.sqrt(4 * n)
    b = c @ c.T + np.eye(n)
    ew = scipy.linalg.eigh(a, b, eigvals_only=True)
    dinv = jnp.asarray(1.0 / (np.arange(1.0, n + 1) + 1.0),
                       jnp.complex128)

    lams, v, info = lobpcg_eigh_general(
        jnp.asarray(a), jnp.asarray(b, np.complex128), r, tol=1e-10,
        maxiter=400, precond=lambda R: dinv[:, None] * R, with_info=True)
    assert float(info.converged) == 1.0
    np.testing.assert_allclose(lams, ew[:r], rtol=1e-9)
    gram = np.asarray(v).conj().T @ b @ np.asarray(v)
    np.testing.assert_allclose(gram, np.eye(r), atol=1e-9)


def test_complex_pencil_phase_sensitive_gradient():
    """Phase-sensitive gradient of the complex pencil matches FD
    (regression: the tangent lacked the pivot-phase gauge shift)."""
    rng = np.random.default_rng(4)
    n = 32
    h = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    a = (h + h.conj().T) / 2 + np.diag(np.arange(1.0, n + 1))
    c = rng.standard_normal((n, n)) / np.sqrt(4 * n)
    bm = jnp.asarray(c @ c.T + np.eye(n), np.complex128)
    pert = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    pert = (pert + pert.conj().T) / 2
    aj, pj = jnp.asarray(a), jnp.asarray(pert)

    def f(t):
        _, v = dominant_eigh_gen(DenseOperator(aj + t * pj),
                                 DenseOperator(bm), r=2, maxiter=400,
                                 tol=1e-12)
        return jnp.imag(v[5, 0])

    g = float(jax.grad(f)(jnp.float64(0.0)))
    eps = 1e-5
    fd = (float(f(jnp.float64(eps)))
          - float(f(jnp.float64(-eps)))) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=2e-5)
