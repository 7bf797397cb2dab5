"""Differentiable dominant_eigh tests.

Mirrors the reference's ``tests/test_symeig.py``: gradcheck (order 1 AND 2 —
the reference needs double backward for fidelity susceptibility) of the
custom derivative rule on small random symmetric matrices, and parity of the
matrix-free path against the dense path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

from dominantsparseeigenad_tpu import (
    DenseOperator, MatrixFreeOperator, dominant_eigh,
)


def random_symmetric(n, key):
    a = jax.random.normal(key, (n, n), dtype=jnp.float64)
    return (a + a.T) / 2


def test_forward_matches_eigh():
    n = 48
    a = random_symmetric(n, jax.random.PRNGKey(0))
    lam, v = dominant_eigh(a, k=40, extreme="min")
    evals, evecs = jnp.linalg.eigh(a)
    np.testing.assert_allclose(lam, evals[0], atol=1e-10)
    np.testing.assert_allclose(jnp.abs(v @ evecs[:, 0]), 1.0, atol=1e-9)


def test_eigenvalue_gradient_is_vvT():
    """dλ/dA = v v^T — the textbook Hellmann-Feynman relation."""
    n = 30
    a = random_symmetric(n, jax.random.PRNGKey(1))

    def lam_fn(a):
        lam, _ = dominant_eigh(DenseOperator(a), k=n, extreme="min")
        return lam

    grad_a = jax.grad(lam_fn)(a)
    _, v = dominant_eigh(DenseOperator(a), k=n, extreme="min")
    np.testing.assert_allclose(grad_a, jnp.outer(v, v), atol=1e-8)


def test_check_grads_order2_eigenvalue():
    n = 16
    a = random_symmetric(n, jax.random.PRNGKey(2))

    def lam_fn(a):
        a = (a + a.T) / 2  # well-defined derivatives for any tangent
        lam, _ = dominant_eigh(DenseOperator(a), k=n, extreme="min",
                               tol=1e-13)
        return lam

    check_grads(jax.jit(lam_fn), (a,), order=2, modes=["fwd", "rev"],
                atol=1e-5, rtol=1e-5)


def test_check_grads_eigenvector_functional():
    """Grad-check a nonlinear functional of the eigenvector (exercises dv)."""
    n = 14
    a = random_symmetric(n, jax.random.PRNGKey(3))
    w = jax.random.normal(jax.random.PRNGKey(4), (n,), dtype=jnp.float64)

    def f(a):
        a = (a + a.T) / 2
        lam, v = dominant_eigh(DenseOperator(a), k=n, extreme="min",
                               tol=1e-13)
        # gauge-invariant functional (even in v)
        return (w @ v) ** 2 + lam ** 2

    check_grads(jax.jit(f), (a,), order=2, modes=["fwd", "rev"],
                atol=2e-4, rtol=2e-4)


def test_max_extreme_gradients():
    n = 14
    a = random_symmetric(n, jax.random.PRNGKey(5))

    def f(a):
        a = (a + a.T) / 2
        lam, v = dominant_eigh(DenseOperator(a), k=n, extreme="max",
                               tol=1e-13)
        return lam

    check_grads(jax.jit(f), (a,), order=2, modes=["fwd", "rev"],
                atol=1e-5, rtol=1e-5)


def test_matrix_free_matches_dense_gradient():
    """The reference's sparse-vs-dense cross-validation (test_symeig.py):
    wrap a small dense matrix in a matvec closure; values and parameter
    gradients must match the dense path."""
    n = 24
    base = random_symmetric(n, jax.random.PRNGKey(6))
    pert = random_symmetric(n, jax.random.PRNGKey(7))

    def dense_lam(g):
        return dominant_eigh(DenseOperator(base + g * pert), k=n,
                             extreme="min", tol=1e-13)[0]

    def mf_lam(g):
        op = MatrixFreeOperator(
            lambda g, x: base @ x + g * (pert @ x), g, dim=n,
            dtype=jnp.float64)
        return dominant_eigh(op, k=n, extreme="min", tol=1e-13)[0]

    g = jnp.asarray(0.3, dtype=jnp.float64)
    np.testing.assert_allclose(dense_lam(g), mf_lam(g), atol=1e-10)
    np.testing.assert_allclose(jax.grad(dense_lam)(g), jax.grad(mf_lam)(g),
                               atol=1e-8)
    # second derivative parity (the fidelity-susceptibility machinery)
    np.testing.assert_allclose(
        jax.grad(jax.grad(dense_lam))(g), jax.grad(jax.grad(mf_lam))(g),
        atol=1e-6)


def test_hessian_matches_perturbation_theory():
    """d²λ₀/dg² of A(g)=A0+g·B against second-order perturbation theory:
    2 Σ_{n>0} |<n|B|0>|² / (λ0 - λn)."""
    n = 20
    a0 = random_symmetric(n, jax.random.PRNGKey(8))
    b = random_symmetric(n, jax.random.PRNGKey(9))

    def lam(g):
        op = MatrixFreeOperator(lambda g, x: a0 @ x + g * (b @ x), g,
                                dim=n, dtype=jnp.float64)
        return dominant_eigh(op, k=n, extreme="min", tol=1e-13)[0]

    g0 = jnp.asarray(0.0, dtype=jnp.float64)
    d2 = jax.grad(jax.grad(lam))(g0)

    evals, evecs = jnp.linalg.eigh(a0)
    v0 = evecs[:, 0]
    me = evecs[:, 1:].T @ (b @ v0)
    want = 2 * jnp.sum(me ** 2 / (evals[0] - evals[1:]))
    np.testing.assert_allclose(d2, want, rtol=1e-6)


def test_jit_and_value_and_grad():
    n = 32
    a = random_symmetric(n, jax.random.PRNGKey(10))

    @jax.jit
    def f(a):
        lam, v = dominant_eigh(DenseOperator(a), k=n, extreme="min")
        return lam, v

    lam, v = f(a)
    np.testing.assert_allclose(a @ v, lam * v, atol=1e-8)

    g = jax.jit(jax.grad(lambda a: f(a)[0]))(a)
    np.testing.assert_allclose(g, jnp.outer(v, v), atol=1e-8)


def test_refine_eigenpair_mixed_precision():
    """TPU recipe: cheap f32 Krylov forward, then 2 Newton polish steps
    against the f64 operator reach f64 round-off — instead of a full f64
    Krylov run (SURVEY hard part 6)."""
    from dominantsparseeigenad_tpu import refine_eigenpair
    from dominantsparseeigenad_tpu.models import tfim_dense_hamiltonian

    n = 8
    h64 = tfim_dense_hamiltonian(n, jnp.float64(0.9))
    h32 = h64.astype(jnp.float32)

    lam32, v32 = dominant_eigh(DenseOperator(h32), k=50, extreme="min")
    w, vv = np.linalg.eigh(np.asarray(h64))
    res32 = abs(float(lam32) - w[0])
    assert res32 > 1e-12          # f32 really is the coarse tier

    lam, v = refine_eigenpair(DenseOperator(h64), lam32, v32,
                              definite_sign=+1.0)
    np.testing.assert_allclose(float(lam), w[0], rtol=1e-14, atol=1e-13)
    resid = np.linalg.norm(np.asarray(h64) @ np.asarray(v)
                           - float(lam) * np.asarray(v))
    assert resid < 1e-11
    # Interior-safe MINRES path (definite_sign=None) reaches the same pair.
    lam2, _ = refine_eigenpair(DenseOperator(h64), lam32, v32)
    np.testing.assert_allclose(float(lam2), w[0], rtol=1e-14, atol=1e-13)


def test_dominant_eigh_preconditioned_gradients():
    """precond= threads a Jacobi inverse into the IFT tangent solves:
    gradients match the unpreconditioned path, and the same
    preconditioner measurably cuts the deflated-CG iteration count."""
    from dominantsparseeigenad_tpu.ops.cg import solve_deflated_info

    n = 300
    rng = np.random.default_rng(90)
    diag = jnp.asarray(np.linspace(1.0, 3000.0, n))
    offd = jnp.asarray(rng.standard_normal((n, n))) * 0.5
    h0 = jnp.diag(diag) + (offd + offd.T) / 2
    h1 = jnp.asarray(rng.standard_normal((n, n)))
    h1 = (h1 + h1.T) / 2

    inv_diag = 1.0 / jnp.diagonal(h0)
    jacobi = lambda r: inv_diag * r  # held alive for the whole test

    def e0(g, **kw):
        return dominant_eigh(DenseOperator(h0 + g * h1), k=80,
                             extreme="min", tol=1e-11, **kw)[0]

    g0 = jnp.float64(0.05)
    grad_plain = jax.grad(e0)(g0)
    grad_pc = jax.grad(lambda g: e0(g, precond=jacobi))(g0)
    np.testing.assert_allclose(grad_pc, grad_plain, rtol=1e-9)

    # The preconditioner really does help on this spectrum.
    lam, v = dominant_eigh(DenseOperator(h0), k=80, extreme="min")
    b = jnp.asarray(rng.standard_normal(n))
    _, it_plain, _ = solve_deflated_info(DenseOperator(h0), lam, v, b,
                                         tol=1e-10)
    _, it_pc, _ = solve_deflated_info(DenseOperator(h0), lam, v, b,
                                      tol=1e-10, precond=jacobi)
    assert float(it_pc) < 0.7 * float(it_plain)


@pytest.mark.parametrize("reorth_chunks,reorth_passes",
                         [(0, 2), (4, 1)])  # (4, 1) = the bench.py config
def test_bf16_basis_storage_matches_f32(reorth_chunks, reorth_passes):
    """basis_dtype=bf16: the narrowed reorth history + one-Newton polish
    holds (at least) full-f32 accuracy for the eigenpair and its
    first/second derivatives.  Both paths are judged against an f64
    ground truth — NOT against each other: the bf16+polish result is in
    fact ~10x CLOSER to truth on dE0/dg (measured 1.9e-5 vs plain f32's
    1.9e-4 — the polish removes Krylov noise the plain path keeps), so a
    bf16-vs-f32 comparison at f32's own error scale would be testing the
    agreement of two approximations at a tolerance tighter than the
    reference's error.  The eigenVALUE comes from the full-precision
    tridiagonal and the polished eigenVECTOR from a working-precision
    deflated solve, so everything downstream (IFT tangents, chi_F) holds
    f32 accuracy while the dominant HBM traffic is halved (the
    headline-bench win)."""
    from dominantsparseeigenad_tpu.models import tfim_operator

    n = 10
    kw = dict(reorth_chunks=reorth_chunks, reorth_passes=reorth_passes)

    def obs(gval, dtype, tol, **extra):
        def ground(g):
            op = tfim_operator(n, g, dtype=dtype)
            return dominant_eigh(op, k=30, extreme="min", tol=tol, **extra)
        (lam, v), (dlam, dv) = jax.jvp(
            jax.jit(ground), (jnp.asarray(gval, dtype),),
            (jnp.asarray(1.0, dtype),))
        return np.asarray(jnp.stack([lam, dlam, jnp.vdot(dv, dv)]),
                          np.float64)

    truth = obs(1.2, jnp.float64, 1e-12)
    f32 = obs(1.2, jnp.float32, 1e-6, **kw)
    b16 = obs(1.2, jnp.float32, 1e-6, basis_dtype=jnp.bfloat16, **kw)

    # Plain-f32 error budget (measured ~1.5e-6 / 1.9e-4 / 5.4e-4; asserted
    # at ~5x margin) — this is the bar "matches f32" means.
    np.testing.assert_allclose(f32[0], truth[0], rtol=1e-5)   # E0
    np.testing.assert_allclose(f32[1], truth[1], rtol=1e-3)   # dE0/dg
    np.testing.assert_allclose(f32[2], truth[2], rtol=3e-3)   # chi_F
    # bf16 basis + polish beats it (measured ~1.4e-6 / 1.9e-5 / 1.5e-4).
    np.testing.assert_allclose(b16[0], truth[0], rtol=1e-5)   # E0
    np.testing.assert_allclose(b16[1], truth[1], rtol=1e-4)   # dE0/dg
    np.testing.assert_allclose(b16[2], truth[2], rtol=1e-3)   # chi_F

    # The polished pair is a genuine eigenpair at working precision.
    g = jnp.float32(1.2)
    lam, v = jax.jit(lambda g: dominant_eigh(
        tfim_operator(n, g, dtype=jnp.float32), k=30, extreme="min",
        tol=1e-6, basis_dtype=jnp.bfloat16, **kw))(g)
    op = tfim_operator(n, g, dtype=jnp.float32)
    resid = float(jnp.linalg.norm(op.matvec(v) - lam * v)
                  / jnp.abs(lam))
    assert resid < 1e-5, resid
    # And the gauge survives the polish: pivot entry real positive.
    assert float(v[int(jnp.argmax(jnp.abs(v)))]) > 0


def test_bf16_basis_storage_guards():
    from dominantsparseeigenad_tpu.models import tfim_operator
    from dominantsparseeigenad_tpu.ops.lanczos import lanczos

    op = tfim_operator(6, 1.0, dtype=jnp.float32)
    with pytest.raises(ValueError, match="fixed-k"):
        dominant_eigh(op, k=10, basis_dtype=jnp.bfloat16,
                      early_exit_tol=1e-4)
    cop = DenseOperator(jnp.eye(8, dtype=jnp.complex64))
    with pytest.raises(ValueError, match="real"):
        lanczos(cop, 4, basis_dtype=jnp.bfloat16)
    # Requesting the operator's own dtype is a harmless no-op, even for a
    # complex operator (only a genuine narrowing is rejected).
    res = lanczos(cop, 4, basis_dtype=jnp.complex64)
    assert res.basis.dtype == jnp.complex64
