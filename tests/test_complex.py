"""Complex Hermitian operator support — an extension over the real-only
reference: forward Lanczos, deflated solves, and IFT derivatives to second
order, with the conjugate-aware transpose solves (A^T = conj(A)).
"""

import jax
import jax.numpy as jnp
import numpy as np

from dominantsparseeigenad_tpu import (
    DenseOperator, MatrixFreeOperator, cg, dominant_eigh,
    dominant_eigh_multi, lanczos_eigh, minres, solve_deflated)


def _herm(n, seed):
    rng = np.random.default_rng(seed)
    b = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    return jnp.asarray((b + b.conj().T) / 2)


def test_complex_lanczos_forward():
    n = 48
    h = _herm(n, 0)
    lam, v = lanczos_eigh(DenseOperator(h), k=n, extreme="min")
    evals = np.linalg.eigvalsh(np.asarray(h))
    np.testing.assert_allclose(jnp.real(lam), evals[0], rtol=1e-12)
    res = np.asarray(h @ v - lam * v)
    assert np.linalg.norm(res) < 1e-10
    # Phase gauge: pivot entry real positive.
    pivot = np.asarray(v)[np.argmax(np.abs(np.asarray(v)))]
    assert abs(pivot.imag) < 1e-12 and pivot.real > 0


def test_complex_solves():
    n = 40
    h = _herm(n, 1)
    spd = h @ h.conj().T + n * jnp.eye(n)
    b = jnp.asarray(np.random.default_rng(2).standard_normal(n)
                    + 1j * np.random.default_rng(3).standard_normal(n))
    x = cg(lambda v: spd @ v, b, tol=1e-12)
    assert float(jnp.linalg.norm(spd @ x - b)) < 1e-8
    x2 = minres(lambda v: h @ v, b, tol=1e-12, maxiter=400)
    assert float(jnp.linalg.norm(h @ x2 - b)) < 1e-7


def test_complex_first_and_second_derivatives():
    n = 36
    h0, h1 = _herm(n, 4), _herm(n, 5)

    def e0(g):
        op = MatrixFreeOperator(lambda gg, x: h0 @ x + gg * (h1 @ x),
                                g, dim=n, dtype=h0.dtype)
        lam, _ = dominant_eigh(op, k=n, extreme="min", tol=1e-12)
        return lam

    g0 = jnp.float64(0.3)
    grad = jax.jit(jax.grad(e0))(g0)
    d2 = jax.jit(jax.grad(jax.grad(e0)))(g0)

    evals, evecs = np.linalg.eigh(np.asarray(h0 + 0.3 * h1))
    v0 = evecs[:, 0]
    de_exact = np.real(v0.conj() @ (np.asarray(h1) @ v0))
    me = evecs[:, 1:].conj().T @ (np.asarray(h1) @ v0)
    d2_exact = 2 * np.sum(np.abs(me) ** 2 / (evals[0] - evals[1:]))
    np.testing.assert_allclose(grad, de_exact, rtol=1e-9)
    np.testing.assert_allclose(d2, d2_exact, rtol=1e-7)


def test_complex_eigenvector_gradient():
    """Gradient of an eigenvector functional |<w, v>|^2 — exercises the
    deflated-solve transpose (the conj-aware path) in reverse mode."""
    n = 30
    h0, h1 = _herm(n, 6), _herm(n, 7)
    w = jnp.asarray(np.random.default_rng(8).standard_normal(n)
                    + 1j * np.random.default_rng(9).standard_normal(n))

    def overlap(g):
        op = MatrixFreeOperator(lambda gg, x: h0 @ x + gg * (h1 @ x),
                                g, dim=n, dtype=h0.dtype)
        _, v = dominant_eigh(op, k=n, extreme="min", tol=1e-12)
        return jnp.abs(jnp.vdot(w, v)) ** 2

    g0 = jnp.float64(0.2)
    overlap = jax.jit(overlap)
    grad = jax.jit(jax.grad(overlap))(g0)
    eps = 1e-6
    num = (overlap(g0 + eps) - overlap(g0 - eps)) / (2 * eps)
    np.testing.assert_allclose(grad, num, rtol=1e-5)


def test_complex_multi():
    n, r = 40, 4
    h = _herm(n, 10)
    lams, v = dominant_eigh_multi(DenseOperator(h), r=r, k=n)
    evals = np.linalg.eigvalsh(np.asarray(h))
    np.testing.assert_allclose(lams, evals[:r], rtol=1e-10)
    gram = np.asarray(v.conj().T @ v)
    np.testing.assert_allclose(gram, np.eye(r), atol=1e-8)

    def loss(g):
        op = MatrixFreeOperator(lambda gg, x: h @ x + gg * x,
                                g, dim=n, dtype=h.dtype)
        lams, _ = dominant_eigh_multi(op, r=r, k=n)
        return jnp.sum(lams)

    grad = jax.grad(loss)(jnp.float64(0.0))
    np.testing.assert_allclose(grad, float(r), rtol=1e-10)  # shift by g*I


def test_complex_deflated_solve():
    n = 32
    h = _herm(n, 11)
    evals, evecs = np.linalg.eigh(np.asarray(h))
    lam, v = jnp.asarray(evals[0]), jnp.asarray(evecs[:, 0])
    b = jnp.asarray(np.random.default_rng(12).standard_normal(n)
                    + 1j * np.random.default_rng(13).standard_normal(n))
    x = solve_deflated(DenseOperator(h), lam, v, b, tol=1e-12)
    pb = b - v * jnp.vdot(v, b)
    res = (h @ x - lam * x) - pb
    assert float(jnp.linalg.norm(res)) < 1e-8
    assert abs(complex(jnp.vdot(v, x))) < 1e-10


def _cnonsym(n, rng, scale=0.05):
    """Complex non-symmetric matrix with an isolated dominant eigenvalue."""
    d = np.concatenate([[3.0 + 0.7j],
                        0.4 * (rng.standard_normal(n - 1)
                               + 1j * rng.standard_normal(n - 1))])
    return jnp.asarray(np.diag(d) + scale * (
        rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))))


def test_complex_nonsymmetric_dominant_eig():
    """dominant_eig on a complex NON-symmetric operator: complex dominant
    eigenvalue matches numpy, left/right residuals vanish, and the
    normalization is the BILINEAR l^T r = 1 (a conjugating pairing would
    silently change lambda and every tangent)."""
    from dominantsparseeigenad_tpu.ops.eig import dominant_eig

    n = 24
    rng = np.random.default_rng(20)
    a0 = _cnonsym(n, rng)
    lam, l, v = dominant_eig(a0, num_iters=1000, power_tol=1e-12)

    w = np.linalg.eigvals(np.asarray(a0))
    lam_np = w[np.argmax(np.abs(w))]
    np.testing.assert_allclose(complex(lam), lam_np, rtol=1e-9)
    assert np.linalg.norm(np.asarray(a0 @ v - lam * v)) < 1e-8
    assert np.linalg.norm(np.asarray(a0.T @ l - lam * l)) < 1e-7
    np.testing.assert_allclose(complex(jnp.sum(l * v)), 1.0, rtol=1e-9)


def test_complex_nonsymmetric_dominant_eig_grads():
    """Forward- and reverse-mode derivatives of complex non-symmetric
    dominant_eig vs finite differences.  Reverse mode runs the TRANSPOSE
    bordered system — regression for the amv/armv complex transpose
    mismatch (armv must be the exact bilinear transpose of amv)."""
    from dominantsparseeigenad_tpu.ops.eig import dominant_eig

    n = 20
    rng = np.random.default_rng(21)
    a0 = _cnonsym(n, rng)
    a1 = jnp.asarray(0.5 * (rng.standard_normal((n, n))
                            + 1j * rng.standard_normal((n, n))))
    wv = jnp.asarray(rng.standard_normal(n) + 1j * rng.standard_normal(n))

    def f_lam(t):
        lam, _, _ = dominant_eig(a0 + t * a1, num_iters=1000,
                                 power_tol=1e-12)
        return jnp.abs(lam) ** 2

    def f_vec(t):
        _, l, v = dominant_eig(a0 + t * a1, num_iters=1000,
                               power_tol=1e-12)
        return jnp.abs(jnp.sum(wv * v)) ** 2 + jnp.abs(jnp.sum(wv * l)) ** 2

    t0, eps = jnp.float64(0.0), 1e-6
    for f in (f_lam, f_vec):
        g_rev = jax.grad(f)(t0)
        _, g_fwd = jax.jvp(f, (t0,), (jnp.float64(1.0),))
        num = (f(t0 + eps) - f(t0 - eps)) / (2 * eps)
        np.testing.assert_allclose(g_fwd, num, rtol=2e-5)
        np.testing.assert_allclose(g_rev, num, rtol=2e-5)


def test_complex_nonsymmetric_cgnr_solver_grads():
    """solver='cgnr' must produce the same complex gradients as bicgstab:
    the normal equations require the Hermitian adjoint A^H A (CG on the
    complex-symmetric bilinear A^T A silently mis-solves)."""
    from dominantsparseeigenad_tpu.ops.eig import dominant_eig

    n = 20
    rng = np.random.default_rng(21)
    a0 = _cnonsym(n, rng)
    a1 = jnp.asarray(0.5 * (rng.standard_normal((n, n))
                            + 1j * rng.standard_normal((n, n))))
    wv = jnp.asarray(rng.standard_normal(n) + 1j * rng.standard_normal(n))

    def f(t, solver):
        _, l, v = dominant_eig(a0 + t * a1, num_iters=1000,
                               power_tol=1e-12, solver=solver)
        return jnp.abs(jnp.sum(wv * v)) ** 2 + jnp.abs(jnp.sum(wv * l)) ** 2

    t0, eps = jnp.float64(0.0), 1e-6
    num = (f(t0 + eps, "cgnr") - f(t0 - eps, "cgnr")) / (2 * eps)
    for mode in (jax.grad, lambda fn: lambda t: jax.jvp(
            fn, (t,), (jnp.float64(1.0),))[1]):
        g = mode(lambda t: f(t, "cgnr"))(t0)
        np.testing.assert_allclose(g, num, rtol=2e-4)


def test_complex_phase_sensitive_eigenvector_gradients():
    """Pivot-phase gauge tangents: gradients of PHASE-SENSITIVE
    functionals (Im/Re of individual components) must match FD for
    complex Hermitian operators — the raw IFT tangent satisfies the
    normalization constraint but not the forward's pivot-phase gauge
    (regression: 11% error before the _pivot_phase_project shift)."""
    from dominantsparseeigenad_tpu import (dominant_eigh,
                                           dominant_eigh_multi)

    rng = np.random.default_rng(4)
    n = 32
    h = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    a = (h + h.conj().T) / 2 + np.diag(np.arange(1.0, n + 1))
    pert = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    pert = (pert + pert.conj().T) / 2
    aj, pj = jnp.asarray(a), jnp.asarray(pert)

    def check(f, rtol=2e-5):
        f = jax.jit(f)
        g = float(jax.jit(jax.grad(f))(jnp.float64(0.0)))
        eps = 1e-5
        fd = (float(f(jnp.float64(eps)))
              - float(f(jnp.float64(-eps)))) / (2 * eps)
        np.testing.assert_allclose(g, fd, rtol=rtol)

    def f_single(t):
        _, v = dominant_eigh(DenseOperator(aj + t * pj), k=n,
                             extreme="min", tol=1e-12)
        return jnp.imag(v[5]) + jnp.real(v[3])

    def f_multi(t):
        _, v = dominant_eigh_multi(DenseOperator(aj + t * pj), r=2, k=n,
                                   tol=1e-12)
        return jnp.imag(v[5, 0]) + jnp.real(v[7, 1])

    check(f_single)
    check(f_multi)


def test_power_iteration_complex_pivot_gauge():
    """Regression (round-4 review): power_iteration used sign(pivot)
    instead of conj(sign(pivot)), leaving a complex pivot phase-DOUBLED
    instead of real positive — inconsistent with every other forward."""
    from dominantsparseeigenad_tpu import power_iteration

    n = 32
    h = _herm(n, 21) + jnp.diag(jnp.arange(1.0, n + 1))
    lam, v = power_iteration(DenseOperator(h), num_iters=800)
    evals = np.linalg.eigvalsh(np.asarray(h))
    np.testing.assert_allclose(float(jnp.real(lam)), evals[-1], rtol=1e-8)
    pivot = np.asarray(v)[np.argmax(np.abs(np.asarray(v)))]
    assert abs(pivot.imag) < 1e-9 and pivot.real > 0, pivot
