"""Preconditioner constructors (ops/precond.py).

The reference has no preconditioning (its CG.py is plain CG); the hooks
here accepted a user callable since round 2 but shipped no constructor.
These tests prove the shipped constructors (a) extract the structural
diagonal/blocks correctly from every format, (b) actually pay — >= 3x
CG-iteration reduction on an ill-conditioned family at equal accuracy —
and (c) stay SPD (the CG contract) even for indefinite shifted systems.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dominantsparseeigenad_tpu import (BellOperator, COOOperator,
                                       CSROperator, DenseOperator,
                                       block_jacobi_precond, cg_info,
                                       dominant_eigh, jacobi_precond,
                                       lobpcg_eigh, operator_diagonal)
from dominantsparseeigenad_tpu.ops.operators import (ScaledOperator,
                                                     ShiftedOperator,
                                                     SumOperator)


def _ill_conditioned_spd(rng, n, cond=1e4, coupling=0.05):
    """Diagonally dominant SPD with condition number ~``cond``: the
    conditioning lives on the diagonal (log-uniform 1..cond), where
    Jacobi can see it."""
    d = np.exp(rng.uniform(0.0, np.log(cond), n))
    d[0], d[-1] = 1.0, cond               # pin the extremes
    s = rng.standard_normal((n, n)) * coupling
    a = np.diag(d) + (s + s.T) / 2
    # keep SPD: shift up by any negative slack
    w = np.linalg.eigvalsh(a)
    if w[0] <= 0.5:
        a += (0.5 - w[0]) * np.eye(n)
    return a


def test_operator_diagonal_formats():
    """Structural diagonal parity across every shipped format and the
    shift/scale/sum composites."""
    rng = np.random.default_rng(0)
    n = 64
    a_np = rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.3)
    a_np = (a_np + a_np.T) / 2
    np.fill_diagonal(a_np, rng.standard_normal(n))
    want = np.diagonal(a_np)

    dense = DenseOperator(jnp.asarray(a_np))
    rows, cols = np.nonzero(a_np)
    coo = COOOperator(jnp.asarray(rows, jnp.int32),
                      jnp.asarray(cols, jnp.int32),
                      jnp.asarray(a_np[rows, cols]), n)
    import scipy.sparse as sp
    csr_np = sp.csr_matrix(a_np)
    csr = CSROperator(jnp.asarray(csr_np.indptr, jnp.int32),
                      jnp.asarray(csr_np.indices, jnp.int32),
                      jnp.asarray(csr_np.data), n)
    bell = BellOperator.from_dense(a_np, bs=16, symmetric=True,
                                   use_pallas=False)
    for name, op in [("dense", dense), ("coo", coo), ("csr", csr),
                     ("bell", bell)]:
        np.testing.assert_allclose(np.asarray(operator_diagonal(op)),
                                   want, rtol=1e-12, err_msg=name)
    # ShiftedOperator is A - shift*I; assert against the operator's OWN
    # matvec on basis vectors, not a hand-derived formula (the round-5
    # review caught the first version of this test locking in a sign
    # error instead of catching it).
    shifted = ShiftedOperator(dense, jnp.float64(2.5))
    got = np.asarray(operator_diagonal(shifted))
    np.testing.assert_allclose(got, want - 2.5, rtol=1e-12)
    probe = np.asarray(shifted.matvec(jnp.eye(n, dtype=jnp.float64)[0]))
    np.testing.assert_allclose(got[0], probe[0], rtol=1e-12)
    scaled = ScaledOperator(dense, jnp.float64(-3.0))
    np.testing.assert_allclose(np.asarray(operator_diagonal(scaled)),
                               -3.0 * want, rtol=1e-12)
    summed = SumOperator(dense, scaled)
    np.testing.assert_allclose(np.asarray(operator_diagonal(summed)),
                               want - 3.0 * want, rtol=1e-12, atol=1e-12)


def test_operator_diagonal_matrix_free_raises():
    from dominantsparseeigenad_tpu import MatrixFreeOperator
    op = MatrixFreeOperator(lambda p, x: p * x, jnp.float64(2.0), dim=8,
                            dtype=jnp.float64)
    with pytest.raises(TypeError, match="diag"):
        operator_diagonal(op)


def test_jacobi_pays_3x_on_ill_conditioned_cg():
    """The VERDICT bar: >= 3x CG-iteration reduction at equal accuracy
    on a condition-1e4 diagonally dominant family (3 seeds)."""
    n = 256
    for seed in range(3):
        rng = np.random.default_rng(100 + seed)
        a_np = _ill_conditioned_spd(rng, n)
        a = jnp.asarray(a_np)
        b = jnp.asarray(rng.standard_normal(n))
        mv = lambda x: a @ x
        x0, it0, res0 = cg_info(mv, b, tol=1e-10, maxiter=20 * n)
        m = jacobi_precond(DenseOperator(a))
        x1, it1, res1 = cg_info(mv, b, tol=1e-10, maxiter=20 * n,
                                precond=m)
        # Equal accuracy: both converged to the same true residual bar.
        assert float(res0) < 1e-9 and float(res1) < 1e-9, \
            f"seed {seed}: res {float(res0):.2e}/{float(res1):.2e}"
        np.testing.assert_allclose(np.asarray(x1),
                                   np.linalg.solve(a_np, np.asarray(b)),
                                   rtol=1e-6, atol=1e-8)
        assert int(it1) * 3 <= int(it0), \
            f"seed {seed}: {int(it0)} -> {int(it1)} iters (< 3x)"


def test_block_jacobi_beats_jacobi_on_block_structure():
    """Ill-conditioning INSIDE (bs, bs) diagonal blocks: plain Jacobi
    can't see it, block-Jacobi folds it away entirely."""
    n, bs = 256, 16
    nb = n // bs
    rng = np.random.default_rng(7)
    blocks = []
    for i in range(nb):
        q, _ = np.linalg.qr(rng.standard_normal((bs, bs)))
        # in-block spectrum spans 3 decades; diagonal entries of the
        # rotated block are all O(mean) — invisible to plain Jacobi.
        w = np.exp(rng.uniform(0.0, np.log(1e3), bs))
        blocks.append(q @ np.diag(w) @ q.T)
    import scipy.linalg as sla
    a_np = sla.block_diag(*blocks)
    s = rng.standard_normal((n, n)) * 0.02
    a_np = a_np + (s + s.T) / 2
    w_all = np.linalg.eigvalsh(a_np)
    if w_all[0] <= 0.1:
        a_np += (0.1 - w_all[0]) * np.eye(n)
    a = jnp.asarray(a_np)
    b = jnp.asarray(rng.standard_normal(n))
    mv = lambda x: a @ x

    mj = jacobi_precond(DenseOperator(a))
    mb = block_jacobi_precond(DenseOperator(a), bs=bs)
    _, it_j, res_j = cg_info(mv, b, tol=1e-10, maxiter=20 * n, precond=mj)
    xb_, it_b, res_b = cg_info(mv, b, tol=1e-10, maxiter=20 * n,
                               precond=mb)
    assert float(res_b) < 1e-9
    np.testing.assert_allclose(np.asarray(xb_),
                               np.linalg.solve(a_np, np.asarray(b)),
                               rtol=1e-6, atol=1e-8)
    assert int(it_b) * 3 <= int(it_j), \
        f"block {int(it_b)} vs jacobi {int(it_j)} (< 3x)"

    # BELL extraction gives the same preconditioner as the dense path.
    bell = BellOperator.from_dense(a_np, bs=bs, symmetric=True,
                                   use_pallas=False)
    mb2 = block_jacobi_precond(bell)
    r = jnp.asarray(rng.standard_normal(n))
    np.testing.assert_allclose(np.asarray(mb(r)), np.asarray(mb2(r)),
                               rtol=1e-10)


def test_precond_spd_under_indefinite_shift():
    """A - shift indefinite: both constructors must still produce a
    symmetric POSITIVE definite M^{-1} (the CG contract)."""
    n, bs = 48, 8
    rng = np.random.default_rng(3)
    a_np = _ill_conditioned_spd(rng, n, cond=100)
    shift = float(np.median(np.diagonal(a_np)))    # lands mid-spectrum
    for m in [jacobi_precond(DenseOperator(jnp.asarray(a_np)),
                             shift=shift),
              block_jacobi_precond(DenseOperator(jnp.asarray(a_np)),
                                   bs=bs, shift=shift)]:
        mat = np.asarray(m(jnp.eye(n, dtype=jnp.float64)))
        np.testing.assert_allclose(mat, mat.T, atol=1e-12)
        assert np.linalg.eigvalsh(mat)[0] > 0


def test_lobpcg_iteration_reduction():
    """The library constructor cuts LOBPCG iterations on the
    ill-conditioned family (same convergence target)."""
    n = 256
    rng = np.random.default_rng(11)
    a_np = _ill_conditioned_spd(rng, n)
    op = DenseOperator(jnp.asarray(a_np))
    m = jacobi_precond(op)
    lams0, _, i0 = lobpcg_eigh(op, 2, tol=1e-9, maxiter=600,
                               with_info=True)
    lams1, _, i1 = lobpcg_eigh(op, 2, tol=1e-9, maxiter=600, precond=m,
                               with_info=True)
    w = np.linalg.eigvalsh(a_np)[:2]
    np.testing.assert_allclose(np.asarray(lams1), w, rtol=1e-7)
    assert float(i1.converged) == 1.0
    assert int(i1.iterations) * 2 <= int(i0.iterations), \
        f"{int(i0.iterations)} -> {int(i1.iterations)}"


def test_dominant_eigh_precond_grad_parity():
    """Preconditioning the derivative solves must not CHANGE the
    derivative: value+grad parity with the unpreconditioned path, and
    FD agreement (the precondition is exact math, not an approximation
    of the solution)."""
    n = 96
    rng = np.random.default_rng(5)
    a_np = _ill_conditioned_spd(rng, n, cond=1e3)
    da_np = rng.standard_normal((n, n))
    da_np = (da_np + da_np.T) / 2
    a, da = jnp.asarray(a_np), jnp.asarray(da_np)
    m = jacobi_precond(DenseOperator(a))

    def lam_with(precond):
        def f(t):
            return dominant_eigh(DenseOperator(a + t * da), k=n,
                                 extreme="min", tol=1e-11,
                                 precond=precond)[0]
        return jax.jvp(f, (jnp.float64(0.0),), (jnp.float64(1.0),))

    (v0, g0) = lam_with(None)
    (v1, g1) = lam_with(m)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-10)
    np.testing.assert_allclose(float(g1), float(g0), rtol=1e-8)
    eps = 1e-6
    num = (np.linalg.eigvalsh(a_np + eps * da_np)[0]
           - np.linalg.eigvalsh(a_np - eps * da_np)[0]) / (2 * eps)
    np.testing.assert_allclose(float(g1), num, rtol=1e-6, atol=1e-8)


def test_precond_zero_diagonal_degrades_to_identity():
    """A purely off-diagonal operator has nothing for Jacobi to use —
    both constructors must degrade to the identity, not inf/NaN."""
    n = 8
    a = jnp.ones((n, n)) - jnp.eye(n)  # zero diagonal
    r = jnp.arange(1.0, n + 1.0)
    for m in [jacobi_precond(DenseOperator(a)),
              block_jacobi_precond(DenseOperator(a * 0.0), bs=4)]:
        z = np.asarray(m(r))
        assert np.all(np.isfinite(z))
        np.testing.assert_allclose(z, np.asarray(r), rtol=1e-12)


def test_preconditioned_minres_indefinite():
    """Preconditioned MINRES (round-5 completion of the precond story —
    the slicing/interior derivative solves run MINRES, not CG): on an
    ill-conditioned INDEFINITE diagonally dominated system the Jacobi
    preconditioner must (a) leave the converged solution unchanged and
    (b) reach a far smaller true residual under a tight iteration cap."""
    from dominantsparseeigenad_tpu import minres

    n = 256
    rng = np.random.default_rng(17)
    d = np.exp(rng.uniform(0, np.log(1e4), n))
    d[: n // 2] *= -1.0                     # indefinite
    s = rng.standard_normal((n, n)) * 0.05
    a_np = np.diag(d) + (s + s.T) / 2
    a = jnp.asarray(a_np)
    b = jnp.asarray(rng.standard_normal(n))
    mv = lambda x: a @ x
    m = jacobi_precond(diag=jnp.asarray(np.abs(d)))

    x_ref = np.linalg.solve(a_np, np.asarray(b))
    x_p = minres(mv, b, tol=1e-12, maxiter=20 * n, precond=m)
    np.testing.assert_allclose(np.asarray(x_p), x_ref, rtol=1e-6,
                               atol=1e-8)

    cap = 60
    r_plain = np.linalg.norm(
        np.asarray(b - mv(minres(mv, b, tol=1e-12, maxiter=cap))))
    r_prec = np.linalg.norm(
        np.asarray(b - mv(minres(mv, b, tol=1e-12, maxiter=cap,
                                 precond=m))))
    assert r_prec * 10 <= r_plain, (r_plain, r_prec)


def test_preconditioned_minres_reduces_to_plain():
    """precond=None and precond=identity must produce the same iterates
    (the preconditioned recurrence with M=I IS the plain recurrence)."""
    from dominantsparseeigenad_tpu import minres

    n = 64
    rng = np.random.default_rng(19)
    a_np = rng.standard_normal((n, n))
    a_np = (a_np + a_np.T) / 2              # indefinite generic
    a = jnp.asarray(a_np)
    b = jnp.asarray(rng.standard_normal(n))
    mv = lambda x: a @ x
    x0 = minres(mv, b, tol=1e-10, maxiter=40)   # NOT converged: iterates
    x1 = minres(mv, b, tol=1e-10, maxiter=40, precond=lambda r: r)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x1),
                               rtol=1e-12, atol=1e-13)


def test_solve_deflated_minres_precond():
    """Deflated MINRES with the projected preconditioner: same solution
    as unpreconditioned (both converge), exactly V-orthogonal."""
    from dominantsparseeigenad_tpu import solve_deflated

    n = 96
    rng = np.random.default_rng(23)
    a_np = _ill_conditioned_spd(rng, n, cond=1e3)
    a = jnp.asarray(a_np)
    w, vec = np.linalg.eigh(a_np)
    j = n // 2                              # interior eigenvalue
    lam = jnp.float64(w[j])
    v = jnp.asarray(vec[:, j])
    b = jnp.asarray(rng.standard_normal(n))
    m = jacobi_precond(DenseOperator(a), shift=float(lam))
    x0 = solve_deflated(a, lam, v, b, method="minres", tol=1e-11,
                        maxiter=5000)
    x1 = solve_deflated(a, lam, v, b, method="minres", tol=1e-11,
                        maxiter=5000, precond=m)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x0),
                               rtol=1e-6, atol=1e-8)
    assert abs(float(jnp.vdot(v, x1))) < 1e-10


def test_interior_eigh_precond():
    """interior_eigh(precond=...): value/vector parity with the plain
    path and an FD-checked directional derivative through the
    preconditioned solves."""
    from dominantsparseeigenad_tpu import interior_eigh, jacobi_precond

    n = 64
    rng = np.random.default_rng(29)
    d = np.exp(rng.uniform(0, np.log(300), n))
    s = rng.standard_normal((n, n)) * 0.05
    a_np = np.diag(d) + (s + s.T) / 2
    a = jnp.asarray(a_np)
    w = np.linalg.eigvalsh(a_np)
    sigma = float(0.5 * (w[n // 2] + w[n // 2 + 1]) + 0.3 * (
        w[n // 2] - 0.5 * (w[n // 2] + w[n // 2 + 1])))
    m = jacobi_precond(diag=jnp.asarray(d), shift=sigma)

    lam0, v0 = interior_eigh(a, sigma, k=40, inner_tol=1e-12,
                             inner_maxiter=4000, tol=1e-10)
    lam1, v1 = interior_eigh(a, sigma, k=40, inner_tol=1e-12,
                             inner_maxiter=4000, tol=1e-10, precond=m)
    want = w[np.argmin(np.abs(w - sigma))]
    np.testing.assert_allclose(float(lam1), want, rtol=1e-9)
    np.testing.assert_allclose(float(lam1), float(lam0), rtol=1e-9)
    np.testing.assert_allclose(np.abs(np.asarray(v1)),
                               np.abs(np.asarray(v0)), atol=1e-6)

    da_np = rng.standard_normal((n, n))
    da_np = (da_np + da_np.T) / 2
    _, g = jax.jvp(lambda mat: interior_eigh(
        mat, sigma, k=40, inner_tol=1e-12, inner_maxiter=4000,
        tol=1e-10, precond=m)[0], (a,), (jnp.asarray(da_np),))
    eps = 1e-7

    def lam_at(mat):
        ww = np.linalg.eigvalsh(mat)
        return ww[np.argmin(np.abs(ww - sigma))]

    num = (lam_at(a_np + eps * da_np) - lam_at(a_np - eps * da_np)) \
        / (2 * eps)
    np.testing.assert_allclose(float(g), num, rtol=1e-5, atol=1e-7)


def test_spectral_slice_solve_precond():
    """spectral_slice(solve_precond=...): derivative parity with the
    unpreconditioned path and FD agreement — the last MINRES consumer
    wired to the constructors."""
    from dominantsparseeigenad_tpu import spectral_slice

    n, r = 48, 3
    rng = np.random.default_rng(41)
    d = np.sort(np.concatenate([np.linspace(-0.4, 0.4, r),
                                rng.uniform(0.7, 30.0, (n - r) // 2),
                                -rng.uniform(0.7, 30.0,
                                             n - r - (n - r) // 2)]))
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    a_np = q @ np.diag(d) @ q.T
    a = jnp.asarray(a_np)
    da_np = rng.standard_normal((n, n))
    da_np = (da_np + da_np.T) / 2
    da = jnp.asarray(da_np)
    m = jacobi_precond(DenseOperator(a), shift=0.0)

    def s_with(precond):
        def f(t):
            lams, _, _ = spectral_slice(a + t * da, -0.5, 0.5, r=r,
                                        degree=90, maxiter=200, tol=1e-9,
                                        solve_precond=precond)
            return jnp.sum(lams)
        return jax.jvp(f, (jnp.float64(0.0),), (jnp.float64(1.0),))

    (v0, g0) = s_with(None)
    (v1, g1) = s_with(m)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-9)
    np.testing.assert_allclose(float(g1), float(g0), rtol=1e-7)
    eps = 1e-6

    def s_at(mat):
        w = np.linalg.eigvalsh(mat)
        return w[(w >= -0.5) & (w <= 0.5)].sum()

    num = (s_at(a_np + eps * da_np) - s_at(a_np - eps * da_np)) / (2 * eps)
    np.testing.assert_allclose(float(g1), num, rtol=1e-6, atol=1e-8)
