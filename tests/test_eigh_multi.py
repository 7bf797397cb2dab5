"""Block (top-r) dominant eigensolver, MINRES path, vmap batching and
check_grads-style order-2 validation — extensions over the reference's
one-pair-at-a-time API (SURVEY.md §7 hard part 2: clustered spectra).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

from dominantsparseeigenad_tpu import (
    DenseOperator, dominant_eigh, dominant_eigh_multi, minres,
    solve_deflated)
from dominantsparseeigenad_tpu.models import tfim_operator


def _sym(n, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n))
    return jnp.asarray((a + a.T) / 2)


def test_multi_values_match_full_eigh():
    n, r = 80, 5
    a = _sym(n)
    lams, v = dominant_eigh_multi(DenseOperator(a), r=r, k=n, extreme="min")
    evals, evecs = np.linalg.eigh(np.asarray(a))
    np.testing.assert_allclose(lams, evals[:r], rtol=1e-10)
    # Same subspace: |<v_i, u_i>| = 1 (simple spectrum for random a).
    overlaps = np.abs(np.einsum("ni,ni->i", np.asarray(v), evecs[:, :r]))
    np.testing.assert_allclose(overlaps, 1.0, atol=1e-8)

    lams_max, _ = dominant_eigh_multi(DenseOperator(a), r=3, k=n,
                                      extreme="max")
    np.testing.assert_allclose(lams_max, evals[-1:-4:-1], rtol=1e-10)


def test_multi_eigenvalue_gradients():
    n, r = 48, 4
    a = _sym(n, seed=1)

    def loss(a):
        lams, _ = dominant_eigh_multi(DenseOperator(a), r=r, k=n)
        return jnp.sum(jnp.arange(1.0, r + 1) * lams)

    g = jax.grad(loss)(a)
    evals, evecs = np.linalg.eigh(np.asarray(a))
    expected = sum((i + 1) * np.outer(evecs[:, i], evecs[:, i])
                   for i in range(r))
    np.testing.assert_allclose(g, expected, rtol=1e-7, atol=1e-10)


def test_multi_eigenvector_gradients_fd():
    n, r = 24, 3
    a = _sym(n, seed=2)

    def loss(a):
        lams, v = dominant_eigh_multi(DenseOperator(a), r=r, k=n,
                                      tol=1e-12)
        return jnp.sum(v ** 4) + jnp.sum(lams ** 2)

    loss = jax.jit(loss)
    g = jax.jit(jax.grad(loss))(a)
    eps = 1e-6
    rng = np.random.default_rng(3)
    for _ in range(3):
        i, j = rng.integers(0, n, 2)
        da = jnp.zeros_like(a).at[i, j].set(eps / 2).at[j, i].add(eps / 2)
        num = (loss(a + da) - loss(a - da)) / eps
        got = g[i, j] + (g[j, i] if i != j else 0.0)
        sym_fac = 1.0 if i == j else 1.0
        np.testing.assert_allclose(got * sym_fac, num, rtol=5e-4,
                                   atol=1e-8)


def test_multi_degenerate_block_finite():
    """Exact 2-fold degenerate lowest pair: invariants stay differentiable
    (subspace projector + eigenvalue sum), per the broadened in-block
    rule."""
    d = np.diag([1.0, 1.0, 2.0, 3.0, 4.0, 5.0])
    q, _ = np.linalg.qr(np.random.default_rng(4).standard_normal((6, 6)))
    a = jnp.asarray(q @ d @ q.T)

    def loss(a):
        lams, v = dominant_eigh_multi(DenseOperator(a), r=2, k=6)
        p = v @ v.T                       # projector: gauge-invariant
        return jnp.sum(lams) + jnp.sum(p * p)

    loss = jax.jit(loss)
    val, g = jax.jit(jax.value_and_grad(loss))(a)
    assert np.all(np.isfinite(np.asarray(g)))
    eps = 1e-6
    da = jnp.zeros_like(a).at[0, 0].set(eps)
    num = (loss(a + da) - loss(a - da)) / (2 * eps)
    np.testing.assert_allclose(g[0, 0], num, rtol=1e-4, atol=1e-7)


def test_check_grads_order2_dominant_eigh():
    """jax.test_util.check_grads to order 2 — the survey's load-bearing
    test technique (SURVEY.md §4), applied to the single-pair solver."""
    n = 24
    a = _sym(n, seed=5)

    def f(a):
        sym = (a + a.T) / 2
        lam, v = dominant_eigh(DenseOperator(sym), k=n, extreme="min",
                               tol=1e-13)
        return lam + jnp.sum(v ** 4)

    check_grads(jax.jit(f), (a,), order=2, modes=("fwd", "rev"), atol=1e-3,
                rtol=1e-3)


def test_vmap_batched_eigensolver():
    """Data-parallel batch of couplings through vmap — the reference loops
    in Python; here one vmapped program (SURVEY.md §2.5 table)."""
    n = 6
    gs = jnp.linspace(0.5, 1.5, 3)

    def e0(g):
        lam, _ = dominant_eigh(tfim_operator(n, g), k=1 << n,
                               extreme="min")
        return lam

    batched = jax.vmap(e0)(gs)
    single = jnp.stack([e0(g) for g in gs])
    np.testing.assert_allclose(batched, single, rtol=1e-10)

    dbatched = jax.vmap(jax.grad(e0))(gs)
    dsingle = jnp.stack([jax.grad(e0)(g) for g in gs])
    np.testing.assert_allclose(dbatched, dsingle, rtol=1e-8)


def test_minres_deflated_matches_cg():
    n = 50
    a = _sym(n, seed=6)
    evals, evecs = np.linalg.eigh(np.asarray(a))
    lam, v = jnp.asarray(evals[0]), jnp.asarray(evecs[:, 0])
    b = jnp.asarray(np.random.default_rng(7).standard_normal(n))
    x_cg = solve_deflated(DenseOperator(a), lam, v, b, definite_sign=1.0,
                          tol=1e-12)
    x_mr = solve_deflated(DenseOperator(a), lam, v, b, method="minres",
                          tol=1e-12)
    np.testing.assert_allclose(x_mr, x_cg, rtol=1e-8, atol=1e-10)

    # MINRES handles an *interior* shift where CG has no valid sign.
    lam_int, v_int = jnp.asarray(evals[3]), jnp.asarray(evecs[:, 3])
    x = solve_deflated(DenseOperator(a), lam_int, v_int, b,
                       method="minres", tol=1e-10)
    pb = b - v_int * jnp.vdot(v_int, b)
    res = (a @ x - lam_int * x) - pb
    assert float(jnp.linalg.norm(res) / jnp.linalg.norm(pb)) < 1e-7


def test_generic_observables():
    """ops.observables: fidelity susceptibility and energy curvature for
    arbitrary operator builders (generic versions of the reference's
    TFIM-script-only constructions)."""
    from dominantsparseeigenad_tpu import (energy_curvature,
                                           fidelity_susceptibility)
    from dominantsparseeigenad_tpu.models import (tfim_ed_observables,
                                                  tfim_operator)
    n, g = 8, 1.1
    chi = fidelity_susceptibility(lambda gg: tfim_operator(n, gg),
                                  jnp.float64(g), k=1 << n)
    e0_ed, de_ed, d2e_ed, chi_ed = tfim_ed_observables(n, g)
    np.testing.assert_allclose(chi, chi_ed, rtol=1e-7)

    e, d1, d2 = energy_curvature(lambda gg: tfim_operator(n, gg),
                                 jnp.float64(g), k=1 << n)
    np.testing.assert_allclose(e, e0_ed, rtol=1e-10)
    np.testing.assert_allclose(d1, de_ed, rtol=1e-9)
    np.testing.assert_allclose(d2, d2e_ed, rtol=1e-6)
