"""Convergence guards and early-exit observability (VERDICT r1 #3).

The reference hits maxiter / runs a too-small k silently; this framework
reports effective k + Ritz residual and can turn non-convergence into a
checkify error.  The load-bearing test: a deliberately under-converged
solve is *flagged*, not silent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import checkify

from dominantsparseeigenad_tpu import (
    DenseOperator, dominant_eigh, lanczos_adaptive)
from dominantsparseeigenad_tpu.models import tfim_dense_hamiltonian
from dominantsparseeigenad_tpu.ops.cg import solve_deflated_info
from dominantsparseeigenad_tpu.utils import (
    assert_converged, assert_converged_residual)


@pytest.fixture(scope="module")
def tfim_h():
    return tfim_dense_hamiltonian(8, 1.0)  # dim 256


def test_adaptive_early_exit_matches_full(tfim_h):
    e = np.linalg.eigvalsh(np.asarray(tfim_h))
    lam, v, info = jax.jit(
        lambda m: lanczos_adaptive(DenseOperator(m), 120, extreme="min",
                                   tol=1e-10))(tfim_h)
    assert float(info.converged) == 1.0
    # Early exit actually fired: far fewer steps than the k budget.
    assert float(info.effective_k) < 80
    np.testing.assert_allclose(lam, e[0], rtol=1e-12)
    resid = np.linalg.norm(tfim_h @ v - lam * v)
    assert resid < 1e-7


def test_adaptive_max_extreme(tfim_h):
    e = np.linalg.eigvalsh(np.asarray(tfim_h))
    lam, v, info = lanczos_adaptive(DenseOperator(tfim_h), 120,
                                    extreme="max", tol=1e-10)
    assert float(info.converged) == 1.0
    np.testing.assert_allclose(lam, e[-1], rtol=1e-12)


def test_underconverged_is_flagged(tfim_h):
    _, _, info = lanczos_adaptive(DenseOperator(tfim_h), 6, extreme="min",
                                  tol=1e-10)
    assert float(info.converged) == 0.0
    assert float(info.residual) > 1e-10
    assert float(info.effective_k) == 6


def test_dominant_eigh_with_info_true_residual(tfim_h):
    """with_info (no early exit) reports the TRUE Ritz residual."""
    lam, v, info = dominant_eigh(DenseOperator(tfim_h), k=40,
                                 extreme="min", with_info=True)
    true_res = float(np.linalg.norm(tfim_h @ v - lam * v) / abs(lam))
    np.testing.assert_allclose(float(info.residual), true_res, rtol=1e-6)
    assert float(info.converged) == 1.0

    # Under-converged variant is flagged.
    _, _, bad = dominant_eigh(DenseOperator(tfim_h), k=5, extreme="min",
                              with_info=True)
    assert float(bad.converged) == 0.0


def test_dominant_eigh_early_exit_gradient(tfim_h):
    """Gradients are unchanged by the early-exit forward (IFT rule only
    needs the converged pair), including through jit."""

    def e0(g, **kw):
        h = tfim_dense_hamiltonian(8, g)
        return dominant_eigh(DenseOperator(h), k=100, extreme="min",
                             tol=1e-10, **kw)[0]

    g0 = jnp.float64(1.0)
    ref_val, ref_grad = jax.value_and_grad(e0)(g0)
    val, grad = jax.jit(jax.value_and_grad(
        lambda g: e0(g, early_exit_tol=1e-11)))(g0)
    np.testing.assert_allclose(val, ref_val, rtol=1e-11)
    np.testing.assert_allclose(grad, ref_grad, rtol=1e-8)


def test_with_info_zero_tangents(tfim_h):
    """info rides through jvp with zero tangents (second order safe)."""

    def f(g):
        h = tfim_dense_hamiltonian(8, g)
        lam, v, info = dominant_eigh(DenseOperator(h), k=60,
                                     extreme="min", with_info=True,
                                     early_exit_tol=1e-11)
        return lam, info

    (lam, info), (dlam, dinfo) = jax.jvp(f, (jnp.float64(1.0),),
                                         (jnp.float64(1.0),))
    assert float(dinfo.residual) == 0.0
    assert float(dlam) != 0.0


def test_checkify_guard_raises(tfim_h):
    def solve(m):
        lam, v, info = dominant_eigh(DenseOperator(m), k=5, extreme="min",
                                     with_info=True)
        assert_converged(info)
        return lam

    err, lam = checkify.checkify(solve)(tfim_h)
    with pytest.raises(Exception, match="did not converge"):
        err.throw()

    # And the converged case passes clean.
    def solve_ok(m):
        lam, v, info = dominant_eigh(DenseOperator(m), k=60,
                                     extreme="min", with_info=True)
        assert_converged(info)
        return lam

    err, lam = checkify.checkify(solve_ok)(tfim_h)
    err.throw()  # no-op


def test_solve_deflated_info_maxiter_hit(tfim_h):
    """A CG starved of iterations reports a residual above tol instead of
    silently returning garbage."""
    e, vecs = np.linalg.eigh(np.asarray(tfim_h))
    lam, v = jnp.asarray(e[0]), jnp.asarray(vecs[:, 0])
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(tfim_h.shape[0]))

    x, iters, resid = solve_deflated_info(DenseOperator(tfim_h), lam, v, b,
                                          tol=1e-12, maxiter=3)
    assert int(iters) == 3
    assert float(resid) > 1e-12

    err, _ = checkify.checkify(
        lambda r: assert_converged_residual(r, 1e-12))(resid)
    with pytest.raises(Exception, match="above tolerance"):
        err.throw()

    # Full budget converges and reports so.
    x, iters, resid = solve_deflated_info(DenseOperator(tfim_h), lam, v, b,
                                          tol=1e-10)
    assert float(resid) <= 1e-9
    rec = tfim_h @ x - lam * x
    proj_b = b - v * jnp.vdot(v, b)
    np.testing.assert_allclose(rec, proj_b, atol=1e-7)


def test_f32_tolerance_floor_reports_converged():
    """The f64-appropriate default tolerances are below f32 machine eps;
    the dtype-aware floor must keep early exit live and report
    converged=1 on fully converged f32 runs (TPU's working precision)."""
    from dominantsparseeigenad_tpu.ops.eig import dominant_eig

    n = 32
    rng = np.random.default_rng(50)
    a32 = jnp.asarray(rng.random((n, n)) + 0.1, jnp.float32)
    lam, l, r, info = dominant_eig(a32, num_iters=500, with_info=True)
    assert float(info.converged) == 1.0
    assert float(info.iterations) < 200

    h = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    h = (h + h.T) / 2
    lam2, v2, info2 = dominant_eigh(DenseOperator(h), k=n, extreme="min",
                                    with_info=True)
    assert float(info2.converged) == 1.0
