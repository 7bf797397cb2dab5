"""2D classical Ising tests: TRG and CTMRG free energy vs Onsager's exact
solution, derivatives through the truncated decompositions (energy,
specific heat), the degeneracy-safe eigh/svd rules, and the non-symmetric
transfer-matrix eigensolver — reference ``examples/CTMRG`` application
(SURVEY.md §2.2 A3, BASELINE config #4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dominantsparseeigenad_tpu import eigh_safe, svd_safe
from dominantsparseeigenad_tpu.models import (
    ctmrg_environment, ctmrg_free_energy, ising_observables,
    ising_vertex_tensor, onsager_free_energy, transfer_spectral_gap,
    trg_free_energy)

BETA_C = float(np.log(1 + np.sqrt(2)) / 2)


# ---------------------------------------------------------------------------
# decomp rules
# ---------------------------------------------------------------------------

def test_eigh_safe_matches_fd():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((8, 8))
    a = jnp.asarray((a + a.T) / 2)

    def f(a):
        w, v = eigh_safe(a)
        return jnp.sum(w ** 2) + jnp.sum(v[:, -1] ** 4)

    g = jax.grad(f)(a)
    eps = 1e-6
    for i, j in [(0, 0), (2, 5), (7, 1)]:
        da = jnp.zeros_like(a).at[i, j].set(eps).at[j, i].add(
            eps if i != j else 0.0)
        num = (f(a + da / 2) - f(a - da / 2)) / eps
        got = g[i, j] + (g[j, i] if i != j else 0.0)
        np.testing.assert_allclose(got, num, rtol=1e-5, atol=1e-8)


def test_eigh_safe_degenerate_is_finite():
    # Exact multiplet: gradient of an invariant (sum of the degenerate
    # eigenvalues) must be finite and correct, where plain eigh NaNs.
    a = jnp.asarray(np.diag([1.0, 1.0, 2.0]))

    def f(a):
        w, v = eigh_safe(a)
        return w[0] + w[1]

    g = jax.grad(f)(a)
    assert np.all(np.isfinite(g))
    np.testing.assert_allclose(g, np.diag([1.0, 1.0, 0.0]), atol=1e-8)


def test_svd_safe_matches_fd():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((7, 7)))

    def f(a):
        u, s, vt = svd_safe(a)
        return jnp.sum(s ** 1.5) + jnp.sum((u[:, 0] + vt[0]) ** 4)

    g = jax.grad(f)(a)
    eps = 1e-6
    for i, j in [(0, 0), (3, 5), (6, 2)]:
        da = jnp.zeros_like(a).at[i, j].set(eps)
        num = (f(a + da / 2) - f(a - da / 2)) / eps
        np.testing.assert_allclose(g[i, j], num, rtol=1e-5, atol=1e-8)


def test_svd_safe_reconstruction():
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.standard_normal((12, 12)))
    u, s, vt = svd_safe(a)
    np.testing.assert_allclose(u @ jnp.diag(s) @ vt, a, rtol=1e-10,
                               atol=1e-12)
    assert bool(jnp.all(jnp.diff(s) <= 1e-12))  # descending


def test_svd_safe_truncated_forward_and_grad():
    """Randomized-sketch truncated SVD: top-r values/vectors match the
    dense SVD on a decaying spectrum; first derivative matches FD; second
    derivative is finite and close to the full-rule value."""
    from dominantsparseeigenad_tpu.ops.decomp import svd_safe_truncated
    rng = np.random.default_rng(5)
    n, r = 60, 8
    q1, _ = np.linalg.qr(rng.standard_normal((n, n)))
    q2, _ = np.linalg.qr(rng.standard_normal((n, 40)))
    s_true = np.exp(-0.4 * np.arange(40))
    a0 = jnp.asarray(q1[:, :40] * s_true[None, :] @ q2.T)   # (n, 40) rect

    u, s, vt = svd_safe_truncated(a0, r)
    np.testing.assert_allclose(s, s_true[:r], rtol=1e-10)
    su, sv, svt = np.linalg.svd(np.asarray(a0), full_matrices=False)
    # column spans match up to sign
    np.testing.assert_allclose(np.abs(np.einsum("ni,ni->i", su[:, :r], u)),
                               np.ones(r), rtol=1e-8)

    def f(x):
        u, s, vt = svd_safe_truncated(a0 * x + 1e-3 * x * x * jnp.ones_like(a0), r)
        sq = jnp.sqrt(s)
        return jnp.sum(((u * sq[None]) @ (sq[:, None] * vt)) ** 3)

    f = jax.jit(f)
    x = jnp.float64(1.0)
    d1 = float(jax.jit(jax.grad(f))(x))
    h = 1e-5
    fd = (float(f(x + h)) - float(f(x - h))) / (2 * h)
    np.testing.assert_allclose(d1, fd, rtol=1e-6)
    d2 = float(jax.jit(jax.grad(jax.grad(f)))(x))
    assert np.isfinite(d2)


def test_trg_split_methods_agree():
    """The f32/TPU tier (subspace sketch) must track the f64 gram split
    in value and first derivative."""
    b = jnp.float64(0.44)
    vals = {}
    for method in ("gram", "subspace"):
        f = lambda bb: trg_free_energy(bb, chi=12, n_steps=12,
                                       split_method=method)
        vals[method] = jax.jit(
            lambda bb: jax.jvp(f, (bb,), (jnp.float64(1.0),)))(b)
    np.testing.assert_allclose(vals["subspace"][0], vals["gram"][0],
                               rtol=1e-9)
    np.testing.assert_allclose(vals["subspace"][1], vals["gram"][1],
                               rtol=1e-4)


# ---------------------------------------------------------------------------
# free energy vs Onsager
# ---------------------------------------------------------------------------

def test_onsager_anchors():
    # beta -> 0: lnZ/N -> ln 2; at beta_c: ln(2)/2 + 2G/pi.
    np.testing.assert_allclose(onsager_free_energy(1e-9), np.log(2),
                               rtol=1e-8)
    # At beta_c the integrand has a log singularity, so Gauss-Legendre
    # converges slowly there — use a fine grid and a looser tolerance.
    catalan = 0.915965594177219015
    np.testing.assert_allclose(
        onsager_free_energy(BETA_C, n_quad=512),
        np.log(2) / 2 + 2 * catalan / np.pi, rtol=2e-5)


# Off-critical converges fast in chi (cost scales ~chi^6, so the small
# configs carry most of the coverage cheaply); the critical point needs
# the larger window.
@pytest.mark.parametrize("beta,chi,n_steps,rtol", [
    (0.3, 14, 16, 5e-5),
    (BETA_C, 20, 18, 2e-5),
    (0.6, 14, 16, 5e-5),
])
def test_trg_free_energy(beta, chi, n_steps, rtol):
    exact = onsager_free_energy(beta, n_quad=128)
    got = jax.jit(lambda bb: trg_free_energy(
        bb, chi=chi, n_steps=n_steps))(jnp.float64(beta))
    np.testing.assert_allclose(got, exact, rtol=rtol)


@pytest.mark.parametrize("beta", [0.35, 0.55])
def test_ctmrg_free_energy(beta):
    exact = onsager_free_energy(beta, n_quad=128)
    got = jax.jit(lambda bb: ctmrg_free_energy(
        bb, chi=16, n_steps=30))(jnp.float64(beta))
    np.testing.assert_allclose(got, exact, rtol=1e-9)


def test_observables_through_trg():
    """Energy (1st derivative) and specific heat (2nd) through the TRG
    flow — the reference's flagship double-backward application."""
    b = 0.5
    lnz, u, cv = jax.jit(lambda bb: ising_observables(
        bb, method="trg", chi=12, n_steps=14))(jnp.float64(b))
    ex = lambda bb: onsager_free_energy(bb, n_quad=128)
    u_ex = -jax.grad(ex)(jnp.float64(b))
    cv_ex = b * b * jax.grad(jax.grad(ex))(jnp.float64(b))
    np.testing.assert_allclose(u, u_ex, rtol=1e-4)
    np.testing.assert_allclose(cv, cv_ex, rtol=1e-3)


def test_observables_through_ctmrg():
    b = 0.5
    lnz, u, cv = jax.jit(lambda bb: ising_observables(
        bb, method="ctmrg", chi=16, n_steps=25))(jnp.float64(b))
    ex = lambda bb: onsager_free_energy(bb, n_quad=128)
    np.testing.assert_allclose(lnz, ex(b), rtol=1e-5)
    np.testing.assert_allclose(u, -jax.grad(ex)(jnp.float64(b)), rtol=1e-4)
    # The 2nd derivative converges slowest in chi/n_steps; chi=16 sits at
    # ~0.5% (chi=24, n_steps=30 reaches ~8e-4 — kept smaller for runtime).
    np.testing.assert_allclose(
        cv, b * b * jax.grad(jax.grad(ex))(jnp.float64(b)), rtol=1e-2)


def test_ctmrg_solver_tiers_agree():
    """The default CTMRG now renormalizes with the framework's OWN
    truncated solver (eigh_safe_truncated); the opt-in block-Lanczos tier
    (dominant_eigh_multi) and the full-decomposition oracle must agree in
    value and first derivative (VERDICT r1 missing #2)."""
    b = 0.45
    full, trunc, lancz = jax.jit(lambda bb: (
        ctmrg_free_energy(bb, chi=8, n_steps=12, eigh_solver="full"),
        ctmrg_free_energy(bb, chi=8, n_steps=12),  # default: truncated
        ctmrg_free_energy(bb, chi=8, n_steps=12, eigh_solver="lanczos"),
    ))(jnp.float64(b))
    np.testing.assert_allclose(trunc, full, rtol=1e-12)
    np.testing.assert_allclose(lancz, full, rtol=1e-12)

    gfull = jax.jit(jax.grad(lambda bb: ctmrg_free_energy(
        bb, chi=8, n_steps=10, eigh_solver="full")))(jnp.float64(b))
    gtrunc = jax.jit(jax.grad(lambda bb: ctmrg_free_energy(
        bb, chi=8, n_steps=10)))(jnp.float64(b))
    glancz = jax.jit(jax.grad(lambda bb: ctmrg_free_energy(
        bb, chi=8, n_steps=10, eigh_solver="lanczos")))(jnp.float64(b))
    np.testing.assert_allclose(gtrunc, gfull, rtol=1e-9)
    np.testing.assert_allclose(glancz, gfull, rtol=1e-7)


def test_transfer_gap_and_gradient():
    # beta < beta_c (disordered phase): the dominant transfer eigenvalue
    # is unique, the Perron-Frobenius setting dominant_eig assumes.  (In
    # the ordered phase the top pair is asymptotically degenerate —
    # symmetry-breaking sectors — and power iteration cannot split it.)
    b = 0.35
    f = jax.jit(lambda bb: transfer_spectral_gap(bb, chi=8, n_steps=12))
    lam, dlam = jax.value_and_grad(f)(jnp.float64(b))
    assert float(lam) > 0 and np.isfinite(float(dlam))
    # FD cross-check; eps can't be too small — the finite-chi environment
    # has tiny truncation-order kinks that make 1e-6-scale FD noisy.
    eps = 1e-4
    num = (f(jnp.float64(b + eps)) - f(jnp.float64(b - eps))) / (2 * eps)
    np.testing.assert_allclose(dlam, num, rtol=1e-2)


def test_trg_lanczos_split_matches_full():
    """TRG with the framework's truncated dominant_svd inside the
    renormalization (chi < dim splits) reproduces the dense-SVD flow in
    values and first derivative."""
    b = 0.45
    full, lz = jax.jit(lambda bb: (
        trg_free_energy(bb, chi=8, n_steps=6),
        trg_free_energy(bb, chi=8, n_steps=6, split_method="lanczos"),
    ))(jnp.float64(b))
    np.testing.assert_allclose(lz, full, rtol=1e-9)

    gf = jax.jit(jax.grad(lambda bb: trg_free_energy(
        bb, chi=6, n_steps=5)))(jnp.float64(b))
    gl = jax.jit(jax.grad(lambda bb: trg_free_energy(
        bb, chi=6, n_steps=5, split_method="lanczos")))(jnp.float64(b))
    np.testing.assert_allclose(gl, gf, rtol=1e-7)


def test_correlation_length():
    """xi from the two leading transfer eigenvalues — the second via the
    same dominant eigensolver on the rank-1 deflated operator (operator-
    algebra composition); differentiable in beta."""
    from dominantsparseeigenad_tpu.models import (correlation_length,
                                                  transfer_operator)
    b = 0.35
    c, e, t = jax.jit(lambda bb: ctmrg_environment(
        bb, chi=10, n_steps=15))(jnp.float64(b))
    m = np.asarray(transfer_operator(c, e, t).to_dense())
    w = np.sort(np.abs(np.linalg.eigvals(m)))[::-1]
    xi_exact = 1.0 / np.log(w[0] / w[1])
    xi = jax.jit(lambda bb: correlation_length(
        bb, chi=10, n_steps=15))(jnp.float64(b))
    np.testing.assert_allclose(xi, xi_exact, rtol=1e-6)

    f = jax.jit(lambda bb: correlation_length(bb, chi=8, n_steps=12))
    dxi = jax.jit(jax.grad(f))(jnp.float64(b))
    eps = 1e-4
    num = (f(jnp.float64(b + eps)) - f(jnp.float64(b - eps))) / (2 * eps)
    np.testing.assert_allclose(dxi, num, rtol=1e-3)
    assert float(dxi) > 0  # xi grows approaching beta_c from below


def test_correlation_length_ordered_phase():
    """Deep in the ordered phase the top transfer pair is quasi-degenerate
    (gap ~2e-4 at chi=10): plain power iteration returned round-off there
    (and could even make the gap negative), while the Arnoldi-seeded
    forward resolves the true finite-chi gap — xi must be large, POSITIVE,
    and match the dense-eig oracle."""
    from dominantsparseeigenad_tpu.models import (correlation_length,
                                                  transfer_operator)

    b = 0.5
    c, e, t = ctmrg_environment(jnp.float64(b), chi=10, n_steps=15)
    w = np.abs(np.linalg.eigvals(np.asarray(transfer_operator(c, e, t)
                                            .to_dense())))
    w = np.sort(w)[::-1]
    xi_exact = 1.0 / np.log(w[0] / w[1])
    xi = float(correlation_length(jnp.float64(b), chi=10, n_steps=15))
    assert xi > 100  # ordered phase: huge but finite at finite chi
    np.testing.assert_allclose(xi, xi_exact, rtol=1e-4)


def test_trg_unrolled_grad_grad_matches_nested_forward():
    """unroll=True restores true reverse-over-reverse through the TRG flow
    (the scanned flow's grad(grad()) is a documented JAX scan-transpose
    limitation); it must agree with the supported nested-forward c_v
    route and stay finite."""
    # Both routes run the SAME chi/n_steps, so the agreement assertion is
    # truncation-independent — small chi keeps the rev-rev unroll cheap
    # (chi=12 cost 87 s of the suite budget; chi=8 is ~10x cheaper).
    beta = jnp.float64(0.44)
    d2_unrolled = jax.jit(jax.grad(jax.grad(
        lambda b: trg_free_energy(b, chi=8, n_steps=6, unroll=True))))(beta)
    d2_fwd = jax.jit(jax.grad(jax.jacfwd(
        lambda b: trg_free_energy(b, chi=8, n_steps=6))))(beta)
    assert np.isfinite(float(d2_unrolled))
    np.testing.assert_allclose(d2_unrolled, d2_fwd, rtol=1e-6)


def test_svd_safe_complex_tangents():
    """Regression (round-4 review): svd_safe's JVP was real-only — it
    crashed on complex input (complex tangent for the real s) and both
    safe-SVD rules dropped the Im<u|dA|v> diagonal coupling that fixes
    the relative phase tangent of (u_i, v_i), giving O(||dA||)-wrong
    gradients for any functional mixing u and v.  Check the
    gauge-invariant rank-r reconstruction tangent against finite
    differences for both rules."""
    from dominantsparseeigenad_tpu.ops.decomp import (svd_safe,
                                                      svd_safe_truncated)

    rng = np.random.default_rng(9)
    n = 8
    a0 = jnp.asarray(rng.standard_normal((n, n))
                     + 1j * rng.standard_normal((n, n)))
    da = jnp.asarray(rng.standard_normal((n, n))
                     + 1j * rng.standard_normal((n, n)))
    probe = jnp.asarray(rng.standard_normal((n, n))
                        + 1j * rng.standard_normal((n, n)))

    def recon_full(t):
        u, s, vt = svd_safe(a0 + t * da)
        return jnp.real(jnp.sum(probe * (u @ jnp.diag(
            s.astype(u.dtype)) @ vt)))

    def recon_trunc(t):
        u, s, vt = svd_safe_truncated(a0 + t * da, 4, 1e-12, n, 2)
        return jnp.real(jnp.sum(probe * (u @ jnp.diag(
            s.astype(u.dtype)) @ vt)))

    eps = 1e-7
    for f in (recon_full, recon_trunc):
        num = (f(eps) - f(-eps)) / (2 * eps)
        _, g = jax.jvp(f, (0.0,), (1.0,))
        np.testing.assert_allclose(float(g), float(num), rtol=1e-6)
