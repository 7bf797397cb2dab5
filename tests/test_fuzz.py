"""Seed-swept consistency fuzz across solvers, dtypes and formats.

Breadth complement to the targeted suites (the round-3/round-4 review
cycles showed that single-configuration tests leave configuration holes —
the complex-gauge chi_F bug survived 200 targeted tests).  Shapes are
FIXED so each sweep compiles once and replays over many random
instances; every check compares against a dense numpy oracle or central
finite differences, the reference's own gradcheck strategy (SURVEY.md
§4) widened over a corpus.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dominantsparseeigenad_tpu import (COOOperator, CSROperator,
                                       DenseOperator, MatrixFreeOperator,
                                       dominant_eig, dominant_eigh)

N = 48
N_SEEDS = 12


def _sym(rng, complex_=False):
    a = rng.standard_normal((N, N))
    if complex_:
        a = a + 1j * rng.standard_normal((N, N))
    return (a + a.conj().T) / 2


@pytest.mark.parametrize("complex_", [False, True], ids=["real", "complex"])
def test_fuzz_dominant_eigh_values_and_grads(complex_):
    """min/max eigenvalue + directional derivative vs numpy/FD over a
    random Hermitian corpus (one jitted program, N_SEEDS instances)."""
    @jax.jit
    def both(a):
        lmin, _ = dominant_eigh(a, k=N, extreme="min")
        lmax, _ = dominant_eigh(a, k=N, extreme="max")
        return lmin, lmax

    @jax.jit
    def dmin(a, da):
        return jax.jvp(lambda m: dominant_eigh(m, k=N, extreme="min")[0],
                       (a,), (da,))

    for seed in range(N_SEEDS):
        rng = np.random.default_rng(1000 + seed)
        a_np = _sym(rng, complex_)
        da_np = _sym(rng, complex_)
        a, da = jnp.asarray(a_np), jnp.asarray(da_np)
        w = np.linalg.eigvalsh(a_np)
        lmin, lmax = both(a)
        np.testing.assert_allclose(float(lmin), w[0], rtol=1e-9,
                                   err_msg=f"seed {seed}")
        np.testing.assert_allclose(float(lmax), w[-1], rtol=1e-9,
                                   err_msg=f"seed {seed}")
        # Gap guard: FD through a near-degenerate extremal pair measures
        # the subgradient, not the derivative — skip those seeds.
        if w[1] - w[0] < 1e-3:
            continue
        _, g = dmin(a, da)
        eps = 1e-6
        num = (np.linalg.eigvalsh(a_np + eps * da_np)[0]
               - np.linalg.eigvalsh(a_np - eps * da_np)[0]) / (2 * eps)
        # atol floor: central FD carries ~1e-8 absolute noise, which
        # dominates rtol when the directional derivative is near zero.
        np.testing.assert_allclose(float(g), num, rtol=1e-6, atol=1e-7,
                                   err_msg=f"seed {seed}")


def test_fuzz_dominant_eig_triples():
    """Non-symmetric dominant triples over a random corpus with an
    enforced Perron gap: residuals of BOTH vectors on the original
    matrix, the bilinear normalization, and the FD derivative of lam."""
    @jax.jit
    def solve(a):
        return dominant_eig(a, num_iters=800, power_tol=1e-12,
                            method="arnoldi", with_info=True)

    @jax.jit
    def dlam(a, da):
        return jax.jvp(lambda m: dominant_eig(
            m, num_iters=800, power_tol=1e-12, method="arnoldi")[0],
            (a,), (da,))

    for seed in range(N_SEEDS):
        rng = np.random.default_rng(2000 + seed)
        a_np = rng.standard_normal((N, N))
        # Enforce a real simple dominant eigenvalue (Perron setting).
        a_np = a_np + 1.5 * np.abs(a_np).sum(axis=1).max() * np.eye(N) / N \
            + np.outer(np.abs(rng.standard_normal(N)) + 0.5,
                       np.abs(rng.standard_normal(N)) + 0.5)
        da_np = rng.standard_normal((N, N))
        a, da = jnp.asarray(a_np), jnp.asarray(da_np)
        lam, l, r, info = solve(a)
        assert float(info.converged) == 1.0, f"seed {seed}"
        w = np.linalg.eigvals(a_np)
        lam_ref = w[np.argmax(np.abs(w))]
        assert abs(lam_ref.imag) < 1e-9, f"seed {seed}: not Perron"
        np.testing.assert_allclose(float(lam), lam_ref.real, rtol=1e-8,
                                   err_msg=f"seed {seed}")
        rv, lv = np.asarray(r), np.asarray(l)
        assert np.linalg.norm(a_np @ rv - float(lam) * rv) < 1e-7
        assert np.linalg.norm(a_np.T @ lv - float(lam) * lv) \
            / np.linalg.norm(lv) < 1e-7
        np.testing.assert_allclose(float(np.sum(lv * rv)), 1.0, rtol=1e-9)
        _, g = dlam(a, da)
        eps = 1e-6

        def lam_at(m):
            ww = np.linalg.eigvals(m)
            return ww[np.argmax(np.abs(ww))].real

        num = (lam_at(a_np + eps * da_np)
               - lam_at(a_np - eps * da_np)) / (2 * eps)
        np.testing.assert_allclose(float(g), num, rtol=1e-5,
                                   err_msg=f"seed {seed}")


def test_fuzz_format_parity():
    """The same random sparse symmetric matrix through every storage
    format must give identical eigenvalues AND identical gradients w.r.t.
    a global scale parameter (dense/COO/CSR/matrix-free share the solver
    code paths — parity is the invariant the formats must uphold)."""
    def make_ops(a_np, t):
        a = t * jnp.asarray(a_np)
        rows, cols = np.nonzero(a_np)
        dense = DenseOperator(a)
        coo = COOOperator(jnp.asarray(rows), jnp.asarray(cols),
                          t * jnp.asarray(a_np[rows, cols]), N)
        import scipy.sparse as sp
        csr_np = sp.csr_matrix(a_np)
        csr = CSROperator(jnp.asarray(csr_np.indptr),
                          jnp.asarray(csr_np.indices),
                          t * jnp.asarray(csr_np.data), N)
        aj = jnp.asarray(a_np)
        mf = MatrixFreeOperator(lambda p, x: p * (aj @ x), t, dim=N,
                                dtype=aj.dtype)
        return {"dense": dense, "coo": coo, "csr": csr, "mf": mf}

    @jax.jit
    def lam_grad(op):
        return dominant_eigh(op, k=N, extreme="min")[0]

    for seed in range(6):
        rng = np.random.default_rng(3000 + seed)
        a_np = rng.standard_normal((N, N)) * (rng.random((N, N)) < 0.2)
        a_np = (a_np + a_np.T) / 2
        vals = {}
        for name, op in make_ops(a_np, jnp.float64(1.0)).items():
            f = lambda t, nm=name: lam_grad(make_ops(a_np, t)[nm])
            val, grad = jax.value_and_grad(f)(jnp.float64(1.0))
            vals[name] = (float(val), float(grad))
        ref = vals["dense"]
        w = np.linalg.eigvalsh(a_np)
        np.testing.assert_allclose(ref[0], w[0], rtol=1e-9)
        for name, (v, g) in vals.items():
            np.testing.assert_allclose(v, ref[0], rtol=1e-9,
                                       err_msg=f"{name} seed {seed}")
            np.testing.assert_allclose(g, ref[1], rtol=1e-7,
                                       err_msg=f"{name} seed {seed}")


def test_fuzz_dominant_svd():
    """Truncated SVD over random rectangular corpora (both
    orientations): singular values vs numpy, triple residuals
    ``A v = s u``, and the FD derivative of ``sum(s)`` — exercises the
    Hermitian-embedding forward and the block solver after the round-4
    LOBPCG/precision fixes."""
    from dominantsparseeigenad_tpu import dominant_svd

    for m, n in [(40, 24), (24, 40)]:
        @jax.jit
        def dsum(a, da):
            return jax.jvp(lambda x: jnp.sum(
                dominant_svd(x, r=3, k=64)[1]), (a,), (da,))

        for seed in range(4):
            rng = np.random.default_rng(4000 + seed)
            a_np = rng.standard_normal((m, n))
            da_np = rng.standard_normal((m, n))
            a, da = jnp.asarray(a_np), jnp.asarray(da_np)
            u, s, v = dominant_svd(a, r=3, k=64)
            s_ref = np.linalg.svd(a_np, compute_uv=False)[:3]
            np.testing.assert_allclose(np.asarray(s), s_ref, rtol=1e-9,
                                       err_msg=f"{m}x{n} seed {seed}")
            for j in range(3):
                # residual scales with sigma (solver tol is relative)
                assert np.linalg.norm(
                    a_np @ np.asarray(v[:, j])
                    - float(s[j]) * np.asarray(u[:, j])) < 1e-6
            if s_ref[2] - np.linalg.svd(a_np, compute_uv=False)[3] < 1e-3:
                continue  # FD through a near-degenerate boundary
            _, g = dsum(a, da)
            eps = 1e-6
            num = (np.linalg.svd(a_np + eps * da_np,
                                 compute_uv=False)[:3].sum()
                   - np.linalg.svd(a_np - eps * da_np,
                                   compute_uv=False)[:3].sum()) / (2 * eps)
            np.testing.assert_allclose(float(g), num, rtol=1e-6,
                                       atol=1e-7,
                                       err_msg=f"{m}x{n} seed {seed}")


def test_fuzz_generalized_pencil():
    """Generalized symmetric-definite pencils A x = lam B x over a
    random corpus: eigenvalues vs scipy and FD gradients in BOTH
    operands — exercises the B-metric LOBPCG forward after the
    conjugate-direction fix."""
    import scipy.linalg as sla
    from dominantsparseeigenad_tpu import dominant_eigh_gen

    n, r = 40, 3

    @jax.jit
    def dval(a, b, da, db):
        return jax.jvp(lambda x, y: jnp.sum(dominant_eigh_gen(
            x, y, r=r, maxiter=600, tol=1e-10)[0]), (a, b), (da, db))

    for seed in range(4):
        rng = np.random.default_rng(5000 + seed)
        a_np = rng.standard_normal((n, n))
        a_np = (a_np + a_np.T) / 2
        c = rng.standard_normal((n, n)) / np.sqrt(n)
        b_np = c @ c.T + np.eye(n)           # SPD, moderate conditioning
        da_np = rng.standard_normal((n, n)); da_np = (da_np + da_np.T) / 2
        db_np = rng.standard_normal((n, n)) / 4
        db_np = (db_np + db_np.T) / 2
        a, b = jnp.asarray(a_np), jnp.asarray(b_np)
        lams, x = dominant_eigh_gen(a, b, r=r, maxiter=600, tol=1e-10)
        ref = sla.eigh(a_np, b_np, eigvals_only=True)[:r]
        np.testing.assert_allclose(np.asarray(lams), ref, rtol=1e-8,
                                   err_msg=f"seed {seed}")
        w_all = sla.eigh(a_np, b_np, eigvals_only=True)
        if w_all[r] - w_all[r - 1] < 1e-3:
            continue
        _, g = dval(a, b, jnp.asarray(da_np), jnp.asarray(db_np))
        eps = 1e-6
        num = (sla.eigh(a_np + eps * da_np, b_np + eps * db_np,
                        eigvals_only=True)[:r].sum()
               - sla.eigh(a_np - eps * da_np, b_np - eps * db_np,
                          eigvals_only=True)[:r].sum()) / (2 * eps)
        np.testing.assert_allclose(float(g), num, rtol=1e-5, atol=1e-7,
                                   err_msg=f"seed {seed}")


@pytest.mark.parametrize("complex_", [False, True], ids=["real", "complex"])
def test_fuzz_second_order(complex_):
    """Second directional derivative d²λ/dt² of the extremal eigenvalue
    along random Hermitian rays vs the sum-over-states oracle — the
    flagship capability (chi_F, c_v) swept over a corpus at order 2."""
    @jax.jit
    def d2(a, da):
        def lam(t):
            return dominant_eigh(DenseOperator(a + t * da), k=N,
                                 extreme="min")[0]

        def g(t):
            return jax.jvp(lam, (t,), (jnp.ones_like(t),))

        (_, d1), (_, dd) = jax.jvp(g, (jnp.float64(0.0),),
                                   (jnp.float64(1.0),))
        return d1, dd

    for seed in range(8):
        rng = np.random.default_rng(6000 + seed)
        a_np = _sym(rng, complex_)
        da_np = _sym(rng, complex_)
        w, vec = np.linalg.eigh(a_np)
        if w[1] - w[0] < 1e-2:
            continue  # perturbation series ill-conditioned at tiny gaps
        d1, dd = d2(jnp.asarray(a_np), jnp.asarray(da_np))
        v0 = vec[:, 0]
        me = vec[:, 1:].conj().T @ (da_np @ v0)
        d1_ref = float(np.real(v0.conj() @ (da_np @ v0)))
        d2_ref = float(2.0 * np.sum(np.abs(me) ** 2 / (w[0] - w[1:])))
        np.testing.assert_allclose(float(d1), d1_ref, rtol=1e-8,
                                   atol=1e-10, err_msg=f"seed {seed}")
        np.testing.assert_allclose(float(dd), d2_ref, rtol=1e-6,
                                   atol=1e-8, err_msg=f"seed {seed}")


def test_fuzz_block_solver_degenerate_clusters():
    """dominant_eigh_multi on spectra with EXACT multiplets (the CTMRG
    hazard): eigenvalue sums and subspace projectors must match numpy
    even though individual eigenvectors are gauge inside a cluster, and
    the scale-parameter gradient of the (gauge-invariant) trace must
    match FD.  Swept over random cluster layouts."""
    from dominantsparseeigenad_tpu import dominant_eigh_multi

    n, r = 40, 4

    @jax.jit
    def solve(a):
        return dominant_eigh_multi(a, r=r, k=n, extreme="max")

    @jax.jit
    def dsum(a, da):
        return jax.jvp(lambda m: jnp.sum(dominant_eigh_multi(
            m, r=r, k=n, extreme="max")[0]), (a,), (da,))

    for seed in range(6):
        rng = np.random.default_rng(7000 + seed)
        # Random spectrum with an exact doublet or triplet at the top.
        mult = int(rng.integers(2, 4))
        top = 5.0 + rng.random()
        d = np.concatenate([[top] * mult,
                            np.sort(rng.random(n - mult) * 4)[::-1]])
        q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        a_np = q @ np.diag(d) @ q.T
        a = jnp.asarray(a_np)
        lams, v = solve(a)
        np.testing.assert_allclose(np.asarray(lams), d[:r], rtol=1e-9,
                                   err_msg=f"seed {seed} mult {mult}")
        # Subspace parity (projector, not vectors — cluster gauge).
        p_got = np.asarray(v) @ np.asarray(v).T
        w, vec = np.linalg.eigh(a_np)
        v_ref = vec[:, ::-1][:, :r]
        p_ref = v_ref @ v_ref.T
        assert np.abs(p_got - p_ref).max() < 1e-7, f"seed {seed}"
        # Gradient of the gauge-invariant eigenvalue sum along a random
        # symmetric ray, vs FD (the broadened rule must stay exact for
        # cluster-invariant functionals).
        da_np = rng.standard_normal((n, n)); da_np = (da_np + da_np.T) / 2
        _, g = dsum(a, jnp.asarray(da_np))
        eps = 1e-6
        num = (np.linalg.eigvalsh(a_np + eps * da_np)[::-1][:r].sum()
               - np.linalg.eigvalsh(a_np - eps * da_np)[::-1][:r].sum()) \
            / (2 * eps)
        np.testing.assert_allclose(float(g), num, rtol=1e-6, atol=1e-7,
                                   err_msg=f"seed {seed}")


def test_fuzz_forward_engine_parity():
    """Every FORWARD ENGINE must produce the same extremal eigenvalue on
    the same corpus: plain fixed-k, adaptive early-exit, thick-restart,
    and the LOBPCG block method — engines differ in iteration shape, the
    answer must not (swept over random Hermitian instances)."""
    from dominantsparseeigenad_tpu import dominant_eigh_multi

    @jax.jit
    def plain(a):
        return dominant_eigh(a, k=N, extreme="min")[0]

    @jax.jit
    def adaptive(a):
        return dominant_eigh(a, k=N, extreme="min",
                             early_exit_tol=1e-11)[0]

    @jax.jit
    def restarted(a):
        return dominant_eigh(a, k=16, restart_cycles=10,
                             extreme="min")[0]

    @jax.jit
    def lobpcg_multi(a):
        return dominant_eigh_multi(a, r=2, method="lobpcg",
                                   k=300, extreme="min")[0][0]

    for seed in range(8):
        rng = np.random.default_rng(8000 + seed)
        a_np = _sym(rng)
        a = jnp.asarray(a_np)
        ref = np.linalg.eigvalsh(a_np)[0]
        for name, f in [("plain", plain), ("adaptive", adaptive),
                        ("restarted", restarted),
                        ("lobpcg", lobpcg_multi)]:
            np.testing.assert_allclose(
                float(f(a)), ref, rtol=1e-7,
                err_msg=f"{name} seed {seed}")
