"""Sparse operator tests: COO and blocked-ELL (+ Pallas kernel in
interpret mode on CPU) against dense oracles, through the eigensolver, and
through first/second derivatives.

The reference has no sparse formats (its sparse path is a closure); the
parity target is this framework's own dense path (SURVEY.md §2.4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dominantsparseeigenad_tpu import (
    BellOperator, COOOperator, DenseOperator, dominant_eigh,
    random_bell_operator)
from dominantsparseeigenad_tpu.ops.pallas_spmv import bell_spmv


def _random_sparse_sym(n, density=0.1, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n)) * (rng.random((n, n)) < density)
    return (a + a.T) / 2


def test_coo_matvec_and_eigh():
    n = 96
    a = _random_sparse_sym(n)
    op = COOOperator.from_dense(a)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(n))
    np.testing.assert_allclose(op.matvec(x), a @ x, rtol=1e-12)
    np.testing.assert_allclose(op.rmatvec(x), a.T @ x, rtol=1e-12)
    np.testing.assert_allclose(op.to_dense(), a, rtol=1e-12)

    lam, v = dominant_eigh(op, k=n, extreme="min")
    lam_d, _ = dominant_eigh(DenseOperator(jnp.asarray(a)), k=n,
                             extreme="min")
    np.testing.assert_allclose(lam, lam_d, rtol=1e-10)


def test_coo_gradients_match_dense():
    n = 64
    a = _random_sparse_sym(n)
    op = COOOperator.from_dense(a)

    def loss_coo(vals):
        o = COOOperator(op.rows, op.cols, vals, n)
        lam, v = dominant_eigh(o, k=n, extreme="min")
        return lam + jnp.sum(v ** 4)

    def loss_dense(a):
        lam, v = dominant_eigh(DenseOperator(a), k=n, extreme="min")
        return lam + jnp.sum(v ** 4)

    g_coo = jax.grad(loss_coo)(op.vals)
    g_dense = jax.grad(loss_dense)(jnp.asarray(a))
    # dense gradient entries at the sparse positions must match (symmetric
    # pattern => no symmetrization mismatch).
    np.testing.assert_allclose(g_coo, g_dense[op.rows, op.cols],
                               rtol=1e-6, atol=1e-10)


def test_bell_from_dense_roundtrip_and_matvec():
    n, bs = 128, 16
    a = _random_sparse_sym(n, density=0.05)
    op = BellOperator.from_dense(a, bs=bs, use_pallas=False)
    x = jnp.asarray(np.random.default_rng(2).standard_normal(n))
    np.testing.assert_allclose(op.matvec(x), a @ x, rtol=1e-10)
    np.testing.assert_allclose(op.rmatvec(x), a.T @ x, rtol=1e-10)


def test_bell_pallas_interpret_matches_xla():
    n, bs = 256, 32
    a = _random_sparse_sym(n, density=0.08, seed=3)
    op = BellOperator.from_dense(a, bs=bs)
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal(n).astype(np.float32))
    y_xla = op._xla_matvec(x)
    y_pal = bell_spmv(op.vals.astype(jnp.float32), op.cols, x,
                      True)  # interpret=True on CPU
    np.testing.assert_allclose(y_pal, y_xla, rtol=1e-5, atol=1e-5)


def test_bell_spmv_derivatives():
    """bell_spmv custom_jvp: forward/reverse/second-order vs einsum."""
    n, bs = 64, 8
    a = _random_sparse_sym(n, density=0.2, seed=4)
    op = BellOperator.from_dense(a, bs=bs)
    x = jnp.asarray(np.random.default_rng(4).standard_normal(n))

    def f(vals, x):
        return jnp.sum(bell_spmv(vals, op.cols, x, True) ** 2)

    def f_ref(vals, x):
        xb = x.reshape(-1, bs)
        y = jnp.einsum("ijab,ijb->ia", vals, xb[op.cols]).reshape(-1)
        return jnp.sum(y ** 2)

    gv, gx = jax.grad(f, argnums=(0, 1))(op.vals, x)
    gv_r, gx_r = jax.grad(f_ref, argnums=(0, 1))(op.vals, x)
    np.testing.assert_allclose(gv, gv_r, rtol=1e-9)
    np.testing.assert_allclose(gx, gx_r, rtol=1e-9)

    # Second order: grad of a gradient contraction (scalar).
    h = jax.grad(lambda xx: jnp.vdot(
        jax.grad(f, argnums=1)(op.vals, xx), xx))(x)
    h_r = jax.grad(lambda xx: jnp.vdot(
        jax.grad(f_ref, argnums=1)(op.vals, xx), xx))(x)
    np.testing.assert_allclose(h, h_r, rtol=1e-9)


def test_random_bell_operator_symmetric():
    key = jax.random.PRNGKey(0)
    op = random_bell_operator(key, n=128, bs=16, blocks_per_row=5,
                              dtype=jnp.float64, use_pallas=False)
    dense = op.to_dense()
    np.testing.assert_allclose(dense, dense.T, atol=1e-12)

    lam, v = jax.jit(lambda: dominant_eigh(op, k=60, extreme="max"))()
    evals = np.linalg.eigvalsh(np.asarray(dense))
    np.testing.assert_allclose(lam, evals[-1], rtol=1e-8)


def test_bell_eigh_gradient():
    """Gradient through the eigensolver with a BellOperator (XLA path)."""
    key = jax.random.PRNGKey(1)
    op = random_bell_operator(key, n=64, bs=8, blocks_per_row=3,
                              dtype=jnp.float64, use_pallas=False)

    def loss(vals):
        o = BellOperator(vals, op.cols, op.n, symmetric=True,
                         use_pallas=False)
        lam, _ = dominant_eigh(o, k=50, extreme="max")
        return lam

    g = jax.grad(jax.jit(loss))(op.vals)
    # Exact check: for a simple eigenvalue, dlam/dA[r, c] = v[r] * v[c],
    # so the gradient w.r.t. the stored entry (i, j, a, b) is
    # v[i*bs + a] * v[cols[i, j]*bs + b] with v the true top eigenvector.
    dense = np.asarray(op.to_dense())
    evals, evecs = np.linalg.eigh(dense)
    v = evecs[:, -1]
    bs = op.block_size
    nb = op.n // bs
    vb = v.reshape(nb, bs)
    expected = np.einsum("ia,ijb->ijab", vb, vb[np.asarray(op.cols)])
    np.testing.assert_allclose(g, expected, rtol=1e-6, atol=1e-9)


def test_bcoo_operator():
    from dominantsparseeigenad_tpu import BCOOOperator
    n = 64
    a = _random_sparse_sym(n, density=0.15, seed=9)
    op = BCOOOperator(jnp.asarray(a))
    x = jnp.asarray(np.random.default_rng(9).standard_normal(n))
    np.testing.assert_allclose(op.matvec(x), a @ x, rtol=1e-12)
    lam, _ = dominant_eigh(op, k=n, extreme="max")
    np.testing.assert_allclose(lam, np.linalg.eigvalsh(a)[-1], rtol=1e-9)

    # differentiable through the eigensolver w.r.t. the stored values
    def loss(vals):
        import jax.experimental.sparse as jsparse
        m = jsparse.BCOO((vals, op.mat.indices), shape=op.mat.shape)
        l, _ = dominant_eigh(BCOOOperator(m), k=n, extreme="max")
        return l
    g = jax.grad(loss)(op.mat.data)
    evals, evecs = np.linalg.eigh(a)
    v = evecs[:, -1]
    idx = np.asarray(op.mat.indices)
    np.testing.assert_allclose(g, v[idx[:, 0]] * v[idx[:, 1]],
                               rtol=1e-6, atol=1e-10)


def test_csr_matvec_and_roundtrips():
    n = 96
    a = _random_sparse_sym(n, seed=11)
    from dominantsparseeigenad_tpu import CSROperator
    op = CSROperator.from_dense(a)
    x = jnp.asarray(np.random.default_rng(4).standard_normal(n))
    np.testing.assert_allclose(op.matvec(x), a @ x, rtol=1e-12)
    np.testing.assert_allclose(op.rmatvec(x), a.T @ x, rtol=1e-12)
    np.testing.assert_allclose(op.to_dense(), a, rtol=1e-12)
    # scipy roundtrip + COO conversion agree
    import scipy.sparse as sp
    op2 = CSROperator.from_scipy(sp.csr_matrix(a))
    np.testing.assert_allclose(op2.to_dense(), a, rtol=1e-12)
    np.testing.assert_allclose(op.to_coo().to_dense(), a, rtol=1e-12)


def test_csr_eigh_and_gradients_match_dense():
    n = 64
    a = _random_sparse_sym(n, seed=12)
    from dominantsparseeigenad_tpu import CSROperator
    op = CSROperator.from_dense(a)

    def loss_csr(data):
        o = CSROperator(op.indptr, op.indices, data, n, op._rows)
        lam, v = dominant_eigh(o, k=n, extreme="min")
        return lam + jnp.sum(v ** 4)

    def loss_dense(m):
        lam, v = dominant_eigh(DenseOperator(m), k=n, extreme="min")
        return lam + jnp.sum(v ** 4)

    # jit through the pytree boundary (indices ride as int leaves)
    g_csr = jax.jit(jax.grad(loss_csr))(op.data)
    g_dense = jax.grad(loss_dense)(jnp.asarray(a))
    np.testing.assert_allclose(
        g_csr, g_dense[np.asarray(op._rows), np.asarray(op.indices)],
        rtol=1e-6, atol=1e-10)


def test_csr_constructible_under_jit():
    """CSROperator's derived row index must be tracer-safe: building the
    operator from traced indptr/indices inside jit (the natural 4-arg
    constructor) may not touch numpy."""
    from dominantsparseeigenad_tpu import CSROperator

    rng = np.random.default_rng(31)
    a = np.where(rng.random((12, 12)) < 0.3, rng.standard_normal((12, 12)),
                 0.0)
    base = CSROperator.from_dense(jnp.asarray(a))
    x = jnp.asarray(rng.standard_normal(12))

    @jax.jit
    def mv(indptr, indices, data, x):
        op = CSROperator(indptr, indices, data, 12)
        return op.matvec(x), op.rmatvec(x)

    y, yt = mv(base.indptr, base.indices, base.data, x)
    np.testing.assert_allclose(y, a @ np.asarray(x), atol=1e-12)
    np.testing.assert_allclose(yt, a.T @ np.asarray(x), atol=1e-12)


def test_csr_from_scipy_rejects_rectangular():
    import scipy.sparse as sp

    from dominantsparseeigenad_tpu import CSROperator

    with pytest.raises(ValueError, match="square"):
        CSROperator.from_scipy(sp.random(6, 9, density=0.5, format="csr"))


def test_csr_lobpcg_and_spectral_slice():
    """The new block solvers run on sparse operators (matmat = vmapped
    sparse matvec): LOBPCG block values and an interior slice both match
    the dense oracle on a CSR operator."""
    from dominantsparseeigenad_tpu import (CSROperator, lobpcg_eigh,
                                           spectral_slice)

    n, r = 150, 3
    a = _random_sparse_sym(n, seed=13)
    op = CSROperator.from_dense(a)
    ew = np.linalg.eigh(np.asarray(a))[0]

    # Random sparse spectra are heavily clustered, so the block-boundary
    # gap is tiny — ask for a reachable residual (eigenvalue error goes
    # as residual^2, so values are still sharp).
    lams, _, info = jax.jit(lambda o: lobpcg_eigh(
        o, r, tol=1e-6, maxiter=600, with_info=True))(op)
    assert float(info.converged) == 1.0
    np.testing.assert_allclose(lams, ew[:r], rtol=1e-7)

    lo_e = (ew[70] + ew[69]) / 2
    hi_e = (ew[73] + ew[72]) / 2  # 3 inside
    sl, _, sinfo = jax.jit(lambda o: spectral_slice(
        o, float(lo_e), float(hi_e), r=5, degree=100, maxiter=250,
        tol=1e-8))(op)
    inside = np.asarray(sl)[(np.asarray(sl) >= lo_e)
                            & (np.asarray(sl) <= hi_e)]
    assert float(sinfo.n_inside) == 3.0
    np.testing.assert_allclose(np.sort(inside), ew[70:73], rtol=1e-7)


# ---------------------------------------------------------------------------
# bf16 narrow-values tier (round-4: the 2x HBM-bandwidth lever)
# ---------------------------------------------------------------------------

def test_bell_bf16_vals_matvec_budget():
    """bf16-stored values: matvec matches the f32-storage oracle within
    the documented ~8e-3 relative budget, and the compute dtype (what
    Lanczos sees) stays f32."""
    n, bs = 512, 32
    op32 = random_bell_operator(jax.random.PRNGKey(5), n=n, bs=bs,
                                blocks_per_row=5, dtype=jnp.float32,
                                use_pallas=False)
    op16 = op32.astype_vals(jnp.bfloat16)
    assert op16.vals.dtype == jnp.bfloat16
    assert op16.dtype == jnp.float32          # compute dtype
    x = jax.random.normal(jax.random.PRNGKey(6), (n,), jnp.float32)
    y32 = op32.matvec(x)
    y16 = op16.matvec(x)
    assert y16.dtype == jnp.float32
    rel = float(jnp.linalg.norm(y16 - y32) / jnp.linalg.norm(y32))
    assert rel < 8e-3, rel
    assert rel > 0  # the tier is actually active, not silently upcast


def test_bell_bf16_vals_pallas_interpret_matches_xla():
    """Pallas kernel (interpret mode) and XLA path share the bf16 error
    budget bit-for-bit up to f32 summation order."""
    n, bs = 256, 32
    op = random_bell_operator(jax.random.PRNGKey(7), n=n, bs=bs,
                              blocks_per_row=3, dtype=jnp.float32,
                              vals_dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(8), (n,), jnp.float32)
    y_xla = BellOperator(op.vals, op.cols, n,
                         use_pallas=False).matvec(x)
    y_pal = bell_spmv(op.vals, op.cols, x, True)  # interpret=True
    assert y_pal.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_xla),
                               rtol=1e-6, atol=1e-6)


def test_bell_bf16_vals_eigh_and_gradient():
    """dominant_eigh on the bf16 tier: eigenvalue within the Weyl bound
    eps_bf16*||A|| of the f32-storage result, and the matrix-entry
    gradient (bf16 cotangents on the vals leaf) stays finite and close
    to the f32 gradient in direction."""
    n, bs, k = 512, 32, 60
    op32 = random_bell_operator(jax.random.PRNGKey(9), n=n, bs=bs,
                                blocks_per_row=5, dtype=jnp.float32,
                                use_pallas=False)
    op16 = op32.astype_vals(jnp.bfloat16)
    lam32, _ = dominant_eigh(op32, k=k, extreme="min")
    lam16, v16 = dominant_eigh(op16, k=k, extreme="min")
    # ||A|| ~ O(1) by construction (scale = 1/sqrt(row nnz)).
    assert abs(float(lam16) - float(lam32)) < 1.6e-2
    assert float(jnp.abs(jnp.linalg.norm(v16) - 1.0)) < 1e-5

    def lam_of(vals):
        o = BellOperator(vals, op16.cols, n, symmetric=True,
                         use_pallas=False)
        lam, _ = dominant_eigh(o, k=k, extreme="min")
        return lam

    g16 = jax.grad(lam_of)(op16.vals)
    g32 = jax.grad(lambda v: dominant_eigh(
        BellOperator(v, op32.cols, n, symmetric=True, use_pallas=False),
        k=k, extreme="min")[0])(op32.vals)
    assert g16.dtype == jnp.bfloat16
    a, b = (np.asarray(g16, np.float64).ravel(),
            np.asarray(g32, np.float64).ravel())
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.999, cos


def test_bell_banded_slot_plan_detection_and_parity():
    """Banded-slot fast path: random_bell_operator's slots are all ring
    bands, detection must find them, and the slab-DMA kernel (interpret
    mode) must match the XLA oracle exactly — including the ring-wrap
    rows the x padding covers."""
    from dominantsparseeigenad_tpu.ops.pallas_spmv import (bell_spmv,
                                                           detect_slot_plan)

    n, bs = 512, 32
    op = random_bell_operator(jax.random.PRNGKey(13), n=n, bs=bs,
                              blocks_per_row=5, dtype=jnp.float32,
                              use_pallas=False)
    assert op.slot_plan is not None
    assert all(kind == "band" for kind, _ in op.slot_plan)
    assert detect_slot_plan(op.cols, op.vals.shape[0]) == op.slot_plan

    x = jax.random.normal(jax.random.PRNGKey(14), (n,), jnp.float32)
    y_plan = bell_spmv(op.vals, op.cols, x, True, op.slot_plan)
    y_gather = bell_spmv(op.vals, op.cols, x, True, None)
    y_xla = op.matvec(x)
    np.testing.assert_allclose(np.asarray(y_plan), np.asarray(y_xla),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(y_plan), np.asarray(y_gather),
                               rtol=1e-6, atol=1e-6)

    # A genuinely irregular pattern must NOT be declared banded.
    a = _random_sparse_sym(128, density=0.2, seed=3)
    irr = BellOperator.from_dense(a, bs=16, use_pallas=False)
    assert irr.slot_plan is None or any(
        kind == "gather" for kind, _ in irr.slot_plan)


def test_bell_spmm_parity_and_block_solver():
    """SpMM tier: Pallas (interpret) vs XLA einsum vs column-by-column
    SpMV on an (N, r) block — incl. banded plan and bf16 values — and
    the block eigensolver (LOBPCG) through BellOperator.matmat."""
    from dominantsparseeigenad_tpu.ops.pallas_spmv import bell_spmm

    n, bs, r = 512, 32, 8
    op = random_bell_operator(jax.random.PRNGKey(17), n=n, bs=bs,
                              blocks_per_row=5, dtype=jnp.float32,
                              use_pallas=False)
    X = jax.random.normal(jax.random.PRNGKey(18), (n, r), jnp.float32)
    y_cols = jnp.stack([op.matvec(X[:, j]) for j in range(r)], axis=1)
    y_mm = op.matmat(X)
    np.testing.assert_allclose(np.asarray(y_mm), np.asarray(y_cols),
                               rtol=1e-5, atol=1e-5)
    y_pal = bell_spmm(op.vals, op.cols, X, True, op.slot_plan)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_cols),
                               rtol=1e-5, atol=1e-5)
    y_pal_g = bell_spmm(op.vals, op.cols, X, True, None)  # gather path
    np.testing.assert_allclose(np.asarray(y_pal_g), np.asarray(y_cols),
                               rtol=1e-5, atol=1e-5)
    # bf16 narrow tier through the SpMM path.
    y16 = op.astype_vals(jnp.bfloat16).matmat(X)
    rel = float(jnp.linalg.norm(y16 - y_cols) / jnp.linalg.norm(y_cols))
    assert 0 < rel < 8e-3, rel

    # Block eigensolver rides matmat: top-4 of the f64 twin vs dense.
    from dominantsparseeigenad_tpu import dominant_eigh_multi
    op64 = random_bell_operator(jax.random.PRNGKey(17), n=n, bs=bs,
                                blocks_per_row=5, dtype=jnp.float64,
                                use_pallas=False)
    # r=6 block, judge the first 3: eigenvalues 4/5 of this spectrum
    # are 2.8e-3 apart (near-degenerate — convergence there tests the
    # spectrum, not the SpMM path this test is about); guard vectors
    # keep the judged ones clean.
    lams, _ = dominant_eigh_multi(op64, r=6, k=100, method="lobpcg",
                                  tol=1e-9, maxiter=400)
    dense = np.linalg.eigvalsh(np.asarray(op64.to_dense()))
    np.testing.assert_allclose(np.asarray(lams)[:3], dense[:3], rtol=1e-5)


def test_bell_mismatched_slot_plan_falls_back():
    """Regression (round-4 review): a slot plan whose band offsets do not
    match the passed cols — or a plan applied to a rectangular row panel —
    must be REJECTED (generic gathers are always correct), not silently
    DMA the wrong x slabs."""
    from dominantsparseeigenad_tpu.ops.pallas_spmv import (bell_spmv,
                                                           _bell_spmv_xla)

    n, bs = 512, 32
    op = random_bell_operator(jax.random.PRNGKey(23), n=n, bs=bs,
                              blocks_per_row=5, dtype=jnp.float32,
                              use_pallas=False)
    x = jax.random.normal(jax.random.PRNGKey(24), (n,), jnp.float32)
    oracle = np.asarray(op.matvec(x))

    # Same length, wrong offsets (a plan from a DIFFERENT operator).
    nb = op.vals.shape[0]
    bad = tuple(("band", (off + 1) % nb) for _, off in op.slot_plan)
    y_bad = bell_spmv(op.vals, op.cols, x, True, bad)
    np.testing.assert_allclose(np.asarray(y_bad), oracle,
                               rtol=1e-6, atol=1e-6)

    # Square-operator plan against a rectangular row panel: band offsets
    # are defined on the square ring and do not transfer.
    rows = nb // 2
    y_panel = bell_spmv(op.vals[:rows], op.cols[:rows], x, True,
                        op.slot_plan)
    y_panel_ref = _bell_spmv_xla(op.vals[:rows], op.cols[:rows], x)
    np.testing.assert_allclose(np.asarray(y_panel),
                               np.asarray(y_panel_ref),
                               rtol=1e-6, atol=1e-6)
