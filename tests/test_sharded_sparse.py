"""Row-sharded blocked-ELL operator (BASELINE config #5 tier) on the
8-virtual-device CPU mesh: values, transposes, and IFT gradients (orders
1 and 2) must match the single-device BellOperator / dense oracles.

The reference has no sparse storage or distribution (SURVEY.md §2.4/§2.5);
the oracle is this framework's own single-device path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dominantsparseeigenad_tpu import (
    BellOperator, DenseOperator, dominant_eigh, random_bell_operator)
from dominantsparseeigenad_tpu.parallel import (
    RowShardedBellOperator, make_mesh, shard_vector)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()  # (1, 8): all devices on the "shards" axis


def _sym_bell(n=128, bs=8, bpr=5, dtype=jnp.float64):
    return random_bell_operator(jax.random.PRNGKey(5), n=n, bs=bs,
                                blocks_per_row=bpr, dtype=dtype,
                                use_pallas=False)


@pytest.mark.parametrize("mode", ["all_gather", "ring"])
def test_sharded_bell_matvec_matches_local(mesh, mode):
    op = _sym_bell()
    sop = RowShardedBellOperator.from_bell(op, mesh, mode=mode)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(op.n))
    y_local = op.matvec(x)
    y_shard = sop.matvec(shard_vector(x, mesh))
    np.testing.assert_allclose(y_shard, y_local, rtol=1e-12, atol=1e-13)
    # symmetric: rmatvec aliases matvec
    np.testing.assert_allclose(sop.rmatvec(shard_vector(x, mesh)),
                               y_local, rtol=1e-12, atol=1e-13)


def test_sharded_bell_ring_visits_only_active_offsets(mesh):
    op = _sym_bell(bpr=3)  # diagonal + one +/- band pair
    sop = RowShardedBellOperator.from_bell(op, mesh, mode="ring")
    # The diagonal band is shard offset 0; a band pair at block offset
    # +/-o straddles at most 2 shard offsets each (nb_l=2 rows/shard), so
    # <= 5 active ring offsets — strictly fewer than p=8 hops when the
    # band is narrow (that's the point of offset-skipping).
    assert 1 <= len(sop._offsets) <= 5
    assert all(0 <= o < 8 for o in sop._offsets)


def test_sharded_bell_rmatvec_nonsymmetric(mesh):
    # Non-symmetric pattern: take the symmetric generator and zero one band
    # asymmetrically via the dense detour (small n, oracle-grade).
    rng = np.random.default_rng(3)
    n, bs = 64, 8
    a = np.zeros((n, n))
    nb = n // bs
    for i in range(nb):
        for j in (i, (i + 2) % nb):
            a[i * bs:(i + 1) * bs, j * bs:(j + 1) * bs] = \
                rng.standard_normal((bs, bs))
    bop = BellOperator.from_dense(jnp.asarray(a), bs=bs, use_pallas=False)
    sop = RowShardedBellOperator.from_bell(bop, mesh, mode="all_gather")
    x = jnp.asarray(rng.standard_normal(n))
    xs = shard_vector(x, mesh)
    np.testing.assert_allclose(sop.matvec(xs), a @ x, rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(sop.rmatvec(xs), a.T @ x,
                               rtol=1e-12, atol=1e-13)


@pytest.mark.parametrize("mode", ["all_gather", "ring"])
def test_sharded_bell_eigh_grad_matches_local(mesh, mode):
    """dominant_eigh value + gradient w.r.t. the block values through the
    sharded SpMV == the single-device BellOperator path."""
    op = _sym_bell(n=64, bs=8, bpr=3)
    sop = RowShardedBellOperator.from_bell(op, mesh, mode=mode)

    def loss_local(vals):
        o = BellOperator(vals, op.cols, op.n, symmetric=True,
                         use_pallas=False)
        lam, v = dominant_eigh(o, k=40, extreme="min")
        return lam + jnp.sum(v ** 4)

    def loss_sharded(vals):
        lam, v = dominant_eigh(sop.with_vals(vals), k=40, extreme="min")
        return lam + jnp.sum(v ** 4)

    v0, g0 = jax.jit(jax.value_and_grad(loss_local))(op.vals)
    v1, g1 = jax.jit(jax.value_and_grad(loss_sharded))(op.vals)
    np.testing.assert_allclose(v1, v0, rtol=1e-9)
    np.testing.assert_allclose(g1, g0, rtol=1e-6, atol=1e-10)


def test_sharded_bell_second_derivative(mesh):
    """Order 2 through the sharded sparse SpMV: d2 lambda/dt2 of A + t*B
    (B a fixed pattern-compatible perturbation) vs the single-device path."""
    op = _sym_bell(n=64, bs=8, bpr=3)
    sop = RowShardedBellOperator.from_bell(op, mesh, mode="all_gather")
    rng = np.random.default_rng(9)
    dvals = jnp.asarray(rng.standard_normal(op.vals.shape))
    # Keep the perturbation symmetric: symmetrize through the dense detour.
    b = BellOperator(dvals, op.cols, op.n, use_pallas=False).to_dense()
    b = (b + b.T) / 2
    dvals = BellOperator.from_dense(b, bs=8, use_pallas=False)

    def lam_of(vals_fn, t):
        lam, _ = dominant_eigh(vals_fn(t), k=40, extreme="min")
        return lam

    # Rebuild the perturbation on the ORIGINAL slot layout so vals shapes
    # match: project b onto op's pattern.
    nb, max_blk, bs, _ = op.vals.shape
    bmat = np.asarray(b).reshape(nb, bs, nb, bs).transpose(0, 2, 1, 3)
    pert = np.zeros_like(np.asarray(op.vals))
    cols_np = np.asarray(op.cols)
    for i in range(nb):
        for j in range(max_blk):
            pert[i, j] = bmat[i, cols_np[i, j]]
    pert = jnp.asarray(pert)

    local = lambda t: BellOperator(op.vals + t * pert, op.cols, op.n,
                                   symmetric=True, use_pallas=False)
    shard = lambda t: sop.with_vals(op.vals + t * pert)

    d2_local = jax.jit(jax.grad(jax.grad(lambda t: lam_of(local, t))))(0.0)
    d2_shard = jax.jit(jax.grad(jax.grad(lambda t: lam_of(shard, t))))(0.0)
    np.testing.assert_allclose(d2_shard, d2_local, rtol=1e-7)


@pytest.mark.parametrize("mode", ["all_gather", "ring"])
def test_sharded_bell_bf16_vals_matches_local(mesh, mode):
    """The bf16 narrow-values tier through the sharded operator (both
    comm modes): matvec matches the single-device bf16 BellOperator
    exactly up to f32 summation order, and the compute dtype stays f32."""
    op = random_bell_operator(jax.random.PRNGKey(11), n=128, bs=8,
                              blocks_per_row=5, dtype=jnp.float32,
                              vals_dtype=jnp.bfloat16, use_pallas=False)
    sop = RowShardedBellOperator.from_bell(op, mesh, mode=mode)
    assert sop.dtype == jnp.float32
    assert sop.vals.dtype == jnp.bfloat16
    x = jax.random.normal(jax.random.PRNGKey(12), (128,), jnp.float32)
    y_local = op.matvec(x)
    y_shard = sop.matvec(shard_vector(x, mesh))
    assert y_shard.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(y_shard), np.asarray(y_local),
                               rtol=2e-6, atol=2e-6)


def test_sharded_bell_matmat_block_solver(mesh):
    """Distributed SpMM tier: RowShardedBellOperator.matmat vs the local
    operator on an (N, r) block, and the block eigensolver (LOBPCG)
    through the sharded operator vs dense."""
    op = random_bell_operator(jax.random.PRNGKey(21), n=128, bs=8,
                              blocks_per_row=5, dtype=jnp.float64,
                              use_pallas=False)
    sop = RowShardedBellOperator.from_bell(op, mesh)
    X = jax.random.normal(jax.random.PRNGKey(22), (128, 4), jnp.float64)
    y_local = op.matmat(X)
    y_shard = sop.matmat(jax.device_put(
        X, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("shards", None))))
    np.testing.assert_allclose(np.asarray(y_shard), np.asarray(y_local),
                               rtol=1e-12)

    from dominantsparseeigenad_tpu import dominant_eigh_multi
    # r=5 block, judge the first 2 (the low end of this random
    # spectrum is clustered; guard vectors keep the judged ones clean).
    lams_s, _ = dominant_eigh_multi(sop, r=5, k=60, method="lobpcg",
                                    tol=1e-9, maxiter=400)
    dense = np.linalg.eigvalsh(np.asarray(op.to_dense()))
    np.testing.assert_allclose(np.asarray(lams_s)[:2], dense[:2], rtol=1e-5)


def test_sharded_operator_through_slicing_and_observables(mesh):
    """Distributed coverage widening: the sharded sparse operator drops
    into the OTHER solver tiers unchanged — KPM spectral density and the
    generic observable layer — because everything is built on the
    LinearOperator protocol + collectives-transparent shard_map."""
    from dominantsparseeigenad_tpu import (fidelity_susceptibility,
                                           spectral_density)

    op = random_bell_operator(jax.random.PRNGKey(31), n=128, bs=8,
                              blocks_per_row=5, dtype=jnp.float64,
                              use_pallas=False)
    sop = RowShardedBellOperator.from_bell(op, mesh)

    # KPM DOS through the sharded matvec vs the local operator.
    xs = jnp.linspace(-1.6, 1.6, 9)
    d_loc = spectral_density(op, xs, degree=64, n_probe=8,
                             key=jax.random.PRNGKey(3))
    d_shr = spectral_density(sop, xs, degree=64, n_probe=8,
                             key=jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(d_shr), np.asarray(d_loc),
                               rtol=1e-9, atol=1e-12)

    # chi_F of a parameterized SHARDED operator family vs the local one
    # (one jvp through the IFT rule with psum'd reductions inside).
    def make_local(g):
        return BellOperator(op.vals + g * jnp.ones_like(op.vals) * 1e-2,
                            op.cols, op.n, symmetric=True,
                            use_pallas=False)

    chi_shr = fidelity_susceptibility(
        lambda g: sop.with_vals(op.vals + g * jnp.ones_like(op.vals)
                                * 1e-2), jnp.float64(0.1), k=80)
    chi_loc = fidelity_susceptibility(make_local, jnp.float64(0.1), k=80)
    np.testing.assert_allclose(float(chi_shr), float(chi_loc), rtol=1e-8)


def test_ring_mode_keeps_structural_zero_blocks(mesh):
    """Regression (round-4 review): ring-mode bucketing dropped slots by
    VALUE (|vals| > 0), so a stored block whose entries are zero at
    construction (a coupling initialized at 0) silently vanished from
    with_vals() and from JVP tangents — wrong SpMV and an exactly-zero
    gradient, disagreeing with all_gather mode.  Dropping must be
    structural (pad convention: col 0 + zero block) only."""
    n, bs = 256, 16
    nb = n // bs
    rng = np.random.default_rng(31)
    # Symmetric block-tridiagonal ring with the FIRST off-diagonal band
    # zeroed at construction (structurally present, value zero).
    vals = np.zeros((nb, 3, bs, bs))
    cols = np.zeros((nb, 3), np.int32)
    diag = rng.standard_normal((nb, bs, bs))
    vals[:, 0] = diag + np.swapaxes(diag, 1, 2)
    cols[:, 0] = np.arange(nb)
    cols[:, 1] = (np.arange(nb) + 1) % nb     # zero blocks, real slots
    cols[:, 2] = (np.arange(nb) - 1) % nb
    vals[:, 2] = rng.standard_normal((nb, bs, bs))
    # symmetrize the -1 band against the +1 band of the previous row:
    vals[:, 1] = np.swapaxes(np.roll(vals[:, 2], -1, axis=0), 1, 2)
    off = vals[:, 1].copy()
    vals[:, 1] = 0.0                          # zero out at construction

    x = jnp.asarray(rng.standard_normal(n))
    sop = RowShardedBellOperator(jnp.asarray(vals), jnp.asarray(cols), n,
                                 mesh, mode="ring", symmetric=False,
                                 use_pallas=False)
    # Revive the zeroed band through with_vals: its contribution must
    # NOT have been dropped by the construction-time bucketing.
    vals2 = vals.copy()
    vals2[:, 1] = off
    y_ring = np.asarray(jax.jit(lambda o, v, xx: o.with_vals(v).matvec(xx))(
        sop, jnp.asarray(vals2), shard_vector(x, mesh)))
    gop = RowShardedBellOperator(jnp.asarray(vals2), jnp.asarray(cols), n,
                                 mesh, mode="all_gather", symmetric=False,
                                 use_pallas=False)
    y_ref = np.asarray(jax.jit(lambda o, xx: o.matvec(xx))(
        gop, shard_vector(x, mesh)))
    np.testing.assert_allclose(y_ring, y_ref, rtol=1e-12, atol=1e-12)


def _block_tridiag(n, bs, rng):
    """Symmetric block-tridiagonal ring (halo width = 1 block row)."""
    nb = n // bs
    vals = np.zeros((nb, 3, bs, bs))
    cols = np.zeros((nb, 3), np.int32)
    diag = rng.standard_normal((nb, bs, bs))
    vals[:, 0] = diag + np.swapaxes(diag, 1, 2)
    cols[:, 0] = np.arange(nb)
    cols[:, 1] = (np.arange(nb) + 1) % nb
    cols[:, 2] = (np.arange(nb) - 1) % nb
    vals[:, 1] = rng.standard_normal((nb, bs, bs))
    vals[:, 2] = np.swapaxes(np.roll(vals[:, 1], 1, axis=0), 1, 2)
    return jnp.asarray(vals), jnp.asarray(cols)


def test_ring_hop_accounting_banded(mesh):
    """The ring mode's traffic CONTRACT (round-4 ask #5): a halo-banded
    operator visits exactly its active offsets — here a block-
    tridiagonal ring on p=8 shards has offsets (0, 1, p-1), i.e. 2
    ppermute hops per matvec, never p-1 — and the compiled HLO carries
    exactly that many collective-permutes."""
    n, bs = 256, 16                      # nb=16, nb_l=2 per shard
    rng = np.random.default_rng(41)
    vals, cols = _block_tridiag(n, bs, rng)
    sop = RowShardedBellOperator(vals, cols, n, mesh, mode="ring",
                                 symmetric=True, use_pallas=False)
    assert sop.ring_offsets == (0, 1, 7), sop.ring_offsets
    assert sop.ring_hops == 2

    x = shard_vector(jnp.asarray(rng.standard_normal(n)), mesh)
    f = jax.jit(lambda o, xx: o.matvec(xx))
    txt = f.lower(sop, x).compile().as_text()
    n_perm = txt.count("collective-permute-start(")
    if n_perm == 0:                       # backend spells it unfused
        n_perm = txt.count("collective-permute(")
    assert n_perm == sop.ring_hops, (n_perm, txt[:200])

    # And the values are right (vs a dense oracle).
    a = np.zeros((n, n))
    nb = n // bs
    for i in range(nb):
        for j in range(3):
            c = int(np.asarray(cols)[i, j])
            a[i*bs:(i+1)*bs, c*bs:(c+1)*bs] += np.asarray(vals)[i, j]
    y = sop.matvec(x)
    np.testing.assert_allclose(np.asarray(y), a @ np.asarray(
        jax.device_get(x)), rtol=1e-11, atol=1e-12)


def test_ring_matmat_shares_bucket_gather(mesh):
    """mode="ring" SpMM (round-4 ask #5): one bucket gather per offset
    serves all r vectors; values AND vals-gradients must match the
    all_gather-mode SpMM and the local operator."""
    op = random_bell_operator(jax.random.PRNGKey(51), n=128, bs=8,
                              blocks_per_row=5, dtype=jnp.float64,
                              use_pallas=False)
    sop_r = RowShardedBellOperator.from_bell(op, mesh, mode="ring")
    sop_g = RowShardedBellOperator.from_bell(op, mesh)
    X = jax.random.normal(jax.random.PRNGKey(52), (128, 4), jnp.float64)
    Xs = jax.device_put(X, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("shards", None)))
    y_loc = np.asarray(op.matmat(X))
    np.testing.assert_allclose(np.asarray(sop_r.matmat(Xs)), y_loc,
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(sop_g.matmat(Xs)), y_loc,
                               rtol=1e-12)

    w = jax.random.normal(jax.random.PRNGKey(53), (128, 4), jnp.float64)

    def loss(vals, s):
        return jnp.sum(w * s.with_vals(vals).matmat(Xs))

    g_r = jax.grad(loss)(sop_r.vals, sop_r)
    g_g = jax.grad(loss)(sop_g.vals, sop_g)
    np.testing.assert_allclose(np.asarray(g_r), np.asarray(g_g),
                               rtol=1e-11, atol=1e-13)
