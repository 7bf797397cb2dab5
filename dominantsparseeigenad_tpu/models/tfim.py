"""1D transverse-field Ising model (TFIM) drivers.

Rebuild of the reference's ``examples/TFIM/`` application stack (the paper's
flagship): the 2^N-dimensional quantum Hamiltonian

    H(g) = - sum_i sigma^z_i sigma^z_{i+1}  -  g * sum_i sigma^x_i     (PBC)

computed three ways, mirroring the reference:

* **dense exact diagonalization** (reference's small-N ED scripts) — builds
  the full 2^N x 2^N matrix; used as the ground-truth oracle;
* **matrix-free** (reference's sparse scripts + ``setDominantSparseSymeig``):
  a matvec closure over the 2^N vector — the diagonal (zz) term is a
  precomputed bit-arithmetic array, the off-diagonal (x) term is N
  single-spin flips, each a ``jnp.flip`` on one axis of the
  (2, 2, ..., 2)-reshaped state.  On TPU these lower to contiguous HBM
  reverse-copies that XLA fuses with the adds;
* **analytic Jordan-Wigner** finite-N ground energy for validation at sizes
  where ED is impossible (N=20 => dim ~ 10^6, BASELINE config #3).

Derived quantities, all differentiated *through the eigensolver* exactly as
the reference does with double backward:

* ``dE0/dg``, ``d2E0/dg2`` (reference ED example; BASELINE config #2);
* fidelity susceptibility  chi_F = <∂ψ|∂ψ> - <∂ψ|ψ><ψ|∂ψ>  (reference
  sparse example) — one ``jax.jvp`` through the IFT rule yields ∂ψ/∂g;
  the gauge term is subtracted explicitly by the shared
  ``ops.observables.fidelity_susceptibility`` (zero for real operators,
  essential for complex ones).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from ..ops.eigh import dominant_eigh
from ..ops.operators import MatrixFreeOperator


# ---------------------------------------------------------------------------
# Hamiltonian construction
# ---------------------------------------------------------------------------

def tfim_zz_diagonal(n: int, dtype=jnp.float64) -> jax.Array:
    """Diagonal of -sum_i sz_i sz_{i+1} (PBC) over the 2^n basis.

    Bit arithmetic: basis state j has spin s_i = 1 - 2*bit_i(j); each
    anti-aligned neighbor pair contributes +1, aligned -1.  Accumulated
    bond-by-bond (n fused passes over the 2^n vector) so no (2^n, n)
    intermediate ever materializes — XLA fuses the whole thing into one
    elementwise kernel.
    """
    if n < 3:
        # Same guard as heisenberg_operator: the PBC ring visits its
        # single (n=2) bond from both endpoints — the zz diagonal would
        # silently be 2x the standard Hamiltonian (and n=1 self-bonds) —
        # and the shared dense oracle would inherit the same factor, so
        # internal cross-checks could not catch it.
        raise ValueError(f"need n >= 3 (PBC double-counts bonds at n=2, "
                         f"self-bonds at n=1); got n={n}")
    dim = 1 << n
    idx = jnp.arange(dim, dtype=jnp.uint32)
    n_anti = jnp.zeros(dim, dtype=dtype)
    for i in range(n):
        bi = (idx >> i) & 1
        bj = (idx >> ((i + 1) % n)) & 1
        n_anti = n_anti + (bi ^ bj).astype(dtype)
    # -sum sz sz = -( (n - n_anti) - n_anti ) = 2*n_anti - n
    return 2.0 * n_anti - n


def _bit_groups(n: int, max_bits: int = 7) -> list[int]:
    """Split n qubits into contiguous bit groups of <= max_bits (LSB first)."""
    groups = []
    r = n
    while r > 0:
        s = min(max_bits, r)
        groups.append(s)
        r -= s
    return groups


def _cube_adjacency(m: int, dtype) -> jax.Array:
    """(2^m, 2^m) hypercube adjacency: 1 where indices differ in one bit."""
    idx = np.arange(1 << m)
    x = idx[:, None] ^ idx[None, :]
    adj = (x != 0) & ((x & (x - 1)) == 0)
    return jnp.asarray(adj, dtype=dtype)


def flip_sum(x: jax.Array, n: int) -> jax.Array:
    """sum_i flip_i(x) — apply every single-spin flip and sum.

    TPU-native formulation: per-bit ``jnp.flip`` calls have tiny inner
    strides for the low bits (hostile to HBM/VMEM tiling), so instead the
    n bits are split into <=7-bit groups and each group's flip-sum is one
    contraction with a (2^m, 2^m) hypercube-adjacency matrix — i.e. the
    whole transverse-field term sum_i sigma^x_i becomes ~n/7 small MXU
    matmuls over the reshaped state tensor instead of ~n strided
    reverse-copies.  Exact (not an approximation): sigma^x on site i only
    touches bit i, so grouping is a free tensorization.
    """
    groups = _bit_groups(n)
    shape = tuple(1 << s for s in reversed(groups))
    x3 = x.reshape(shape)
    out = jnp.zeros_like(x3)
    for axis, s in enumerate(reversed(groups)):
        adj = _cube_adjacency(s, x.dtype)
        # HIGHEST precision: the default bf16 passthrough rounds the
        # state to ~2^-8 inside the hot matvec, capping E0 accuracy at
        # ~2e-5 relative on TPU f32 (adjacency entries are exact 0/1;
        # the state side is what gets rounded).  Bandwidth-bound: the
        # extra MXU passes cost <2% wall time on the N=20 bench.
        y = jnp.tensordot(adj, x3, axes=[[1], [axis]],
                          precision=jax.lax.Precision.HIGHEST)
        out = out + jnp.moveaxis(y, 0, axis)
    return out.reshape(-1)


def tfim_matvec(params, x: jax.Array) -> jax.Array:
    """y = H(g) x, matrix-free.  params = (g, zz_diagonal)."""
    g, diag = params
    n = diag.shape[0].bit_length() - 1
    return diag.astype(x.dtype) * x - g * flip_sum(x, n)


def tfim_operator(n: int, g, dtype=jnp.float64) -> MatrixFreeOperator:
    """Matrix-free TFIM Hamiltonian as a differentiable LinearOperator.

    Replaces the reference's ``setDominantSparseSymeig(Hmatvec,
    Aadjoint_to_gadjoint)`` global-state dance: ``g`` is a pytree leaf, the
    adjoint contraction u^T (dH/dg) w is derived by AD of the matvec.
    """
    g = jnp.asarray(g, dtype=dtype)
    diag = tfim_zz_diagonal(n, dtype=dtype)
    return MatrixFreeOperator(tfim_matvec, (g, diag), dim=1 << n,
                              dtype=dtype)


def tfim_dense_hamiltonian(n: int, g, dtype=jnp.float64) -> jax.Array:
    """Full 2^n x 2^n TFIM matrix (reference's ED path; small n only)."""
    g = jnp.asarray(g, dtype=dtype)
    dim = 1 << n
    # -sum_i sigma^x_i couples basis state i to i XOR 2^k — assembled as
    # ONE constant numpy matrix so the traced graph is a single fused
    # axpy `diag(zz) - g * Hx` (and its transpose pass one contraction),
    # instead of n sequential dim^2 updates.
    idx = np.arange(dim)
    hx = np.zeros((dim, dim))
    for i in range(n):
        hx[idx, idx ^ (1 << i)] += 1.0
    return (jnp.diag(tfim_zz_diagonal(n, dtype=dtype))
            - g * jnp.asarray(hx, dtype=dtype))


def tfim2d_zz_diagonal(lx: int, ly: int, dtype=jnp.float64) -> jax.Array:
    """Diagonal of -sum_<ij> sz_i sz_j on an lx x ly periodic square
    lattice (site (x, y) -> bit x + lx*y), over the 2^(lx*ly) basis."""
    if lx < 3 or ly < 3:
        # Torus dimensions below 3 double-count the wrapped bonds (and
        # self-bond at length 1) — same guard as the 1D chain.
        raise ValueError("need lx, ly >= 3 (a torus dimension of 2 "
                         f"double-counts its wrapped bonds); got "
                         f"({lx}, {ly})")
    n = lx * ly
    dim = 1 << n
    idx = jnp.arange(dim, dtype=jnp.uint32)

    def bit(p):
        return (idx >> p) & 1

    n_anti = jnp.zeros(dim, dtype=dtype)
    for y in range(ly):
        for x in range(lx):
            p = x + lx * y
            for q in (((x + 1) % lx) + lx * y, x + lx * ((y + 1) % ly)):
                n_anti = n_anti + (bit(p) ^ bit(q)).astype(dtype)
    # 2 bonds per site; -sum sz sz = 2*n_anti - n_bonds
    return 2.0 * n_anti - 2 * n


def tfim2d_operator(lx: int, ly: int, g,
                    dtype=jnp.float64) -> MatrixFreeOperator:
    """Matrix-free 2D transverse-field Ising model on an lx x ly periodic
    square lattice — beyond the reference (1D only).  The transverse term
    is site-local, so the same hypercube-adjacency ``flip_sum`` applies
    unchanged; only the zz bond diagonal differs.
    """
    g = jnp.asarray(g, dtype=dtype)
    diag = tfim2d_zz_diagonal(lx, ly, dtype=dtype)
    return MatrixFreeOperator(tfim_matvec, (g, diag),
                              dim=1 << (lx * ly), dtype=dtype)


def tfim2d_dense_hamiltonian(lx: int, ly: int, g,
                             dtype=jnp.float64) -> jax.Array:
    """Dense 2D TFIM (ED oracle; tiny lattices only)."""
    n = lx * ly
    g = jnp.asarray(g, dtype=dtype)
    h = jnp.diag(tfim2d_zz_diagonal(lx, ly, dtype=dtype))
    eye = np.eye(2)
    sx = np.array([[0.0, 1.0], [1.0, 0.0]])
    for i in range(n):
        ops = [eye] * n
        ops[i] = sx
        full = ops[0]
        for o in ops[1:]:
            full = np.kron(full, o)
        h = h - g * jnp.asarray(full, dtype=dtype)
    return h


# ---------------------------------------------------------------------------
# Sharded (multi-chip) matrix-free Hamiltonian
# ---------------------------------------------------------------------------

def tfim_sharded_operator(n: int, g, mesh, *, dtype=jnp.float64,
                          axis: str = None):
    """TFIM Hamiltonian as a row-sharded matrix-free operator on a mesh.

    The 2^n-dimensional state vector is block-partitioned over ``p = 2^d``
    devices along mesh axis ``axis``; a shard holds the amplitudes whose
    top ``d`` basis bits equal its shard index.  Inside the ``shard_map``
    matvec:

    * the zz diagonal term and the ``n - d`` low-bit spin flips are purely
      local (``jnp.flip`` on one axis of the reshaped local block);
    * each of the ``d`` high-bit spin flips exchanges *whole shards*
      between XOR-partner devices with a single ``lax.ppermute`` over ICI
      — the hypercube-exchange analogue of ring attention for Hilbert-
      space sharding (SURVEY.md §2.5 / §5).

    The reference has no distributed path at all; this is the north-star
    scaling component layered on the same eigensolver math.  Gradients in
    ``g`` flow through ``shard_map`` + ``ppermute`` transparently.
    """
    from ..parallel.mesh import SHARD_AXIS
    from ..parallel.sharded import ShardedMatrixFreeOperator
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import lax

    if axis is None:
        axis = SHARD_AXIS
    p = mesh.shape[axis]
    d = p.bit_length() - 1
    if (1 << d) != p:
        raise ValueError(f"shard count {p} must be a power of two")
    if d > n:
        raise ValueError(f"cannot split 2^{n} states over 2^{d} shards")
    m = n - d  # local qubits

    g = jnp.asarray(g, dtype=dtype)
    diag = jax.device_put(tfim_zz_diagonal(n, dtype=dtype),
                          NamedSharding(mesh, P(axis)))

    def local_matvec(params, x_local):
        gg, diag_local = params
        y = diag_local.astype(x_local.dtype) * x_local
        # Local spin flips (low m bits): cube-adjacency contractions.
        flips = flip_sum(x_local, m) if m > 0 else jnp.zeros_like(x_local)
        for b in range(d):  # high-bit flips: XOR-partner shard exchange
            perm = [(s, s ^ (1 << b)) for s in range(p)]
            flips = flips + lax.ppermute(x_local, axis, perm)
        return y - gg * flips

    return ShardedMatrixFreeOperator(
        local_matvec, (g, diag), dim=1 << n, mesh=mesh, dtype=dtype,
        axis=axis, param_specs=(P(), P(axis)))


# ---------------------------------------------------------------------------
# Analytic (Jordan-Wigner) reference values
# ---------------------------------------------------------------------------

def tfim_exact_e0(n: int, g) -> jax.Array:
    """Exact finite-N ground energy via Jordan-Wigner (even N, PBC).

    The ground state lives in the even-fermion-parity (antiperiodic /
    Neveu-Schwarz) sector: momenta k = (2m+1) pi / N, and

        E0 = - sum_k sqrt(1 + g^2 - 2 g cos k).

    Differentiable in g, so it also provides exact dE0/dg and d2E0/dg2
    oracles (the "perturbation theory" comparison of BASELINE config #2,
    exact to all orders).
    """
    g = jnp.asarray(g)
    m = jnp.arange(n)
    k = (2 * m + 1) * jnp.pi / n
    return -jnp.sum(jnp.sqrt(1.0 + g ** 2 - 2.0 * g * jnp.cos(k)))


# ---------------------------------------------------------------------------
# Differentiable observables through the eigensolver
# ---------------------------------------------------------------------------

def tfim_ground_energy(n: int, g, *, k: int = 100, tol: float = 1e-10,
                       dtype=jnp.float64):
    """E0(g) through the matrix-free Lanczos eigensolver; differentiable to
    arbitrary order in g (reference sparse TFIM script)."""
    lam, _ = dominant_eigh(tfim_operator(n, g, dtype=dtype),
                           k=min(k, 1 << n), extreme="min", tol=tol)
    return lam


def tfim_ground_state(n: int, g, *, k: int = 100, tol: float = 1e-10,
                      dtype=jnp.float64):
    """(E0, |psi0>) through the eigensolver; differentiable."""
    return dominant_eigh(tfim_operator(n, g, dtype=dtype),
                         k=min(k, 1 << n), extreme="min", tol=tol)


def tfim_energy_gap(n: int, g, *, k: int = 100, tol: float = 1e-10,
                    dtype=jnp.float64):
    """Many-body gap E1 - E0 via the block eigensolver (r=2), matrix-free
    and differentiable in g — closes at the quantum critical point g=1.
    (Beyond the reference API: it computes one pair at a time.)"""
    from ..ops.eigh import dominant_eigh_multi
    lams, _ = dominant_eigh_multi(tfim_operator(n, g, dtype=dtype), r=2,
                                  k=min(k, 1 << n), tol=tol)
    return lams[1] - lams[0]


def fidelity_susceptibility(n: int, g, *, k: int = 100, tol: float = 1e-10,
                            dtype=jnp.float64):
    """chi_F(g) of the TFIM ground state (reference: the double-backward
    construction of the ``examples/TFIM`` sparse driver).

    Thin wrapper over the generic gauge-invariant
    :func:`~..ops.observables.fidelity_susceptibility` — ONE
    implementation of the chi_F construction (the round-3 complex-gauge
    fix lives there; a second hand-rolled copy here had to be patched in
    lockstep, which is exactly how such fixes get missed)."""
    from ..ops.observables import fidelity_susceptibility as _chi

    g = jnp.asarray(g, dtype=dtype)
    return _chi(lambda gg: tfim_operator(n, gg, dtype=dtype), g,
                k=min(k, 1 << n), tol=tol)


def tfim_observables_sweep(n: int, gs, *, k: int = 100, tol: float = 1e-10,
                           maxiter: int | None = None, dtype=jnp.float64,
                           **eigh_kwargs):
    """Batched (E0, dE0/dg, chi_F) over an ARRAY of couplings — one
    traced program, one device dispatch, one device->host transfer.

    The physically natural use of the flagship workload is a chi_F
    *curve* over the coupling (the reference's sparse TFIM driver and
    the paper's Fig. 2 loop over g in Python, paying a full eigensolve
    dispatch per point).  Here the whole sweep is ``jax.vmap`` over one
    (forward + IFT-tangent) program: the b-point batch rides each HBM
    pass of the Lanczos reorthogonalization and each MXU flip-sum
    contraction together, and — on a remote/tunneled device — the
    per-dispatch host round-trip (~25 ms on this chip, ~44% of a
    single-point solve at N=20) is paid ONCE for the whole curve
    instead of once per point.

    Returns an ``(len(gs), 3)`` array with columns ``E0, dE0/dg,
    chi_F`` (gauge-invariant form, matching
    :func:`~..ops.observables.fidelity_susceptibility`).  Extra keyword
    arguments are forwarded to :func:`~..ops.eigh.dominant_eigh`
    (e.g. ``basis_dtype=jnp.bfloat16``, ``reorth_chunks=4``).  Memory
    scales linearly in ``len(gs)`` (each point carries its own
    ``(k+1, 2^n)`` Lanczos basis); jit the call for the dispatch
    amortization to materialize.
    """
    gs = jnp.asarray(gs, dtype=dtype)
    diag = tfim_zz_diagonal(n, dtype=dtype)
    kk = min(k, 1 << n)
    # Under vmap both lax.cond branches execute every step, so the lazy
    # breakdown-restart branch (RNG + full-basis projection) would charge
    # every lane ~half its per-problem budget; the carried restart
    # direction is the vmap-friendly equivalent (see lanczos.lanczos).
    # Only injected for the plain fixed-k forward: dominant_eigh rejects
    # restart_mode != "cond" alongside restart_cycles/early_exit_tol, and
    # blaming an argument the caller never passed would be misleading
    # (those engines run under lax.scan/while, not vmap-hostile cond).
    if (not eigh_kwargs.get("restart_cycles")
            and eigh_kwargs.get("early_exit_tol") is None):
        eigh_kwargs.setdefault("restart_mode", "carry")

    def one(g):
        def ground(gg):
            op = MatrixFreeOperator(tfim_matvec, (gg, diag), dim=1 << n,
                                    dtype=dtype)
            return dominant_eigh(op, k=kk, extreme="min", tol=tol,
                                 maxiter=maxiter, **eigh_kwargs)

        (lam, v), (dlam, dv) = jax.jvp(ground, (g,),
                                       (jnp.ones((), dtype),))
        chi = (jnp.real(jnp.vdot(dv, dv))
               - jnp.abs(jnp.vdot(v, dv)) ** 2)
        return jnp.stack([lam, dlam, chi])

    return jax.vmap(one)(gs)


def tfim_ed_observables(n: int, g, dtype=jnp.float64):
    """Dense-ED oracle: (E0, dE0/dg, d2E0/dg2, chi_F) from full eigh.

    Ground truth for the tests (reference validates its sparse path against
    ED the same way).  Uses sum-over-states perturbation formulas:
        dE0/dg   = <0| dH/dg |0>
        d2E0/dg2 = 2 sum_{m>0} |<m|dH/dg|0>|^2 / (E0 - Em)
        chi_F    =   sum_{m>0} |<m|dH/dg|0>|^2 / (E0 - Em)^2
    """
    h = tfim_dense_hamiltonian(n, g, dtype=dtype)
    evals, evecs = jnp.linalg.eigh(h)
    v0 = evecs[:, 0]
    # dH/dg |0> = -sum_i sx_i |0>
    dh_v0 = -flip_sum(v0, n)
    de = jnp.vdot(v0, dh_v0)
    me = evecs[:, 1:].T @ dh_v0
    gaps = evals[0] - evals[1:]
    d2e = 2.0 * jnp.sum(me ** 2 / gaps)
    chi = jnp.sum(me ** 2 / gaps ** 2)
    return evals[0], de, d2e, chi
