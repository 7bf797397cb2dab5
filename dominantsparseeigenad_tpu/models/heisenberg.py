"""Spin-1/2 XXZ / Heisenberg chain — second quantum model family.

No reference analogue (the reference ships TFIM only); this demonstrates
that the operator protocol + eigensolver stack generalizes beyond the
transverse-field Ising model.  The chain Hamiltonian (PBC)

    H = sum_i [ (J/2)(S+_i S-_{i+1} + S-_i S+_{i+1}) + Jz Sz_i Sz_{i+1} ]

is applied matrix-free on the 2^n basis with the same TPU-native
tensorization as ``tfim.py``: bits are split into <=7-bit groups, all
*intra-group* exchange bonds become one (2^m, 2^m) matrix contraction on
the MXU, and the few *boundary* bonds (group-to-group and the PBC wrap)
are 4x4 contractions on a pair of exposed bit axes.

Differentiable in (J, Jz): ground energy, its coupling derivatives, and
spin stiffness-style second derivatives all flow through
``dominant_eigh``'s IFT rules.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.eigh import dominant_eigh
from ..ops.operators import MatrixFreeOperator
from .tfim import _bit_groups


def _zz_diagonal(n: int, dtype) -> np.ndarray:
    """sum_i Sz_i Sz_{i+1} (PBC) over the 2^n basis, Sz = diag(1,-1)/2."""
    dim = 1 << n
    idx = np.arange(dim, dtype=np.uint64)
    total = np.zeros(dim, dtype=np.float64)
    for i in range(n):
        bi = (idx >> np.uint64(i)) & np.uint64(1)
        bj = (idx >> np.uint64((i + 1) % n)) & np.uint64(1)
        total += 0.25 * (1.0 - 2.0 * bi.astype(np.float64)) * (
            1.0 - 2.0 * bj.astype(np.float64))
    return total.astype(np.dtype(dtype))


@lru_cache(maxsize=None)
def _exchange_group_matrix(m: int, bonds: tuple) -> np.ndarray:
    """(2^m, 2^m) matrix of sum over ``bonds`` (local bit pairs (i, j)) of
    the exchange term (S+_i S-_j + S-_i S+_j)/2 = half bit-pair swap."""
    dim = 1 << m
    mat = np.zeros((dim, dim), dtype=np.float64)
    s = np.arange(dim)
    for (i, j) in bonds:
        bi = (s >> i) & 1
        bj = (s >> j) & 1
        anti = bi != bj
        flipped = s ^ ((1 << i) | (1 << j))
        mat[flipped[anti], s[anti]] += 0.5
    return mat


_PAIR_EXCHANGE = np.zeros((2, 2, 2, 2))  # [I, J, i, j]: |IJ><ij| terms
_PAIR_EXCHANGE[0, 1, 1, 0] = 0.5
_PAIR_EXCHANGE[1, 0, 0, 1] = 0.5


def _apply_pair(x: jax.Array, n: int, p: int, q: int) -> jax.Array:
    """Apply the 4x4 exchange on global bits p < q of the 2^n state."""
    a = 1 << (n - 1 - q)
    b = 1 << (q - p - 1)
    c = 1 << p
    x5 = x.reshape(a, 2, b, 2, c)
    m4 = jnp.asarray(_PAIR_EXCHANGE, dtype=x.dtype)
    y5 = jnp.einsum("IJij,aibjc->aIbJc", m4, x5,
                    precision=jax.lax.Precision.HIGHEST)
    return y5.reshape(-1)


def heisenberg_matvec(params, x: jax.Array) -> jax.Array:
    """y = H x for the XXZ chain; params = (j, jz, zz_diag, group_mats)."""
    j, jz, diag, group_mats = params
    n = diag.shape[0].bit_length() - 1
    groups = _bit_groups(n)
    y = (jz * diag).astype(x.dtype) * x

    # Intra-group exchange: one matrix per bit group.
    shape = tuple(1 << s for s in reversed(groups))
    x3 = x.reshape(shape)
    acc = jnp.zeros_like(x3)
    for axis, mat in zip(range(len(groups) - 1, -1, -1), group_mats):
        g = jnp.tensordot(mat.astype(x.dtype), x3, axes=[[1], [axis]],
                          precision=jax.lax.Precision.HIGHEST)
        acc = acc + jnp.moveaxis(g, 0, axis)
    y = y + j * acc.reshape(-1)

    # Boundary bonds: last bit of each group <-> first bit of the next,
    # plus the PBC wrap bond (n-1, 0) when n spans more than one group.
    starts = np.cumsum([0] + groups[:-1]).tolist()
    pair_acc = jnp.zeros_like(x)
    for gi in range(len(groups) - 1):
        p = starts[gi] + groups[gi] - 1        # MSB of group gi
        q = starts[gi + 1]                     # LSB of group gi+1
        pair_acc = pair_acc + _apply_pair(x, n, p, q)
    if len(groups) > 1:
        pair_acc = pair_acc + _apply_pair(x, n, 0, n - 1)
    y = y + j * pair_acc
    return y


def heisenberg_operator(n: int, j=1.0, jz=1.0,
                        dtype=jnp.float64) -> MatrixFreeOperator:
    """Matrix-free XXZ chain Hamiltonian as a differentiable operator.

    ``j`` (transverse exchange) and ``jz`` (Ising anisotropy) are
    differentiable pytree leaves; ``jz = j`` gives the isotropic
    Heisenberg chain.
    """
    if n < 3:
        raise ValueError("need n >= 3 (PBC double-counts bonds at n=2)")
    groups = _bit_groups(n)
    starts = np.cumsum([0] + groups[:-1]).tolist()
    group_mats = []
    for gi, m in enumerate(groups):
        bonds = tuple((i, i + 1) for i in range(m - 1))
        # Single-group chains carry the PBC bond inside the matrix.
        if len(groups) == 1 and n > 2:
            bonds = bonds + ((0, m - 1),)
        group_mats.append(jnp.asarray(
            _exchange_group_matrix(m, bonds), dtype=dtype))
    diag = jnp.asarray(_zz_diagonal(n, np.float64), dtype=dtype)
    params = (jnp.asarray(j, dtype=dtype), jnp.asarray(jz, dtype=dtype),
              diag, tuple(group_mats))
    return MatrixFreeOperator(heisenberg_matvec, params, dim=1 << n,
                              dtype=dtype)


def heisenberg_dense(n: int, j=1.0, jz=1.0, dtype=jnp.float64) -> jax.Array:
    """Dense XXZ Hamiltonian via Kronecker products (ED oracle, small n)."""
    sp = np.array([[0.0, 1.0], [0.0, 0.0]])
    sm = sp.T
    sz = np.diag([0.5, -0.5])
    eye = np.eye(2)

    def site_op(op, i):
        mats = [eye] * n
        mats[i] = op
        full = mats[0]
        for m in mats[1:]:
            full = np.kron(full, m)
        return full

    h = np.zeros((1 << n, 1 << n))
    for i in range(n):
        ip = (i + 1) % n
        h += 0.5 * float(j) * (site_op(sp, i) @ site_op(sm, ip)
                               + site_op(sm, i) @ site_op(sp, ip))
        h += float(jz) * site_op(sz, i) @ site_op(sz, ip)
    return jnp.asarray(h, dtype=dtype)


def heisenberg_ground_energy(n: int, j=1.0, jz=1.0, *, k: int = 120,
                             tol: float = 1e-10, dtype=jnp.float64):
    """E0 of the XXZ chain through the eigensolver; differentiable in
    (j, jz) to arbitrary order."""
    op = heisenberg_operator(n, j, jz, dtype=dtype)
    lam, _ = dominant_eigh(op, k=min(k, 1 << n), extreme="min", tol=tol)
    return lam
