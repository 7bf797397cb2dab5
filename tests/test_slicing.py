"""Polynomial spectrum slicing (north-star addition — the reference has
no interior capability at all): Jackson-Chebyshev filter + LOBPCG +
Rayleigh-Ritz, with an interior-block IFT derivative rule (deflated
MINRES).  Oracles: dense ``np.linalg.eigh`` slices and finite
differences; physics drive on TFIM excited states.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

from dominantsparseeigenad_tpu import (
    DenseOperator, SliceInfo, spectral_bounds, spectral_slice)
from dominantsparseeigenad_tpu.models import tfim_operator
from dominantsparseeigenad_tpu.models.tfim import tfim_dense_hamiltonian


def _sym(n, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n))
    return jnp.asarray((a + a.T) / 2)


def test_bounds_enclose_spectrum():
    a = _sym(200)
    ew = np.linalg.eigh(np.asarray(a))[0]
    lo, hi = spectral_bounds(DenseOperator(a), k=30)
    assert float(lo) < ew[0] and float(hi) > ew[-1]


def test_slice_matches_dense_eigh():
    n = 300
    a = _sym(n)
    ew = np.linalg.eigh(np.asarray(a))[0]
    lo_e = (ew[140] + ew[139]) / 2
    hi_e = (ew[146] + ew[145]) / 2  # 6 eigenvalues inside
    lams, v, info = spectral_slice(DenseOperator(a), lo_e, hi_e, r=8,
                                   degree=100, maxiter=400, tol=1e-8)
    assert float(info.n_inside) == 6.0
    assert float(info.converged) == 1.0
    lams = np.asarray(lams)
    inside = lams[(lams >= lo_e) & (lams <= hi_e)]
    np.testing.assert_allclose(inside, ew[140:146], rtol=1e-10)
    # Orthonormal block; inside vectors are true eigenvectors.
    np.testing.assert_allclose(np.asarray(v.T @ v), np.eye(8), atol=1e-8)


def test_slice_guards():
    op = DenseOperator(_sym(64))
    with pytest.raises(ValueError, match="a < b"):
        spectral_slice(op, 2.0, 1.0)
    with pytest.raises(ValueError, match="dim >= 3"):
        spectral_slice(DenseOperator(_sym(8)), 0.0, 1.0, r=4)


def test_slice_gradients_order2():
    """Interior-block IFT rule (deflated MINRES): check_grads to order 2
    on the sum of inside eigenvalues of a parameterized matrix."""
    n = 48
    a0 = np.asarray(_sym(n, seed=2))
    ew = np.linalg.eigh(a0)[0]
    lo_e = (ew[20] + ew[19]) / 2
    hi_e = (ew[23] + ew[22]) / 2  # 3 eigenvalues inside, r=4 buffer

    def f(mat):
        sym = (mat + mat.T) / 2
        lams, v, _ = spectral_slice(DenseOperator(sym), lo_e, hi_e, r=4,
                                    degree=120, maxiter=300, tol=1e-11)
        w = jnp.asarray([0.0, 1.0, 2.0, 3.0])
        return jnp.sum(lams * w) + jnp.sum(v[0] ** 2)

    check_grads(f, (jnp.asarray(a0),), order=2, modes=("fwd", "rev"),
                atol=2e-3, rtol=2e-3)


def test_slice_tfim_excited_band():
    """Physics drive: the single-flip excitation band of the weak-field
    TFIM, and d(band energy)/dg vs dense-ED finite differences."""
    n, g = 10, 0.3
    ew = np.linalg.eigh(np.asarray(tfim_dense_hamiltonian(n, g)))[0]
    # Lower part of the single-flip excitation band: edges placed in true
    # spectral gaps (left: the 2.9-wide gap above the ground doublet;
    # right: the 0.13 gap after state 11) -> 10 eigenvalues inside.
    lo_e = float((ew[1] + ew[2]) / 2)
    hi_e = float((ew[11] + ew[12]) / 2)

    def band_sum(gv):
        op = tfim_operator(n, gv)
        lams, _, info = spectral_slice(op, lo_e, hi_e, r=14, degree=200,
                                       maxiter=300, tol=1e-9)
        inside = (lams >= lo_e) & (lams <= hi_e)
        return jnp.sum(jnp.where(inside, lams, 0.0)), info

    (val, info) = band_sum(jnp.float64(g))
    n_in = int(float(info.n_inside))
    truth = ew[(ew >= lo_e) & (ew <= hi_e)]
    assert n_in == len(truth)
    np.testing.assert_allclose(float(val), truth.sum(), rtol=1e-9)

    d = jax.grad(lambda gv: band_sum(gv)[0])(jnp.float64(g))
    eps = 1e-5

    def oracle(gv):
        e = np.linalg.eigh(np.asarray(tfim_dense_hamiltonian(n, gv)))[0]
        return e[(e >= lo_e) & (e <= hi_e)].sum()

    fd = (oracle(g + eps) - oracle(g - eps)) / (2 * eps)
    np.testing.assert_allclose(float(d), fd, rtol=1e-6)
