"""Thick-restart Lanczos: bounded-memory convergence, checkpoint/resume."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from dominantsparseeigenad_tpu import lanczos_restarted
from dominantsparseeigenad_tpu.models import tfim_operator, tfim_exact_e0


def test_restarted_beats_single_shot():
    """With the same window size, restarting converges where a single
    k-step run cannot."""
    from dominantsparseeigenad_tpu import lanczos_eigh
    n = 12
    op = tfim_operator(n, 1.0)
    exact = float(tfim_exact_e0(n, 1.0))
    lam_single, _ = lanczos_eigh(op, 20, extreme="min")
    lam_rest, v, res = lanczos_restarted(op, k=20, n_restarts=10,
                                         extreme="min")
    err_single = abs(float(lam_single) - exact)
    err_rest = abs(float(lam_rest) - exact)
    assert err_rest < 1e-10
    assert err_rest < err_single / 100
    assert float(jnp.linalg.norm(op.matvec(v) - lam_rest * v)) < 1e-9


def test_restarted_dense_max():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((256, 256))
    a = jnp.asarray((a + a.T) / 2)
    lam, v, _ = lanczos_restarted(a, k=28, n_restarts=8, extreme="max")
    evals = np.linalg.eigvalsh(np.asarray(a))
    np.testing.assert_allclose(lam, evals[-1], rtol=1e-11)


def test_restarted_jit_and_deterministic():
    op = tfim_operator(10, 0.8)
    f = jax.jit(lambda: lanczos_restarted(op, k=16, n_restarts=6)[0])
    a, b = float(f()), float(f())
    assert a == b


def test_restart_forward_in_dominant_eigh():
    """dominant_eigh(restart_cycles=...) — the bounded-memory forward
    composes with the IFT derivatives to machine precision (the rule only
    needs the converged pair)."""
    from dominantsparseeigenad_tpu.models import tfim_exact_e0
    n = 12

    from dominantsparseeigenad_tpu import dominant_eigh

    def e0(g):
        lam, _ = dominant_eigh(tfim_operator(n, g), k=24,
                               restart_cycles=10, extreme="min", tol=1e-11)
        return lam

    val, grad = jax.jit(jax.value_and_grad(e0))(jnp.float64(1.0))
    ex_v = tfim_exact_e0(n, 1.0)
    ex_g = jax.grad(lambda g: tfim_exact_e0(n, g))(jnp.float64(1.0))
    np.testing.assert_allclose(val, ex_v, rtol=1e-12)
    np.testing.assert_allclose(grad, ex_g, rtol=1e-12)
    d2 = jax.jit(jax.grad(jax.grad(e0)))(jnp.float64(1.0))
    ex_2 = jax.grad(jax.grad(lambda g: tfim_exact_e0(n, g)))(jnp.float64(1.0))
    np.testing.assert_allclose(d2, ex_2, rtol=1e-9)


def test_restart_cycle_clamps_oversized_k():
    """Regression (round-4 review): the documented cycle-by-cycle driving
    pattern passes the USER's k to restart_cycle, while restart_init
    clamps its own k to op.dim — an unclamped cycle then builds a basis
    wider than the space whose spurious ~0 Ritz values 'converge'
    silently.  The clamped call must match the correctly-sized one."""
    from dominantsparseeigenad_tpu.ops.restart import (
        restart_cycle, restart_extract, restart_init)

    rng = np.random.default_rng(7)
    a = rng.standard_normal((32, 32))
    a = jnp.asarray((a + a.T) / 2)

    state_big = restart_init(a, k=64)     # clamps to dim=32 internally
    state_ref = restart_init(a, k=32)
    for _ in range(4):
        state_big, _ = restart_cycle(a, state_big, 64)   # must clamp too
        state_ref, _ = restart_cycle(a, state_ref, 32)
    np.testing.assert_allclose(np.asarray(state_big.theta),
                               np.asarray(state_ref.theta), rtol=1e-12)
    lam, _, _ = restart_extract(state_big)
    evals = np.linalg.eigvalsh(np.asarray(a))
    np.testing.assert_allclose(float(lam), evals[0], rtol=1e-10)


def test_restart_tiny_operator_retains_a_ritz_vector():
    """Regression (round-4 review): a dim-3 operator clamps k to 3 and
    the k//4 default made num_kept l = 0 — empty Ritz arrays that
    crashed restart_extract with an IndexError.  The default now floors
    at 1; an explicit num_kept=0 is rejected."""
    a = jnp.diag(jnp.asarray([1.0, 2.0, 5.0]))
    lam, v, _ = lanczos_restarted(a, k=64, n_restarts=3)
    np.testing.assert_allclose(float(lam), 1.0, rtol=1e-10)
    from dominantsparseeigenad_tpu.ops.restart import restart_init
    import pytest
    with pytest.raises(ValueError, match="num_kept >= 1"):
        restart_init(a, k=3, num_kept=0)


def test_stepped_driver_matches_fused():
    """The cycle-stepped Python driver with jit + donated state (how
    benchmarks/restart_bench.py --stepped drives the 134M-dim N=27
    point) must reproduce the fused lanczos_restarted result.

    Runs in a SUBPROCESS (``stepped_driver_worker.py``, same isolation
    pattern as the fault-tolerance worker): inside loaded xdist workers
    XLA:CPU segfaulted nondeterministically compiling ANY form of this
    check (jitted, eager, with or without the compile cache) — poisoned
    worker-process state, not this code; a fresh interpreter removes
    the variable.  See the worker's docstring for the crash history.
    """
    import subprocess
    import sys

    worker = os.path.join(os.path.dirname(__file__),
                          "stepped_driver_worker.py")
    proc = subprocess.run([sys.executable, worker], capture_output=True,
                          text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "parity OK" in proc.stdout
