"""Tests for the auxiliary subsystems (timing, checkpoint, logging,
diagnostics) — all components the reference lacks entirely (SURVEY.md §5).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from dominantsparseeigenad_tpu import DenseOperator, cg, lanczos
from dominantsparseeigenad_tpu.utils import (
    JsonlLogger, cg_relative_residual, lanczos_health, load_pytree,
    orthogonality_loss, ritz_residual, save_pytree, sync, timeit)


def _sym(n, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n))
    return jnp.asarray((a + a.T) / 2)


def test_timeit_and_sync():
    a = _sym(64)
    f = jax.jit(lambda x: x @ x)
    res = timeit(f, a, repeats=3, warmup=1)
    assert len(res.times_s) == 3 and res.best > 0
    out = sync(f(a))
    np.testing.assert_allclose(out, a @ a)


def test_checkpoint_roundtrip(tmp_path):
    a = _sym(48)
    res = lanczos(DenseOperator(a), k=20)
    path = os.path.join(tmp_path, "lanczos_state")
    save_pytree(path, res)
    restored = load_pytree(path, res)
    np.testing.assert_allclose(restored.basis, res.basis)
    np.testing.assert_allclose(restored.alphas, res.alphas)
    np.testing.assert_allclose(restored.betas, res.betas)

    # Deterministic warm restart: resume from the checkpointed last basis
    # vector and reproduce the continuation bit-for-bit.
    v_last = restored.basis[:, -1]
    cont1 = lanczos(DenseOperator(a), k=10, v0=v_last)
    cont2 = lanczos(DenseOperator(a), k=10, v0=v_last)
    np.testing.assert_array_equal(cont1.alphas, cont2.alphas)


def test_jsonl_logger(tmp_path):
    path = os.path.join(tmp_path, "log.jsonl")
    with JsonlLogger(path) as log:
        log.log("lanczos_step", residual=jnp.float64(1e-3), iter=3)
        log.log("done", ok=True)
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["event"] == "lanczos_step"
    assert abs(lines[0]["residual"] - 1e-3) < 1e-12
    assert lines[1]["ok"] is True


def test_diagnostics():
    a = _sym(80, seed=3)
    op = DenseOperator(a)
    res = lanczos(op, k=80)
    health = lanczos_health(op, res)
    # Fully converged k = n run: tiny residuals, orthogonal basis.
    assert float(health["ortho_loss"]) < 1e-10
    assert float(health["ritz_residual_min"]) < 1e-8
    assert float(health["ritz_residual_max"]) < 1e-8
    evals = np.linalg.eigvalsh(np.asarray(a))
    lo, hi = (float(x) for x in health["ritz_extremes"])
    np.testing.assert_allclose([lo, hi], [evals[0], evals[-1]], rtol=1e-10)

    b = jnp.asarray(np.random.default_rng(0).standard_normal(80))
    spd = a @ a.T + 80 * jnp.eye(80)
    x = cg(lambda v: spd @ v, b, tol=1e-12)
    assert float(cg_relative_residual(lambda v: spd @ v, b, x)) < 1e-10


def test_orthogonality_loss_complex_basis():
    """Regression (round-4 review): the Gram used a plain transpose, so a
    perfectly orthonormal COMPLEX Lanczos basis reported O(1) loss."""
    from dominantsparseeigenad_tpu.ops.lanczos import lanczos
    from dominantsparseeigenad_tpu.utils.diagnostics import (
        orthogonality_loss)

    rng = np.random.default_rng(7)
    h = rng.standard_normal((40, 40)) + 1j * rng.standard_normal((40, 40))
    h = jnp.asarray((h + h.conj().T) / 2)
    res = lanczos(h, 20)
    assert float(orthogonality_loss(res)) < 1e-12
