"""Smoke tests: every example driver must run end-to-end with tiny args
and produce finite numbers (regression: the drivers silently routed f64
onto the emulated-TPU backend and NaN'd / crashed — examples are user
surface, so they get the same guardrails as the library)."""

import os
import subprocess
import sys

import pytest

_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))

_CASES = [
    ("tfim_ed.py", ["--n", "6", "--points", "2"]),
    ("tfim_sparse.py", ["--n", "8", "--points", "2", "--k", "40"]),
    ("tfim_sparse.py", ["--n", "8", "--points", "3", "--k", "40",
                        "--batched"]),
    ("heisenberg.py", ["--n", "6", "--points", "3", "--k", "40"]),
    ("spectral.py", ["--n", "6", "--points", "2"]),
    ("ising2d.py", ["--points", "2", "--chi", "8", "--steps", "8"]),
    ("distributed_lanczos.py", ["--n", "8", "--k", "30"]),
    ("transfer_spectrum.py",
     ["--points", "2", "--chi", "8", "--steps", "10"]),
    ("lobpcg_precond.py", ["--n", "10", "--maxiter", "200"]),
    ("spectrum_slice.py", ["--n", "10", "--dos-points", "10",
                          "--maxiter", "150"]),
    ("vibrational_modes.py", ["--n", "100"]),
    ("sharded_sparse.py", ["--n", "512", "--bs", "16", "--k", "30"]),
    ("complex_spectrum.py", ["--n", "48", "--m", "5"]),
]


@pytest.mark.parametrize("script,args", _CASES,
                         ids=[c[0] for c in _CASES])
def test_example_runs_clean(script, args):
    env = dict(os.environ)
    # The examples pick their own platform (CPU for f64 validation); make
    # sure the test harness's own pinning doesn't leak in.
    env.pop("JAX_PLATFORMS", None)
    # Share the suite's persistent compile cache with the subprocess:
    # without it every suite run re-pays full XLA compilation inside each
    # example (~20-40 s apiece — the examples were the slowest "tests").
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.abspath(
        os.path.join(_ROOT, ".jax_cache_tests"))
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1.0"
    # The package is used from a source checkout (not installed); the
    # examples bootstrap sys.path themselves, but keep the subprocess
    # robust even if that ever regresses.
    env["PYTHONPATH"] = _ROOT + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, os.path.join(_ROOT, "examples", script), *args],
        capture_output=True, text=True, timeout=420, cwd=_ROOT, env=env)
    assert r.returncode == 0, f"{script} failed:\n{r.stderr[-2000:]}"
    assert "nan" not in r.stdout.lower(), (
        f"{script} produced NaN:\n{r.stdout[-2000:]}")
