"""Stepped-vs-fused restart parity check, run in its OWN process.

Exercised by ``test_restart.py::test_stepped_driver_matches_fused`` via
subprocess (the same isolation pattern as ``restart_crash_worker.py``):
when this check ran INSIDE a loaded pytest-xdist worker, XLA:CPU
segfaulted nondeterministically while compiling its programs (three
distinct crash frames across runs — compile-cache read, cache write,
and ``backend_compile_and_load``; the eager variant crashed compiling a
plain primitive), pointing at poisoned worker-process state from
earlier tests, not at this code — standalone it never crashed.  A fresh
interpreter removes that variable entirely.

Drives the cycle-stepped Python driver with jit + donated state (the
exact pattern ``benchmarks/restart_bench.py --stepped`` uses for the
134M-dim N=27 point) and asserts parity with the fused
``lanczos_restarted``.  Exits 0 on success.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from dominantsparseeigenad_tpu import (DenseOperator, lanczos_restarted,
                                       restart_cycle, restart_extract,
                                       restart_init)


def main():
    n, k, cycles = 200, 16, 6
    rng = np.random.default_rng(33)
    a_np = rng.standard_normal((n, n))
    a_np = (a_np + a_np.T) / 2
    op = DenseOperator(jnp.asarray(a_np))

    lam_f, v_f, _ = lanczos_restarted(op, k, n_restarts=cycles)

    init = jax.jit(lambda: restart_init(op, k=k, extreme="min"))
    cyc = jax.jit(functools.partial(restart_cycle, op, k=k,
                                    extreme="min"), donate_argnums=(0,))
    st = init()
    for _ in range(cycles):
        st, _ = cyc(st)
    lam_s, v_s, _ = restart_extract(st)

    np.testing.assert_allclose(float(lam_s), float(lam_f), rtol=1e-12)
    np.testing.assert_allclose(float(lam_s),
                               np.linalg.eigvalsh(a_np)[0], rtol=1e-9)
    np.testing.assert_allclose(np.abs(np.asarray(v_s)),
                               np.abs(np.asarray(v_f)), atol=1e-9)
    print("stepped-driver parity OK")


if __name__ == "__main__":
    main()
