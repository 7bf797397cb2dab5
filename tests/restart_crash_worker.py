"""Fault-injection worker for test_faulttolerance.py.

Drives thick-restart Lanczos cycle by cycle through the public
``restart_init`` / ``restart_cycle`` API, checkpointing the
:class:`RestartState` pytree after every cycle — and, when asked,
SIGKILLs ITSELF mid-run (a real crash: no atexit, no flushing, exactly
what a preempted host looks like).  On resume it loads the newest
checkpoint and continues from that cycle.  Determinism of the state
pytree makes crashed-and-resumed runs bitwise-reproducible.

Usage:
  python restart_crash_worker.py <ckpt_dir> <n_cycles> [--crash-after C]
"""

import argparse
import os
import signal
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

N, K = 384, 24


def operator():
    from dominantsparseeigenad_tpu import DenseOperator
    rng = np.random.default_rng(7)
    a = rng.standard_normal((N, N))
    return DenseOperator(jnp.asarray((a + a.T) / 2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt_dir")
    ap.add_argument("n_cycles", type=int)
    ap.add_argument("--crash-after", type=int, default=-1,
                    help="SIGKILL self after checkpointing this cycle")
    args = ap.parse_args()

    from dominantsparseeigenad_tpu import (restart_cycle, restart_extract,
                                           restart_init)
    from dominantsparseeigenad_tpu.utils.checkpoint import (load_pytree,
                                                            save_pytree)

    op = operator()
    os.makedirs(args.ckpt_dir, exist_ok=True)

    # Failure detection + elastic resume: find the newest complete
    # checkpoint (cycle files are written atomically enough for this
    # rehearsal — the .tree.json lands after the .npz).
    done = sorted(int(f.split("_")[1].split(".")[0])
                  for f in os.listdir(args.ckpt_dir)
                  if f.startswith("cycle_") and f.endswith(".tree.json"))
    state = restart_init(op, K, extreme="min", key=jax.random.PRNGKey(0))
    start = 0
    if done:
        start = done[-1] + 1
        path = os.path.join(args.ckpt_dir, f"cycle_{done[-1]}")
        state = load_pytree(path, state)
        print(f"resumed from cycle {done[-1]}", flush=True)

    for c in range(start, args.n_cycles):
        state, resid = restart_cycle(op, state, K, extreme="min")
        save_pytree(os.path.join(args.ckpt_dir, f"cycle_{c}"), state)
        print(f"cycle {c} resid {float(resid):.3e}", flush=True)
        if c == args.crash_after:
            os.kill(os.getpid(), signal.SIGKILL)  # simulated host failure

    lam, v, resid = restart_extract(state)
    evals = np.linalg.eigvalsh(np.asarray(op.a))
    print(f"DONE lam={float(lam):.15e} exact={evals[0]:.15e} "
          f"resid={float(resid):.3e}", flush=True)


if __name__ == "__main__":
    main()
