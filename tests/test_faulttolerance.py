"""Fault injection + elastic recovery rehearsal (SURVEY §5 S3).

The reference has nothing of the kind (runs are seconds); the survey
scopes the subsystem to restart-from-state checkpointing for long runs.
This test closes the round-3 "partial" by actually INJECTING a failure:
a worker drives thick-restart Lanczos cycle by cycle through the public
``restart_init``/``restart_cycle`` API, checkpoints each cycle, and
SIGKILLs itself mid-run; the driver detects the crash (returncode -9),
relaunches, the worker resumes from the newest checkpoint, and the final
eigenvalue must match an uninterrupted run BITWISE (the RestartState
pytree is the complete deterministic solver state).
"""

import os
import subprocess
import sys

_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
_WORKER = os.path.join(os.path.dirname(__file__), "restart_crash_worker.py")

N_CYCLES = 6


def _run(ckpt_dir, *extra):
    env = dict(os.environ)
    env["PYTHONPATH"] = _ROOT + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, _WORKER, ckpt_dir, str(N_CYCLES), *extra],
        capture_output=True, text=True, timeout=300, cwd=_ROOT, env=env)


def test_sigkill_midrun_then_resume_matches_uninterrupted(tmp_path):
    # Uninterrupted oracle run.
    clean = _run(str(tmp_path / "clean"))
    assert clean.returncode == 0, clean.stdout[-2000:]
    done_clean = [l for l in clean.stdout.splitlines()
                  if l.startswith("DONE")]
    assert done_clean, clean.stdout

    # Injected failure: the worker kills itself after cycle 2.
    crash_dir = str(tmp_path / "crash")
    crashed = _run(crash_dir, "--crash-after", "2")
    assert crashed.returncode == -9, (crashed.returncode,
                                      crashed.stdout[-500:])
    assert "DONE" not in crashed.stdout
    assert "cycle 2" in crashed.stdout          # progress was persisted

    # Detection + elastic resume: same command, fresh process.
    resumed = _run(crash_dir)
    assert resumed.returncode == 0, resumed.stdout[-2000:]
    assert "resumed from cycle 2" in resumed.stdout
    # Only the remaining cycles ran.
    assert "cycle 2 " not in resumed.stdout.replace("resumed from cycle 2",
                                                    "")
    done_resumed = [l for l in resumed.stdout.splitlines()
                    if l.startswith("DONE")]
    assert done_resumed, resumed.stdout

    # Bitwise agreement of the final state with the uninterrupted run,
    # and agreement with the dense oracle the worker prints alongside.
    assert done_resumed[0] == done_clean[0], (done_resumed, done_clean)
    lam = float(done_clean[0].split("lam=")[1].split()[0])
    exact = float(done_clean[0].split("exact=")[1].split()[0])
    assert abs(lam - exact) < 1e-8 * max(1.0, abs(exact))
