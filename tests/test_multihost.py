"""Multi-process (DCN-path) rehearsal of the distributed runtime.

The rest of the suite runs every collective single-process on virtual
devices (the ICI analogue); this test actually EXECUTES the multi-host
entry point ``parallel.mesh.init_distributed`` — two OS processes, 4
virtual CPU devices each, one global 8-device mesh — and runs a sharded
Lanczos + IFT-gradient step across the process boundary, asserted
against a dense oracle inside each worker (see multihost_worker.py).

Reference analogue: none — the reference is strictly single-process
(SURVEY.md §2.5); this covers the survey's "multi-host runtime via
jax.distributed.initialize" row (§5).
"""

import os
import socket
import subprocess
import sys

_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_sharded_lanczos_gradient():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)   # worker pins its own platform
    env.pop("XLA_FLAGS", None)       # ...and its own device count
    env["PYTHONPATH"] = _ROOT + os.pathsep + env.get("PYTHONPATH", "")
    # Keep the coordinator's gRPC out of any proxies the environment sets.
    env["no_proxy"] = "127.0.0.1,localhost," + env.get("no_proxy", "")

    procs = [subprocess.Popen(
        [sys.executable, worker, coord, "2", str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=_ROOT, env=env) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert f"OK proc={i}" in out, out[-1000:]
    # Both processes must agree on the eigenvalue they computed together.
    lam0 = outs[0].split("lam=")[1].split()[0]
    lam1 = outs[1].split("lam=")[1].split()[0]
    assert lam0 == lam1, (lam0, lam1)
