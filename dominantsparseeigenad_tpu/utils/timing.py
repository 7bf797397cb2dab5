"""Timing / profiling harness.

The reference has no profiling at all (ad-hoc ``time.time()`` prints in
example scripts at most — SURVEY.md §5).  TPU-native equivalents:

* :func:`sync` / :func:`timeit` — wall-clock measurement that actually
  synchronizes.  NOTE the platform gotcha baked in here: on tunneled TPU
  runtimes (PJRT plugin over a network), ``jax.block_until_ready`` can
  return while work is still queued remotely; only a device→host transfer
  is a true barrier.  ``sync`` therefore pulls one scalar from every
  array leaf.
* :func:`trace` — context manager around ``jax.profiler`` emitting a
  Perfetto/TensorBoard trace directory.
* ``jax.named_scope`` is used at call sites (Lanczos/CG) so traces show
  algorithmic phases, not just fused HLO names.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


def sync(tree):
    """Block until every array in ``tree`` is materialized, for real.

    Forces a device->host read of one element per leaf (a true barrier on
    remote/tunneled PJRT backends where ``block_until_ready`` may be
    asynchronous), then returns ``tree`` unchanged.
    """
    jax.block_until_ready(tree)
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "ravel") and getattr(leaf, "size", 0):
            np.asarray(jax.device_get(leaf.ravel()[0]))
    return tree


@dataclass
class TimingResult:
    times_s: list[float] = field(default_factory=list)

    @property
    def best(self) -> float:
        return min(self.times_s)

    @property
    def median(self) -> float:
        return float(np.median(self.times_s))

    def __repr__(self):
        return (f"TimingResult(best={self.best*1e3:.3f}ms, "
                f"median={self.median*1e3:.3f}ms, n={len(self.times_s)})")


def timeit(fn, *args, repeats: int = 5, warmup: int = 1) -> TimingResult:
    """Measure steady-state wall-clock of ``fn(*args)`` with true syncs."""
    for _ in range(warmup):
        sync(fn(*args))
    res = TimingResult()
    for _ in range(repeats):
        t0 = time.perf_counter()
        sync(fn(*args))
        res.times_s.append(time.perf_counter() - t0)
    return res


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a profiler trace (view in Perfetto / TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
