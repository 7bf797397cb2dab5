"""Structured metrics logging.

The reference logs nothing beyond prints + matplotlib (SURVEY.md §5).
Here: a minimal JSONL logger for per-iteration solver records (residual
norms, Ritz values, orthogonality loss, nnz/s) that plays well with jit —
metrics are computed *inside* the compiled program as arrays (see
``dominant_eigh(..., with_info=True)`` / ``ops.cg.solve_deflated_info`` /
``utils.diagnostics``) and logged host-side afterwards.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


class JsonlLogger:
    """Append-only JSONL metrics log (file or stderr)."""

    def __init__(self, path: str | None = None):
        self._fh = open(path, "a") if path else sys.stderr
        self._owns = path is not None

    def log(self, event: str, **fields):
        rec = {"t": time.time(), "event": event}
        for k, v in fields.items():
            if hasattr(v, "tolist"):
                v = np.asarray(v).tolist()
            rec[k] = v
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()

    def close(self):
        if self._owns:
            self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
