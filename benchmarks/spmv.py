"""SpMV throughput benchmark — the BASELINE "nnz/s/chip" headline metric.

Runs the blocked-ELL SpMV (Pallas kernel and XLA gather-einsum fallback)
on a synthetic block-banded symmetric operator (BASELINE config #5
single-chip flavor) and reports Gnnz/s and effective GB/s, with the
tunnel round-trip overhead measured and subtracted so the device-side
number is honest.

Run: python benchmarks/spmv.py --n 524288 --bs 128 --bpr 17
"""

import argparse
import json
import os
import sys
import time

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp

from dominantsparseeigenad_tpu import BellOperator, bell_spmv, \
    random_bell_operator


def _sync_time(f, *args, repeats=4):
    _ = float(f(*args)[0])          # warmup + queue drain
    ts = []
    for _i in range(repeats):
        t0 = time.perf_counter()
        _ = float(f(*args)[0])      # host transfer = true barrier
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 19)
    ap.add_argument("--bs", type=int, default=128)
    ap.add_argument("--bpr", type=int, default=17)
    args = ap.parse_args()

    op = random_bell_operator(jax.random.PRNGKey(2), n=args.n, bs=args.bs,
                              blocks_per_row=args.bpr, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(3), (args.n,), jnp.float32)
    nnz = op.nnz
    print(f"# backend={jax.default_backend()}  n={args.n}  "
          f"nnz={nnz/1e9:.2f}e9  vals={nnz*4/2**30:.2f} GiB",
          file=sys.stderr)

    # Per-call overhead floor (tunnel round-trip + dispatch).
    tiny = jax.jit(lambda v: v + 1.0)
    overhead = _sync_time(tiny, jnp.ones((8,), jnp.float32), repeats=6)

    f_pal = jax.jit(lambda v, c, xx: bell_spmv(v, c, xx, False))
    f_xla = jax.jit(lambda v, c, xx: BellOperator(
        v, c, args.n, use_pallas=False)._xla_matvec(xx))

    results = {}
    for name, f in [("pallas", f_pal), ("xla", f_xla)]:
        dt = _sync_time(f, op.vals, op.cols, x)
        dev = max(dt - overhead, 1e-9)
        results[name] = nnz / dev / 1e9
        print(f"# {name}: {dt*1e3:.2f}ms raw, {dev*1e3:.2f}ms device -> "
              f"{nnz/dev/1e9:.1f} Gnnz/s ({nnz*4/dev/1e9:.0f} GB/s)",
              file=sys.stderr)

    print(json.dumps({
        "metric": "bell_spmv_nnz_per_s_per_chip",
        "value": round(results["pallas"] * 1e9),
        "unit": "nnz/s",
        "vs_baseline": round(results["pallas"] / results["xla"], 3),
    }))


if __name__ == "__main__":
    main()
