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

# Runnable from a source checkout without installation: put the repo
# root ahead of the script dir on sys.path.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp

from dominantsparseeigenad_tpu import BellOperator, bell_spmv, \
    random_bell_operator


N_CHAIN = 20  # SpMVs per timed call: amortizes the ~25 ms tunnel RTT


def _sync_time(f, *args, repeats=4):
    _ = float(f(*args)[0])          # warmup + queue drain
    ts = []
    for _i in range(repeats):
        t0 = time.perf_counter()
        _ = float(f(*args)[0])      # host transfer = true barrier
        ts.append(time.perf_counter() - t0)
    return min(ts)


def run_sharded(args):
    """BASELINE config #5 as written: the synthetic BELL operator
    row-partitioned over a p-device mesh (RowShardedBellOperator), SpMV
    chained under jit; emits *per-chip* nnz/s so the number is comparable
    across shard counts.  On the single real TPU chip p=1 measures the
    shard_map overhead; on the 8-virtual-device CPU mesh it validates
    collective correctness at scale (same code runs unchanged on a pod)."""
    import numpy as np
    from jax.sharding import Mesh
    from dominantsparseeigenad_tpu.parallel import (
        RowShardedBellOperator, shard_vector)
    from dominantsparseeigenad_tpu.parallel.mesh import BATCH_AXIS, SHARD_AXIS

    p = args.shards
    devices = jax.devices()[:p]
    mesh = Mesh(np.asarray(devices).reshape(1, p), (BATCH_AXIS, SHARD_AXIS))
    op = random_bell_operator(
        jax.random.PRNGKey(2), n=args.n, bs=args.bs,
        blocks_per_row=args.bpr, dtype=jnp.float32,
        vals_dtype=jnp.bfloat16 if args.bf16_vals else None)
    sop = RowShardedBellOperator.from_bell(op, mesh, mode=args.mode)
    x = shard_vector(jax.random.normal(jax.random.PRNGKey(3), (args.n,),
                                       jnp.float32), mesh)
    nnz = sop.nnz
    print(f"# sharded backend={jax.default_backend()} p={p} mode={args.mode}"
          f" n={args.n} nnz={nnz/1e9:.2f}e9", file=sys.stderr)

    @jax.jit
    def run(o, xx):
        def body(_, cur):
            y = o.matvec(cur)
            return y / jnp.linalg.norm(y)
        return jax.lax.fori_loop(0, N_CHAIN, body, xx)

    dt = _sync_time(run, sop, x) / N_CHAIN
    per_chip = nnz / dt / p
    print(f"# sharded: {dt*1e3:.2f}ms/spmv -> {per_chip/1e9:.1f} Gnnz/s/chip"
          f" ({nnz*4/dt/1e9:.0f} GB/s aggregate)", file=sys.stderr)
    print(json.dumps({
        "metric": "sharded_bell_spmv_nnz_per_s_per_chip",
        "value": round(per_chip),
        "unit": "nnz/s/chip",
        "vs_baseline": round(per_chip / 1e9, 3),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 19)
    ap.add_argument("--bs", type=int, default=128)
    ap.add_argument("--bpr", type=int, default=17)
    ap.add_argument("--shards", type=int, default=0,
                    help="row-partition over this many devices "
                         "(0 = single-device kernel comparison)")
    ap.add_argument("--mode", choices=("all_gather", "ring"),
                    default="all_gather")
    ap.add_argument("--spmm", type=int, default=0, metavar="R",
                    help="benchmark the SpMM tier: A @ X for an (N, R) "
                         "block (the block solvers' workload); reports "
                         "effective nnz*R/s and the speedup over R "
                         "chained SpMVs")
    ap.add_argument("--bf16-vals", action="store_true",
                    help="narrow-values tier: store block values in bf16 "
                         "(f32 accumulate); halves the HBM value stream "
                         "for ~2x nnz/s at the documented eps_bf16 ~ "
                         "3.9e-3 storage-rounding budget (ops/sparse.py; "
                         "measured ~1.7e-3 in ops/pallas_spmv.py)")
    args = ap.parse_args()

    if args.shards:
        if args.spmm:
            ap.error("--spmm with --shards is not wired in this bench; "
                     "the distributed SpMM tier is exercised by "
                     "RowShardedBellOperator.matmat in the test suite")
        return run_sharded(args)

    vals_dtype = jnp.bfloat16 if args.bf16_vals else None
    op = random_bell_operator(jax.random.PRNGKey(2), n=args.n, bs=args.bs,
                              blocks_per_row=args.bpr, dtype=jnp.float32,
                              vals_dtype=vals_dtype)
    x = jax.random.normal(jax.random.PRNGKey(3), (args.n,), jnp.float32)
    nnz = op.nnz
    vb = op.vals.dtype.itemsize
    print(f"# backend={jax.default_backend()}  n={args.n}  "
          f"nnz={nnz/1e9:.2f}e9  vals={nnz*vb/2**30:.2f} GiB "
          f"({op.vals.dtype})", file=sys.stderr)

    # Chain N_CHAIN dependent SpMVs inside one jit so the ~25 ms tunnel
    # round-trip amortizes away (subtracting a separately-measured
    # overhead is too noisy when the kernel itself takes a few ms —
    # it can even produce impossible >bandwidth numbers).
    def chain(spmv_once):
        def run(v, c, xx):
            def body(_, cur):
                y = spmv_once(v, c, cur)
                return y / jnp.linalg.norm(y)
            return jax.lax.fori_loop(0, N_CHAIN, body, xx)
        return jax.jit(run)

    # Off-TPU the non-interpret kernel would reach Mosaic lowering and
    # crash before the JSON line; interpret mode keeps the same code
    # path testable anywhere (the numbers are only meaningful on-chip).
    interp = jax.default_backend() != "tpu"

    if args.spmm:
        r = args.spmm
        from dominantsparseeigenad_tpu import bell_spmm
        X = jax.random.normal(jax.random.PRNGKey(3), (args.n, r),
                              jnp.float32)

        f_mm = chain(lambda v, c, xx: bell_spmm(v, c, xx, interp,
                                                op.slot_plan))
        f_cols = chain(lambda v, c, xx: jnp.stack(
            [bell_spmv(v, c, xx[:, j], interp, op.slot_plan)
             for j in range(r)], axis=1))
        dt_mm = _sync_time(lambda v, c, xx: f_mm(v, c, xx)[:, 0],
                           op.vals, op.cols, X) / N_CHAIN
        dt_cols = _sync_time(lambda v, c, xx: f_cols(v, c, xx)[:, 0],
                             op.vals, op.cols, X) / N_CHAIN
        eff = nnz * r / dt_mm
        print(f"# spmm r={r}: {dt_mm*1e3:.2f}ms vs {dt_cols*1e3:.2f}ms "
              f"for {r} chained SpMVs ({dt_cols/dt_mm:.1f}x) -> "
              f"{eff/1e9:.0f} Gnnz*r/s", file=sys.stderr)
        print(json.dumps({
            "metric": f"bell_spmm_r{r}_nnzr_per_s_per_chip",
            "value": round(eff),
            "unit": "nnz*r/s",
            "vs_baseline": round(dt_cols / dt_mm, 3),
        }))
        return

    # Pass the slot plan exactly as BellOperator.matvec would: the
    # measured path must be the production path (the banded slab-DMA
    # kernel), not the generic gather fallback.
    f_pal = chain(lambda v, c, xx: bell_spmv(v, c, xx, interp,
                                             op.slot_plan))
    f_xla = chain(lambda v, c, xx: BellOperator(
        v, c, args.n, use_pallas=False)._xla_matvec(xx))

    results = {}
    for name, f in [("pallas", f_pal), ("xla", f_xla)]:
        dt = _sync_time(f, op.vals, op.cols, x) / N_CHAIN
        results[name] = nnz / dt / 1e9
        print(f"# {name}: {dt*1e3:.2f}ms/spmv (x{N_CHAIN} chained) -> "
              f"{nnz/dt/1e9:.1f} Gnnz/s ({nnz*vb/dt/1e9:.0f} GB/s "
              f"value stream)", file=sys.stderr)

    if args.bf16_vals:
        # Report the tier's accuracy cost next to its speed: relative
        # matvec error of the narrow tier vs the f32-storage oracle.
        # Run at a reduced size — the storage-rounding budget is
        # size-independent, and a full-size f32 twin plus its on-chip
        # upcast temp on top of the bench buffers OOMs HBM.
        n_chk = min(args.n, 1 << 16)
        op32 = random_bell_operator(jax.random.PRNGKey(2), n=n_chk,
                                    bs=args.bs, blocks_per_row=args.bpr,
                                    dtype=jnp.float32)
        op16 = op32.astype_vals(jnp.bfloat16)
        xc = jax.random.normal(jax.random.PRNGKey(3), (n_chk,),
                               jnp.float32)
        y16 = BellOperator(op16.vals, op16.cols, n_chk,
                           use_pallas=False).matvec(xc)
        y32 = op32._xla_matvec(xc)
        rel = float(jnp.linalg.norm(y16 - y32) / jnp.linalg.norm(y32))
        print(f"# bf16-vals matvec rel err vs f32 storage: {rel:.2e} "
              f"(n={n_chk})", file=sys.stderr)

    print(json.dumps({
        "metric": ("bell_spmv_bf16vals_nnz_per_s_per_chip"
                   if args.bf16_vals else "bell_spmv_nnz_per_s_per_chip"),
        "value": round(results["pallas"] * 1e9),
        "unit": "nnz/s",
        "vs_baseline": round(results["pallas"] / results["xla"], 3),
    }))


if __name__ == "__main__":
    main()
