"""Pallas TPU kernel: blocked-ELLPACK SpMV — the native tier of the hot loop.

The reference leaves its inner matvec to ATen (SURVEY.md §2.4: zero native
code); on TPU the equivalent "native tier" is a Pallas kernel.  SpMV is
HBM-bandwidth-bound (~2 flops per 4 bytes of block data), so the kernel's
job is to stream the block values through VMEM at speed-of-light while the
MXU consumes them:

* grid = (block_rows, blocks_per_row); the last grid axis is innermost, so
  the output block for row ``i`` stays resident in VMEM while its partial
  products accumulate — no HBM round-trips for ``y``;
* the block-column indices ride in scalar-prefetch (SMEM), so each ``x``
  block is *gathered by the BlockSpec index_map* — Pallas's pipeline
  prefetches the right (bs,) segment of ``x`` into VMEM one grid step
  ahead, overlapping the gather DMA with the previous block's matmul
  (this is the canonical TPU block-sparse pattern; cf. the
  PrefetchScalarGridSpec section of the Pallas guide);
* each (bs, bs) block multiply is a single MXU op with
  ``preferred_element_type=f32``.

A ``jax.custom_vjp``-free design: the caller (``BellOperator``) is linear
in ``vals`` and ``x``, and the XLA einsum path defines the same math, so
AD is routed through the XLA path by ``jax.custom_jvp`` below — the Pallas
kernel stays forward-only (it is only ever on the non-differentiated
Lanczos/CG hot loop; eigensolver gradients come from the IFT rules, never
from differentiating the iteration).

ROOFLINE (measured on the v5e chip, n=2^19, bs=128, 17 blocks/row, 20
chained SpMVs; HBM peak ~819 GB/s):

* f32 values: 154.4 Gnnz/s = 618 GB/s value stream; with the x gathers
  (bs·4 B per bs² block bytes ≈ 1.6%) and the y write, ~630 GB/s total
  = **77% of peak** (XLA fallback: 612 GB/s).
* bf16 values (narrow tier): 263 Gnnz/s = **1.70x** the f32 tier at a
  measured 1.7e-3 matvec error — 527 GB/s value stream ≈ 67% of peak
  (XLA fallback: 514 GB/s).

Where the residual gap lives: the per-step x gathers.  Each grid step
issues G small (bs·4 B = 512 B) DMAs whose cost is engine
latency/occupancy, not bytes — a fixed time that does NOT shrink when
the value stream halves, which is why the bf16 tier lands at 1.7x
rather than 2.0x and a few points lower on %-of-peak.  Measured
levers: gather-pipeline depth 2 -> 4 plus row group 64 -> 128 took the
bf16 tier 250 -> 264 Gnnz/s; the row-group sweep below sets the f32
point.  Closing the rest would need coalescing the per-row gathers
into block-level DMAs, which requires contiguity the generic BELL
format does not guarantee (a banded-matrix special case could).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-specific bits are optional so CPU test runs can import this.
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None


import os

# Optional override for tuning experiments; 0 = auto (see _pick_row_group).
_ROW_GROUP = int(os.environ.get("DSE_SPMV_ROW_GROUP", "0"))

# Scoped-VMEM budget for the two pipeline buffers of the vals stream.  The
# TPU compiler's scoped-vmem limit is 16 MiB; leave headroom for y, the
# gather scratch and semaphores.  Measured on the v5e chip (n=2^19,
# bs=128, 17 blocks/row): row group 8 -> 142 Gnnz/s, 16 -> 155, 32 -> 155,
# 64 -> 157 (XLA fallback: 153); 128 OOMs scoped VMEM.  Fewer, larger
# grid steps amortize the per-step overhead (semaphore waits + G gather
# DMA starts) against a longer vals DMA.
_VALS_VMEM_BUDGET = 12 * 1024 * 1024


def _pick_row_group(nb: int, bs: int, itemsize: int) -> int | None:
    """Largest row group that tiles nb and keeps 2 vals buffers in budget."""
    if _ROW_GROUP:
        return _ROW_GROUP if nb % _ROW_GROUP == 0 else None
    for g in (128, 64, 32, 16, 8):
        if nb % g == 0 and 2 * g * bs * bs * itemsize <= _VALS_VMEM_BUDGET:
            return g
    return None


# Gather-pipeline depth: how many grid steps of x-segment DMAs are in
# flight at once.  The G per-step gathers are small (bs * 4 bytes each),
# so their cost is DMA-engine latency/occupancy, not bytes; one step of
# lookahead (classic double buffering) only hides them behind a single
# vals-block fetch, which stops being enough once the bf16 tier halves
# the vals stream.  Depth 4 gives each gather burst ~3 vals-fetches of
# time to complete.  VMEM cost: depth * G * bs * 4 bytes (256 KiB at
# G=128, bs=128) — negligible next to the vals buffers.
_GATHER_DEPTH = 4


def _spmv_kernel(depth, cols_ref, vals_ref, x_hbm_ref, y_ref, xg_ref,
                 sems):
    # Grid: (row-group i, slot j).  Each step streams a (G, 1, bs, bs)
    # stack of value blocks through the Pallas pipeline (the bandwidth
    # driver) while the G needed x segments are pulled from HBM by
    # explicit sliced DMAs with dynamic offsets from scalar-prefetch —
    # dynamic *gathers* in VMEM and 1-row output blocks both violate TPU
    # tiling rules, so the gather happens at the DMA level instead.
    # The gathers run ``depth`` steps ahead of the compute (see
    # _GATHER_DEPTH): step s starts step s+depth-1's segment DMAs, so
    # each burst of G small DMAs has depth-1 vals-block fetches of time
    # to land (without lookahead the ~G small-DMA latencies serialize
    # with compute and halve throughput).
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    total = pl.num_programs(0) * nj      # static: the grid is static
    g = vals_ref.shape[0]

    @pl.when(j == 0)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    s = i * nj + j
    slot = jax.lax.rem(s, jnp.int32(depth))

    # cols rides in scalar-prefetch SMEM *transposed* to (max_blk, nb):
    # SMEM pads the minor dimension to 128 lanes, so the natural
    # (nb, max_blk) layout would waste 128/max_blk x of the 1 MiB SMEM
    # budget and exhaust it around nb ~ 2000 block-rows.
    # One DMA semaphore per pipeline slot, shared by that slot's G
    # copies (each wait retires one copy's worth): per-copy semaphores
    # would need depth*G sflag words and overflow the ~2 KiB semaphore-
    # flag space at G=128, depth=4.
    def start_gathers(step, into_slot):
        ii = jax.lax.div(step, jnp.int32(nj))
        jj = jax.lax.rem(step, jnp.int32(nj))
        for r in range(g):
            idx = cols_ref[jj, ii * g + r]
            pltpu.make_async_copy(
                x_hbm_ref.at[idx], xg_ref.at[into_slot, r],
                sems.at[into_slot],
            ).start()

    @pl.when(s == 0)
    def _():
        # Prime the pipeline: steps 0 .. depth-2 into their slots.
        for d in range(min(depth - 1, total)):
            start_gathers(jnp.int32(d), jnp.int32(d % depth))

    @pl.when(s + (depth - 1) < total)
    def _():
        start_gathers(s + jnp.int32(depth - 1),
                      jax.lax.rem(s + jnp.int32(depth - 1),
                                  jnp.int32(depth)))

    for r in range(g):
        pltpu.make_async_copy(
            x_hbm_ref.at[0], xg_ref.at[slot, r], sems.at[slot],
        ).wait()

    # Narrow-values tier: bf16 lives in HBM (that is where the 2x
    # bandwidth win is); on-core the blocks are upcast to f32 in VMEM
    # before the dot — Mosaic's batched matmul has no bf16 lowering for
    # this (G,K)-vector rhs shape, the VPU convert is free next to the
    # HBM stream, and the multiply then carries only the STORAGE
    # rounding (no extra bf16 multiply error) — one clean error budget.
    blocks = vals_ref[:, 0].astype(y_ref.dtype)  # (G, bs, bs)
    y_ref[...] += jax.lax.dot_general(
        blocks, xg_ref[slot],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,    # full f32, not bf16 passes
        preferred_element_type=y_ref.dtype)


def _bell_spmv_pallas(vals, cols, x, *, interpret: bool = False):
    nb, max_blk, bs, _ = vals.shape
    g = _pick_row_group(nb, bs, vals.dtype.itemsize)
    smem_bytes = max_blk * (-(-nb // 128) * 128) * 4
    if g is None or smem_bytes > 768 * 1024:
        # Row count not tileable, or the index table would overflow the
        # 1 MiB scalar-memory budget -> XLA fallback.
        return _bell_spmv_xla(vals, cols, x)
    # Narrow-values tier (vals stored bf16): ONLY the value blocks are
    # narrow — x stays at its own (f32) dtype end to end.  The x gather
    # is ~1/bs of the value stream, so narrowing it would buy <1%
    # bandwidth while costing an extra rounding AND hitting Mosaic's
    # packed-bf16 single-row memref_slice limitation in the gather DMA.
    out_dtype = x.dtype
    depth = min(_GATHER_DEPTH, (nb // g) * max_blk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,            # cols
        grid=(nb // g, max_blk),
        in_specs=[
            pl.BlockSpec((g, 1, bs, bs), lambda i, j, cols: (i, j, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),       # x stays in HBM
        ],
        out_specs=pl.BlockSpec((g, bs), lambda i, j, cols: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((depth, g, bs), x.dtype),     # gather pipeline
            pltpu.SemaphoreType.DMA((depth,)),
        ],
    )
    y = pl.pallas_call(
        functools.partial(_spmv_kernel, depth),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, bs), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * max_blk * bs * bs,
            bytes_accessed=vals.size * vals.dtype.itemsize
            + x.size * x.dtype.itemsize * max_blk,
            transcendentals=0,
        ),
    )(cols.T, vals, x.reshape(-1, bs))
    return y.reshape(-1)


def _bell_spmv_xla(vals, cols, x):
    nb, max_blk, bs, _ = vals.shape
    out_dtype = x.dtype
    xb = x.reshape(-1, bs)  # nb_cols may exceed nb (rectangular row panel)
    # Upcast narrow-stored values at the dot (no-op when dtypes agree):
    # XLA fuses the convert into the einsum, so the HBM read stays bf16
    # while the multiply matches the Pallas kernel's error budget
    # (storage rounding only).
    y = jnp.einsum("ijab,ijb->ia", vals.astype(out_dtype), xb[cols],
                   precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=out_dtype)
    return y.reshape(-1)


@functools.partial(jax.custom_jvp, nondiff_argnums=(3,))
def bell_spmv(vals, cols, x, interpret: bool = False):
    """y = A x for a blocked-ELL matrix; Pallas kernel forward, XLA math
    for derivatives (bilinear in (vals, x), so the JVP is two more SpMVs).

    ``A`` may be a rectangular row panel: ``vals`` is
    (nb_rows, max_blk, bs, bs) while ``x`` has length ``nb_cols * bs``
    with ``cols`` indexing block-columns in [0, nb_cols) — this is how the
    row-sharded distributed operator applies its local panel against the
    gathered global vector.  The square case is nb_cols == nb_rows.
    """
    return _bell_spmv_pallas(vals, cols, x, interpret=interpret)


@bell_spmv.defjvp
def _bell_spmv_jvp(interpret, primals, tangents):
    vals, cols, x = primals
    dvals, _, dx = tangents  # cols is integer -> float0 tangent, ignored
    y = bell_spmv(vals, cols, x, interpret)
    # Tangents go through the XLA einsum/gather path: those are standard
    # linear ops, so JAX can transpose them (reverse mode) and
    # differentiate them again (arbitrary order), which a Pallas call in
    # the tangent trace could not offer.  The kernel carries the primal
    # hot loop; derivatives are rare per solve (one IFT rule application).
    dy = _bell_spmv_xla(dvals, cols, x) + _bell_spmv_xla(vals, cols, dx)
    return y, dy
