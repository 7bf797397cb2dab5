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

Where the residual gap lives (fitted from the f32/bf16 pair, which
share the grid but halve the bytes): the streaming rate itself is
~720 GB/s, plus a ~2 us FIXED cost per grid step that does not shrink
with the value stream — which is why the bf16 tier lands at ~1.7x
rather than 2.0x.  Measured levers: gather-pipeline depth 2 -> 4 plus
row group 64 -> 128 took the bf16 tier 250 -> 264; the banded
slot-plan slab DMAs (one (G, bs) copy per step instead of G row
gathers, `detect_slot_plan`) bound the gather term.  The remaining
fixed cost matches the (bs, bs) x (bs,) block-GEMV on the MXU — a
vector rhs uses 1/bs of the systolic columns (~2.7 us/step at 1-pass
bf16) — i.e. the narrow tier is at the MXU GEMV floor, not a memory
limit; only a multi-vector (SpMM) workload moves it, and the SpMM tier
(:func:`bell_spmm`, what the block solvers call) does exactly that:

* r=8  f32: 7.41 ms for all 8 vectors — vs 49.98 ms chained SpMVs
  (**6.7x**; the extra 7 vectors ride the same value stream for free);
* r=32 f32: 9.27 ms (**21x**, 3.9 T(nnz·r)/s effective);
* r=8 bf16: 4.35 ms (= the bf16 SpMV time — still value-stream-bound).
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


def _pick_row_group(nb: int, bs: int, itemsize: int,
                    r: int = 1) -> int | None:
    """Largest row group that tiles nb and keeps 2 vals buffers (plus the
    r-wide gather pipeline, SpMM case) in budget."""
    if _ROW_GROUP:
        return _ROW_GROUP if nb % _ROW_GROUP == 0 else None
    for g in (128, 64, 32, 16, 8):
        if nb % g == 0 and (2 * g * bs * bs * itemsize
                            + (_GATHER_DEPTH + 1) * g * bs * r * 4
                            <= _VALS_VMEM_BUDGET):
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


def detect_slot_plan(cols, nb: int):
    """Static per-slot fetch plan from CONCRETE block-column indices.

    Slot ``j`` is a *band* when its column indices are a ring offset of
    the row index: ``cols[i, j] == (i + o) % nb`` for a fixed ``o`` —
    true for every slot of block-banded/circulant operators (e.g. the
    BASELINE config-#5 family, where each stored band is exactly such a
    slot).  A banded slot's x segment for a row group is a CONTIGUOUS
    (G, bs) slab (mod wrap), so the kernel fetches it with ONE slab DMA
    instead of G per-row gathers — removing the DMA-engine occupancy
    the roofline note above identifies as the residual bottleneck.
    Returns a hashable tuple of ("band", o) / ("gather", 0) entries, or
    None when no slot is banded (the generic gather kernel then runs
    unchanged).
    """
    import numpy as np
    cs = np.asarray(cols)
    i = np.arange(nb)
    plan, any_band = [], False
    for j in range(cs.shape[1]):
        o = int(cs[0, j]) % nb
        if np.array_equal(cs[:, j], (i + o) % nb):
            plan.append(("band", o))
            any_band = True
        else:
            plan.append(("gather", 0))
    return tuple(plan) if any_band else None


def _slot_plan_matches(cols, nb, plan) -> bool:
    """Verify a plan's band slots against CONCRETE ``cols`` (a mismatched
    plan would DMA the wrong x slabs — numerically wrong, no error).
    Traced ``cols`` can't be checked here and returns True: under jit the
    plan/cols pairing was validated at the eager call that traced it, or
    at operator construction (``BellOperator`` derives the plan from its
    own concrete cols)."""
    import numpy as np
    try:
        cs = np.asarray(cols)
    except Exception:  # tracer
        return True
    i = np.arange(nb)
    for j, (kind, off) in enumerate(plan):
        if kind == "band" and not np.array_equal(
                cs[:, j], (i + int(off)) % nb):
            return False
    return True


def _spmv_kernel(depth, plan, cols_ref, vals_ref, x_hbm_ref, y_ref,
                 xg_ref, sems):
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
    nb = pl.num_programs(0) * g

    def _row_gathers(jj_static, ii, into_slot):
        for r in range(g):
            idx = cols_ref[jj_static, ii * g + r]
            pltpu.make_async_copy(
                x_hbm_ref.at[idx], xg_ref.at[into_slot, r],
                sems.at[into_slot],
            ).start()

    def start_gathers(step, into_slot):
        ii = jax.lax.div(step, jnp.int32(nj))
        jj = jax.lax.rem(step, jnp.int32(nj))
        if plan is None:
            _row_gathers(jj, ii, into_slot)
            return
        # Static per-slot dispatch (the plan is trace-time data): banded
        # slots fetch their whole (G, bs) slab in ONE DMA — the caller
        # padded x by G rows so the ring wrap never splits the slab.
        for j_st, (kind, off) in enumerate(plan):
            @pl.when(jj == j_st)
            def _(j_st=j_st, kind=kind, off=off):
                if kind == "band":
                    start = jax.lax.rem(ii * g + jnp.int32(off),
                                        jnp.int32(nb))
                    pltpu.make_async_copy(
                        x_hbm_ref.at[pl.ds(start, g)],
                        xg_ref.at[into_slot], sems.at[into_slot],
                    ).start()
                else:
                    _row_gathers(j_st, ii, into_slot)

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

    if plan is None:
        for r in range(g):
            pltpu.make_async_copy(
                x_hbm_ref.at[0], xg_ref.at[slot, r], sems.at[slot],
            ).wait()
    else:
        for j_st, (kind, _off) in enumerate(plan):
            @pl.when(j == j_st)
            def _(kind=kind):
                if kind == "band":
                    pltpu.make_async_copy(
                        x_hbm_ref.at[pl.ds(0, g)], xg_ref.at[slot],
                        sems.at[slot],
                    ).wait()
                else:
                    for r in range(g):
                        pltpu.make_async_copy(
                            x_hbm_ref.at[0], xg_ref.at[slot, r],
                            sems.at[slot],
                        ).wait()

    # Narrow-values tier: bf16 lives in HBM (that is where the 2x
    # bandwidth win is); on-core the blocks are upcast to f32 in VMEM
    # before the dot (Mosaic's batched matmul has no bf16 lowering for
    # this (G,K)-vector rhs shape), then multiplied at DEFAULT (single
    # bf16-pass) precision: re-rounding the upcast blocks is a NO-OP —
    # they are exactly bf16 — so only the f32 x picks up one extra
    # rounding (~budget x2, still inside the documented 3.9e-3), while
    # the matmul runs in 1 MXU pass instead of HIGHEST's 3.  That
    # matters because a (bs,bs)x(bs,) block GEMV uses 1/bs of the
    # systolic array: at HIGHEST the 3-pass GEMV becomes the kernel
    # floor (~4.4 ms/spmv at n=2^19) once bf16 storage halves the HBM
    # time below it.  The f32 tier keeps HIGHEST — its data is genuine
    # f32 and it stays HBM-bound anyway.
    blocks = vals_ref[:, 0].astype(y_ref.dtype)  # (G, bs, bs)
    # HIGHEST on the upcast-f32 operands everywhere: a DEFAULT-precision
    # experiment on the bf16 tier changed neither speed nor accuracy
    # (chip-measured — Mosaic's lowering of this f32 dot is the same),
    # so keep the one precision whose semantics match the XLA oracle.
    prec = jax.lax.Precision.HIGHEST
    xg = xg_ref[slot]
    if xg.ndim == 2:
        # SpMV: (G, bs, bs) x (G, bs) block GEMV.
        y_ref[...] += jax.lax.dot_general(
            blocks, xg,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            precision=prec,
            preferred_element_type=y_ref.dtype)
    else:
        # SpMM: xg is (G, r, bs) (r in the sublane slot); contract the
        # shared bs index with the blocks' COLUMN index:
        # y[o, a] = sum_b x[o, b] A[a, b] — a real MXU matmul per block.
        y_ref[...] += jax.lax.dot_general(
            xg, blocks,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            precision=prec,
            preferred_element_type=y_ref.dtype)


def _bell_spmv_pallas(vals, cols, x, *, interpret: bool = False,
                      slot_plan=None):
    """Shared Pallas driver for SpMV (``x`` (N,)) and SpMM (``x``
    (N, r)): the kernel body is shape-agnostic — the gather/slab DMAs
    and the batched dot pick up the trailing r dimension from the ref
    shapes, and an (N, r) block turns the per-block vector product into
    a real (bs, bs) x (bs, r) MXU matmul."""
    nb, max_blk, bs, _ = vals.shape
    rhs_r = None if x.ndim == 1 else x.shape[-1]
    g = _pick_row_group(nb, bs, vals.dtype.itemsize, rhs_r or 1)
    smem_bytes = max_blk * (-(-nb // 128) * 128) * 4
    if g is None or smem_bytes > 768 * 1024 or (not interpret
                                                and bs % 128 != 0):
        # Row count not tileable, the index table would overflow the
        # 1 MiB scalar-memory budget, or the block size is not a
        # multiple of the 128-lane minor-dim tiling -> XLA fallback.
        # (Mosaic rejects the gather/slab DMAs' (1, bs) HBM memref
        # slices outright for bs < 128 — chip-verified at bs=32 — so
        # small-block operators take the einsum path on hardware;
        # interpret mode has no tiling and keeps exercising the kernel
        # logic at small shapes in the CPU suite.)
        return _bell_spmv_xla(vals, cols, x)
    if slot_plan is not None and (
            len(slot_plan) != max_blk          # stale (pattern changed)
            or x.shape[0] // bs != nb          # rectangular row panel:
            # band offsets are defined on the SQUARE ring (i + o) % nb;
            # against a wider gathered vector they'd fetch slabs
            # unrelated to what cols actually indexes
            or not _slot_plan_matches(cols, nb, slot_plan)):
        slot_plan = None  # generic gathers are always correct
    # Narrow-values tier (vals stored bf16): ONLY the value blocks are
    # narrow — x stays at its own (f32) dtype end to end.  The x gather
    # is ~1/bs of the value stream, so narrowing it would buy <1%
    # bandwidth while costing an extra rounding AND hitting Mosaic's
    # packed-bf16 single-row memref_slice limitation in the gather DMA.
    out_dtype = x.dtype
    depth = min(_GATHER_DEPTH, (nb // g) * max_blk)

    if rhs_r is None:
        xb = x.reshape(-1, bs)
        blk_shape = (g, bs)
    else:
        # SpMM rhs rides as (nb, r, bs): r in the SUBLANE position so
        # the minor dim stays the full 128 lanes — an r-minor layout is
        # tile-padded 128/r-fold in HBM and its sub-tile memref slices
        # crash Mosaic's compile helper.  Transposed back at the end.
        xb = jnp.swapaxes(x.reshape(-1, bs, rhs_r), 1, 2)
        blk_shape = (g, rhs_r, bs)
    if slot_plan is not None:
        # Banded slots fetch (G, ...) slabs at ring offsets; padding x
        # with its own first G rows makes every slab contiguous (no
        # wrap split, which a fixed-size DMA could not express).  The
        # copy is nb*bs*(r*)4 bytes — small next to the value stream.
        xb = jnp.concatenate([xb, xb[:g]], axis=0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,            # cols
        grid=(nb // g, max_blk),
        in_specs=[
            pl.BlockSpec((g, 1, bs, bs), lambda i, j, cols: (i, j, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),       # x stays in HBM
        ],
        out_specs=pl.BlockSpec(blk_shape, lambda i, j, cols:
                               (i, 0) + (0,) * (len(blk_shape) - 2)),
        scratch_shapes=[
            pltpu.VMEM((depth,) + blk_shape, x.dtype),  # gather pipeline
            pltpu.SemaphoreType.DMA((depth,)),
        ],
    )
    y = pl.pallas_call(
        functools.partial(_spmv_kernel, depth, slot_plan),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb,) + blk_shape[1:], out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * max_blk * bs * bs * (rhs_r or 1),
            bytes_accessed=vals.size * vals.dtype.itemsize
            + x.size * x.dtype.itemsize * max_blk,
            transcendentals=0,
        ),
    )(cols.T, vals, xb)
    if rhs_r is None:
        return y.reshape(-1)
    return jnp.swapaxes(y, 1, 2).reshape(-1, rhs_r)


def _bell_spmv_xla(vals, cols, x):
    nb, max_blk, bs, _ = vals.shape
    out_dtype = x.dtype
    # Upcast narrow-stored values at the dot (no-op when dtypes agree):
    # XLA fuses the convert into the einsum, so the HBM read stays bf16
    # while the multiply matches the Pallas kernel's error budget
    # (storage rounding only).
    if x.ndim == 1:
        xb = x.reshape(-1, bs)  # nb_cols may exceed nb (row panel)
        y = jnp.einsum("ijab,ijb->ia", vals.astype(out_dtype), xb[cols],
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=out_dtype)
        return y.reshape(-1)
    r = x.shape[-1]
    xb = x.reshape(-1, bs, r)
    y = jnp.einsum("ijab,ijbr->iar", vals.astype(out_dtype), xb[cols],
                   precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=out_dtype)
    return y.reshape(-1, r)


@functools.partial(jax.custom_jvp, nondiff_argnums=(3, 4))
def bell_spmv(vals, cols, x, interpret: bool = False, slot_plan=None):
    """y = A x for a blocked-ELL matrix; Pallas kernel forward, XLA math
    for derivatives (bilinear in (vals, x), so the JVP is two more SpMVs).

    ``A`` may be a rectangular row panel: ``vals`` is
    (nb_rows, max_blk, bs, bs) while ``x`` has length ``nb_cols * bs``
    with ``cols`` indexing block-columns in [0, nb_cols) — this is how the
    row-sharded distributed operator applies its local panel against the
    gathered global vector.  The square case is nb_cols == nb_rows.

    ``slot_plan`` is the static banded-slot fetch plan from
    :func:`detect_slot_plan` (None = generic per-row gathers); it only
    applies to square operators (the panel case keeps gathers).
    """
    return _bell_spmv_pallas(vals, cols, x, interpret=interpret,
                             slot_plan=slot_plan)


@functools.partial(jax.custom_jvp, nondiff_argnums=(3, 4))
def bell_spmm(vals, cols, x, interpret: bool = False, slot_plan=None):
    """Y = A X for a blocked-ELL matrix and an (N, r) block of vectors —
    the SpMM tier the block solvers (``lobpcg_eigh``,
    ``dominant_eigh_multi``) ride.  Same kernel as :func:`bell_spmv`
    with the trailing r dimension threaded through the gather DMAs, so
    each grid step runs real (bs, bs) x (bs, r) MXU matmuls instead of
    the 1/bs-utilization block GEMV (see the roofline note), and the
    value stream is amortized over all r vectors.  Derivatives route
    through the XLA path exactly like the SpMV."""
    return _bell_spmv_pallas(vals, cols, x, interpret=interpret,
                             slot_plan=slot_plan)


@bell_spmm.defjvp
def _bell_spmm_jvp(interpret, slot_plan, primals, tangents):
    vals, cols, x = primals
    dvals, _, dx = tangents
    y = bell_spmm(vals, cols, x, interpret, slot_plan)
    dy = _bell_spmv_xla(dvals, cols, x) + _bell_spmv_xla(vals, cols, dx)
    return y, dy


@bell_spmv.defjvp
def _bell_spmv_jvp(interpret, slot_plan, primals, tangents):
    vals, cols, x = primals
    dvals, _, dx = tangents  # cols is integer -> float0 tangent, ignored
    y = bell_spmv(vals, cols, x, interpret, slot_plan)
    # Tangents go through the XLA einsum/gather path: those are standard
    # linear ops, so JAX can transpose them (reverse mode) and
    # differentiate them again (arbitrary order), which a Pallas call in
    # the tangent trace could not offer.  The kernel carries the primal
    # hot loop; derivatives are rare per solve (one IFT rule application).
    dy = _bell_spmv_xla(dvals, cols, x) + _bell_spmv_xla(vals, cols, dx)
    return y, dy
