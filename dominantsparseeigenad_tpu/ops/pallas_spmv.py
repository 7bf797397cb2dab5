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


def _spmv_kernel(cols_ref, vals_ref, x_ref, y_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    # vals block: (1, 1, bs, bs); x block: (1, bs) gathered by index_map.
    block = vals_ref[0, 0]
    xseg = x_ref[0]
    y_ref[0, :] += jnp.dot(block, xseg,
                           preferred_element_type=y_ref.dtype)


def _bell_spmv_pallas(vals, cols, x, *, interpret: bool = False):
    nb, max_blk, bs, _ = vals.shape
    xb = x.reshape(nb, bs)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,            # cols
        grid=(nb, max_blk),
        in_specs=[
            pl.BlockSpec((1, 1, bs, bs), lambda i, j, cols: (i, j, 0, 0)),
            pl.BlockSpec((1, bs), lambda i, j, cols: (cols[i, j], 0)),
        ],
        out_specs=pl.BlockSpec((1, bs), lambda i, j, cols: (i, 0)),
    )
    y = pl.pallas_call(
        _spmv_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, bs), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * max_blk * bs * bs,
            bytes_accessed=vals.size * vals.dtype.itemsize
            + x.size * x.dtype.itemsize * max_blk,
            transcendentals=0,
        ),
    )(cols, vals, xb)
    return y.reshape(-1)


def _bell_spmv_xla(vals, cols, x):
    nb, max_blk, bs, _ = vals.shape
    xb = x.reshape(nb, bs)
    y = jnp.einsum("ijab,ijb->ia", vals, xb[cols],
                   preferred_element_type=x.dtype)
    return y.reshape(-1)


@functools.partial(jax.custom_jvp, nondiff_argnums=(3,))
def bell_spmv(vals, cols, x, interpret: bool = False):
    """y = A x for a blocked-ELL matrix; Pallas kernel forward, XLA math
    for derivatives (bilinear in (vals, x), so the JVP is two more SpMVs).
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
