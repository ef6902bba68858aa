"""Pallas TPU kernels for block-sparse SpMV.

One grid step per stored block: the Pallas pipeline double-buffers the block
stream HBM->VMEM while the MXU contracts the previous block, so throughput is
HBM-bandwidth-bound (the speed-of-light for SpMV). Output tiles are revisited
consecutively (blocks are CSR-sorted by block-row) and accumulated in VMEM;
`_build_bsr` guarantees every block-row owns at least one stored block so
each output tile is initialized exactly once.

Replaces the reference's scipy CSR matvec (``A @ v`` / ``A.T @ u`` inside all
Krylov loops, e.g. ``trips/utilities/decompositions.py:177-183``).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_pallas() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _spmv_kernel(brow_ref, bcol_ref, block_ref, x_ref, y_ref):
    n = pl.program_id(0)
    row = brow_ref[n]
    prev = brow_ref[jnp.maximum(n - 1, 0)]
    first = jnp.logical_or(n == 0, row != prev)

    blk = block_ref[0]
    xv = x_ref[:]  # (1, bs)
    contrib = jax.lax.dot_general(
        xv.astype(blk.dtype),
        blk,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, bs)

    @pl.when(first)
    def _():
        y_ref[...] = contrib

    @pl.when(jnp.logical_not(first))
    def _():
        y_ref[...] = y_ref[...] + contrib


@partial(jax.jit, static_argnames=("bs", "m_out"))
def _pallas_bsr_matvec(blocks, brow, bcol, x, bs, m_out):
    nblocks = blocks.shape[0]
    mb = -(-m_out // bs)
    xp = jnp.pad(x, (0, (-x.shape[0]) % bs))
    xb = xp.reshape(-1, bs)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, bs, bs), lambda n, brow, bcol: (n, 0, 0)),
            pl.BlockSpec((1, bs), lambda n, brow, bcol: (bcol[n], 0)),
        ],
        out_specs=pl.BlockSpec((1, bs), lambda n, brow, bcol: (brow[n], 0)),
    )
    yb = pl.pallas_call(
        _spmv_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mb, bs), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * nblocks * bs * bs,
            bytes_accessed=nblocks * bs * bs * blocks.dtype.itemsize,
            transcendentals=0,
        ),
    )(brow, bcol, blocks, xb)
    return yb.reshape(-1)[:m_out].astype(x.dtype)


def bsr_matvec(op, x, transpose: bool):
    """Dispatch: Pallas kernel on TPU, XLA segment-sum elsewhere."""
    if transpose:
        blocks, brow, bcol, m_out = op.blocks_t, op.brow_t, op.bcol_t, op.shape[1]
    else:
        blocks, brow, bcol, m_out = op.blocks, op.brow, op.bcol, op.shape[0]
    if _use_pallas():
        return _pallas_bsr_matvec(blocks, brow, bcol, x, op.bs, m_out)
    return op._apply(blocks, brow, bcol, x, m_out)
