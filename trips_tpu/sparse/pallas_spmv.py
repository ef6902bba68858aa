"""Pallas TPU kernels for block-sparse SpMV (forward and adjoint).

Grid steps stream groups of G stored blocks HBM->VMEM; the Pallas pipeline
double-buffers the stream while the MXU contracts the previous group, so
throughput is HBM-bandwidth-bound on the block stream — the speed-of-light
regime for SpMV. x and y live whole in VMEM (a 256x256 tomography problem
needs ~0.3 MB, far under the ~16 MB budget); block row/column ids are
scalar-prefetched into SMEM and drive dynamic VMEM indexing.

The adjoint kernel consumes the *same* forward block stream with the
contraction transposed and scatter-accumulates into the VMEM-resident
output — no transpose partition is stored.

Replaces the reference's scipy CSR matvec (``A @ v`` / ``A.T @ u`` inside
all Krylov loops, e.g. ``trips/utilities/decompositions.py:177-183``).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

# blocks per grid step; Mosaic tiles rank-1 s32 SMEM operands by 1024
GROUP = int(os.environ.get("TRIPS_TPU_SPMV_GROUP", "1024"))


def _use_pallas() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _make_kernel(G, transpose):
    def kernel(brow_ref, bcol_ref, block_ref, x_ref, y_ref):
        n = pl.program_id(0)

        @pl.when(n == 0)
        def _():
            y_ref[...] = jnp.zeros_like(y_ref)

        def body(g, _):
            row = brow_ref[g]
            colb = bcol_ref[g]
            blk = block_ref[g]  # (br, bc)
            if transpose:
                xseg = x_ref[row, :]  # (br,)
                contrib = jax.lax.dot_general(
                    xseg[None, :].astype(blk.dtype), blk,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # (1, bc)
                y_ref[colb, :] += contrib[0]
            else:
                xseg = x_ref[colb, :]  # (bc,)
                contrib = jax.lax.dot_general(
                    blk, xseg[:, None].astype(blk.dtype),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # (br, 1)
                y_ref[row, :] += contrib[:, 0]
            return 0

        jax.lax.fori_loop(0, G, body, 0)

    return kernel


@partial(jax.jit, static_argnames=("br", "bc", "m_out", "transpose",
                                   "interpret"))
def _pallas_bsr_apply(blocks, brow, bcol, x, br, bc, m_out, transpose,
                      interpret=False):
    nblocks = blocks.shape[0]
    G = GROUP
    npad = (-nblocks) % G
    if npad:
        # pad with zero blocks (accumulate zeros into tile 0 — harmless)
        blocks = jnp.pad(blocks, ((0, npad), (0, 0), (0, 0)))
        brow = jnp.pad(brow, (0, npad))
        bcol = jnp.pad(bcol, (0, npad))
    ngroups = (nblocks + npad) // G

    in_width = br if transpose else bc
    out_width = bc if transpose else br
    mb = -(-m_out // out_width)
    xp = jnp.pad(x, (0, (-x.shape[0]) % in_width)).astype(jnp.float32)
    xb = xp.reshape(-1, in_width)

    # block ids ride along in per-group SMEM tiles (they would overflow SMEM
    # as whole-array scalar prefetch once nblocks exceeds ~250k)
    grid_spec = pl.GridSpec(
        grid=(ngroups,),
        in_specs=[
            pl.BlockSpec((G,), lambda n: (n,), memory_space=pltpu.SMEM),
            pl.BlockSpec((G,), lambda n: (n,), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (G, br, bc), lambda n: (n, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x whole
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),  # y whole
    )
    yb = pl.pallas_call(
        _make_kernel(G, transpose),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mb, out_width), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * nblocks * br * bc,
            bytes_accessed=nblocks * br * bc * blocks.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(brow, bcol, blocks, xb)
    return yb.reshape(-1)[:m_out].astype(x.dtype)


def bsr_matvec(op, x, transpose: bool):
    """Dispatch: Pallas kernel on TPU, XLA segment-sum elsewhere.

    int8-quantized operators always take the XLA apply (there is no
    quantized Pallas kernel yet), even with ``prefer_pallas=True``.
    """
    if (getattr(op, "prefer_pallas", True) and _use_pallas()
            and getattr(op, "quant_scale", None) is None):
        br, bc = op.block_shape
        m_out = op.shape[1] if transpose else op.shape[0]
        return _pallas_bsr_apply(op.blocks, op.brow, op.bcol, x, br, bc,
                                 m_out, transpose)
    return op._apply(x, transpose)
