"""Pallas TPU kernels for the shear-rotate stage of ``ShearFanProjector``.

The XLA form of the 3-shear rotation is ~30 masked-roll/blend passes over the
(na, C, C) canvas stack; each pass round-trips HBM, which dominates the
apply (~2 ms of a 2.3 ms forward at 256x256/60 views — measured r2). These
kernels keep the whole per-angle canvas in VMEM: one HBM read of the
quarter-turned base canvas and one write of the rotated result per angle.

Grid: one step per view. The per-view quarter-turn (exact rot90, computed
once outside) is selected through a scalar-prefetched index array
(``PrefetchScalarGridSpec``), so each grid step DMAs only its (C, C) block.
Shifts/fractions arrive as per-angle (C, 1) / (1, C) blocks. Rolls use the
log2 masked-roll decomposition (lane/sublane circular rolls are native VPU
moves).

The adjoint kernel runs the exact transposed stages in reverse order and
accumulates per-quarter canvases across its (contiguous) angle range using
the standard output-revisiting pattern, so ``<Ax, y> == <x, A'y>`` holds to
roundoff (pinned by tests, including ``interpret=True`` on CPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nbits(C):
    return int(C - 1).bit_length()


def _shear_fwd(buf, k, f, axis, C):
    """out(c) = (1-f)*in(c+k) + f*in(c+k+1) per line (k, f broadcast on
    the complementary axis)."""
    s = jnp.mod(k, C)
    for b in range(_nbits(C)):
        mask = ((s >> b) & 1) > 0
        buf = jnp.where(mask, jnp.roll(buf, -(1 << b), axis=axis), buf)
    return (1.0 - f) * buf + f * jnp.roll(buf, -1, axis=axis)


def _shear_adj(buf, k, f, axis, C):
    """Exact transpose: out(c) = (1-f)*g(c-k) + f*g(c-k-1)."""
    s = jnp.mod(k, C)
    v = (1.0 - f) * buf + jnp.roll(f * buf, 1, axis=axis)
    for b in range(_nbits(C)):
        mask = ((s >> b) & 1) > 0
        v = jnp.where(mask, jnp.roll(v, 1 << b, axis=axis), v)
    return v


def _fwd_kernel(kq_ref, q_ref, kx_ref, fx_ref, ky_ref, fy_ref, out_ref,
                *, C):
    del kq_ref
    buf = q_ref[0].astype(jnp.float32)
    buf = _shear_fwd(buf, kx_ref[0], fx_ref[0].astype(jnp.float32), 1, C)
    buf = _shear_fwd(buf, ky_ref[0], fy_ref[0].astype(jnp.float32), 0, C)
    buf = _shear_fwd(buf, kx_ref[0], fx_ref[0].astype(jnp.float32), 1, C)
    out_ref[0] = buf.astype(out_ref.dtype)


def _adj_kernel(kq_ref, g_ref, kx_ref, fx_ref, ky_ref, fy_ref, out_ref,
                *, C):
    g = pl.program_id(0)
    buf = g_ref[0].astype(jnp.float32)
    buf = _shear_adj(buf, kx_ref[0], fx_ref[0].astype(jnp.float32), 1, C)
    buf = _shear_adj(buf, ky_ref[0], fy_ref[0].astype(jnp.float32), 0, C)
    buf = _shear_adj(buf, kx_ref[0], fx_ref[0].astype(jnp.float32), 1, C)
    prev = kq_ref[jnp.maximum(g - 1, 0)]
    is_first = jnp.logical_or(g == 0, kq_ref[g] != prev)

    @pl.when(is_first)
    def _():
        out_ref[0] = buf.astype(out_ref.dtype)

    @pl.when(jnp.logical_not(is_first))
    def _():
        out_ref[0] = out_ref[0] + buf.astype(out_ref.dtype)


def _shift_specs(C):
    return [
        pl.BlockSpec((1, C, 1), lambda g, kq: (g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C, 1), lambda g, kq: (g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, C), lambda g, kq: (g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, C), lambda g, kq: (g, 0, 0),
                     memory_space=pltpu.VMEM),
    ]


@functools.partial(jax.jit, static_argnames=("kq", "out_dtype", "interpret"))
def rotate_all_pallas(quarters, kx, fx, ky, fy, kq, out_dtype=jnp.float32,
                      interpret=False):
    """(3, C, C) quarters -> (na, C, C) rotated canvases."""
    na, C = kx.shape[0], quarters.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(na,),
        in_specs=[pl.BlockSpec((1, C, C), lambda g, kq: (kq[g], 0, 0),
                               memory_space=pltpu.VMEM)] + _shift_specs(C),
        out_specs=pl.BlockSpec((1, C, C), lambda g, kq: (g, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, C=C),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((na, C, C), out_dtype),
        interpret=interpret,
    )(jnp.asarray(kq, jnp.int32), quarters,
      kx.reshape(na, C, 1), fx.reshape(na, C, 1),
      ky.reshape(na, 1, C), fy.reshape(na, 1, C))


@functools.partial(jax.jit, static_argnames=("kq", "out_dtype", "interpret"))
def rotate_all_adjoint_pallas(g_canvases, kx, fx, ky, fy, kq,
                              out_dtype=jnp.float32, interpret=False):
    """(na, C, C) cotangents -> (3, C, C) per-quarter accumulated canvases.

    Angles must be grouped contiguously by quarter index (they are: the
    quarter index is monotone in theta)."""
    na, C = kx.shape[0], g_canvases.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(na,),
        in_specs=[pl.BlockSpec((1, C, C), lambda g, kq: (g, 0, 0),
                               memory_space=pltpu.VMEM)] + _shift_specs(C),
        out_specs=pl.BlockSpec((1, C, C), lambda g, kq: (kq[g], 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_adj_kernel, C=C),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3, C, C), out_dtype),
        interpret=interpret,
    )(jnp.asarray(kq, jnp.int32), g_canvases,
      kx.reshape(na, C, 1), fx.reshape(na, C, 1),
      ky.reshape(na, 1, C), fy.reshape(na, 1, C))


def _gcontract_ata_kernel(r_ref, g_ref, o_ref):
    """One detector tile: forward-contract all rotated canvases against the
    G block, immediately back-project the tile's sinogram — G is streamed
    from HBM ONCE per normal-equations apply (it is read twice by the
    separate forward/adjoint einsums, and at 256^2/60 views G is 128 MB,
    the dominant stream of the ShearFanProjector iteration).

    Operands arrive (i, c)-FLATTENED and G detector-MAJOR — R (na, C*C),
    Gt (p_pad, C*C) — so both contractions are plain single-axis matmuls
    (Mosaic's tpu.matmul rejects multi-dimensional contracting dims) and
    the detector tile is a sublane-axis block, which may legally be 64
    rows (the 128-lane-tile rule killed the (C, C, 64) layout, and the
    full 128-detector tile plus the f32 accumulator exceeds VMEM at
    256^2/60 views: measured 156 MB of 128)."""
    d = pl.program_id(0)
    R = r_ref[...]                       # (na, C*C)
    Gt = g_ref[...]                      # (dt, C*C)
    U = jax.lax.dot_general(
        R, Gt, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (na, dt)
    contrib = jax.lax.dot_general(
        U.astype(Gt.dtype), Gt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(
        o_ref.dtype)                                 # (na, C*C)

    @pl.when(d == 0)
    def _():
        o_ref[...] = contrib

    @pl.when(d != 0)
    def _():
        o_ref[...] = o_ref[...] + contrib


@functools.partial(jax.jit,
                   static_argnames=("dtile", "acc_dtype", "interpret"))
def gcontract_ata_pallas(R, Gt, dtile=64, acc_dtype=jnp.float32,
                         interpret=False):
    """(na, C, C) rotated canvases + (C, C, p_pad) hat constant ->
    (na, C, C) A^T A canvas cotangents, G streamed once (d-tiled grid).

    ``acc_dtype``: the cross-tile accumulator. Mosaic requires 128-lane
    blocks, so at 256^2/60 views the f32 accumulator does not fit VMEM
    next to the double-buffered G block — the bf16 accumulator (3 grid
    steps of similar-scale contributions) is the price of the single
    G stream there."""
    na, C = R.shape[0], R.shape[1]
    if Gt.ndim == 3:  # accept the (C, C, p_pad) layout (tests/interpret)
        Gt = jnp.transpose(jnp.reshape(Gt, (C * C, Gt.shape[2])))
    p_pad = Gt.shape[0]
    assert p_pad % dtile == 0
    # (i, c) flattened, G detector-major: single-axis matmuls, and the
    # detector tile sits on the sublane axis (64-row blocks are legal)
    Rf = jnp.reshape(R, (na, C * C))
    out = pl.pallas_call(
        _gcontract_ata_kernel,
        grid=(p_pad // dtile,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(126e6)),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # R whole
            pl.BlockSpec((dtile, C * C), lambda d: (d, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((na, C * C), jnp.dtype(acc_dtype)),
        interpret=interpret,
    )(Rf, Gt)
    return jnp.reshape(out, (na, C, C))
