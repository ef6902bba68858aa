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
