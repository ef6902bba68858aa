"""Pallas TPU kernel for the shear-packed banded projector (ROADMAP item 1).

The banded pack (``banded.py``) stores, per angle, a (T, n, p) weight slab
with ``column(a, i, t, d) = S[a,i] + P[a, g(i), d] + t``. A generic gather
apply is index-bound on TPU (~70-100 ns per indexed access); this kernel
removes *all* runtime gathers by restructuring the apply into three dense,
VPU/MXU-shaped stages executed per angle with everything resident in VMEM:

1. **Shear**: ``Xs[i, c] = X[i, (c + S[a,i]) mod n]`` — per-row circular
   roll, decomposed into log2(n) masked lane-rolls (native VPU moves, the
   same machinery as ``operators/pallas_shear.py``).
2. **Band extraction as one-hot matmul**: for line-group ``g`` the
   predictor column ``Pm[d] = P[a,g,d] mod n`` selects, per detector, one
   lane of the sheared rows. Building the one-hot matrix
   ``E[c, d] = (c == Pm[d])`` from a broadcasted iota turns the selection
   into ``U = Xg_taps @ E`` on the MXU, where ``Xg_taps`` stacks the
   group's rows rolled by each tap offset ``t`` (so one (T·gsize, n) x
   (n, p) matmul covers the whole band of the group). The mod-n wrap is
   exact: packed weights only exist where the true column is in range, so
   wrapped lanes are always multiplied by stored zeros.
3. **Weight contraction**: ``y[a] += sum_{t,i} W[a,t,i,:] * U[(t,i),:]``
   — an elementwise multiply-reduce on the VPU.

The adjoint kernel runs the exact transposed stages in reverse order
(multiply by W, matmul against ``E^T``, un-roll taps, un-shear rows) and
accumulates the per-angle image contributions into a VMEM-resident output
across sequential grid steps, so ``<Ax, y> == <x, A'y>`` holds to roundoff
of the accumulation dtype.

Precision: with float32 weight storage the one-hot matmuls run at
``Precision.HIGHEST`` (bit-accurate selection); bfloat16 storage uses the
native MXU path (inputs rounded to bf16, f32 accumulate).

Replaces the stored-matrix role of ASTRA's projector
(``trips/test_problems/Tomography.py:73-88``) on the TPU fast path.
"""
from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _vmem_limit(W, n_groups=32, ap=1):
    """Scoped-VMEM request: W slab double-buffered + stage intermediates
    + the shared per-group one-hot list. The compiler default (16 MB)
    rejects the larger packs (g16 bf16 T=26, f32) even though they fit
    physical VMEM; ask for what the kernel actually needs, capped well
    under the hardware budget."""
    block = int(np.prod(W.shape[1:])) * W.dtype.itemsize * ap
    n, p_pad = int(W.shape[2]), int(W.shape[3])
    # E_shared (ATA): n_groups (n, p_pad) bf16 one-hots held across both
    # stages — 26 MB at 640^2/g32 (a small-T bucket's 5*block margin
    # alone under-budgeted this by 424 KB, r4)
    e_bytes = n_groups * n * p_pad * 2
    # measured: the fused A^T A kernel keeps ~5 slab-equivalents live
    # (double-buffered W + both stages' f32 intermediates) at STEMPO
    # scale (T=18, 640x640 slabs)
    return int(min(110 * 2**20, 5 * block + e_bytes + 24 * 2**20))


def _f32_mode():
    """f32-exact selection strategy (TRIPS_TPU_F32_SELECT):

    - ``stack`` (default, r5): the three bf16 split components are
      CONCATENATED along M into ONE selection matmul (3x the M rows at
      identical total FLOPs) — the three sequential split3 matmuls ran at
      poor MXU fill (M=T*gsize ~ 120 rows < one M-tile), and r4 showed
      the f32 path is selection-compute-bound.
    - ``split3``: three sequential one-pass matmuls (r4 default).
    - ``highest``: Precision.HIGHEST emulated-f32 matmuls (r3).

    All three are exact to accumulation order: the selection operand E is
    0/1 (exact in bf16) and hi+mid+lo capture all 24 mantissa bits."""
    return os.environ.get("TRIPS_TPU_F32_SELECT", "stack")


def _f32_split3():
    return _f32_mode() != "highest"


def _sel_dot(Mf, E, dims, f32_exact):
    """One-hot selection matmul. bf16 path: single native matmul.
    f32-exact path: bf16x3 split of the f32 side (see _f32_split3) or
    HIGHEST-precision emulation."""
    if not f32_exact:
        return jax.lax.dot_general(
            Mf.astype(jnp.bfloat16), E,
            dimension_numbers=dims,
            preferred_element_type=jnp.float32)
    if not _f32_split3():
        return jax.lax.dot_general(
            Mf, E.astype(jnp.float32), dimension_numbers=dims,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    parts = _split3(Mf)
    if _f32_mode() == "stack" and dims in ((((1,), (0,)), ((), ())),
                                           (((1,), (1,)), ((), ()))):
        # one M-stacked matmul instead of three M=T*gsize passes (the M
        # rows triple to fill the MXU; identical FLOPs)
        M = Mf.shape[0]
        u = jax.lax.dot_general(jnp.concatenate(parts, axis=0), E,
                                dimension_numbers=dims,
                                preferred_element_type=jnp.float32)
        return u[:M] + u[M:2 * M] + u[2 * M:]
    out = None
    for mk in parts:
        u = jax.lax.dot_general(mk, E, dimension_numbers=dims,
                                preferred_element_type=jnp.float32)
        out = u if out is None else out + u
    return out


def _split3(x):
    """Exact bf16x3 decomposition of an f32 array (hi+mid+lo covers all 24
    mantissa bits; see _f32_split3)."""
    m1 = x.astype(jnp.bfloat16)
    r = x - m1.astype(jnp.float32)
    m2 = r.astype(jnp.bfloat16)
    m3 = (r - m2.astype(jnp.float32)).astype(jnp.bfloat16)
    return (m1, m2, m3)


def _nbits(n):
    return int(n - 1).bit_length()


def _roll_rows(buf, s_col, n, sign):
    """Per-row circular roll along lanes: out(c) = in(c + sign*s) per row.

    ``s_col`` is an (n, 1) int32 column of non-negative shifts; ``sign``
    +1 gives the pull-back (forward shear), -1 its exact transpose."""
    s = jnp.mod(s_col, n)
    for k in range(_nbits(n)):
        mask = ((s >> k) & 1) > 0
        buf = jnp.where(mask, jnp.roll(buf, -sign * (1 << k), axis=1), buf)
    return buf


def _build_E(pm, g, n, p_pad):
    """(n, p_pad) one-hot selection operand for group ``g``."""
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (n, p_pad), 0)
    return (iota_c == pm[g, :][None, :]).astype(jnp.bfloat16)


def _fwd_stage(xs, w, pm, *, n, n_groups, T, f32_exact, batched,
               E_shared=None):
    """Sheared image -> one sinogram row. ``batched=True`` expresses the
    per-group one-hot selections as a single G-batched dot_general (no
    interleaved VPU work between MXU calls); ``False`` is the original
    unrolled per-group loop. ``E_shared``: prebuilt per-group one-hots
    (the fused A^T A kernel builds them once for both stages)."""
    p_pad = w.shape[2]
    gsize = n // n_groups
    if batched:
        # Mosaic's tpu.matmul needs batch dims at EQUAL positions: use a
        # clean 3-D (G, M, K) x (G, K, N) batched contraction.
        R = jnp.stack([xs if t == 0 else jnp.roll(xs, -t, axis=1)
                       for t in range(T)])           # (T, n, n)
        tapsB = jnp.transpose(
            R.reshape(T, n_groups, gsize, n),
            (1, 0, 2, 3)).reshape(n_groups, T * gsize, n)
        iota3 = jax.lax.broadcasted_iota(
            jnp.int32, (n_groups, n, p_pad), 1)
        E_b = (iota3 == pm[:, None, :]).astype(jnp.bfloat16)
        U = _sel_dot(tapsB, E_b, (((2,), (1,)), ((0,), (0,))),
                     f32_exact)                       # (G, T*gsize, p_pad)
        Wb = jnp.transpose(
            w.reshape(T, n_groups, gsize, p_pad),
            (1, 0, 2, 3)).reshape(n_groups, T * gsize, p_pad)
        return jnp.sum(Wb.astype(jnp.float32) * U, axis=(0, 1))
    # f32-exact split3: decompose the sheared image ONCE per angle —
    # rolls/slices commute with the elementwise split, so per-group taps
    # of the parts are bit-identical to splitting each group's taps
    # (r4: the per-group splits were ~the whole f32-vs-bf16 compute gap)
    presplit = f32_exact and _f32_split3()
    parts = _split3(xs) if presplit else (xs,)
    acc = jnp.zeros((1, p_pad), jnp.float32)
    for g in range(n_groups):
        E = (_build_E(pm, g, n, p_pad) if E_shared is None
             else E_shared[g])

        def group_taps(buf):
            xg = buf[g * gsize:(g + 1) * gsize, :]
            return jnp.concatenate(
                [xg if t == 0 else jnp.roll(xg, -t, axis=1)
                 for t in range(T)], axis=0)

        if presplit:
            if _f32_mode() == "stack":
                # one M-stacked selection matmul for all three split
                # components (3x M fill, same FLOPs — see _f32_mode)
                M = T * gsize
                u = jax.lax.dot_general(
                    jnp.concatenate([group_taps(p) for p in parts],
                                    axis=0),
                    E, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                U = u[:M] + u[M:2 * M] + u[2 * M:]
            else:
                U = None
                for part in parts:
                    u = jax.lax.dot_general(
                        group_taps(part), E, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    U = u if U is None else U + u
        else:
            U = _sel_dot(group_taps(xs), E, (((1,), (0,)), ((), ())),
                         f32_exact)
        wg = w[:, g * gsize:(g + 1) * gsize, :].reshape(T * gsize, p_pad)
        acc = acc + jnp.sum(wg.astype(jnp.float32) * U, axis=0,
                            keepdims=True)
    return acc[0]


def _unpack_refs(refs, has_scales):
    """(W, S, P[, scales], input, output) ref layout shared by the three
    kernels; ``scales`` present only for int8-stored packs."""
    if has_scales:
        w_ref, s_ref, p_ref, sc_ref, in_ref, o_ref = refs
    else:
        (w_ref, s_ref, p_ref, in_ref, o_ref), sc_ref = refs, None
    return w_ref, s_ref, p_ref, sc_ref, in_ref, o_ref


def _slab(w_ref, sc_ref, j):
    """Angle j's weight slab, dequantized in VMEM for int8 storage
    (elementwise convert+scale — unlike the r4 compact-tap decompression
    there are no masked selects, so the halved stream is a pure win)."""
    w = w_ref[j]
    if sc_ref is not None:
        return w.astype(jnp.float32) * sc_ref[j, 0, 0]
    return w


def _fwd_dtype(f32_exact):
    """Forward shear/taps element type. For quantized storage (bf16/int8)
    the selection matmul rounds the image to bf16 anyway, so the forward
    shear rolls + taps run in bf16 directly: half the VPU roll bytes and
    no per-group f32->bf16 cast (r5; shear measured ~25% of bf16 device
    time). The f32-exact path keeps f32 (the split3 decomposition needs
    the full mantissa). The adjoint side stays f32 everywhere: its
    per-angle image contributions accumulate over all angles."""
    return jnp.float32 if f32_exact else jnp.bfloat16


def _fwd_kernel(*refs, n, n_groups, T, f32_exact, batched=False, ap=1,
                has_scales=False):
    w_ref, s_ref, p_ref, sc_ref, x_ref, o_ref = _unpack_refs(
        refs, has_scales)
    a = pl.program_id(0)
    for j in range(ap):
        xs = _roll_rows(x_ref[...].astype(_fwd_dtype(f32_exact)),
                        s_ref[j], n, +1)
        o_ref[a * ap + j, :] = _fwd_stage(
            xs, _slab(w_ref, sc_ref, j), p_ref[j], n=n,
            n_groups=n_groups, T=T, f32_exact=f32_exact, batched=batched)


def _adj_stage(y, w, pm, *, n, n_groups, T, f32_exact, batched,
               E_shared=None):
    """Sinogram row -> sheared-image contribution (exact transpose of
    ``_fwd_stage``); same batched/loop duality. With ``E_shared`` the
    transposed contraction runs against the forward's (n, p_pad) one-hots
    via swapped dot dimensions — no second iota/compare pass per group."""
    p_pad = w.shape[2]
    gsize = n // n_groups
    if batched:
        iota3 = jax.lax.broadcasted_iota(
            jnp.int32, (n_groups, p_pad, n), 2)
        EtB = (iota3 == pm[:, :, None]).astype(jnp.bfloat16)
        Wb = jnp.transpose(
            w.reshape(T, n_groups, gsize, p_pad),
            (1, 0, 2, 3)).reshape(n_groups, T * gsize, p_pad)
        Zb = Wb.astype(jnp.float32) * y[None, None, :]
        U = _sel_dot(Zb, EtB, (((2,), (1,)), ((0,), (0,))),
                     f32_exact)                       # (G, T*gsize, n)
        Ut = jnp.transpose(
            U.reshape(n_groups, T, gsize, n), (1, 0, 2, 3))
        acc = Ut[0]
        for t in range(1, T):
            acc = acc + jnp.roll(Ut[t], t, axis=2)
        return acc.reshape(n, n)
    iota_c = (jax.lax.broadcasted_iota(jnp.int32, (p_pad, n), 1)
              if E_shared is None else None)
    blocks = []
    for g in range(n_groups):
        wg = w[:, g * gsize:(g + 1) * gsize, :].reshape(T * gsize, p_pad)
        Z = wg.astype(jnp.float32) * y[None, :]
        if E_shared is None:
            Et = (iota_c == pm[g, :][:, None]).astype(jnp.bfloat16)
            U = _sel_dot(Z, Et, (((1,), (0,)), ((), ())),
                         f32_exact).reshape(T, gsize, n)
        else:
            U = _sel_dot(Z, E_shared[g], (((1,), (1,)), ((), ())),
                         f32_exact).reshape(T, gsize, n)
        blk = U[0]
        for t in range(1, T):
            blk = blk + jnp.roll(U[t], t, axis=1)
        blocks.append(blk)
    return jnp.concatenate(blocks, axis=0)


def _adj_kernel(*refs, n, n_groups, T, f32_exact, batched=False, ap=1,
                has_scales=False):
    w_ref, s_ref, p_ref, sc_ref, y_ref, o_ref = _unpack_refs(
        refs, has_scales)
    a = pl.program_id(0)
    img = None
    for j in range(ap):
        y = y_ref[a * ap + j, :].astype(jnp.float32)  # (p_pad,)
        xs_adj = _adj_stage(y, _slab(w_ref, sc_ref, j), p_ref[j], n=n,
                            n_groups=n_groups, T=T, f32_exact=f32_exact,
                            batched=batched)
        c = _roll_rows(xs_adj, s_ref[j], n, -1).astype(o_ref.dtype)
        img = c if img is None else img + c

    @pl.when(a == 0)
    def _():
        o_ref[...] = img

    @pl.when(a != 0)
    def _():
        o_ref[...] = o_ref[...] + img


@functools.partial(
    jax.jit, static_argnames=("n_groups", "interpret", "batched", "ap"))
def _fwd_call(X, W, S, Pm, n_groups, interpret=False, batched=False,
              scales=None, ap=1):
    na, T, n, p_pad = W.shape
    assert na % ap == 0, (na, ap)
    kern = functools.partial(
        _fwd_kernel, n=n, n_groups=n_groups, T=T,
        f32_exact=W.dtype == jnp.float32, batched=batched, ap=ap,
        has_scales=scales is not None)
    specs, args = _specs_args(W, S, Pm, scales, n_groups, ap)
    return pl.pallas_call(
        kern,
        grid=(na // ap,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(W, n_groups, ap)),
        in_specs=specs + [pl.BlockSpec(memory_space=pltpu.VMEM)],  # X
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),  # y whole
        out_shape=jax.ShapeDtypeStruct((na, p_pad), jnp.float32),
        interpret=interpret,
    )(*args, X)


def _specs_args(W, S, Pm, scales, n_groups, ap):
    """Input BlockSpecs + argument list for the shared (W, S, P[, scales])
    layout; ``ap`` angles per grid step."""
    na, T, n, p_pad = W.shape
    specs = [
        pl.BlockSpec((ap, T, n, p_pad), lambda a: (a, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ap, n, 1), lambda a: (a, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ap, n_groups, p_pad), lambda a: (a, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [W, S.reshape(na, n, 1), Pm]
    if scales is not None:
        # Mosaic requires the last two block dims to fill (8, 128) tiles:
        # broadcast the per-angle scalar to one full f32 tile per angle
        specs.append(pl.BlockSpec((ap, 8, 128), lambda a: (a, 0, 0),
                                  memory_space=pltpu.VMEM))
        args.append(jnp.broadcast_to(
            scales.reshape(na, 1, 1).astype(jnp.float32), (na, 8, 128)))
    return specs, args


@functools.partial(
    jax.jit, static_argnames=("n_groups", "interpret", "batched", "ap"))
def _adj_call(Y, W, S, Pm, n_groups, interpret=False, batched=False,
              scales=None, ap=1):
    na, T, n, p_pad = W.shape
    assert na % ap == 0, (na, ap)
    kern = functools.partial(
        _adj_kernel, n=n, n_groups=n_groups, T=T,
        f32_exact=W.dtype == jnp.float32, batched=batched, ap=ap,
        has_scales=scales is not None)
    specs, args = _specs_args(W, S, Pm, scales, n_groups, ap)
    return pl.pallas_call(
        kern,
        grid=(na // ap,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(W, n_groups, ap)),
        in_specs=specs + [pl.BlockSpec(memory_space=pltpu.VMEM)],  # Y
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),  # image whole
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        interpret=interpret,
    )(*args, Y)


def _ata_kernel(*refs, n, n_groups, T, f32_exact, batched=False, ap=1,
                has_scales=False):
    """Fused A^T A per angle: forward stages into a register-resident
    sinogram row, immediately back-projected — the weight slab ``W`` is
    streamed from HBM ONCE per normal-equations apply instead of once for
    the forward and once for the adjoint. CGLS on the normal equations
    (``krylov.cgls_normal``) halves the dominant HBM stream per iteration.
    """
    w_ref, s_ref, p_ref, sc_ref, x_ref, o_ref = _unpack_refs(
        refs, has_scales)
    a = pl.program_id(0)
    p_pad = w_ref.shape[3]
    img = None
    for j in range(ap):
        xs = _roll_rows(x_ref[...].astype(_fwd_dtype(f32_exact)),
                        s_ref[j], n, +1)
        E_shared = (None if batched else
                    [_build_E(p_ref[j], g, n, p_pad)
                     for g in range(n_groups)])
        w = _slab(w_ref, sc_ref, j)
        y = _fwd_stage(xs, w, p_ref[j], n=n, n_groups=n_groups, T=T,
                       f32_exact=f32_exact, batched=batched,
                       E_shared=E_shared)
        xs_adj = _adj_stage(y, w, p_ref[j], n=n, n_groups=n_groups,
                            T=T, f32_exact=f32_exact, batched=batched,
                            E_shared=E_shared)
        c = _roll_rows(xs_adj, s_ref[j], n, -1).astype(o_ref.dtype)
        img = c if img is None else img + c

    @pl.when(a == 0)
    def _():
        o_ref[...] = img

    @pl.when(a != 0)
    def _():
        o_ref[...] = o_ref[...] + img


@functools.partial(
    jax.jit, static_argnames=("n_groups", "interpret", "batched", "ap"))
def _ata_call(X, W, S, Pm, n_groups, interpret=False, batched=False,
              scales=None, ap=1):
    na, T, n, p_pad = W.shape
    assert na % ap == 0, (na, ap)
    kern = functools.partial(
        _ata_kernel, n=n, n_groups=n_groups, T=T,
        f32_exact=W.dtype == jnp.float32, batched=batched, ap=ap,
        has_scales=scales is not None)
    specs, args = _specs_args(W, S, Pm, scales, n_groups, ap)
    return pl.pallas_call(
        kern,
        grid=(na // ap,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(W, n_groups, ap)),
        in_specs=specs + [pl.BlockSpec(memory_space=pltpu.VMEM)],  # X
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),  # image whole
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        interpret=interpret,
    )(*args, X)


def _batched_default():
    """Per-group loop vs one G-batched dot_general (TRIPS_TPU_BANDED_BATCHED
    toggles for experiments; the loop is the measured default)."""
    return os.environ.get("TRIPS_TPU_BANDED_BATCHED", "0") == "1"


def banded_normal_apply_pallas(op, v, interpret: bool = False,
                               batched: bool | None = None):
    """x -> A^T A x with one fused kernel pass per drive group (the weight
    stream is read once; the per-angle sinogram never leaves the core)."""
    if batched is None:
        batched = _batched_default()
    n = op.nx
    npd = getattr(op, "n_pad", n)
    X = _embed(v.reshape(n, n).astype(jnp.float32), npd)
    img = jnp.zeros((npd, npd), jnp.float32)
    for W, S, P, is_cols in (
            (op.W_rows, op.shift_rows, op.P_rows, False),
            (op.W_cols, op.shift_cols, op.P_cols, True)):
        if not W.size:
            continue
        contrib = _ata_call(X.T if is_cols else X, W, S, jnp.mod(P, npd),
                            op.n_groups, interpret=interpret,
                            batched=batched)
        img = img + (contrib.T if is_cols else contrib)
    return img[:n, :n].reshape(-1).astype(v.dtype)


def _embed(X, npd):
    """(n, n) image -> (npd, npd) lane-aligned roll space."""
    n = X.shape[0]
    if npd == n:
        return X
    return jnp.zeros((npd, npd), X.dtype).at[:n, :n].set(X)


def pallas_supported(op) -> bool:
    """Alignment preconditions for the TPU kernel (else: XLA fallback).

    The roll axis is the pack-time lane-aligned ``n_pad`` (ROADMAP r3
    item 3: any grid size packs to a 128-multiple roll space), so the
    kernel path is available for every grid whose n_pad the group count
    divides."""
    npd = getattr(op, "n_pad", op.nx)
    if npd % op.n_groups or npd % 128:
        return False
    for W in (op.W_rows, op.W_cols):
        if W.size and (W.shape[3] % 128 or W.shape[2] != npd):
            return False
    return True


def banded_apply_pallas(op, v, transpose: bool, interpret: bool = False,
                        batched: bool | None = None):
    if batched is None:
        batched = _batched_default()
    n, p = op.nx, op.det_count
    npd = getattr(op, "n_pad", n)
    na = op.shape[0] // p
    groups = (
        (op.W_rows, op.shift_rows, op.P_rows, op._angles_rows, False),
        (op.W_cols, op.shift_cols, op.P_cols, op._angles_cols, True),
    )
    if not transpose:
        X = _embed(v.reshape(n, n).astype(jnp.float32), npd)
        y = jnp.zeros((na, p), jnp.float32)
        for W, S, P, aidx, is_cols in groups:
            if not W.size:
                continue
            yg = _fwd_call(X.T if is_cols else X, W, S, jnp.mod(P, npd),
                           op.n_groups, interpret=interpret,
                           batched=batched)
            y = y.at[jnp.asarray(aidx)].set(yg[:, :p])
        return y.reshape(-1).astype(v.dtype)
    Y = v.reshape(na, p).astype(jnp.float32)
    img = jnp.zeros((npd, npd), jnp.float32)
    for W, S, P, aidx, is_cols in groups:
        if not W.size:
            continue
        p_pad = W.shape[3]
        Yg = jnp.pad(Y[jnp.asarray(aidx)], ((0, 0), (0, p_pad - p)))
        contrib = _adj_call(Yg, W, S, jnp.mod(P, npd), op.n_groups,
                            interpret=interpret, batched=batched)
        img = img + (contrib.T if is_cols else contrib)
    return img[:n, :n].reshape(-1).astype(v.dtype)
