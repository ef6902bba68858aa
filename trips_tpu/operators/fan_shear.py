"""Shear-rotate fan-beam projector — the gather-free fan fast path.

TPU-first redesign of the fan-beam projector (the reference's ASTRA
'line_fanflat' geometry, ``trips/test_problems/Tomography.py:49-68``).

Why this exists: the exact Siddon fan matrix is unstructured sparsity, and
on TPU every indexed access costs ~70-100 ns regardless of payload
(ROADMAP.md), so stored-matrix applies are index-count-bound. This operator
removes *all* runtime indexing by restructuring fan projection into dense,
gather-free stages:

  A. **Rotate** each view's image into a canonical frame (source at
     ``(0, -so)``, horizontal detector at ``y = +od``) — an exact quarter
     turn (``rot90``: transpose + flip, no resampling) followed by a 3-shear
     rotation for the residual angle in [-45°, 45°). Each shear is a per-line
     integer roll (log2 decomposition into masked lane/sublane rolls — pure
     VPU moves) plus a 2-tap fractional blend. All views are processed as one
     batched (na, C, C) array — a single fused XLA program, no per-angle
     dispatch.
  B. **Fan contraction**: in the canonical frame the geometry is *identical
     for every view*, so the remaining work — per-row perspective sampling of
     the rotated canvases at the ray/row crossings, ray-step weighting, and
     the sum over rows — is one einsum ``y[a,d] = Σ_{i,c} R[a,i,c]·G[i,c,d]``
     against a **view-independent constant** ``G`` built once *on device*
     from iota arithmetic (a few scalars cross the host boundary, never a
     matrix). ``G[i,:,d]`` holds the 2-tap hat weights at the crossing of
     ray ``d`` with canvas row ``i``, scaled by the per-ray step length
     ``sqrt(1 + (u_d/(so+od))^2)``.

The adjoint is ``jax.linear_transpose`` of the forward — exact transposition
of every stage, so ``<Ax, y> == <x, A'y>`` holds to roundoff by
construction.

Correctness of the circular rolls: content never wraps because the maximum
shear excursion of the image disc (radius r = nx/sqrt(2)) is
``r·sqrt(1 + tan^2(22.5°))`` horizontally during the middle shear state and
``r`` vertically — the canvas is sized past the worst case, so rolled-in
values are always zeros from the empty margin.

Model note: composing the rotation's interpolations with the stage-B hat
sampling gives an effective pixel footprint a little wider than Siddon's
'line' chords — a standard smoother discretization of the same line
integrals (shear/slant-stack Radon). Reconstruction parity with the
exact-Siddon matrix at measurement-noise level is pinned by tests
(mirroring the validated parallel shear-stack, ``shear_projector.py``).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core.linop import LinearOperator, register_op


def _round_up(x, m):
    return ((x + m - 1) // m) * m


class ShearFanProjector(LinearOperator):
    """Fan-beam projector via shear rotation + one banded-warp einsum.

    Matches the reference geometry defaults (``Tomography.py:53-60``):
    ``p = int(sqrt(2) * nx)`` detectors, ``so = 3 nx``, ``od = nx``,
    ``det_width = (so + od) / so``. Sinogram rows are angle-major
    (``angle * p + detector``); the image is (ny, nx) row-major with
    row 0 at the top, matching ``fan_beam_matrix``.

    ``g_dtype`` controls the storage dtype of the stage-B constant
    (bfloat16 halves its HBM stream on TPU; accumulation stays f32).
    """

    def __init__(self, nx, angles=None, views=None, det_count=None,
                 det_width=None, source_origin=None, origin_det=None,
                 ny=None, dtype=None, g_dtype=None):
        ny = ny or nx
        if ny != nx:
            raise NotImplementedError("square grids only")
        dtype = jnp.dtype(dtype or (jnp.float64 if jax.config.jax_enable_x64
                                    else jnp.float32))
        g_dtype = jnp.dtype(g_dtype or dtype)
        if angles is None:
            angles = np.linspace(0, np.pi, views, endpoint=False)
        angles = np.asarray(angles, dtype=float)
        na = len(angles)
        p = int(det_count) if det_count is not None else int(np.sqrt(2) * nx)
        so = float(source_origin) if source_origin is not None else 3.0 * nx
        od = float(origin_det) if origin_det is not None else float(nx)
        dw = float(det_width) if det_width is not None else (so + od) / so
        self.nx = self.ny = nx
        self.det_count = p
        self.n_angles = na
        self.shape = (na * p, nx * ny)
        self.dtype_ = dtype
        self._so, self._od, self._dw = so, od, dw

        # ---- canvas sizing (see module docstring) -----------------------
        r = nx / np.sqrt(2.0)
        bulge = r * np.sqrt(1.0 + np.tan(np.pi / 8) ** 2) + 3.0
        C = int(_round_up(int(np.ceil(2 * bulge)) + 2, 16))
        self._C = C
        cc = (C - 1) / 2.0

        # ---- per-view decomposition: exact quarter turns + residual ----
        # the image is rotated by -theta (the assembly stays canonical)
        k = np.round(angles / (np.pi / 2)).astype(int)  # 0, 1 or 2
        phi = angles - k * (np.pi / 2)  # residual in [-45, 45)
        self._kgroups = tuple(
            tuple(int(a) for a in np.nonzero(k == kk)[0]) for kk in (0, 1, 2))
        self._kq = tuple(int(v) for v in k)
        # rotate-by-(-phi) in pull-back form (out(c) = in(c + shift)):
        # shifts sx = -tan(phi/2)*y per row, sy = -sin(phi)*x per column,
        # applied as ShX, ShY, ShX (sign conventions pinned numerically
        # against scipy.ndimage.rotate)
        t_sh = np.tan(-phi / 2.0)
        m_sh = -np.sin(phi)

        # per-line real shifts; line coordinates are center offsets with
        # y positive up (canvas row 0 on top), x positive right
        y_line = cc - np.arange(C)
        x_line = np.arange(C) - cc
        sx = t_sh[:, None] * y_line[None, :]   # (na, C): x-shift per row
        sy = m_sh[:, None] * x_line[None, :]   # (na, C): y-shift per column

        def split(s):
            k_int = np.floor(s).astype(np.int64)
            return (jnp.asarray(k_int, jnp.int32),
                    jnp.asarray(s - k_int, dtype))

        self._kx, self._fx = split(sx)
        self._ky, self._fy = split(sy)

        # ---- stage-B constant: built lazily on device -------------------
        self._g_dtype = g_dtype
        self.G = self._build_g()
        # detector-major flattened layout for the fused-A^T A kernel,
        # stored once — transposing 100+ MB inside the solver loop is not
        # reliably hoisted by XLA and costs more than the stream it saves
        self.Gt = jnp.transpose(
            jnp.reshape(self.G, (self._C * self._C, self.G.shape[2])))

    def _build_g(self):
        """(C, C, p_pad) hat-weight constant, from iota arithmetic on
        device; the detector axis is padded to a multiple of 128 with zero
        columns (lane-aligned blocks for the fused-A^T A Pallas kernel —
        zero columns contribute nothing in either direction)."""
        C, p = self._C, self.det_count
        so, od, dw = self._so, self._od, self._dw
        cc = (C - 1) / 2.0
        r = self.nx / np.sqrt(2.0)
        f64 = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        u = (jnp.arange(p, dtype=f64) - (p - 1) / 2.0) * dw          # (p,)
        yrow = cc - jnp.arange(C, dtype=f64)                          # (C,)
        # ray d crosses row y at x = u_d * (y + so) / (so + od)
        q = u[None, :] * (yrow[:, None] + so) / (so + od) + cc        # (C,p)
        step = jnp.sqrt(1.0 + (u / (so + od)) ** 2)                   # (p,)
        live = (jnp.abs(yrow) <= (r + 1.5)).astype(f64)               # (C,)
        c0 = jnp.floor(q)
        f = q - c0
        cix = jnp.arange(C, dtype=f64)[None, :, None]                 # c axis
        w = step[None, None, :] * live[:, None, None]
        G = w * ((cix == c0[:, None, :]) * (1.0 - f)[:, None, :]
                 + (cix == (c0 + 1.0)[:, None, :]) * f[:, None, :])
        p_pad = _round_up(p, 128)
        if p_pad != p:
            G = jnp.pad(G, ((0, 0), (0, 0), (0, p_pad - p)))
        return G.astype(self._g_dtype)

    # -- shear machinery ---------------------------------------------------
    def _roll(self, buf, shift, axis):
        """Per-line roll of (na, C, C) ``buf`` along ``axis``.

        value_out(c) = value_in(c + shift) per line; ``shift`` is (na, C)
        indexed by the complementary spatial axis. Decomposed into masked
        power-of-two rolls (non-negative after mod C)."""
        Cp = buf.shape[axis]
        s = jnp.mod(shift, Cp)
        for k in range(int(Cp - 1).bit_length()):
            bit = ((s >> k) & 1).astype(bool)
            mask = bit[:, :, None] if axis == 2 else bit[:, None, :]
            buf = jnp.where(mask, jnp.roll(buf, -(1 << k), axis=axis), buf)
        return buf

    def _shear(self, buf, k_int, frac, axis):
        """Integer per-line roll + 2-tap fractional blend along ``axis``:
        out(c) = (1-f) * in(c + k) + f * in(c + k + 1)."""
        rolled = self._roll(buf, k_int, axis)
        rolled1 = jnp.roll(rolled, -1, axis=axis)
        f = frac[:, :, None] if axis == 2 else frac[:, None, :]
        return (1.0 - f) * rolled + f * rolled1

    def _rotate_all(self, X):
        """(ny, nx) image -> (na, C, C) canonically rotated canvases."""
        C, nx = self._C, self.nx
        off = (C - nx) // 2
        canvas = jnp.zeros((C, C), X.dtype)
        canvas = jax.lax.dynamic_update_slice(canvas, X, (off, off))
        # exact quarter turns: image rotated by -k*90 deg
        quarters = (canvas,
                    jnp.rot90(canvas, k=-1),
                    jnp.rot90(canvas, k=-2))
        parts, order = [], []
        for kk, group in enumerate(self._kgroups):
            if not group:
                continue
            gi = np.asarray(group)
            buf = jnp.broadcast_to(quarters[kk], (len(group), C, C))
            buf = self._shear(buf, self._kx[gi], self._fx[gi], axis=2)
            buf = self._shear(buf, self._ky[gi], self._fy[gi], axis=1)
            buf = self._shear(buf, self._kx[gi], self._fx[gi], axis=2)
            parts.append(buf)
            order.extend(group)
        R = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        perm = np.empty(self.n_angles, dtype=np.int64)
        perm[np.asarray(order)] = np.arange(self.n_angles)
        return R[jnp.asarray(perm)] if list(order) != sorted(order) else R

    # -- Pallas fast path (TPU): rotate stage in VMEM ----------------------
    @staticmethod
    def _use_pallas():
        try:
            return jax.devices()[0].platform == "tpu"
        except Exception:  # noqa: BLE001
            return False

    def _quarters(self, X):
        C, nx = self._C, self.nx
        off = (C - nx) // 2
        canvas = jnp.zeros((C, C), X.dtype)
        canvas = jax.lax.dynamic_update_slice(canvas, X, (off, off))
        return jnp.stack([canvas, jnp.rot90(canvas, k=-1),
                          jnp.rot90(canvas, k=-2)])

    def _rotate_pallas(self, X):
        from .pallas_shear import rotate_all_pallas

        return rotate_all_pallas(
            self._quarters(X).astype(jnp.float32), self._kx, self._fx,
            self._ky, self._fy, self._kq, out_dtype=self.G.dtype)

    def _rotate_adjoint_pallas(self, Radj):
        from .pallas_shear import rotate_all_adjoint_pallas

        acc = jnp.promote_types(self.dtype_, jnp.float32)
        Q = rotate_all_adjoint_pallas(
            Radj, self._kx, self._fx, self._ky, self._fy, self._kq,
            out_dtype=acc)
        canvas = Q[0] + jnp.rot90(Q[1], k=1) + jnp.rot90(Q[2], k=2)
        off = (self._C - self.nx) // 2
        return jax.lax.dynamic_slice(canvas, (off, off),
                                     (self.ny, self.nx))

    def _forward(self, x, force_xla=False):
        X = x.reshape(self.ny, self.nx)
        R = (self._rotate_all(X) if force_xla or not self._use_pallas()
             else self._rotate_pallas(X))
        acc = jnp.promote_types(self.dtype_, jnp.float32)
        y = jnp.einsum("aic,icd->ad", R.astype(self.G.dtype), self.G,
                       preferred_element_type=acc)[:, :self.det_count]
        return y.reshape(-1).astype(self.dtype_)

    def matvec(self, x):
        return self._forward(x.astype(self.dtype_)).astype(x.dtype)

    def rmatvec(self, y):
        if not self._use_pallas():
            def fwd(x):
                return self._forward(x, force_xla=True)

            x0 = jax.ShapeDtypeStruct((self.shape[1],), self.dtype_)
            (xt,) = jax.linear_transpose(fwd, x0)(y.astype(self.dtype_))
            return xt.astype(y.dtype)
        acc = jnp.promote_types(self.dtype_, jnp.float32)
        Y = y.reshape(self.n_angles, self.det_count).astype(self.dtype_)
        Yp = jnp.pad(Y, ((0, 0), (0, self.G.shape[2] - self.det_count)))
        Radj = jnp.einsum("ad,icd->aic", Yp.astype(self.G.dtype), self.G,
                          preferred_element_type=acc).astype(self.G.dtype)
        xt = self._rotate_adjoint_pallas(Radj).reshape(-1)
        return xt.astype(y.dtype)

    def _ata_plan(self):
        """(dtile, acc_dtype) whose VMEM plan fits — R (na, C*C) in the G
        dtype + the accumulator + the per-tile contribution + a
        double-buffered (64, C*C) detector-major G block. Prefers the f32
        accumulator; falls back to the G dtype, then to the
        matvec/rmatvec pair (None)."""
        C, na = self._C, self.n_angles
        gsz = self.G.dtype.itemsize
        dtile = 64
        gbuf = 2 * dtile * C * C * gsz
        for acc in (jnp.float32, self.G.dtype):
            a = jnp.dtype(acc).itemsize
            need = na * C * C * (gsz + 2 * a) + gbuf
            if need < 112e6:
                return dtile, jnp.dtype(acc)
        return None

    def normal_matvec(self, x):
        """x -> A^T A x.

        A fused Pallas kernel that streams G from HBM once per apply
        exists (``pallas_shear.gcontract_ata_pallas``; the pair reads G
        twice, 2x123 MB bf16 at 256^2/60 views) but measured a WASH to
        -7% against XLA's well-pipelined einsum pair across chip states
        (r4: 2.29 vs 2.14 ms/iter and 2.22 vs 2.14; it won 1.32x only in
        one heavily-degraded-chip window) — the kernel's whole-R +
        64-row-G-tile residency does not overlap DMA/compute as well as
        XLA's own schedule. Default: the pair; set TRIPS_TPU_SHEAR_ATA=1
        to use the fused kernel."""
        use_kernel = os.environ.get("TRIPS_TPU_SHEAR_ATA", "0") == "1"
        plan = (self._ata_plan()
                if use_kernel and self._use_pallas() else None)
        if plan is None:
            return self.rmatvec(self.matvec(x))
        from .pallas_shear import gcontract_ata_pallas

        dtile, acc_dtype = plan
        X = x.reshape(self.ny, self.nx).astype(self.dtype_)
        R = self._rotate_pallas(X)                       # (na, C, C)
        Radj = gcontract_ata_pallas(R, self.Gt, dtile=dtile,
                                    acc_dtype=acc_dtype).astype(
            self.G.dtype)
        xt = self._rotate_adjoint_pallas(Radj).reshape(-1)
        return xt.astype(x.dtype)

    def matmat(self, Xm):
        return jax.vmap(self.matvec, in_axes=1, out_axes=1)(Xm)

    def rmatmat(self, Ym):
        return jax.vmap(self.rmatvec, in_axes=1, out_axes=1)(Ym)


register_op(
    ShearFanProjector,
    ["G", "Gt", "_kx", "_fx", "_ky", "_fy"],
    ["nx", "ny", "det_count", "n_angles", "shape", "dtype_", "_C",
     "_kgroups", "_kq", "_so", "_od", "_dw", "_g_dtype"],
)
