"""Shear-stack parallel-beam projector — the gather-free fast path.

TPU-first redesign of the parallel-beam projector (the reference's STEMPO
simulation geometry, ``trips/utilities/io.py:391-420``, ASTRA 'linear').
The Joseph crossing position of detector ``d`` on driving line ``i`` is
separable, ``pos(i, d) = u_i + v_d`` (affine in each index), so projection
factors into three dense, gather-free stages:

  A. **Row shear**: resample image line ``i`` at positions ``u_i + c'``
     (``c'`` integer): an *integer* per-row shift plus a 2-tap fractional
     blend. The integer shift is applied with a log2 decomposition of the
     shift into lane rolls (`jnp.roll` + select per bit) — no gathers, no
     dynamic slices, pure VPU work.
  B. **Stack**: sum the sheared lines over ``i`` (scaled by the ray step).
  C. **Detector resample**: evaluate the stacked profile at ``v_d`` — a
     small dense (p x W) hat-weight matmul, generated from iotas.

The adjoint runs the exact transpose of each stage (roll in the opposite
direction), so ``<Ax, y> == <x, A'y>`` holds to roundoff by construction.

Model note: composing the two linear interpolations (stages A and C) makes
the effective pixel footprint the *quadratic B-spline* ``hat * hat``
evaluated at ``pos - c``, versus Joseph's single ``hat``. This is a
standard, slightly smoother discretization of the same line integral (the
classic shear/slant-stack Radon transform); reconstructions agree with the
Joseph-matrix reconstructions within the noise level (tested), while the
apply does ~15x less arithmetic than generating full Joseph weights
on the fly and streams no matrix from HBM at all.

Why this shape for TPU: every indexed access (XLA gather row, dynamic VMEM
read) costs ~70-100 ns on this stack regardless of payload (ROADMAP.md), so
sparse-format applies are index-count-bound. Here the only "indexing" is
``nbits`` (~9) whole-array lane rolls per angle — contiguous vector moves
the VPU executes at full width.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.linop import LinearOperator, register_op
from .projector_op import _angle_params


def _round_up(x, m):
    return ((x + m - 1) // m) * m


class ShearStackParallelProjector(LinearOperator):
    """Parallel-beam shear-stack projector (quadratic B-spline footprint).

    Rows are angle-major (``angle * det_count + detector``), the image is
    (ny, nx) row-major with ny == nx, matching ``parallel_beam_matrix`` /
    ``OnTheFlyParallelProjector``.
    """

    def __init__(self, nx, angles, det_count=None, det_width=1.0, ny=None,
                 dtype=None):
        ny = ny or nx
        if ny != nx:
            raise NotImplementedError("square grids only")
        dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64
                          else jnp.float32)
        self.nx, self.ny = nx, ny
        self.det_count = p = int(det_count) if det_count is not None else nx
        self.det_width = float(det_width)
        self.angles = np.asarray(angles, dtype=float)
        self.n_angles = na = len(self.angles)
        self.shape = (na * p, nx * ny)

        drive, P0, Pi, Pd, step = [], [], [], [], []
        for th in self.angles:
            dy, p0, pi, pd, st = _angle_params(th, nx, ny, p, self.det_width)
            drive.append(dy)
            P0.append(p0)
            Pi.append(pi)
            Pd.append(pd)
            step.append(st)
        P0, Pi, Pd, step = map(np.asarray, (P0, Pi, Pd, step))

        # c' grid per angle: covers every detector sample v_d = Pd*d +-1 tap
        vmin = np.minimum(0.0, Pd * (p - 1))
        C0 = np.floor(vmin) - 1.0  # c' = C0 + j
        W = int(np.ceil(np.max(np.abs(Pd)) * (p - 1))) + 4

        # per-(angle, line) shear: u_i = P0 + Pi*i = bi + g, g in [0, 1)
        i_idx = np.arange(nx)
        u = P0[:, None] + Pi[:, None] * i_idx[None, :]  # (na, nx)
        bi = np.floor(u)
        g = u - bi
        s_raw = (bi + C0[:, None]).astype(np.int64)  # source offset per line
        OFF = int(max(1, 1 - s_raw.min()))  # buffer column of image col 0
        s = s_raw + OFF  # roll-left amounts, all >= 1
        smax = int(s.max())
        WB = _round_up(max(W + smax + 2, OFF + nx + 1), 128)
        self._W, self._WB, self._OFF = W, WB, OFF
        self._nbits = max(1, int(smax).bit_length())

        self.drive_is_y = jnp.asarray(drive)
        self.Pd = jnp.asarray(Pd, dtype)
        self.step = jnp.asarray(step, dtype)
        self.C0 = jnp.asarray(C0, dtype)
        self.shifts = jnp.asarray(s, jnp.int32)  # (na, nx)
        self.frac = jnp.asarray(g, dtype)  # (na, nx)

        # static angle groups by driving axis: transpose the image once per
        # group and vmap the shear over the group's angles (no per-angle
        # cond; both branches of a vmapped cond would otherwise execute)
        drive = np.asarray(drive)
        g_y = tuple(int(a) for a in np.nonzero(drive)[0])
        g_x = tuple(int(a) for a in np.nonzero(~drive)[0])
        self._groups = (g_y, g_x)
        order = list(g_y) + list(g_x)
        perm = np.empty(na, dtype=np.int64)
        perm[order] = np.arange(na)
        self._row_perm = tuple(perm.tolist())

    # -- integer shear via log2 roll decomposition ------------------------
    def _roll_rows(self, buf, s_row, sign):
        """Per-row circular shift of ``buf`` by ``sign * s_row`` lanes."""
        for k in range(self._nbits):
            bit = ((s_row >> k) & 1).astype(bool)
            buf = jnp.where(bit[:, None],
                            jnp.roll(buf, sign * (1 << k), axis=1), buf)
        return buf

    # -- stage C weights (p, W): hat(v_d - C0 - j) ------------------------
    def _det_weights(self, a):
        dt = self.Pd.dtype
        d_idx = jnp.arange(self.det_count, dtype=dt)
        j_idx = jnp.arange(self._W, dtype=dt)
        diff = (self.Pd[a] * d_idx)[:, None] - self.C0[a] - j_idx[None, :]
        return jnp.maximum(0.0, 1.0 - jnp.abs(diff))

    def matvec(self, x):
        X = x.reshape(self.ny, self.nx)
        nx, W, WB, OFF = self.nx, self._W, self._WB, self._OFF

        def one_angle(a):
            Xd = jax.lax.cond(self.drive_is_y[a], lambda: X, lambda: X.T)
            buf = jnp.zeros((nx, WB), Xd.dtype)
            buf = jax.lax.dynamic_update_slice(buf, Xd, (0, OFF))
            R = self._roll_rows(buf, self.shifts[a], -1)
            gg = self.frac[a][:, None]
            Zr = (1.0 - gg) * R[:, :W] + gg * R[:, 1:W + 1]
            Zc = self.step[a] * jnp.sum(Zr, axis=0)  # (W,)
            T = self._det_weights(a)
            return T @ Zc

        y = jax.lax.map(one_angle, jnp.arange(self.n_angles))
        return y.reshape(-1)

    def rmatvec(self, y):
        p = self.det_count
        Y = y.reshape(self.n_angles, p)
        nx, W, WB, OFF = self.nx, self._W, self._WB, self._OFF

        def one_angle(a):
            T = self._det_weights(a)
            Zc = T.T @ Y[a]  # (W,)
            Zr = self.step[a] * jnp.broadcast_to(Zc[None, :], (nx, W))
            buf = jnp.zeros((nx, WB), Zr.dtype)
            buf = jax.lax.dynamic_update_slice(buf, Zr, (0, 0))
            R = self._roll_rows(buf, self.shifts[a], +1)
            gg = self.frac[a][:, None]
            Xd = ((1.0 - gg) * R[:, OFF:OFF + nx]
                  + gg * R[:, OFF - 1:OFF + nx - 1])
            return jax.lax.cond(self.drive_is_y[a], lambda: Xd, lambda: Xd.T)

        Xs = jax.lax.map(one_angle, jnp.arange(self.n_angles))
        return jnp.sum(Xs, axis=0).reshape(-1)


register_op(
    ShearStackParallelProjector,
    ["drive_is_y", "Pd", "step", "C0", "shifts", "frac"],
    ["nx", "ny", "det_count", "det_width", "shape", "n_angles",
     "_W", "_WB", "_OFF", "_nbits"],
)


def shear_stack_matrix(nx, angles, det_count=None, det_width=1.0, ny=None):
    """Explicit scipy CSR of the shear-stack projector (host oracle).

    Entry [(a, d), (i, c)] = step * sum_t hat(v_d - C0 - j_t) * blend(i, t)
    expanded over the 3-tap composite footprint; used for scipy baselines
    and matrix-level tests (identical to applying the operator to the
    identity, but built directly with NumPy index arithmetic).
    """
    from scipy import sparse as sp

    op = ShearStackParallelProjector(nx, angles, det_count, det_width, ny,
                                     dtype=jnp.float64)
    p = op.det_count
    na = op.n_angles
    C0 = np.asarray(op.C0)
    Pd = np.asarray(op.Pd)
    step = np.asarray(op.step)
    drive = np.asarray(op.drive_is_y)
    s = np.asarray(op.shifts) - op._OFF  # bi + C0
    g = np.asarray(op.frac)

    rows, cols, vals = [], [], []
    i_idx = np.arange(nx)
    d_idx = np.arange(p)
    for a in range(na):
        v = Pd[a] * d_idx  # (p,)
        j0 = np.floor(v - C0[a]).astype(np.int64)
        fv = (v - C0[a]) - j0
        # composite taps over c = (bi + C0) + j + {0, 1} for j in {j0, j0+1}
        #   weight(c offset t) relative to base = s[a,i] + j0(d):
        #   t=0: (1-fv)(1-g); t=1: (1-fv)g + fv(1-g); t=2: fv*g
        base = s[a][None, :] + j0[:, None]  # (p, nx): column for t=0
        w0 = (1 - fv)[:, None] * (1 - g[a])[None, :]
        w1 = (1 - fv)[:, None] * g[a][None, :] + fv[:, None] * (1 - g[a])[None, :]
        w2 = fv[:, None] * g[a][None, :]
        for t, w in ((0, w0), (1, w1), (2, w2)):
            c = base + t
            valid = (c >= 0) & (c < nx) & (w > 1e-14)
            dd, ii = np.nonzero(valid)
            cc = c[valid]
            if drive[a]:
                pix = ii * nx + cc  # row i, column c
            else:
                pix = cc * nx + ii  # drive over columns: c is the row index
            rows.append(a * p + dd)
            cols.append(pix)
            vals.append(w[valid] * step[a])
    A = sp.csr_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=op.shape,
    )
    A.sum_duplicates()
    return A
