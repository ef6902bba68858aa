"""Frame-varying dynamic CT on the champion banded format.

``BatchedBlockDiagOperator`` covers the shared-geometry dynamic datasets
(Emoji / CrossPhantom / STEMPO-real reuse one per-frame operator,
``trips/utilities/io.py:156-158,423-464``). The STEMPO *simulation* mode
instead rotates the angle set every frame
(``trips/utilities/io.py:391-420``), so every frame has its own projector.
``DynamicBandedOperator`` packs each frame's matrix into the shear-banded
format, pads all frames to common (na, T) shapes per drive group, and runs
the per-frame applies as ONE vmapped kernel call over the frame axis —
block-diagonal in time with zero gathers on the critical path.

Padding is exact: padded angles carry all-zero weight slabs (zero
contribution in both directions) and their scatter indices point one past
the sinogram (dropped by scatter ``mode='drop'`` / gather fill 0).

Unlike BSR, the banded pack stores only the true band per angle, so the
wide parallel-beam STEMPO frames that density-exploded BSR (the r2 OOM,
see ``parallel/sharded_bsr.py`` guard) stay at their natural size here.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.linop import LinearOperator, register_op
from .banded import BandedProjector, apply_group_xla


def _use_pallas():
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        return False


class DynamicBandedOperator(LinearOperator):
    """Block-diag over time of per-frame banded projectors with
    frame-varying geometry; applies vmapped over the frame axis."""

    def __init__(self, groups, shape, nx, p, views, n_groups, nnz, nt,
                 n_pad=None):
        # groups: two tuples (W, S, Pm, aidx) stacked over frames —
        # W (nt, na, T, n, p_pad), S (nt, na, n), Pm (nt, na, G, p_pad)
        # int32 mod-n, aidx (nt, na) with out-of-range pad = views
        (self.W_rows, self.shift_rows, self.P_rows, self.aidx_rows) = \
            groups[0]
        (self.W_cols, self.shift_cols, self.P_cols, self.aidx_cols) = \
            groups[1]
        self.shape = tuple(shape)
        self.nx = nx
        self.n_pad = nx if n_pad is None else n_pad
        self.det_count = p
        self.views = views
        self.n_groups = n_groups
        self.nnz = nnz
        self.nt = nt

    @classmethod
    def from_frames(cls, AA, nx, angles_list, n_groups=32, dtype=None,
                    lane_pad=128):
        """Pack per-frame matrices AA[t] (scipy, angle-major rows) built at
        ``angles_list[t]`` into one stacked operator."""
        nt = len(AA)
        assert len(angles_list) == nt
        views0 = len(angles_list[0])
        for t, a in enumerate(angles_list):
            if len(a) != views0:
                raise ValueError(
                    f"frame {t} has {len(a)} angles, expected {views0}: "
                    "the stacked sinogram layout (nt, views, p) requires a "
                    "uniform angle count per frame")
        ops = [BandedProjector.from_scipy_fan(
            AA[t], nx, views=None, angles=np.asarray(angles_list[t]),
            n_groups=n_groups, dtype=dtype, lane_pad=lane_pad)
            for t in range(nt)]
        views = len(angles_list[0])
        p = ops[0].det_count
        p_pad = max((op.W_rows.shape[3] if op.W_rows.size else
                     op.W_cols.shape[3]) for op in ops)
        n = ops[0].n_pad  # lane-aligned roll-space size (>= nx)

        def stack_group(get):
            na_max = max(len(get(op)[3]) for op in ops)
            na_max = max(na_max, 1)
            T_max = max((get(op)[0].shape[1] if get(op)[0].size else 1)
                        for op in ops)
            Ws, Ss, Ps, As = [], [], [], []
            for op in ops:
                W, S, P, aidx = get(op)
                W = np.asarray(W, np.float32 if dtype is None else None)
                na = W.shape[0] if W.size else 0
                if not W.size:
                    W = np.zeros((0, T_max, n, p_pad), np.asarray(
                        ops[0].W_rows if ops[0].W_rows.size else
                        ops[0].W_cols).dtype)
                    S = np.zeros((0, n), np.int32)
                    P = np.zeros((0, n_groups, p_pad), np.int32)
                W = np.pad(np.asarray(W), ((0, na_max - na),
                                           (0, T_max - W.shape[1]),
                                           (0, 0), (0, 0)))
                S = np.pad(np.asarray(S), ((0, na_max - na), (0, 0)))
                P = np.mod(np.pad(np.asarray(P),
                                  ((0, na_max - na), (0, 0), (0, 0))), n)
                # padded angles scatter out of range -> dropped
                a = np.full(na_max, views, np.int32)
                a[:na] = np.asarray(aidx, np.int32)
                Ws.append(W)
                Ss.append(S.astype(np.int32))
                Ps.append(P.astype(np.int32))
                As.append(a)
            return (jnp.asarray(np.stack(Ws)), jnp.asarray(np.stack(Ss)),
                    jnp.asarray(np.stack(Ps)), jnp.asarray(np.stack(As)))

        rows = stack_group(lambda op: (op.W_rows, op.shift_rows, op.P_rows,
                                       op._angles_rows))
        cols = stack_group(lambda op: (op.W_cols, op.shift_cols, op.P_cols,
                                       op._angles_cols))
        m = sum(op.shape[0] for op in ops)
        ncols = nt * nx * nx
        nnz = sum(op.nnz for op in ops)
        return cls((rows, cols), (m, ncols), nx, p, views, n_groups, nnz,
                   nt, n_pad=ops[0].n_pad)

    @property
    def stored_bytes(self):
        tot = 0
        for a in (self.W_rows, self.W_cols):
            tot += a.size * a.dtype.itemsize
        for a in (self.shift_rows, self.shift_cols, self.P_rows,
                  self.P_cols, self.aidx_rows, self.aidx_cols):
            tot += a.size * 4
        return tot

    def _groups(self):
        return ((self.W_rows, self.shift_rows, self.P_rows,
                 self.aidx_rows, False),
                (self.W_cols, self.shift_cols, self.P_cols,
                 self.aidx_cols, True))

    def _fwd_frame(self, W, S, Pm, X):
        if _use_pallas():
            from .pallas_banded_kernel import _fwd_call

            return _fwd_call(X, W, S, Pm, self.n_groups)
        return apply_group_xla(self.n_pad, self.n_groups, X, W, S, Pm,
                               False, wrap=True)

    def _adj_frame(self, W, S, Pm, Yg):
        if _use_pallas():
            from .pallas_banded_kernel import _adj_call

            return _adj_call(Yg, W, S, Pm, self.n_groups)
        return apply_group_xla(self.n_pad, self.n_groups, None, W, S, Pm,
                               True, y_rows=Yg, wrap=True)

    def _ata_frame(self, W, S, Pm, X):
        if _use_pallas():
            from .pallas_banded_kernel import _ata_call

            return _ata_call(X, W, S, Pm, self.n_groups)
        y = apply_group_xla(self.n_pad, self.n_groups, X, W, S, Pm, False,
                            wrap=True)
        return apply_group_xla(self.n_pad, self.n_groups, None, W, S, Pm,
                               True, y_rows=y, wrap=True)

    def _embed_frames(self, X):
        n, npd = self.nx, self.n_pad
        if npd == n:
            return X
        return jnp.zeros((self.nt, npd, npd), X.dtype).at[
            :, :n, :n].set(X)

    def matvec(self, x):
        n, p, v = self.nx, self.det_count, self.views
        X = self._embed_frames(
            x.reshape(self.nt, n, n).astype(jnp.float32))
        y = jnp.zeros((self.nt, v, p), jnp.float32)
        for W, S, Pm, aidx, is_cols in self._groups():
            if not W.size:
                continue
            Xg = jnp.swapaxes(X, 1, 2) if is_cols else X
            yg = jax.vmap(self._fwd_frame)(W, S, Pm, Xg)  # (nt, na, p_pad)
            y = jax.vmap(
                lambda yy, gg, ai: yy.at[ai].set(gg[:, :p], mode="drop")
            )(y, yg, aidx)
        return y.reshape(-1).astype(x.dtype)

    def rmatvec(self, yv):
        n, p, v = self.nx, self.det_count, self.views
        Y = yv.reshape(self.nt, v, p).astype(jnp.float32)
        img = jnp.zeros((self.nt, n, n), jnp.float32)
        for W, S, Pm, aidx, is_cols in self._groups():
            if not W.size:
                continue
            p_pad = W.shape[4]
            Yg = jax.vmap(lambda yy, ai: jnp.take(
                yy, ai, axis=0, mode="fill", fill_value=0.0))(Y, aidx)
            Yg = jnp.pad(Yg, ((0, 0), (0, 0), (0, p_pad - p)))
            c = jax.vmap(self._adj_frame)(W, S, Pm, Yg)  # (nt, npd, npd)
            img = img + (jnp.swapaxes(c, 1, 2) if is_cols else c)[
                :, :n, :n]
        return img.reshape(-1).astype(yv.dtype)

    def normal_matvec(self, x):
        """Per-frame fused A^T A (single weight stream) vmapped over
        frames — the champion single-chip economy, frame-batched."""
        n = self.nx
        X = self._embed_frames(
            x.reshape(self.nt, n, n).astype(jnp.float32))
        img = jnp.zeros((self.nt, n, n), jnp.float32)
        for W, S, Pm, aidx, is_cols in self._groups():
            if not W.size:
                continue
            Xg = jnp.swapaxes(X, 1, 2) if is_cols else X
            c = jax.vmap(self._ata_frame)(W, S, Pm, Xg)
            img = img + (jnp.swapaxes(c, 1, 2) if is_cols else c)[
                :, :n, :n]
        return img.reshape(-1).astype(x.dtype)


register_op(
    DynamicBandedOperator,
    ["W_rows", "shift_rows", "P_rows", "aidx_rows",
     "W_cols", "shift_cols", "P_cols", "aidx_cols"],
    ["shape", "nx", "det_count", "views", "n_groups", "nnz", "nt",
     "n_pad"],
)
