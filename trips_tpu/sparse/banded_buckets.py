"""Ta-bucketed banded projector (round-4 perf finding).

The flat ``BandedProjector`` stacks every drive group at the group-wide
T = max(T_a), but per-angle tap widths vary ~2x (mean 8.2 vs max 15 on
the tomo256x60 fan geometry) — 40%+ of the streamed slab is structural
zero padding. This variant splits each drive group's angles into
``n_buckets`` Ta-sorted buckets, each stacked at its own T, and runs one
kernel call per bucket. Zero added compute, 27-45% less stream; measured
+10% on the f32 exact-matrix A^T A path (bf16 is compute-floor-bound and
gains ~2%; see ROADMAP round-4 findings).

Same exact matrix as the flat pack (``to_scipy`` bit-identical entries);
the fused ``normal_matvec`` sums one ``_ata_call`` per bucket.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.linop import LinearOperator, register_op
from .banded import _pack_groups, _stack_packs, apply_group_xla


def _use_pallas():
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        return False


class BucketedBandedProjector(LinearOperator):
    """Exact banded repack with per-bucket tap widths.

    ``stacks``: tuple of (W, S, Pm-mod-n_pad) array triples (pytree data);
    ``aidxs``/``is_cols`` static per-bucket angle ids and drive flags.
    """

    def __init__(self, stacks, aidxs, is_cols, shape, nx, p, n_groups,
                 nnz, n_pad):
        self.stacks = tuple(tuple(s) for s in stacks)
        self.aidxs = tuple(tuple(int(a) for a in ai) for ai in aidxs)
        self.is_cols = tuple(bool(f) for f in is_cols)
        self.shape = tuple(shape)
        self.nx = nx
        self.n_pad = n_pad
        self.det_count = p
        self.n_groups = n_groups
        self.nnz = nnz

    @classmethod
    def from_scipy_fan(cls, A, nx, views, angles=None, n_groups=64,
                       dtype=None, lane_pad=128, n_buckets=4):
        # n_buckets=4 is the measured optimum on the tomo256x60 fan
        # geometry (r4 sweep: bf16 A^T A 10.03/10.61/10.50/10.59 at
        # nb=3/4/6/8; f32 4.66/4.81/5.01 at nb=2/3/4)
        packs, idx, angles, p, n_pad = _pack_groups(A, nx, views, angles,
                                                    n_groups)
        p_pad = -(-p // lane_pad) * lane_pad
        out_dtype = np.float32 if dtype is None else dtype
        stacks, aidxs, is_cols = [], [], []
        for dr in (True, False):
            group, ids = packs[dr], idx[dr]
            if not group:
                continue
            Ta = np.array([T_a for _, T_a, _, _ in group])
            order = np.argsort(Ta, kind="stable")
            for part in np.array_split(order, min(n_buckets, len(order))):
                if not len(part):
                    continue
                sub = [group[k] for k in part]
                W, S, P = _stack_packs(sub, n_pad, p, p_pad, n_groups,
                                       out_dtype)
                stacks.append((jnp.asarray(W), jnp.asarray(S),
                               jnp.asarray(np.mod(P, n_pad))))
                aidxs.append([ids[k] for k in part])
                is_cols.append(not dr)
        return cls(stacks, aidxs, is_cols, A.shape, nx, p, n_groups,
                   A.nnz, n_pad)

    @property
    def stored_bytes(self):
        return sum(W.size * W.dtype.itemsize + S.size * 4 + P.size * 4
                   for W, S, P in self.stacks)

    def to_scipy(self):
        """Exact reconstruction (host oracle) — same entry set as the flat
        pack."""
        from scipy import sparse as sp

        nx, p = self.nx, self.det_count
        gsize = self.n_pad // self.n_groups
        rows, cols, vals = [], [], []
        for (W, S, P), aidx, isc in zip(self.stacks, self.aidxs,
                                        self.is_cols):
            W, S, P = map(np.asarray, (W, S, P))
            for k, a in enumerate(aidx):
                tt, ii, dd = np.nonzero(W[k])
                cc = np.mod(S[k][ii] + P[k][ii // gsize, dd] + tt,
                            self.n_pad)
                ok = (cc < nx) & (dd < p) & (ii < nx)
                ii, tt, dd, cc = ii[ok], tt[ok], dd[ok], cc[ok]
                pix = cc * nx + ii if isc else ii * nx + cc
                rows.append(a * p + dd)
                cols.append(pix)
                vals.append(W[k][tt, ii, dd])
        M = sp.csr_matrix(
            (np.concatenate(vals).astype(np.float64),
             (np.concatenate(rows), np.concatenate(cols))),
            shape=self.shape)
        M.sum_duplicates()
        return M

    def _embed(self, x):
        n, npd = self.nx, self.n_pad
        X = jnp.reshape(x, (n, n)).astype(jnp.float32)
        if npd == n:
            return X
        return jnp.zeros((npd, npd), X.dtype).at[:n, :n].set(X)

    def matvec(self, x):
        n, p, npd = self.nx, self.det_count, self.n_pad
        na_tot = self.shape[0] // p
        X = self._embed(x)
        y = jnp.zeros((na_tot, p), jnp.float32)
        for (W, S, P), aidx, isc in zip(self.stacks, self.aidxs,
                                        self.is_cols):
            Xg = X.T if isc else X
            if _use_pallas():
                from .pallas_banded_kernel import _fwd_call

                yg = _fwd_call(Xg, W, S, P, self.n_groups)
            else:
                yg = apply_group_xla(npd, self.n_groups, Xg, W, S, P,
                                     False, wrap=True)
            y = y.at[jnp.asarray(aidx)].set(yg[:, :p])
        return y.reshape(-1).astype(x.dtype)

    def rmatvec(self, yv):
        n, p, npd = self.nx, self.det_count, self.n_pad
        Y = jnp.reshape(yv, (-1, p)).astype(jnp.float32)
        img = jnp.zeros((npd, npd), jnp.float32)
        for (W, S, P), aidx, isc in zip(self.stacks, self.aidxs,
                                        self.is_cols):
            p_pad = W.shape[3]
            Yg = jnp.pad(Y[jnp.asarray(aidx)], ((0, 0), (0, p_pad - p)))
            if _use_pallas():
                from .pallas_banded_kernel import _adj_call

                c = _adj_call(Yg, W, S, P, self.n_groups)
            else:
                c = apply_group_xla(npd, self.n_groups, None, W, S, P,
                                    True, y_rows=Yg, wrap=True)
            img = img + (c.T if isc else c)
        return img[:n, :n].reshape(-1).astype(yv.dtype)

    def normal_matvec(self, x):
        """Fused A^T A: one single-stream ``_ata_call`` per bucket."""
        n, npd = self.nx, self.n_pad
        X = self._embed(x)
        img = jnp.zeros((npd, npd), jnp.float32)
        for (W, S, P), aidx, isc in zip(self.stacks, self.aidxs,
                                        self.is_cols):
            Xg = X.T if isc else X
            if _use_pallas():
                from .pallas_banded_kernel import _ata_call

                c = _ata_call(Xg, W, S, P, self.n_groups)
            else:
                yg = apply_group_xla(npd, self.n_groups, Xg, W, S, P,
                                     False, wrap=True)
                c = apply_group_xla(npd, self.n_groups, None, W, S, P,
                                    True, y_rows=yg, wrap=True)
            img = img + (c.T if isc else c)
        return img[:n, :n].reshape(-1).astype(x.dtype)


register_op(
    BucketedBandedProjector,
    ["stacks"],
    ["aidxs", "is_cols", "shape", "nx", "det_count", "n_groups", "nnz",
     "n_pad"],
)
