"""Batched per-frame reconstruction for dynamic CT.

The reference reconstructs dynamic frames one by one in a Python loop
(2_demo_dynamic_CrossPhantom.ipynb cell 20). Here the nt frames become a
vmapped batch axis over the fused solvers: per-frame ELL tables are padded
to a common width and stacked, and the whole multi-frame reconstruction is
a single device launch (which also shards trivially over a 'time' mesh
axis).
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from ..sparse.ell import EllOperator, _csr_to_ell
from ..solvers.fused import fused_gks, fused_mmgks


def stack_ell_tables(blocks):
    """Per-frame scipy matrices -> stacked padded ELL tables (nt leading)."""
    from scipy import sparse as sp

    mats = [sp.csr_matrix(b) for b in blocks]
    shape = mats[0].shape
    for m_ in mats:
        if m_.shape != shape:
            raise ValueError("all frames must share one shape")
    fwd = [_csr_to_ell(m_) for m_ in mats]
    bwd = [_csr_to_ell(m_.T.tocsr()) for m_ in mats]
    w = max(v.shape[1] for v, _ in fwd)
    w_t = max(v.shape[1] for v, _ in bwd)

    def pad_stack(tabs, width):
        vals = np.stack([
            np.pad(v, ((0, 0), (0, width - v.shape[1]))) for v, _ in tabs
        ])
        cols = np.stack([
            np.pad(c, ((0, 0), (0, width - c.shape[1]))) for _, c in tabs
        ])
        return vals, cols.astype(np.int32)

    vals, cols = pad_stack(fwd, w)
    vals_t, cols_t = pad_stack(bwd, w_t)
    nnz = sum(m_.nnz for m_ in mats)
    return (jnp.asarray(vals), jnp.asarray(cols), jnp.asarray(vals_t),
            jnp.asarray(cols_t), shape, nnz)


def _mk_ell(vals, cols, vals_t, cols_t, shape, nnz):
    op = object.__new__(EllOperator)
    op.vals, op.cols = vals, cols
    op.vals_t, op.cols_t = vals_t, cols_t
    op.shape = shape
    op.nnz = nnz
    return op


def batched_frame_solve(blocks, B, L, solver="mmgks", **kw):
    """Reconstruct all frames in one vmapped fused-solver launch.

    blocks: per-frame scipy matrices (same shape); B: per-frame data
    vectors; L: shared regularization operator. Returns X (nt, n).
    """
    vals, cols, vals_t, cols_t, shape, nnz = stack_ell_tables(blocks)
    Bm = jnp.stack([jnp.asarray(np.asarray(bb).reshape(-1)) for bb in B])

    solve = fused_mmgks if solver == "mmgks" else fused_gks
    static = dict(
        projection_dim=kw.pop("projection_dim", 3),
        n_iter=kw.pop("n_iter", 10),
        use_gcv=kw.pop("use_gcv", None),
        # all four on-device regparam modes vmap over frames
        regparam_mode=kw.pop("regparam_mode", "gcv"),
    )

    def one(v, c, vt, ct, b):
        op = _mk_ell(v, c, vt, ct, shape, nnz)
        x, lams, resids = solve(op, b, L, **static, **kw)
        return x

    X = jax.vmap(one)(vals, cols, vals_t, cols_t, Bm)
    return X
