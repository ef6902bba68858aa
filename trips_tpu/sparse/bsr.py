"""Block-sparse (BSR) operator with MXU-sized dense blocks.

The TPU answer to unstructured sparsity: instead of scalar gathers (which the
TPU vector unit hates), the matrix is tiled into ``bs x bs`` dense blocks and
only nonzero blocks are stored. Every apply is then a stream of small dense
matmuls that ride the MXU, and the nnz/s ceiling is HBM bandwidth on the
block stream. Tomography projectors (reference: ASTRA ``OpTomo`` matvecs,
``trips/test_problems/Tomography.py:73-88``) have strong block locality
(neighboring detector rays cross neighboring pixels), so stored-block density
stays high enough for this to beat gather-ELL by a wide margin on TPU.

Blocks are sorted row-major (CSR of blocks); the transpose partition is
materialized for the adjoint apply per the BASELINE design.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.linop import LinearOperator, register_op


def _acc_dtype(a, b):
    """Accumulation dtype: promote inputs, never below float32."""
    d = jnp.promote_types(a, b)
    return jnp.promote_types(d, jnp.float32)


def _build_bsr(A, bs):
    """scipy CSR -> (blocks, brow, bcol, block_rowptr) numpy arrays."""
    from scipy import sparse as sp

    m, n = A.shape
    mb = -(-m // bs)
    nb = -(-n // bs)
    Ap = sp.csr_matrix(A)
    # pad to multiples of bs
    Ap.resize((mb * bs, nb * bs))
    B = Ap.tobsr(blocksize=(bs, bs))
    B.sort_indices()
    blocks = np.ascontiguousarray(B.data)  # (nblocks, bs, bs)
    bcol = B.indices.astype(np.int32)
    rowptr = B.indptr.astype(np.int32)
    counts = np.diff(rowptr)
    # Insert an explicit zero block into every empty block-row so the Pallas
    # kernel writes (initializes) every output tile exactly once.
    empty = np.where(counts == 0)[0]
    if empty.size:
        ins_pos = rowptr[empty]
        blocks = np.insert(blocks, ins_pos, np.zeros((bs, bs), dtype=blocks.dtype), axis=0)
        bcol = np.insert(bcol, ins_pos, 0)
        counts[empty] = 1
        rowptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    brow = np.repeat(np.arange(mb, dtype=np.int32), counts)
    return blocks, brow, bcol, rowptr, mb, nb


class BsrOperator(LinearOperator):
    """Row-major block-sparse operator (forward + transpose partitions)."""

    def __init__(self, blocks, brow, bcol, rowptr, blocks_t, brow_t, bcol_t,
                 rowptr_t, shape, bs, nnz):
        self.blocks = jnp.asarray(blocks)
        self.brow = jnp.asarray(brow)
        self.bcol = jnp.asarray(bcol)
        self.rowptr = jnp.asarray(rowptr)
        self.blocks_t = jnp.asarray(blocks_t)
        self.brow_t = jnp.asarray(brow_t)
        self.bcol_t = jnp.asarray(bcol_t)
        self.rowptr_t = jnp.asarray(rowptr_t)
        self.shape = tuple(shape)
        self.bs = bs
        self.nnz = nnz

    @classmethod
    def from_scipy(cls, A, bs: int = 128, dtype=None, block_dtype=None):
        from scipy import sparse as sp

        A = sp.csr_matrix(A)
        if dtype is not None:
            A = A.astype(dtype)
        nnz = A.nnz
        blocks, brow, bcol, rowptr, _, _ = _build_bsr(A, bs)
        blocks_t, brow_t, bcol_t, rowptr_t, _, _ = _build_bsr(A.T.tocsr(), bs)
        if block_dtype is not None:
            blocks = blocks.astype(block_dtype)
            blocks_t = blocks_t.astype(block_dtype)
        return cls(blocks, brow, bcol, rowptr, blocks_t, brow_t, bcol_t,
                   rowptr_t, A.shape, bs, nnz)

    @property
    def stored_density(self):
        """nnz / stored block capacity — the MXU utilization factor."""
        cap = self.blocks.shape[0] * self.bs * self.bs
        return self.nnz / max(cap, 1)

    # -- applies ---------------------------------------------------------
    def _apply(self, blocks, brow, bcol, x, m_out):
        bs = self.bs
        nb_out = -(-m_out // bs)
        acc = _acc_dtype(blocks.dtype, x.dtype)
        xp = jnp.pad(x, (0, (-x.shape[0]) % bs))
        xb = xp.reshape(-1, bs)
        gathered = xb[bcol]  # (nblocks, bs)
        prod = jnp.einsum(
            "nij,nj->ni", blocks, gathered, preferred_element_type=acc
        )
        y = jax.ops.segment_sum(prod, brow, num_segments=nb_out)
        return y.reshape(-1)[:m_out].astype(x.dtype)

    def _apply_mat(self, blocks, brow, bcol, X, m_out):
        bs = self.bs
        nb_out = -(-m_out // bs)
        k = X.shape[1]
        acc = _acc_dtype(blocks.dtype, X.dtype)
        Xp = jnp.pad(X, (((0, (-X.shape[0]) % bs), (0, 0))))
        Xb = Xp.reshape(-1, bs, k)
        gathered = Xb[bcol]  # (nblocks, bs, k)
        prod = jnp.einsum(
            "nij,njk->nik", blocks, gathered, preferred_element_type=acc
        )
        Y = jax.ops.segment_sum(prod, brow, num_segments=nb_out)
        return Y.reshape(-1, k)[:m_out].astype(X.dtype)

    def matvec(self, x):
        from .pallas_spmv import bsr_matvec

        return bsr_matvec(self, x, transpose=False)

    def rmatvec(self, y):
        from .pallas_spmv import bsr_matvec

        return bsr_matvec(self, y, transpose=True)

    def matvec_xla(self, x):
        return self._apply(self.blocks, self.brow, self.bcol, x, self.shape[0])

    def rmatvec_xla(self, y):
        return self._apply(self.blocks_t, self.brow_t, self.bcol_t, y, self.shape[1])

    def matmat(self, X):
        return self._apply_mat(self.blocks, self.brow, self.bcol, X, self.shape[0])

    def rmatmat(self, Y):
        return self._apply_mat(self.blocks_t, self.brow_t, self.bcol_t, Y, self.shape[1])


register_op(
    BsrOperator,
    ["blocks", "brow", "bcol", "rowptr", "blocks_t", "brow_t", "bcol_t", "rowptr_t"],
    ["shape", "bs", "nnz"],
)
