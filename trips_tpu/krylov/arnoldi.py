"""Arnoldi factorization (modified Gram-Schmidt) — fused device loop.

Reference semantics: ``trips/utilities/decompositions.py:20-116`` (batch) and
``:207-228`` (incremental ``arnoldi_update`` used by Hybrid GMRES).

Deviation (deliberate): the reference *batch* arnoldi orthogonalizes the new
Krylov vector only against columns ``0..k-1`` (``decompositions.py:90-94``
loops ``range(iterations)``), silently skipping the current column ``k`` and
leaving ``H[k, k] = 0``; its incremental form (``:216-218``) orthogonalizes
against all columns. We implement the (correct) incremental semantics in both
forms, so the batch factorization here equals k applications of the
reference's ``arnoldi_update``.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("n_iter", "reorth"))
def arnoldi(A, b, n_iter: int, reorth: bool = False):
    """Returns Q (n, k+1), H (k+1, k) upper-Hessenberg, with Q[:,0] = b/||b||.

    reorth=True adds a second full Gram-Schmidt pass per step (CGS2-quality
    orthogonality; not in the reference)."""
    if A.shape[0] != A.shape[1]:
        raise ValueError("Arnoldi can not be used. The operator is not square")
    n = A.shape[0]
    b = jnp.reshape(b, (-1,))
    dtype = b.dtype

    Q = jnp.zeros((n, n_iter + 1), dtype)
    H = jnp.zeros((n_iter + 1, n_iter), dtype)
    Q = Q.at[:, 0].set(b / jnp.linalg.norm(b))

    def outer(k, carry):
        Q, H = carry
        q_k = jax.lax.dynamic_slice_in_dim(Q, k, 1, axis=1)[:, 0]
        w = A.matvec(q_k)

        def inner(j, wh):
            w, h = wh
            q_j = jax.lax.dynamic_slice_in_dim(Q, j, 1, axis=1)[:, 0]
            hj = jnp.dot(q_j, w)
            active = j <= k
            hj = jnp.where(active, hj, 0.0)
            w = w - hj * q_j
            h = h.at[j].set(hj)
            return (w, h)

        h = jnp.zeros((n_iter + 1,), dtype)
        w, h = jax.lax.fori_loop(0, n_iter, inner, (w, h))
        if reorth:
            # unused columns of Q are zero, so the full product is safe
            corr = Q.T @ w
            w = w - Q @ corr
            h = h + corr
        nrm = jnp.linalg.norm(w)
        h = h.at[k + 1].set(nrm)
        Q = jax.lax.dynamic_update_slice_in_dim(
            Q, (w / jnp.where(nrm == 0, 1.0, nrm))[:, None], k + 1, axis=1
        )
        H = jax.lax.dynamic_update_slice_in_dim(H, h[:, None], k, axis=1)
        return (Q, H)

    Q, H = jax.lax.fori_loop(0, n_iter, outer, (Q, H), unroll=2)
    return Q, H


def arnoldi_init(A, b, n_iter: int):
    """Preallocated Arnoldi state for ``arnoldi_extend``."""
    if A.shape[0] != A.shape[1]:
        raise ValueError("Arnoldi can not be used. The operator is not square")
    n = A.shape[0]
    b = jnp.reshape(b, (-1,))
    dtype = b.dtype
    Q = jnp.zeros((n, n_iter + 1), dtype).at[:, 0].set(
        b / jnp.linalg.norm(b))
    return Q, jnp.zeros((n_iter + 1, n_iter), dtype)


@partial(jax.jit, static_argnames=("reorth",))
def arnoldi_extend(A, Q, H, k0, n_steps, reorth: bool = False):
    """Resume the fused Arnoldi factorization at step ``k0`` for
    ``n_steps`` steps (traced — one compilation for every chunk). The
    matvec-economy primitive for Hybrid GMRES's dp_stop (mirrors the
    reference's incremental arnoldi_update + early break,
    Hybrid_GMRES.py:58-66)."""
    n = Q.shape[0]
    K = H.shape[1]
    dtype = Q.dtype

    def outer(k, carry):
        Q, H = carry
        q_k = jax.lax.dynamic_slice_in_dim(Q, k, 1, axis=1)[:, 0]
        w = A.matvec(q_k)

        def inner(j, wh):
            w, h = wh
            q_j = jax.lax.dynamic_slice_in_dim(Q, j, 1, axis=1)[:, 0]
            hj = jnp.where(j <= k, jnp.dot(q_j, w), 0.0)
            w = w - hj * q_j
            return (w, h.at[j].set(hj))

        h = jnp.zeros((K + 1,), dtype)
        w, h = jax.lax.fori_loop(0, K, inner, (w, h))
        if reorth:
            corr = Q.T @ w
            w = w - Q @ corr
            h = h + corr
        nrm = jnp.linalg.norm(w)
        h = h.at[k + 1].set(nrm)
        Q = jax.lax.dynamic_update_slice_in_dim(
            Q, (w / jnp.where(nrm == 0, 1.0, nrm))[:, None], k + 1, axis=1)
        H = jax.lax.dynamic_update_slice_in_dim(H, h[:, None], k, axis=1)
        return (Q, H)

    return jax.lax.fori_loop(k0, k0 + n_steps, outer, (Q, H))
