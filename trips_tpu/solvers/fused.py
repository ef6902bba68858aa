"""Fully-fused GKS / MMGKS: the entire solver is one jitted device program.

The host-driven variants (gks.py/mmgks.py) mirror the reference's numerics
with per-iteration host work on k x k systems. These versions instead
preallocate the basis at its final width K = projection_dim + n_iter and
run the whole iteration in a ``lax.fori_loop`` with *masked* linear algebra:

- columns >= k (the current active width) of V/AV/LV/Q/R are exactly zero;
- padded projected solves pin the inactive block by adding 1 to the
  inactive diagonal of G = R_A^T R_A + lam R_L^T R_L (nonsingular with a
  zero solution there);
- the GCV trace term uses the traced active count, so lam matches the
  equivalent growing-size computation;
- panel factorizations use Householder QR on the padded panel; Q's
  arbitrary inactive columns are neutralized by masking every projection
  (CholeskyQR would preserve zero columns but squares the panel condition
  number, which these ill-posed panels cannot afford).

No host synchronization, no recompilation as the basis grows — one XLA
program per (shape, n_iter) pair. Parameter selection: on-device GCV
(regparam.device) or a fixed scalar.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..krylov import golub_kahan
from ..operators.weights import smoothed_holder_weights
from ..regparam.device import fminbound


def _masked_qr(P, active_mask):
    """Householder QR of a padded panel whose inactive (trailing) columns
    are zero. R's inactive columns come out exactly zero; Q's inactive
    columns are arbitrary orthonormal completions, so every consumer of Q
    must mask projections by ``active_mask`` (CholeskyQR would keep them
    zero but squares the panel's condition number, which these ill-posed
    panels cannot afford)."""
    Q, R = jnp.linalg.qr(P, mode="reduced")
    return Q, R * active_mask[None, :]


def _pin(active_mask):
    return jnp.diag(jnp.where(active_mask, 0.0, 1.0))


def _masked_tikhonov_solve(R_A, R_L, bproj, lam, active_mask):
    G = R_A.T @ R_A + lam * (R_L.T @ R_L) + _pin(active_mask)
    y = jnp.linalg.solve(G, R_A.T @ bproj)
    return y * active_mask


def _gcv_lambda_masked(R_A, R_L, bproj, t_term, active_mask, out_norm2=0.0):
    """Masked GCV; t_term = active count (standard) or full row count
    (modified hybrid variant, reference gcv.py:69-72)."""
    pin = _pin(active_mask)

    def gcv(lam):
        G = R_A.T @ R_A + lam * (R_L.T @ R_L) + pin
        z = jnp.linalg.solve(G, R_A.T @ bproj)
        num = jnp.sum((R_A @ z - bproj) ** 2) + out_norm2
        trace = jnp.trace(R_A @ jnp.linalg.solve(G, R_A.T))
        return num / (t_term - trace) ** 2

    return fminbound(gcv, 1e-9, 1e2, xtol=1e-12, maxfun=1000)


@partial(jax.jit, static_argnames=("projection_dim", "n_iter", "use_gcv"))
def fused_gks(A, b, L, projection_dim=3, n_iter=20, regparam=1.0,
              use_gcv=True):
    """All-on-device GKS. Returns (x, lambda_history, residual_history).

    regparam: fixed lam when use_gcv=False; ignored otherwise.
    """
    b = jnp.reshape(b, (-1,))
    m, n = A.shape
    s = L.shape[0]
    K = projection_dim + n_iter
    dtype = b.dtype

    _, _, V0 = golub_kahan(A, b, projection_dim)
    V = jnp.zeros((n, K), dtype).at[:, :projection_dim].set(V0)
    AV = jnp.zeros((m, K), dtype).at[:, :projection_dim].set(A.matmat(V0))
    LV = jnp.zeros((s, K), dtype).at[:, :projection_dim].set(L.matmat(V0))

    col_idx = jnp.arange(K)

    def body(ii, carry):
        V, AV, LV, x, lams, resids = carry
        k = projection_dim + ii
        active = col_idx < k

        QA, R_A = _masked_qr(AV, active)
        QL, R_L = _masked_qr(LV, active)
        bproj = (QA.T @ b) * active

        lam = _gcv_lambda_masked(R_A, R_L, bproj, k.astype(dtype), active) if use_gcv \
            else jnp.asarray(regparam, dtype)
        y = _masked_tikhonov_solve(R_A, R_L, bproj, lam, active)
        x = V @ y

        r = A.rmatvec(AV @ y - b) + lam * L.rmatvec(LV @ y)
        for _ in range(3):
            r = r - V @ (V.T @ r)
        rnorm = jnp.linalg.norm(r)
        vn = r / rnorm

        V = V.at[:, k].set(vn)
        AV = AV.at[:, k].set(A.matvec(vn))
        LV = LV.at[:, k].set(L.matvec(vn))
        lams = lams.at[ii].set(lam)
        resids = resids.at[ii].set(rnorm)
        return (V, AV, LV, x, lams, resids)

    x0 = jnp.zeros((n,), dtype)
    lams0 = jnp.zeros((n_iter,), dtype)
    resids0 = jnp.zeros((n_iter,), dtype)
    V, AV, LV, x, lams, resids = jax.lax.fori_loop(
        0, n_iter, body, (V, AV, LV, x0, lams0, resids0)
    )
    return x, lams, resids


@partial(jax.jit, static_argnames=("projection_dim", "n_iter", "use_gcv"))
def fused_mmgks(A, b, L, pnorm=2.0, qnorm=1.0, epsilon=0.1,
                projection_dim=3, n_iter=20, regparam=1.0, use_gcv=True):
    """All-on-device MMGKS (smoothed-Holder weights).

    Returns (x, lambda_history, residual_history).
    """
    b = jnp.reshape(b, (-1,))
    m, n = A.shape
    s = L.shape[0]
    K = projection_dim + n_iter
    dtype = b.dtype

    _, _, V0 = golub_kahan(A, b, projection_dim)
    V = jnp.zeros((n, K), dtype).at[:, :projection_dim].set(V0)
    AV = jnp.zeros((m, K), dtype).at[:, :projection_dim].set(A.matmat(V0))
    LV = jnp.zeros((s, K), dtype).at[:, :projection_dim].set(L.matmat(V0))
    x0 = A.rmatvec(b)

    col_idx = jnp.arange(K)

    def body(ii, carry):
        V, AV, LV, x, lams, resids = carry
        k = projection_dim + ii
        active = col_idx < k

        v = A.matvec(x) - b
        wf = smoothed_holder_weights(v, epsilon, pnorm)
        u = L.matvec(x)
        wr = smoothed_holder_weights(u, epsilon, qnorm)

        QA, R_A = _masked_qr(AV * wf[:, None], active)
        QL, R_L = _masked_qr(LV * wr[:, None], active)
        bproj = (QA.T @ (wf * b)) * active
        bsolve = (QA.T @ b) * active

        lam = _gcv_lambda_masked(R_A, R_L, bproj, k.astype(dtype), active) if use_gcv \
            else jnp.asarray(regparam, dtype)
        y = _masked_tikhonov_solve(R_A, R_L, bsolve, lam, active)
        x = V @ y

        r = A.rmatvec(wf * (AV @ y - b)) + lam * L.rmatvec(wr * (LV @ y))
        for _ in range(2):
            r = r - V @ (V.T @ r)
        rnorm = jnp.linalg.norm(r)
        vn = r / rnorm

        V = V.at[:, k].set(vn)
        AV = AV.at[:, k].set(A.matvec(vn))
        LV = LV.at[:, k].set(L.matvec(vn))
        lams = lams.at[ii].set(lam)
        resids = resids.at[ii].set(rnorm)
        return (V, AV, LV, x, lams, resids)

    lams0 = jnp.zeros((n_iter,), dtype)
    resids0 = jnp.zeros((n_iter,), dtype)
    V, AV, LV, x, lams, resids = jax.lax.fori_loop(
        0, n_iter, body, (V, AV, LV, x0, lams0, resids0)
    )
    return x, lams, resids


@partial(jax.jit, static_argnames=("n_iter", "use_gcv", "reorth"))
def fused_hybrid_lsqr(A, b, n_iter=50, regparam=1.0, use_gcv=True,
                      reorth=False):
    """All-on-device Hybrid LSQR: fused Golub-Kahan factorization, then a
    fori_loop sweep over k with masked projected systems and on-device
    modified-GCV (fullsize = m, reference Hybrid_LSQR.py:80-84) or a fixed
    scalar lam. Returns (x, lambda_history).
    """
    b = jnp.reshape(b, (-1,))
    m, n = A.shape
    K = n_iter
    dtype = b.dtype

    U, B, V = golub_kahan(A, b, n_iter, reorth=reorth)
    beta = jnp.linalg.norm(b)
    bhat = jnp.zeros((K + 1,), dtype).at[0].set(beta)
    row_idx = jnp.arange(K + 1)
    col_idx = jnp.arange(K)

    def body(ii, carry):
        x, lams = carry
        k = ii + 1  # active columns (first solve at ii=1, as the reference)
        col_active = col_idx < k
        row_active = row_idx < k + 1
        Bm = B * col_active[None, :] * row_active[:, None]
        bh = bhat * row_active
        R_L = jnp.eye(K, dtype=dtype)
        lam = _gcv_lambda_masked(
            Bm, R_L * col_active[None, :], bh, jnp.asarray(float(m), dtype),
            col_active,
        ) if use_gcv else jnp.asarray(regparam, dtype)
        y = _masked_tikhonov_solve(Bm, R_L * col_active[None, :], bh, lam,
                                   col_active)
        x = V @ y
        lams = lams.at[ii].set(lam)
        return (x, lams)

    x0 = jnp.zeros((n,), dtype)
    lams0 = jnp.zeros((n_iter,), dtype)
    x, lams = jax.lax.fori_loop(1, n_iter, body, (x0, lams0))
    return x, lams
