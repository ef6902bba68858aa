"""Generalized SVD via QR + cosine-sine decomposition (host, dense).

Reference: ``trips/utilities/decompositions.py:257-334`` builds the GSVD of
(A, B) as QR of the stacked [R_A; R_B] followed by a MATLAB-translated CSD
with diagonal-normalization sweeps. Here the CSD uses the direct Van Loan
construction instead (SVD of Q1 with ascending cosines; the sine block's
columns are automatically orthogonal since S^T S = I - C^2), which is exact
and much simpler, with the same output convention:

  A = U @ C @ X.T,   B = V @ S @ X.T,   C^T C + S^T S = I,
  diag(C) ascending.

Used only by the TGSVD solver and the 'tgsvd' parameter-selection modes;
these operate on small/medium dense problems and run replicated on host.
"""
from __future__ import annotations

import numpy as np


def csd(Q1, Q2, tol=1e-12):
    """CS decomposition of a column-orthonormal stacked pair.

    Q1 (m, p), Q2 (n, p) with Q1^T Q1 + Q2^T Q2 = I_p.
    Returns U (m, m), V (n, n), Z (p, p), C (m, p), S (n, p) with
    Q1 = U C Z^T, Q2 = V S Z^T, cosines ascending.
    """
    m, p = Q1.shape
    n = Q2.shape[0]
    U, c, Zt = np.linalg.svd(Q1)
    # ascending cosines to match the reference's flipped ordering
    q = min(m, p)
    U[:, :q] = U[:, q - 1 :: -1]
    c = c[::-1]
    Z = Zt.T
    Z[:, :q] = Z[:, q - 1 :: -1]

    c_full = np.zeros(p)
    c_full[:q] = np.clip(c, 0.0, 1.0)
    Sblock = Q2 @ Z  # columns orthogonal, norms s_i = sqrt(1 - c_i^2)
    s = np.sqrt(np.clip(1.0 - c_full**2, 0.0, None))

    V = np.zeros((n, n))
    cols = []
    for i in range(min(n, p)):
        if s[i] > tol:
            cols.append(Sblock[:, i] / s[i])
    k = len(cols)
    if k:
        V[:, :k] = np.column_stack(cols)
    # complete V to an orthonormal basis
    if k < n:
        Qc, _ = np.linalg.qr(np.random.default_rng(0).standard_normal((n, n)))
        basis = V[:, :k]
        for v in Qc.T:
            if basis.shape[1] >= n:
                break
            w = v - basis @ (basis.T @ v)
            nw = np.linalg.norm(w)
            if nw > 1e-8:
                basis = np.column_stack([basis, w / nw])
        V = basis

    C = np.zeros((m, p))
    C[np.arange(q), np.arange(q)] = c_full[:q]
    S = np.zeros((n, p))
    qs = min(n, p)
    S[np.arange(qs), np.arange(qs)] = s[:qs]
    # fix signs so V^T Q2 Z = S exactly (columns with s_i > tol already match)
    return U, V, Z, C, S


def gsvd(A, B):
    """GSVD of (A (m,p), B (n,p)), m >= n >= p.

    Returns (U, V, X, C, S) with A = U C X^T, B = V S X^T
    (reference convention, ``decompositions.py:257-271``).
    """
    A = np.asarray(A, dtype=float)
    B = np.asarray(B, dtype=float)
    m1, p = A.shape
    m2, p2 = B.shape
    if p != p2 or not (m1 >= m2 >= p):
        raise ValueError(
            "Invalid input dimensions. A should be of size mxp, and B should "
            "be of size nxp with m >= n >= p."
        )
    QA, RA = np.linalg.qr(A, mode="reduced")
    QB, RB = np.linalg.qr(B, mode="reduced")
    Q, R = np.linalg.qr(np.concatenate([RA, RB], axis=0), mode="reduced")
    U, V, Z, C, S = csd(Q[:p, :], Q[p:, :])
    X = R.T @ Z
    return QA @ U, QB @ V, X, C, S


def gsvd_jit(A, B, tol=1e-12):
    """Jittable device twin of :func:`gsvd` (ROADMAP parity gap "GSVD at
    scale"): same construction (QR of the stacked R factors + Van Loan
    CSD) in jnp, so TGSVD-style solves and tgsvd truncation selection can
    run inside one device program.

    Returns (U, V, X, C, S) with A = U C X^T, B = V S X^T, cosines
    ascending. Difference vs the host version: V's null-sine columns
    (s_i <= tol, a measure-zero configuration for the ill-posed pencils
    this serves) are completed by a deterministic Householder QR of the
    masked sine block rather than the host's Gram-Schmidt sweep — V stays
    orthonormal and V S Z^T == Q2 still holds for every live column.
    Shapes must satisfy m >= n >= p (checked at trace time).
    """
    import jax.numpy as jnp

    m1, p = A.shape
    m2, p2 = B.shape
    if p != p2 or not (m1 >= m2 >= p):
        raise ValueError(
            "Invalid input dimensions. A should be of size mxp, and B "
            "should be of size nxp with m >= n >= p.")
    QA, RA = jnp.linalg.qr(A, mode="reduced")
    QB, RB = jnp.linalg.qr(B, mode="reduced")
    Q, R = jnp.linalg.qr(jnp.concatenate([RA, RB], axis=0), mode="reduced")
    Q1, Q2 = Q[:p, :], Q[p:, :]

    n = Q2.shape[0]
    U, c, Zt = jnp.linalg.svd(Q1)
    q = min(p, Q1.shape[0])
    # ascending cosines (the reference's flipped ordering)
    U = U.at[:, :q].set(U[:, q - 1::-1])
    c = jnp.clip(c[::-1], 0.0, 1.0)
    Z = Zt.T
    Z = Z.at[:, :q].set(Z[:, q - 1::-1])

    c_full = jnp.zeros((p,), A.dtype).at[:q].set(c)
    s = jnp.sqrt(jnp.clip(1.0 - c_full**2, 0.0, None))
    Sblock = Q2 @ Z
    qs = min(n, p)
    live = s[:qs] > tol
    V0 = jnp.where(live[None, :],
                   Sblock[:, :qs] / jnp.maximum(s[:qs], tol)[None, :], 0.0)
    # orthonormal completion: QR of [V0 | I] keeps live columns (already
    # orthonormal) and fills the rest deterministically
    Vq, _ = jnp.linalg.qr(
        jnp.concatenate([V0, jnp.eye(n, dtype=A.dtype)], axis=1),
        mode="reduced")
    # Householder QR may flip signs of the live columns; restore them
    sign = jnp.sign(jnp.sum(Vq[:, :qs] * V0, axis=0))
    sign = jnp.where(sign == 0, 1.0, sign)
    V = Vq[:, :n].at[:, :qs].multiply(sign[None, :])

    C = jnp.zeros((p, p), A.dtype).at[jnp.arange(q), jnp.arange(q)].set(
        c_full[:q])
    qs = min(n, p)
    S = jnp.zeros((n, p), A.dtype).at[jnp.arange(qs), jnp.arange(qs)].set(
        s[:qs])
    X = R.T @ Z
    return QA @ U, QB @ V, X, C, S
