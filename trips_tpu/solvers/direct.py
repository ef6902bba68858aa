"""Direct regularization solvers: Tikhonov, TSVD, TGSVD.

Reference semantics:
- Tikhonov: ``trips/solvers/Tikhonov.py:19-29`` — lam by GCV/DP/scalar, then
  the normal-equations solve (A^T A + lam L^T L) x = A^T b.
- TSVD: ``trips/solvers/tSVD.py:19-38`` — full SVD, truncation index k by
  GCV('tsvd')/DP('tsvd')/user, x = V_k S_k^{-1} U_k^T b.
- TGSVD: ``trips/solvers/tGSVD.py:20-39`` — GSVD of (A, L), truncation by
  GCV('tgsvd')/DP('tgsvd'), x = X^{-T} C_trunc U^T b.

These operate on small/medium dense systems; decompositions run on host
(LAPACK) and the reconstructions on device.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.linop import IdentityOperator, LinearOperator
from ..regparam.dp import discrepancy_principle
from ..regparam.gcv import generalized_crossvalidation
from ..utils.gsvd import gsvd
from ._common import host

_GCV_NAMES = ("gcv", "GCV", "Gcv")
_DP_NAMES = ("DP", "dp", "Dp", "Discrepancy Principle", "Discrepancy principle",
             "discrepancy principle")


def _densify(M, n=None):
    if isinstance(M, IdentityOperator):
        return np.eye(M.shape[0])
    if isinstance(M, LinearOperator):
        return host(M.todense())
    if hasattr(M, "toarray"):
        return M.toarray()
    return np.asarray(M, dtype=float)


def Tikhonov(A, b, L, x_true=None, regparam="gcv", **kwargs):
    """Returns (x, lam)."""
    A = _densify(A)
    L = _densify(L)
    b = np.asarray(b, dtype=float).reshape(-1, 1)
    if regparam in _GCV_NAMES:
        lam = generalized_crossvalidation(np.eye(A.shape[0]), A, L, b)
    elif regparam in _DP_NAMES:
        lam = discrepancy_principle(np.eye(A.shape[0]), A, L, b, **kwargs)
    else:
        lam = regparam
    Aj = jnp.asarray(A)
    Lj = jnp.asarray(L)
    bj = jnp.asarray(b)
    x = jnp.linalg.solve(Aj.T @ Aj + lam * (Lj.T @ Lj), Aj.T @ bj)
    return x, lam


def tSVD_sol(A, b, regparam="gcv", **kwargs):
    """Returns (x, k)."""
    b = np.asarray(b, dtype=float).reshape(-1, 1)
    delta = kwargs.get("delta", None)
    if regparam == "dp" and delta is None:
        raise Exception(
            "A value for the noise level delta was not provided and the "
            "discrepancy principle cannot be applied. Please supply delta, "
            "or choose the regularization parameter according to gcv."
        )
    A = _densify(A)
    U, S, VT = np.linalg.svd(A)
    if regparam == "gcv":
        k = generalized_crossvalidation(U, S, VT, b, gcvtype="tsvd")
    elif regparam == "dp":
        k = discrepancy_principle(U, S, VT, b, dptype="tsvd", **kwargs)
    else:
        k = int(regparam)
    coef = (U[:, :k].T @ b) / S[:k].reshape(-1, 1)
    x = jnp.asarray(VT[:k, :].T) @ jnp.asarray(coef)
    return x, k


def tGSVD_sol(A, L, b, regparam="gcv", **kwargs):
    """Returns (x, k)."""
    b = np.asarray(b, dtype=float).reshape(-1, 1)
    delta = kwargs.get("delta", None)
    if regparam == "dp" and delta is None:
        raise Exception(
            "A value for the noise level delta was not provided and the "
            "discrepancy principle cannot be applied. Please supply delta, "
            "or choose the regularization parameter according to gcv."
        )
    A = _densify(A)
    L = _densify(L)
    U, _, X, C, S = gsvd(A, L)
    if regparam == "gcv":
        k = generalized_crossvalidation(U, S, X, b, gcvtype="tgsvd")
    elif regparam == "dp":
        k = discrepancy_principle(U, C, X, b, dptype="tgsvd", **kwargs)
    else:
        k = int(regparam)
    Y = np.linalg.inv(X.T)
    Ck = C.copy()
    Ck[:k, :k] = 0
    x = jnp.asarray(Y) @ jnp.asarray(Ck) @ (jnp.asarray(U.T) @ jnp.asarray(b))
    return x, k
