"""CGLS solver wrapper with reference-style (x, info) output.

Reference: ``trips/solvers/CGLS.py:16-86``. The fused device loop lives in
``trips_tpu.krylov.cgls``; this wrapper adds the history bookkeeping the
reference returns.
"""
from __future__ import annotations


from ..krylov import cgls as _cgls_fused
from ..krylov import cgls_history as _cgls_history
from ._common import as_op, host, rel_error_history, vec


def CGLS(A, b, x0, max_iter, tol, x_true=None, **kwargs):
    """Returns (x, info)."""
    A = as_op(A)
    b = vec(b)
    x0 = vec(x0)
    want_history = kwargs.get("history", True)
    if want_history:
        x, k, xs, rel_steps = _cgls_history(A, b, x0, max_iter, tol)
        k = int(k)
        x_history = [xs[i] for i in range(k)]
        rel_residual = [float(r) for r in host(rel_steps)[:k]]
    else:
        x, k = _cgls_fused(A, b, x0, max_iter, tol)
        k = int(k)
        x_history, rel_residual = [], []

    info = {
        "xHistory": x_history,
        "regParam": [],
        "relResidual": rel_residual,
        "its": k,
    }
    if x_true is not None:
        info["relError"] = rel_error_history(x_history, x_true) if x_history else []
    return x[:, None], info
