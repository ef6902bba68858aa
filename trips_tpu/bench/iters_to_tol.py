"""Iterations-to-tolerance comparison vs the reference algorithm.

The BASELINE metric's second component: our fused CGLS must take the same
number of iterations to a given tolerance as the reference's NumPy CGLS
(trips/solvers/CGLS.py) — same recurrence, same stopping rule — on the
reference configs. Run as a script to print the comparison table.
"""
from __future__ import annotations

import numpy as np


def cgls_reference(A, b, x0, max_iter, tol):
    """NumPy mirror of the reference CGLS loop (CGLS.py:16-86)."""
    b = np.asarray(b).reshape(-1)
    x = np.asarray(x0).reshape(-1).copy()
    r = b - A @ x
    t = A.T @ r
    p = t.copy()
    norms_t0 = np.linalg.norm(t)
    gamma = norms_t0**2
    k = 0
    while k < max_iter:
        k += 1
        w = A @ p
        delta = np.linalg.norm(w) ** 2 or np.finfo(float).eps
        beta = gamma / delta
        x = x + beta * p
        r = r - beta * w
        t = A.T @ r
        gamma_new = np.linalg.norm(t) ** 2
        p = t + (gamma_new / gamma) * p
        gamma = gamma_new
        if np.sqrt(gamma_new) <= norms_t0 * tol or np.linalg.norm(x) * tol >= 1:
            break
    return x, k


def compare(configs=None):
    import jax.numpy as jnp

    from ..krylov import cgls
    from ..problems.phantoms import shepp_logan, tectonic
    from ..problems.projector import fan_beam_matrix
    from ..sparse import EllOperator

    if configs is None:
        configs = [
            ("tomo32x30", 32, 30, tectonic, 1e-4),
            ("tomo64x40", 64, 40, shepp_logan, 1e-4),
        ]
    rows = []
    for name, nx, views, phantom, tol in configs:
        A = fan_beam_matrix(nx, views=views)
        x_true = phantom(nx).reshape(-1)
        b = A @ x_true
        _, k_ref = cgls_reference(A, b, np.zeros(A.shape[1]), 500, tol)
        op = EllOperator.from_scipy(A)
        _, k_dev = cgls(op, jnp.asarray(b), jnp.zeros(A.shape[1]), 500, tol)
        rows.append((name, k_ref, int(k_dev)))
    return rows


if __name__ == "__main__":
    for name, k_ref, k_dev in compare():
        print(f"{name}: reference CGLS iters={k_ref}, trips-tpu iters={k_dev}")
