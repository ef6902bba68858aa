"""Majorization-minimization reweighting for MMGKS.

Reference: ``trips/utilities/weights.py:29-68`` and the inline variants in
``trips/solvers/MMGKS.py:56-93``. All elementwise, evaluated on device.

The spatial operator used *inside the isoTV weights* by the reference is the
pylops centered first derivative (``operators_old.py:22-45``): interior
stencil 0.5*(x[i+1]-x[i-1]) with zero boundary rows — distinct from the
forward-difference regularization operator. Mirrored here.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.linop import LinearOperator, register_op


def smoothed_holder_weights(x, epsilon, p):
    """z = (x^2 + eps^2)^(p/2 - 1)  (weights.py:66-68)."""
    return (x**2 + epsilon**2) ** (p / 2 - 1)


class CenteredDerivative2D(LinearOperator):
    """pylops-style centered 2D first derivative (operators_old.py:35-45):
    [kron(I, D_c); kron(D_c, I)] with D_c the centered stencil, zero edges.

    Shape (2*nx*ny, nx*ny); used for isoTV/GS weight evaluation.
    """

    def __init__(self, nx, ny):
        self.nx, self.ny = nx, ny
        self.shape = (2 * nx * ny, nx * ny)

    def _d1(self, X):
        # along axis 1 (within a row): 0.5*(x[i+1] - x[i-1]); edges zero
        out = jnp.zeros_like(X)
        return out.at[:, 1:-1].set(0.5 * (X[:, 2:] - X[:, :-2]))

    def _d0(self, X):
        out = jnp.zeros_like(X)
        return out.at[1:-1, :].set(0.5 * (X[2:, :] - X[:-2, :]))

    def matvec(self, x):
        X = x.reshape(self.nx, self.ny)
        return jnp.concatenate([self._d1(X).reshape(-1), self._d0(X).reshape(-1)])

    def rmatvec(self, y):
        nx, ny = self.nx, self.ny
        Y1 = y[: nx * ny].reshape(nx, ny)
        Y0 = y[nx * ny :].reshape(nx, ny)
        Z = jnp.zeros((nx, ny), y.dtype)
        Z = Z.at[:, 2:].add(0.5 * Y1[:, 1:-1])
        Z = Z.at[:, :-2].add(-0.5 * Y1[:, 1:-1])
        Z = Z.at[2:, :].add(0.5 * Y0[1:-1, :])
        Z = Z.at[:-2, :].add(-0.5 * Y0[1:-1, :])
        return Z.reshape(-1)

    def matmat(self, X):
        return jax.vmap(self.matvec, in_axes=1, out_axes=1)(X)


register_op(CenteredDerivative2D, [], ["nx", "ny", "shape"])


def iso_tv_weights(x, u, nx, ny, nt, epsilon, qnorm):
    """Isotropic-TV weights for dynamic problems (MMGKS.py:61-78).

    x: current solution, frame-major (nt*nx*ny,); u = L @ x with L the
    dynamic TV operator (spatial rows first, then the time block). The x/y
    derivative pairs per pixel per frame are coupled isotropically; the time
    block keeps smoothed-Holder weights.

    Deviation (deliberate): the reference reshapes the frame-major solution
    with ``x.reshape(nx**2, nt)`` in C order (MMGKS.py:68), silently pairing
    unrelated pixels across frames; we pair pixel p of frame t with itself.
    Weight row-length bookkeeping matches the reference's pylops centered
    derivative (2*nx*ny rows per frame).
    """
    Ls = CenteredDerivative2D(nx, ny)
    spacen = nx * ny
    spacent = spacen * nt
    X = x.reshape(nt, spacen).T  # (pixels, frames)
    LsX = Ls.matmat(X)  # (2*nx*ny, nt)
    L1, L2 = LsX[:spacen, :], LsX[spacen : 2 * spacen, :]
    weightx = (L1**2 + L2**2 + epsilon**2) ** ((qnorm - 2) / 4)
    # per-frame blocks of [d/dx; d/dy] weights, frame-major like L's rows
    wx_frames = jnp.concatenate([weightx.T, weightx.T], axis=1)  # (nt, 2*spacen)
    weightt = (u[2 * spacent :] ** 2 + epsilon**2) ** ((qnorm - 2) / 4)
    return jnp.concatenate([wx_frames.reshape(-1), weightt.reshape(-1)])


def gs_weights(x, Ls_matmat, nx, ny, nt, qnorm):
    """Group-sparsity weights (MMGKS.py:79-91): couple each spatial-derivative
    row across the nt frames, then tile over frames.

    Notes: the reference adds ``np.exp(2)`` (not epsilon^2) inside the power
    — a quirk we reproduce for parity (MMGKS.py:87-89) — and we fix its
    C-order frame-major reshape as in :func:`iso_tv_weights`.
    """
    X = x.reshape(nt, nx * ny).T  # (pixels, frames)
    D = Ls_matmat(X)  # (nrows, nt)
    row_energy = jnp.sum(D**2, axis=1)
    wr = (row_energy + np.exp(2)) ** (qnorm / 2 - 1)
    return jnp.tile(wr, nt)
