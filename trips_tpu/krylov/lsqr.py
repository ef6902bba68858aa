"""LSQR (Paige-Saunders) with optional Tikhonov damping — fused device loop.

Complements the hybrid solvers: when lam is known (or zero), the whole
damped least-squares iteration runs as one ``lax.while_loop`` on device —
one ``A v`` and one ``A^T u`` per step plus scalar Givens recurrences, the
same hot-loop shape as CGLS but with the better-conditioned bidiagonal
recurrence.

Stopping follows the standard LSQR criteria: atol/btol on the residual
estimates, plus the iteration cap.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class LSQRState(NamedTuple):
    x: jax.Array
    u: jax.Array
    v: jax.Array
    w: jax.Array
    alfa: jax.Array
    beta: jax.Array
    rhobar: jax.Array
    phibar: jax.Array
    rnorm: jax.Array
    arnorm: jax.Array
    k: jax.Array
    done: jax.Array


@partial(jax.jit, static_argnames=("max_iter",))
def lsqr(A, b, max_iter: int, damp=0.0, atol=1e-8, btol=1e-8):
    """Solve min ||Ax-b||^2 + damp^2 ||x||^2; returns (x, iterations)."""
    b = jnp.reshape(b, (-1,))
    m, n = A.shape
    dtype = b.dtype

    beta0 = jnp.linalg.norm(b)
    u0 = b / beta0
    v_raw = A.rmatvec(u0)
    alfa0 = jnp.linalg.norm(v_raw)
    v0 = v_raw / alfa0

    s0 = LSQRState(
        x=jnp.zeros((n,), dtype),
        u=u0,
        v=v0,
        w=v0,
        alfa=alfa0,
        beta=beta0,
        rhobar=alfa0,
        phibar=beta0,
        rnorm=beta0,
        arnorm=alfa0 * beta0,
        k=jnp.zeros((), jnp.int32),
        done=jnp.zeros((), jnp.bool_),
    )
    arnorm0 = s0.arnorm

    def cond(s):
        return jnp.logical_and(s.k < max_iter, jnp.logical_not(s.done))

    def step(s):
        # bidiagonalization step
        u = A.matvec(s.v) - s.alfa * s.u
        beta = jnp.linalg.norm(u)
        u = u / beta
        v = A.rmatvec(u) - beta * s.v
        alfa = jnp.linalg.norm(v)
        v = v / alfa

        # eliminate damping
        rhobar1 = jnp.sqrt(s.rhobar**2 + damp**2)
        cs1 = s.rhobar / rhobar1
        phibar = cs1 * s.phibar

        # Givens rotation
        rho = jnp.sqrt(rhobar1**2 + beta**2)
        cs = rhobar1 / rho
        sn = beta / rho
        theta = sn * alfa
        rhobar = -cs * alfa
        phi = cs * phibar
        phibar_new = sn * phibar

        x = s.x + (phi / rho) * s.w
        w = v - (theta / rho) * s.w

        # phibar carries an alternating sign through the rotations; the
        # residual-norm estimates are its magnitude
        rnorm = jnp.abs(phibar_new)
        arnorm = alfa * jnp.abs(sn * phibar)
        done = jnp.logical_or(
            rnorm <= btol * s0.rnorm + atol, arnorm <= atol * arnorm0
        )
        return LSQRState(x, u, v, w, alfa, beta, rhobar, phibar_new, rnorm,
                         arnorm, s.k + 1, done)

    s = jax.lax.while_loop(cond, step, s0)
    return s.x, s.k
