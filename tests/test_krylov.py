"""Krylov decompositions / CGLS vs NumPy oracles mirroring the reference."""
import jax.numpy as jnp
import numpy as np

from trips_tpu.core import DenseOperator
from trips_tpu.krylov import arnoldi, cgls, cgls_history, golub_kahan

from oracles import arnoldi_np, cgls_np, golub_kahan_np


def make_illposed(rng, m, n, cond=1e2):
    """Dense system with known smooth solution.

    Trajectory-matching tests use cond=1e2: without reorthogonalization the
    Golub-Kahan/CG recurrences amplify eps-level differences like cond^k, so
    bitwise-trajectory comparison is only meaningful for moderate conditioning
    (the reference would diverge from itself across BLAS builds the same way).
    Severely ill-posed cases are covered by invariant tests below.
    """
    U, _ = np.linalg.qr(rng.standard_normal((m, m)))
    V, _ = np.linalg.qr(rng.standard_normal((n, n)))
    s = np.logspace(0, -np.log10(cond), min(m, n))
    A = U[:, : len(s)] @ np.diag(s) @ V[:, : len(s)].T
    x = np.sin(np.linspace(0, 3, n))
    return A, x, A @ x


def test_golub_kahan_matches_oracle(rng):
    A, _, b = make_illposed(rng, 60, 40)
    U, S, V = golub_kahan(DenseOperator(A), jnp.asarray(b), 12)
    U0, S0, V0 = golub_kahan_np(A, b, 12)
    np.testing.assert_allclose(np.asarray(U), U0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(S), S0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(V), V0, atol=1e-8)


def test_arnoldi_matches_update_oracle(rng):
    A, _, b = make_illposed(rng, 30, 30)
    Q, H = arnoldi(DenseOperator(A), jnp.asarray(b), 10)
    Q0, H0 = arnoldi_np(A, b, 10)
    np.testing.assert_allclose(np.asarray(Q), Q0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(H), H0, atol=1e-8)
    # orthogonality of the basis (the reference batch form violates this)
    QtQ = np.asarray(Q).T @ np.asarray(Q)
    np.testing.assert_allclose(QtQ, np.eye(11), atol=1e-10)


def test_cgls_matches_oracle(rng):
    A, xt, b = make_illposed(rng, 50, 50)
    x0 = np.zeros(50)
    x, k = cgls(DenseOperator(A), jnp.asarray(b), jnp.asarray(x0), 30, 1e-12)
    x_np, k_np, _ = cgls_np(A, b, x0, 30, 1e-12)
    assert int(k) == k_np
    # eps differences amplify like cond(A^T A)^k through the recurrence, so
    # the final iterate is compared at the level CG rounding allows
    np.testing.assert_allclose(np.asarray(x), x_np, atol=2e-2)
    # run to convergence: both reach the LS solution
    x_full, _ = cgls(DenseOperator(A), jnp.asarray(b), jnp.asarray(x0), 400, 1e-14)
    assert np.linalg.norm(np.asarray(x_full) - xt) / np.linalg.norm(xt) < 1e-6


def test_cgls_history(rng):
    A, xt, b = make_illposed(rng, 40, 40)
    x0 = np.zeros(40)
    x, k, xs, rel = cgls_history(DenseOperator(A), jnp.asarray(b), jnp.asarray(x0), 15, 0.0)
    _, _, xs_np = cgls_np(A, b, x0, 15, 0.0)
    assert int(k) == len(xs_np)
    np.testing.assert_allclose(np.asarray(xs)[:10], np.array(xs_np)[:10], rtol=1e-6, atol=1e-8)


def test_golub_kahan_invariants_illposed(rng):
    """On a severely ill-posed system, check the factorization relations."""
    A, _, b = make_illposed(rng, 60, 40, cond=1e8)
    k = 12
    U, S, V = golub_kahan(DenseOperator(A), jnp.asarray(b), k)
    U, S, V = np.asarray(U), np.asarray(S), np.asarray(V)
    # A V = U S holds by construction of the recurrence
    np.testing.assert_allclose(A @ V, U @ S, atol=1e-10)
    # first basis vector
    np.testing.assert_allclose(U[:, 0], b / np.linalg.norm(b), atol=1e-12)
    # columns are unit norm
    np.testing.assert_allclose(np.linalg.norm(U, axis=0), 1.0, atol=1e-12)
    np.testing.assert_allclose(np.linalg.norm(V, axis=0), 1.0, atol=1e-12)


def test_cgls_early_stop(rng):
    A, xt, b = make_illposed(rng, 40, 40)
    x0 = np.zeros(40)
    x, k = cgls(DenseOperator(A), jnp.asarray(b), jnp.asarray(x0), 1000, 1e-3)
    _, k_np, _ = cgls_np(A, b, x0, 1000, 1e-3)
    assert abs(int(k) - k_np) <= 1  # stop fires within one iteration of oracle
    assert int(k) < 1000


def test_lsqr_matches_scipy(rng):
    from scipy.sparse.linalg import lsqr as scipy_lsqr

    from trips_tpu.krylov import lsqr

    A, xt, b = make_illposed(rng, 60, 40)
    x, k = lsqr(DenseOperator(A), jnp.asarray(b), 200, damp=0.0,
                atol=1e-10, btol=1e-10)
    x_sp = scipy_lsqr(A, b, damp=0.0, atol=1e-10, btol=1e-10, iter_lim=200)[0]
    np.testing.assert_allclose(np.asarray(x), x_sp, atol=1e-5)


def test_lsqr_damped(rng):
    from trips_tpu.krylov import lsqr
    import scipy.linalg as sla

    A, xt, b = make_illposed(rng, 50, 30)
    damp = 0.1
    x, k = lsqr(DenseOperator(A), jnp.asarray(b), 500, damp=damp,
                atol=1e-12, btol=1e-12)
    x_direct = sla.solve(A.T @ A + damp**2 * np.eye(30), A.T @ b)
    np.testing.assert_allclose(np.asarray(x), x_direct, atol=1e-6)


def test_cgls_iters_to_tolerance_matches_reference():
    """BASELINE metric component: iterations-to-tolerance within rounding of
    the reference CGLS on tomography configs."""
    from trips_tpu.bench.iters_to_tol import compare

    for name, k_ref, k_dev in compare():
        assert abs(k_dev - k_ref) <= max(2, int(0.05 * k_ref)), (name, k_ref, k_dev)
