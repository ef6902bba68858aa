"""Fused all-on-device GKS/MMGKS vs the host-driven reference-parity
implementations."""
import jax.numpy as jnp
import numpy as np

from trips_tpu.core import DenseOperator
from trips_tpu.operators import Blur1D, FirstDerivative1D
from trips_tpu.solvers import GKS, MMGKS
from trips_tpu.solvers.fused import fused_gks, fused_mmgks


def problem():
    n = 80
    rng = np.random.default_rng(7)
    op = Blur1D(n, 4.0)
    A = np.asarray(op.mat)
    h = np.pi / n
    g = -np.pi / 2 + np.arange(0.5, n, 1) * h
    x_true = 2 * np.exp(-6 * (g - 0.8) ** 2) + np.exp(-2 * (g + 0.5) ** 2)
    b_true = A @ x_true
    e = rng.standard_normal(n)
    b = b_true + 0.02 * np.linalg.norm(b_true) / np.linalg.norm(e) * e
    return op, A, x_true, b


def test_fused_gks_matches_host():
    op, A, x_true, b = problem()
    n = len(b)
    L = FirstDerivative1D(n)
    x_host, info = GKS(op, b, L, projection_dim=3, n_iter=8, regparam="gcv")
    x_dev, lams, resids = fused_gks(op, jnp.asarray(b), L, projection_dim=3,
                                    n_iter=8, use_gcv=True)
    # the GCV surface is flat near its minimum, so lam trajectories can
    # differ in the flat region while the solutions coincide
    np.testing.assert_allclose(
        np.asarray(x_dev), np.asarray(x_host).reshape(-1), atol=1e-5
    )
    assert np.all(np.asarray(lams) >= 1e-9) and np.all(np.asarray(lams) <= 1e2)


def test_fused_gks_scalar_lambda():
    op, A, x_true, b = problem()
    n = len(b)
    L = FirstDerivative1D(n)
    x_host, info = GKS(op, b, L, projection_dim=3, n_iter=6, regparam=0.05)
    x_dev, lams, _ = fused_gks(op, jnp.asarray(b), L, projection_dim=3,
                               n_iter=6, regparam=0.05, use_gcv=False)
    np.testing.assert_allclose(
        np.asarray(x_dev), np.asarray(x_host).reshape(-1), rtol=1e-5, atol=1e-8
    )


def test_fused_mmgks_matches_host():
    op, A, x_true, b = problem()
    n = len(b)
    L = FirstDerivative1D(n)
    x_host, info = MMGKS(op, b, L, pnorm=2, qnorm=1, projection_dim=3,
                         n_iter=8, regparam="gcv")
    x_dev, lams, _ = fused_mmgks(op, jnp.asarray(b), L, pnorm=2.0, qnorm=1.0,
                                 projection_dim=3, n_iter=8, use_gcv=True)
    np.testing.assert_allclose(
        np.asarray(x_dev), np.asarray(x_host).reshape(-1), atol=1e-4
    )


def test_fused_gks_reconstruction_quality():
    op, A, x_true, b = problem()
    L = FirstDerivative1D(len(b))
    x_dev, lams, _ = fused_gks(op, jnp.asarray(b), L, projection_dim=3,
                               n_iter=10, use_gcv=True)
    err = np.linalg.norm(np.asarray(x_dev) - x_true) / np.linalg.norm(x_true)
    assert err < 0.1


def test_fused_hybrid_lsqr_matches_host():
    from trips_tpu.solvers import Hybrid_LSQR
    from trips_tpu.solvers.fused import fused_hybrid_lsqr

    op, A, x_true, b = problem()
    x_host, info = Hybrid_LSQR(op, b, n_iter=10, regparam="gcv")
    x_dev, lams = fused_hybrid_lsqr(op, jnp.asarray(b), n_iter=10, use_gcv=True)
    np.testing.assert_allclose(
        np.asarray(x_dev), np.asarray(x_host).reshape(-1), atol=1e-5
    )


def test_fused_hybrid_lsqr_scalar():
    from trips_tpu.solvers import Hybrid_LSQR
    from trips_tpu.solvers.fused import fused_hybrid_lsqr

    op, A, x_true, b = problem()
    x_host, info = Hybrid_LSQR(op, b, n_iter=10, regparam=0.01)
    x_dev, lams = fused_hybrid_lsqr(op, jnp.asarray(b), n_iter=10,
                                    regparam=0.01, use_gcv=False)
    np.testing.assert_allclose(
        np.asarray(x_dev), np.asarray(x_host).reshape(-1), atol=1e-6
    )
