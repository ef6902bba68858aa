"""Structured operators vs scipy sparse / dense oracles."""
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import sparse as sp
from scipy.ndimage import convolve, convolve1d

from trips_tpu.operators import (
    Blur1D,
    Blur2D,
    CenteredDerivative2D,
    CenteredSpaceTimeDerivative,
    FirstDerivative1D,
    FirstDerivative2D,
    FrameletOperator,
    SpaceTimeDerivative,
    analysis_matrix,
    first_derivative_2d_matrix,
    first_derivative_matrix,
    gauss_psf_1d,
    gauss_psf_2d,
    spacetime_derivative_matrix,
)


def check_against_sparse(op, S, rng, atol=1e-12):
    x = rng.standard_normal(op.shape[1])
    y = rng.standard_normal(op.shape[0])
    np.testing.assert_allclose(np.asarray(op.matvec(jnp.asarray(x))), S @ x, atol=atol)
    np.testing.assert_allclose(np.asarray(op.rmatvec(jnp.asarray(y))), S.T @ y, atol=atol)


def test_first_derivative_1d(rng):
    n = 17
    check_against_sparse(FirstDerivative1D(n), first_derivative_matrix(n), rng)


def test_first_derivative_2d(rng):
    n = 9
    check_against_sparse(FirstDerivative2D(n, n), first_derivative_2d_matrix(n, n), rng)


def test_spacetime_derivative(rng):
    nx = ny = 5
    nt = 4
    check_against_sparse(
        SpaceTimeDerivative(nx, ny, nt), spacetime_derivative_matrix(nx, ny, nt), rng
    )


def centered_matrix_1d(n):
    D = sp.lil_matrix((n, n))
    for i in range(1, n - 1):
        D[i, i - 1], D[i, i + 1] = -0.5, 0.5
    return D.tocsr()


def test_centered_derivative_2d(rng):
    n = 7
    Dc = centered_matrix_1d(n)
    S = sp.vstack([sp.kron(sp.identity(n), Dc), sp.kron(Dc, sp.identity(n))]).tocsr()
    check_against_sparse(CenteredDerivative2D(n, n), S, rng)


def test_centered_spacetime(rng):
    nx = ny = 4
    nt = 5
    Dc2 = sp.vstack(
        [
            sp.kron(sp.identity(nx), centered_matrix_1d(nx)),
            sp.kron(centered_matrix_1d(nx), sp.identity(nx)),
        ]
    )
    S = sp.vstack(
        [
            sp.kron(sp.identity(nt), Dc2),
            sp.kron(centered_matrix_1d(nt), sp.identity(nx * ny)),
        ]
    ).tocsr()
    check_against_sparse(CenteredSpaceTimeDerivative(nx, ny, nt), S, rng)


def test_blur1d_matches_scipy(rng):
    n = 40
    psf, _ = gauss_psf_1d(n, 4.0)
    op = Blur1D(n, 4.0)
    x = rng.standard_normal(n)
    np.testing.assert_allclose(
        np.asarray(op.matvec(jnp.asarray(x))), convolve1d(x, psf, mode="reflect"), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(op.rmatvec(jnp.asarray(x))),
        convolve1d(x, psf[::-1], mode="reflect"),
        atol=1e-12,
    )


@pytest.mark.parametrize("dim", [(3, 3), (9, 9), (4, 6)])
def test_blur2d_matches_scipy(rng, dim):
    n = 12
    psf, _ = gauss_psf_2d(dim, (1.0, 2.0))
    op = Blur2D(dim, (1.0, 2.0), n, n)
    X = rng.standard_normal((n, n))
    np.testing.assert_allclose(
        np.asarray(op.matvec(jnp.asarray(X.reshape(-1)))).reshape(n, n),
        convolve(X, psf, mode="reflect"),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(op.rmatvec(jnp.asarray(X.reshape(-1)))).reshape(n, n),
        convolve(X, np.flipud(np.fliplr(psf)), mode="reflect"),
        atol=1e-12,
    )


def test_framelet_tight_frame(rng):
    for l in (1, 2):
        W = analysis_matrix(16, l)
        np.testing.assert_allclose(W.T @ W, np.eye(16), atol=1e-10)


def test_framelet_operator_adjoint(rng):
    op = FrameletOperator(8, 8, 2)
    x = rng.standard_normal(64)
    y = rng.standard_normal(op.shape[0])
    lhs = float(np.asarray(op.matvec(jnp.asarray(x))) @ y)
    rhs = float(x @ np.asarray(op.rmatvec(jnp.asarray(y))))
    assert lhs == pytest.approx(rhs, rel=1e-10)
    # tight frame: W^T W = I
    xtw = np.asarray(op.rmatvec(op.matvec(jnp.asarray(x))))
    np.testing.assert_allclose(xtw, x, atol=1e-10)


def test_framelet_level1_matches_reference_stack(rng):
    """For l=1 the reference recursion and ours coincide: W = [H0;H1;H2]."""
    from trips_tpu.operators.framelet import construct_filters

    n = 10
    H0, H1, H2 = construct_filters(1, n)
    W = analysis_matrix(n, 1)
    np.testing.assert_allclose(W, np.vstack([H0, H1, H2]), atol=1e-12)
