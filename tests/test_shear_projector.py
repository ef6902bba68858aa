"""Shear-stack projector: adjointness, matrix oracle, Joseph proximity."""
import jax.numpy as jnp
import numpy as np

from trips_tpu.operators.shear_projector import (
    ShearStackParallelProjector,
    shear_stack_matrix,
)
from trips_tpu.problems.projector import parallel_beam_matrix


def _ops(nx, nang, det_count=None, shift=0.0123):
    angles = np.linspace(0, np.pi, nang, endpoint=False) + shift
    op = ShearStackParallelProjector(nx, angles, det_count=det_count)
    return angles, op


def test_adjoint_exact(rng):
    for nx, nang, p in [(32, 12, None), (17, 7, 23), (16, 4, 24)]:
        _, op = _ops(nx, nang, p)
        x = rng.standard_normal(op.shape[1])
        y = rng.standard_normal(op.shape[0])
        lhs = float(np.asarray(op.matvec(jnp.asarray(x))) @ y)
        rhs = float(x @ np.asarray(op.rmatvec(jnp.asarray(y))))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


def test_matches_host_matrix_oracle(rng):
    for nx, nang, p in [(32, 12, None), (17, 7, 23)]:
        angles, op = _ops(nx, nang, p)
        A = shear_stack_matrix(nx, angles, det_count=p)
        x = rng.standard_normal(op.shape[1])
        u = rng.standard_normal(op.shape[0])
        np.testing.assert_allclose(
            np.asarray(op.matvec(jnp.asarray(x))), A @ x, atol=1e-11)
        np.testing.assert_allclose(
            np.asarray(op.rmatvec(jnp.asarray(u))), A.T @ u, atol=1e-11)


def test_axis_aligned_angles(rng):
    """Angles 0 and pi/2 exercise degenerate shear (all-zero shifts)."""
    nx = 16
    angles = np.array([0.0, np.pi / 2, np.pi / 4, 2.2])
    op = ShearStackParallelProjector(nx, angles)
    A = shear_stack_matrix(nx, angles)
    x = rng.standard_normal(nx * nx)
    np.testing.assert_allclose(
        np.asarray(op.matvec(jnp.asarray(x))), A @ x, atol=1e-11)
    # at axis-aligned angles the footprint collapses to exact column sums
    AJ = parallel_beam_matrix(nx, angles[:2], model="linear")
    y = np.asarray(op.matvec(jnp.asarray(x)))[: 2 * nx]
    np.testing.assert_allclose(y, AJ @ x, atol=1e-11)


def test_close_to_joseph_operator(rng):
    """Composite (B-spline) footprint stays near the Joseph matrix."""
    nx, nang = 32, 20
    angles, op = _ops(nx, nang)
    AJ = parallel_beam_matrix(nx, angles, model="linear")
    # compare on a smooth image (operator models differ at pixel scale)
    yy, xx = np.mgrid[0:nx, 0:nx] / nx - 0.5
    x = np.exp(-((xx) ** 2 + (yy + 0.1) ** 2) * 20).reshape(-1)
    y1 = np.asarray(op.matvec(jnp.asarray(x)))
    y2 = AJ @ x
    assert np.linalg.norm(y1 - y2) / np.linalg.norm(y2) < 2e-2


def test_cgls_reconstruction_parity(rng):
    """Shear-stack CGLS matches Joseph-matrix CGLS in the noisy regime.

    The comparison is the semiconvergence minimum of the relative error at
    2% data noise — the regime ill-posed reconstruction actually runs in.
    (On *noiseless* consistent data the smoother quadratic-B-spline
    footprint converges ~1.4x slower at a fixed iteration count; with noise
    the min errors agree within ~20%, shrinking as noise grows.)
    """
    from trips_tpu.problems.phantoms import shepp_logan

    nx, views, noise = 32, 40, 0.02
    angles = np.linspace(0, np.pi, views, endpoint=False)
    x_true = shepp_logan(nx).reshape(-1)
    op = ShearStackParallelProjector(nx, angles)
    AJ = parallel_beam_matrix(nx, angles, model="linear")

    def min_err(mv, rmv):
        b = mv(x_true)
        e = rng.standard_normal(b.shape)
        e *= noise * np.linalg.norm(b) / np.linalg.norm(e)
        b = b + e
        x = np.zeros(nx * nx)
        r = b - mv(x)
        t = rmv(r)
        p = t.copy()
        gamma = t @ t
        best = np.inf
        for _ in range(60):
            w = mv(p)
            beta = gamma / (w @ w)
            x = x + beta * p
            r = r - beta * w
            t = rmv(r)
            gn = t @ t
            p = t + (gn / gamma) * p
            gamma = gn
            best = min(best, np.linalg.norm(x - x_true)
                       / np.linalg.norm(x_true))
        return best

    e_shear = min_err(lambda v: np.asarray(op.matvec(jnp.asarray(v))),
                      lambda v: np.asarray(op.rmatvec(jnp.asarray(v))))
    e_joseph = min_err(lambda v: AJ @ v, lambda v: AJ.T @ v)
    assert e_shear < e_joseph * 1.3 + 0.01, (e_shear, e_joseph)
