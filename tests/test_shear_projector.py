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
    """Shear-stack CGLS reconstructs as well as Joseph-matrix CGLS."""
    from trips_tpu.krylov import cgls
    from trips_tpu.problems.phantoms import shepp_logan
    from trips_tpu.core.linop import DenseOperator

    nx, views = 32, 40
    angles = np.linspace(0, np.pi, views, endpoint=False)
    x_true = shepp_logan(nx).reshape(-1)
    op = ShearStackParallelProjector(nx, angles)
    AJ = parallel_beam_matrix(nx, angles, model="linear")

    # consistent data from each model's own forward (no inverse crime wrt
    # the comparison: both reconstruct their own consistent system)
    errs = {}
    for name, A_op, b in (
        ("shear", op, op.matvec(jnp.asarray(x_true))),
        ("joseph", DenseOperator(AJ.toarray()), jnp.asarray(AJ @ x_true)),
    ):
        x, _ = cgls(A_op, b, jnp.zeros(nx * nx), 60, 1e-12)
        errs[name] = (np.linalg.norm(np.asarray(x) - x_true)
                      / np.linalg.norm(x_true))
    assert errs["shear"] < errs["joseph"] * 1.25 + 0.02, errs
