"""Parameter-selection rules vs independently-coded oracles.

The oracles below re-derive the reference formulas (trips/utilities/
reg_param/{gcv,discrepancy_principle,l_curve}.py) directly from their
definitions; the library implementations must reproduce them to near
machine precision on projected systems.
"""
import numpy as np
import pytest
import scipy.linalg as sla
from scipy import optimize as sop

from trips_tpu.regparam import (
    discrepancy_principle,
    generalized_crossvalidation,
    l_curve,
)
from trips_tpu.utils.gsvd import csd, gsvd


def projected_system(rng, m=30, k=8, noise=0.01):
    A = rng.standard_normal((m, m)) @ np.diag(np.logspace(0, -4, m))
    x = np.linspace(0, 1, m)
    b = A @ x
    b = b + noise * np.linalg.norm(b) / np.sqrt(m) * rng.standard_normal(m)
    V = np.linalg.qr(rng.standard_normal((m, k)))[0]
    AV = A @ V
    Q_A, R_A = np.linalg.qr(AV)
    R_L = np.eye(k)
    return A, b.reshape(-1, 1), Q_A, R_A, R_L


def gcv_oracle(Q_A, R_A, R_L, b):
    def func(lam):
        G = R_A.T @ R_A + lam * R_L.T @ R_L
        z = sla.solve(G, R_A.T @ (Q_A.T @ b))
        num = np.linalg.norm(R_A @ z - Q_A.T @ b) ** 2
        tr = R_A.shape[0] - np.trace(R_A @ sla.solve(G, R_A.T))
        return float(num / tr**2)

    return float(sop.fminbound(func, 1e-9, 1e2, xtol=1e-12, maxfun=1000, disp=0))


def test_gcv_tikhonov_matches_oracle(rng):
    _, b, Q_A, R_A, R_L = projected_system(rng)
    lam = generalized_crossvalidation(Q_A, R_A, R_L, b)
    lam0 = gcv_oracle(Q_A, R_A, R_L, b)
    assert lam == pytest.approx(lam0, rel=1e-8, abs=1e-12)


def test_gcv_modified_variant(rng):
    _, b, Q_A, R_A, R_L = projected_system(rng)
    lam = generalized_crossvalidation(
        Q_A, R_A, R_L, b, variant="modified", fullsize=len(b)
    )
    # modified GCV adds the out-of-subspace residual; lam must differ from
    # standard and be positive
    assert lam > 0


def test_gcv_tsvd_index(rng):
    m = 25
    A = rng.standard_normal((m, m)) @ np.diag(np.logspace(0, -6, m))
    x = np.linspace(0, 1, m)
    b = (A @ x + 0.01 * rng.standard_normal(m)).reshape(-1, 1)
    U, S, VT = np.linalg.svd(A)
    k = generalized_crossvalidation(U, S, VT, b, gcvtype="tsvd")
    # oracle: direct evaluation of GCV(k) = ||residual_k||^2/(m-k)^2
    bhat = (U.T @ b).ravel()
    vals = {}
    for kk in range(m):
        num = np.sum(bhat[kk:] ** 2)
        vals[kk] = num / (m - kk) ** 2
    k_star_candidates = [kk for kk in vals if np.isclose(vals[kk], min(vals.values()))]
    assert k in k_star_candidates
    assert 0 < k < m


def test_dp_tikhonov_residual_matches_delta(rng):
    """The lam returned by DP must make ||A x_lam - b|| ~= eta*delta."""
    m = 40
    A = rng.standard_normal((m, m)) @ np.diag(np.logspace(0, -3, m))
    x = np.sin(np.linspace(0, 3, m))
    b_true = A @ x
    e = rng.standard_normal(m)
    e = 0.02 * np.linalg.norm(b_true) / np.linalg.norm(e) * e
    b = (b_true + e).reshape(-1, 1)
    delta = np.linalg.norm(e)
    lam = discrepancy_principle(np.eye(m), A, np.eye(m), b, delta=delta, eta=1.01)
    assert lam > 0
    x_lam = sla.solve(A.T @ A + lam * np.eye(m), A.T @ b)
    resid = np.linalg.norm(A @ x_lam - b)
    assert resid == pytest.approx(1.01 * delta, rel=1e-5)


def test_dp_saturated_returns_zero(rng):
    """Tall A with irreducible residual above eta*delta: testzero >= 0 and
    DP returns alpha = 0 (reference discrepancy_principle.py:66-75,100)."""
    m, n = 12, 6
    A = rng.standard_normal((m, n))
    b = np.ones((m, 1))
    lam = discrepancy_principle(np.eye(m), A, np.eye(n), b, delta=1e-6, eta=1.01)
    assert lam == 0


def test_dp_general_L(rng):
    """General-form L (first-derivative, rank-deficient square case avoided):
    DP still hits the target residual after standard-form transformation."""
    m = 30
    A = rng.standard_normal((m, m)) @ np.diag(np.logspace(0, -3, m))
    L = (np.eye(m) - np.diag(np.ones(m - 1), 1))[:-1, :]  # (m-1, m), rank m-1
    x = np.sin(np.linspace(0, 3, m))
    b_true = A @ x
    e = rng.standard_normal(m)
    e = 0.02 * np.linalg.norm(b_true) / np.linalg.norm(e) * e
    b = (b_true + e).reshape(-1, 1)
    delta = np.linalg.norm(e)
    lam = discrepancy_principle(np.eye(m), A, L, b, delta=delta, eta=1.01)
    assert lam > 0
    x_lam = sla.solve(A.T @ A + lam * L.T @ L, A.T @ b)
    resid = np.linalg.norm(A @ x_lam - b)
    assert resid == pytest.approx(1.01 * delta, rel=1e-4)


def test_dp_explicit_proj(rng):
    """explicitProj adds the out-of-subspace residual ||b - Q Q^T b||^2 to
    the DP function (reference discrepancy_principle.py:68-84): the returned
    lam satisfies ||filtered residual||^2 + outnorm^2 = (eta*delta)^2, so it
    is strictly smaller than the subspace-only root (the out-of-subspace
    term shrinks the attainable filtered-residual target)."""
    m, k = 40, 20
    A_full = rng.standard_normal((m, m)) @ np.diag(np.logspace(0, -4, m))
    x = np.linspace(0, 1, m)
    b_true = A_full @ x
    e = rng.standard_normal(m)
    e = 0.05 * np.linalg.norm(b_true) / np.linalg.norm(e) * e
    b = (b_true + e).reshape(-1, 1)
    delta = np.linalg.norm(e)
    # Golub-Kahan subspace so Q captures b to within (but not below) the
    # noise: the out-of-subspace residual keeps the explicitProj DP
    # attainable while still shifting the root
    from oracles import golub_kahan_np

    _, _, V = golub_kahan_np(A_full, b.reshape(-1), k)
    Q, R_A = np.linalg.qr(A_full @ V)

    lam_std = discrepancy_principle(Q, R_A, np.eye(k), b, delta=delta,
                                    eta=1.01)
    lam_exp = discrepancy_principle(Q, R_A, np.eye(k), b, delta=delta,
                                    eta=1.01, explicitProj=True)
    assert 0 < lam_exp < lam_std  # extra residual term -> smaller target
    # root property of the explicitProj variant
    bproj = Q.T @ b
    out2 = np.linalg.norm(b - Q @ bproj) ** 2
    y = sla.solve(R_A.T @ R_A + lam_exp * np.eye(k), R_A.T @ bproj)
    resid2 = np.linalg.norm(R_A @ y - bproj) ** 2 + out2
    assert resid2 == pytest.approx((1.01 * delta) ** 2, rel=1e-4)


def test_poisson_delta_dp(rng):
    """Poisson-noise DP (beyond reference: the reference's Poisson add_noise
    returns delta=0, Tomography.py:214-217). poisson_delta estimates ||e||
    from counts; DP with it lands within a factor ~2 of the ideal-delta lam
    and yields a comparable reconstruction."""
    from trips_tpu.regparam import poisson_delta

    m = 40
    A = rng.standard_normal((m, m)) @ np.diag(np.logspace(0, -3, m))
    x = np.abs(np.sin(np.linspace(0, 3, m))) + 0.5
    b_true = 2000.0 * np.abs(A @ x)  # counting regime
    b = rng.poisson(lam=b_true + 1).astype(float).reshape(-1, 1)
    e = b.reshape(-1) - (b_true + 1)
    delta_true = np.linalg.norm(e)
    delta_est = poisson_delta(b)
    assert delta_est == pytest.approx(delta_true, rel=0.3)
    lam_est = discrepancy_principle(np.eye(m), A, np.eye(m), b,
                                    delta=delta_est, eta=1.01)
    lam_true = discrepancy_principle(np.eye(m), A, np.eye(m), b,
                                     delta=delta_true, eta=1.01)
    assert lam_est > 0 and lam_true > 0
    assert 0.3 < lam_est / lam_true < 3.0


def test_lcurve_returns_reasonable_lambda(rng):
    _, b, Q_A, R_A, R_L = projected_system(rng)
    lam = l_curve(R_A, R_L, Q_A.T @ b)
    assert 1e-9 <= lam <= 2.0


def test_csd_reconstruction(rng):
    p = 8
    M = np.linalg.qr(rng.standard_normal((2 * p, p)))[0]
    Q1, Q2 = M[:p], M[p:]
    U, V, Z, C, S = csd(Q1, Q2)
    np.testing.assert_allclose(U @ C @ Z.T, Q1, atol=1e-10)
    np.testing.assert_allclose(V @ S @ Z.T, Q2, atol=1e-10)
    np.testing.assert_allclose(C.T @ C + S.T @ S, np.eye(p), atol=1e-10)
    d = np.diag(C)
    assert np.all(np.diff(d) >= -1e-12)  # ascending cosines


def test_gsvd_reconstruction(rng):
    m, n, p = 20, 12, 10
    A = rng.standard_normal((m, p))
    B = rng.standard_normal((n, p))
    U, V, X, C, S = gsvd(A, B)
    np.testing.assert_allclose(U @ C @ X.T, A, atol=1e-9)
    np.testing.assert_allclose(V @ S @ X.T, B, atol=1e-9)


def test_gsvd_jit_matches_host(rng):
    """Jittable GSVD: same factorization quality and the same generalized
    spectrum as the host construction (TGSVD consumes C's diagonal)."""
    import jax
    import jax.numpy as jnp

    from trips_tpu.utils.gsvd import gsvd, gsvd_jit

    for (m, n, p) in ((20, 15, 12), (16, 16, 16), (30, 12, 8)):
        A = rng.standard_normal((m, p))
        B = rng.standard_normal((n, p))
        U, V, X, C, S = jax.jit(gsvd_jit)(jnp.asarray(A), jnp.asarray(B))
        np.testing.assert_allclose(np.asarray(U @ C @ X.T), A, atol=1e-10)
        np.testing.assert_allclose(np.asarray(V @ S @ X.T), B, atol=1e-10)
        np.testing.assert_allclose(
            np.asarray(C.T @ C + S.T @ S), np.eye(p), atol=1e-10)
        Uh, Vh, Xh, Ch, Sh = gsvd(A, B)
        np.testing.assert_allclose(np.diag(np.asarray(C))[: min(m, p)],
                                   np.diag(Ch)[: min(m, p)], atol=1e-8)
