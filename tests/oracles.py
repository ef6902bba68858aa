"""NumPy oracles mirroring the reference implementations (TRIPs-Py).

These re-derive the reference's algorithms (cited per function) in plain
NumPy so the JAX implementations can be checked without the reference's
dependency stack (pylops/astra are not installed here).
"""
import numpy as np


def golub_kahan_np(A, b, n_iter):
    """Mirrors trips/utilities/decompositions.py:118-205 (no reorth)."""
    m, n = A.shape
    b = np.asarray(b).reshape(-1)
    U = np.zeros((m, n_iter + 1))
    V = np.zeros((n, n_iter))
    alphas = np.zeros(n_iter)
    betas = np.zeros(n_iter)
    U[:, 0] = b / np.linalg.norm(b)
    for k in range(n_iter):
        v = A.T @ U[:, k] - (betas[k - 1] * V[:, k - 1] if k > 0 else 0)
        alphas[k] = np.linalg.norm(v)
        v = v / alphas[k]
        u = A @ v - alphas[k] * U[:, k]
        betas[k] = np.linalg.norm(u)
        U[:, k + 1] = u / betas[k]
        V[:, k] = v
    S = np.zeros((n_iter + 1, n_iter))
    S[np.arange(n_iter), np.arange(n_iter)] = alphas
    S[np.arange(1, n_iter + 1), np.arange(n_iter)] = betas
    return U, S, V


def arnoldi_update_np(A, V, H):
    """Mirrors trips/utilities/decompositions.py:207-228 (MGS, all columns)."""
    k = H.shape[0] if H.ndim == 2 else 1
    vtemp = A @ V[:, -1]
    htemp = np.zeros((V.shape[1], 1))
    for j in range(V.shape[1]):
        htemp[j] = V[:, j] @ vtemp
        vtemp = vtemp - htemp[j] * V[:, j]
    nrm = np.linalg.norm(vtemp)
    if H.size <= 1:
        H = htemp
    else:
        H = np.hstack((H, htemp))
    bottom = np.zeros((1, H.shape[1]))
    bottom[0, -1] = nrm
    H = np.vstack((H, bottom))
    V = np.hstack((V, (vtemp / nrm).reshape(-1, 1)))
    return V, H


def arnoldi_np(A, b, n_iter):
    """k applications of arnoldi_update (the correct MGS batch form)."""
    b = np.asarray(b).reshape(-1)
    V = (b / np.linalg.norm(b)).reshape(-1, 1)
    H = np.empty(1)
    for _ in range(n_iter):
        V, H = arnoldi_update_np(A, V, H)
    return V, H


def cgls_np(A, b, x0, max_iter, tol):
    """Mirrors trips/solvers/CGLS.py:16-86."""
    b = np.asarray(b).reshape(-1)
    x = np.asarray(x0).reshape(-1).copy()
    r = b - A @ x
    t = A.T @ r
    p = t.copy()
    norms_t0 = np.linalg.norm(t)
    gamma = norms_t0**2
    xmax = np.linalg.norm(x)
    k, check = 0, 0
    xs = []
    while k < max_iter and check == 0:
        k += 1
        w = A @ p
        delta = np.linalg.norm(w) ** 2
        if delta == 0:
            delta = np.finfo(float).eps
        beta = gamma / delta
        x = x + beta * p
        xs.append(x.copy())
        r = r - beta * w
        t = A.T @ r
        gamma_old = gamma
        norm_t = np.linalg.norm(t)
        gamma = norm_t**2
        p = t + (gamma / gamma_old) * p
        norm_x = np.linalg.norm(x)
        xmax = max(xmax, norm_x)
        check = (norm_t <= norms_t0 * tol) or (norm_x * tol >= 1)
    return x, k, xs
