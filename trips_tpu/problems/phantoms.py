"""Phantom gallery (host-side, NumPy).

Functional parity with ``trips/utilities/phantoms.py`` (itself adapted from
the public AIRToolsII phantomgallery): shepp_logan, tectonic, smooth,
threephases, grains, ppower. Implementations are re-derived from the
standard definitions; grid conventions match the reference so generated
images agree elementwise (up to RNG draws for the random phantoms — the
reference seeds nothing, we accept an optional seed).
"""
from __future__ import annotations

import numpy as np

# standard modified Shepp-Logan ellipse table:
# (amplitude, a, b, x0, y0, phi_degrees)
_SL_ELLIPSES = np.array(
    [
        [1.0, 0.69, 0.92, 0.0, 0.0, 0.0],
        [-0.8, 0.6624, 0.8740, 0.0, -0.0184, 0.0],
        [-0.2, 0.1100, 0.3100, 0.22, 0.0, -18.0],
        [-0.2, 0.1600, 0.4100, -0.22, 0.0, 18.0],
        [0.1, 0.2100, 0.2500, 0.0, 0.35, 0.0],
        [0.1, 0.0460, 0.0460, 0.0, 0.1, 0.0],
        [0.1, 0.0460, 0.0460, 0.0, -0.1, 0.0],
        [0.1, 0.0460, 0.0230, -0.08, -0.605, 0.0],
        [0.1, 0.0230, 0.0230, 0.0, -0.606, 0.0],
        [0.1, 0.0230, 0.0460, 0.06, -0.605, 0.0],
    ]
)


def shepp_logan(N):
    xn = (np.arange(N) - (N - 1) / 2) / ((N - 1) / 2)
    Xn = np.tile(xn, (N, 1))
    Yn = np.rot90(Xn)
    img = np.zeros((N, N))
    for amp, a, b, x0, y0, phi_deg in _SL_ELLIPSES:
        phi = np.deg2rad(phi_deg)
        x = Xn - x0
        y = Yn - y0
        d = ((x * np.cos(phi) + y * np.sin(phi)) ** 2) / a**2 + (
            (y * np.cos(phi) - x * np.sin(phi)) ** 2
        ) / b**2
        img[d <= 1] += amp
    img[img < 0] = 0
    return img


def tectonic(N):
    x = np.zeros((N, N))
    N5, N13, N7, N20 = round(N / 5), round(N / 13), round(N / 7), round(N / 20)
    # right plate
    x[N5 - 1 : N5 + N7, 5 * N13 - 1 : N] = 0.75
    # its angled leading edge
    i = N5 - 1
    for j in range(N20 + 1):
        if (j + 1) % 2 != 0:
            i -= 1
            x[i, 5 * N13 + j :] = 0.75
    # left plate before the break
    xr = np.arange(N5 - 1, N5 + N5)
    x[np.ix_(xr, np.arange(0, 5 * N13))] = 1.0
    # the descending break
    for j in range(5 * N13 - 1, min(12 * N13, N)):
        if (j + 1) % 2 != 0:
            xr = xr + 1
        x[xr, j] = 1.0
    return x


def smooth(N, p=4):
    g = np.arange(N)
    I, J = np.meshgrid(g, g, indexing="xy")
    sigma = 0.25 * N
    centers = np.array([[0.6 * N, 0.6 * N], [0.5 * N, 0.3 * N], [0.2 * N, 0.7 * N], [0.8 * N, 0.2 * N]])
    amps = np.array([1.0, 0.5, 0.7, 0.9])
    x = np.zeros((N, N))
    for i in range(p):
        x += amps[i] * np.exp(
            -((I - centers[i, 0]) ** 2) / (1.2 * sigma) ** 2
            - ((J - centers[i, 1]) ** 2) / sigma**2
        )
    return x / x.max()


def threephases(N, p=70, seed=None):
    rng = np.random.default_rng(seed)
    g = np.arange(N)
    I, J = np.meshgrid(g, g, indexing="xy")
    s1 = 0.025 * N
    c1 = rng.random((p, 2)) * N
    x1 = np.zeros((N, N))
    for i in range(p):
        x1 += np.exp(
            -np.abs(I - c1[i, 0]) ** 3 / (2.5 * s1) ** 3 - np.abs(J - c1[i, 1]) ** 3 / s1**3
        )
    x1 = np.where(x1 < 0.35, 0.0, 2.0)

    s2 = 0.03 * N
    c2 = rng.random((p, 2)) * N
    x2 = np.zeros((N, N))
    for i in range(p):
        x2 += np.exp(-((I - c2[i, 0]) ** 2) / (2 * s2) ** 2 - (J - c2[i, 1]) ** 2 / s2**2)
    x2 = np.where(x2 < 0.55, 0.0, 1.0)

    x = x1 + x2
    x[x == 3] = 1
    return x / x.max()


def grains(N, numGrains=None, seed=None):
    if numGrains is None:
        numGrains = int(round(4 * np.sqrt(N)))
    rng = np.random.default_rng(seed)
    dN = round(N / 10)
    Nbig = N + 2 * dN
    xG = np.ceil(Nbig * rng.random(numGrains))
    yG = np.ceil(Nbig * rng.random(numGrains))
    xx = np.arange(1, Nbig + 1)
    X, Y = np.meshgrid(xx, xx, indexing="xy")
    Xf = X.flatten(order="F")
    Yf = Y.flatten(order="F")
    dist = (Xf[:, None] - xG[None, :]) ** 2 + (Yf[:, None] - yG[None, :]) ** 2
    mins = np.argmin(dist, axis=1)
    x = mins.reshape(Nbig, Nbig) - 1
    x = x[dN : dN + N, dN : dN + N]
    return x / x.max()


def ppower(N, relnz=0.65, p=2.6, seed=None):
    rng = np.random.default_rng(seed)
    Nodd = N % 2 == 1
    if Nodd:
        N += 1
    P = rng.standard_normal((N, N))
    xx = np.arange(1, N + 1)
    I, J = np.meshgrid(xx, xx, indexing="xy")
    U = (((2 * I - 1) / N - 1) ** 2 + ((2 * J - 1) / N - 1) ** 2) ** (-p / 2)
    F = U * np.exp(2 * np.pi * 1j * P)
    F = np.abs(np.fft.ifft2(F))
    f = -np.sort(-F.flatten(order="F"))
    k = round(relnz * N**2) - 1
    F[F < f[k]] = 0
    x = F / f[0]
    if Nodd:
        x = F[1:-1, 1:-1]
    return x
