"""2D deblurring demo — mirrors demo_2D_Deblurring_small_scale /
_large_scale of the reference: Gaussian PSF, 1% noise, Arnoldi-Tikhonov,
Hybrid GMRES/LSQR, GKS, MMGKS with derivative and framelet regularizers.

Run: python demos/demo_2d_deblurring.py [--n 64] [--large]
"""
import argparse

import _bootstrap  # noqa: F401
import numpy as np

from trips_tpu.operators import FirstDerivative2D, FrameletOperator
from trips_tpu.problems import Deblurring2D
from trips_tpu.solvers import GKS, MMGKS, Arnoldi_Tikhonov, Hybrid_GMRES, Hybrid_LSQR


def relerr(x, xt):
    x = np.asarray(x).reshape(-1)
    xt = np.asarray(xt).reshape(-1)
    return np.linalg.norm(x - xt) / np.linalg.norm(xt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50)
    ap.add_argument("--large", action="store_true",
                    help="128x128 with (9,9)/(3,3) PSF (paper Code 2 config)")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    np.random.seed(0)
    n = 128 if args.large else args.n
    dim, spread = ([9, 9], (3, 3)) if args.large else ([3, 3], (1, 1))
    prob = Deblurring2D()
    A = prob.forward_Op(dim, spread, n, n)
    x_true = prob.gen_true("h_im", nx=n, ny=n)
    b_true = prob.gen_data(x_true.reshape(-1, 1))
    b, delta = prob.add_noise(b_true, "Gaussian", 0.01)
    delta = float(delta)
    bv = np.asarray(b).reshape(-1)

    results = {}
    x, lam = Arnoldi_Tikhonov(A, bv, n_iter=8, regparam="dp", delta=delta)
    results["Arnoldi-Tikhonov (dp)"] = relerr(x, x_true)

    x, _ = Hybrid_GMRES(A, bv, n_iter=args.iters, regparam="gcv")
    results["Hybrid GMRES (gcv)"] = relerr(x, x_true)

    x, _ = Hybrid_LSQR(A, bv, n_iter=args.iters, regparam="gcv")
    results["Hybrid LSQR (gcv)"] = relerr(x, x_true)

    L = FirstDerivative2D(n, n)
    x, _ = GKS(A, bv, L, projection_dim=3, n_iter=args.iters, regparam="gcv")
    results["GKS (gcv, derivative L)"] = relerr(x, x_true)

    x, _ = MMGKS(A, bv, L, pnorm=2, qnorm=1, projection_dim=3,
                 n_iter=args.iters, regparam="gcv")
    results["MMGKS p2 q1 (derivative L)"] = relerr(x, x_true)

    W = FrameletOperator(n, n, 2)
    x, _ = MMGKS(A, bv, W, pnorm=2, qnorm=1, projection_dim=3,
                 n_iter=min(args.iters, 15), regparam="gcv")
    results["MMGKS p2 q1 (framelet W)"] = relerr(x, x_true)

    for name, err in results.items():
        print(f"{name:35s} relative error = {err:.4f}")


if __name__ == "__main__":
    main()
