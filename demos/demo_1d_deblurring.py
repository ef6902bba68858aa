"""1D deblurring demo — mirrors demos/demo_1D_deblurring.ipynb of the
reference: Gaussian-PSF blur, 2% noise, TSVD/TGSVD/Tikhonov (DP), Hybrid
GMRES/LSQR (DP), GKS.

Run: python demos/demo_1d_deblurring.py [--n 200] [--plot]
"""
import argparse

import _bootstrap  # noqa: F401
import numpy as np

from trips_tpu.operators import FirstDerivative1D, first_derivative_matrix
from trips_tpu.problems import Deblurring1D
from trips_tpu.solvers import (
    GKS,
    Hybrid_GMRES,
    Hybrid_LSQR,
    Tikhonov,
    tGSVD_sol,
    tSVD_sol,
)


def relerr(x, xt):
    x = np.asarray(x).reshape(-1)
    return np.linalg.norm(x - xt) / np.linalg.norm(xt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--parameter", type=float, default=10.0)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--plot", action="store_true")
    args = ap.parse_args()

    np.random.seed(0)
    n = args.n
    prob = Deblurring1D()
    A = prob.forward_Op_1D(parameter=args.parameter, nx=n)
    x_true = prob.gen_xtrue(n, "curve0")
    b_true = prob.gen_data(x_true, parameter=args.parameter)
    b, delta = prob.add_noise(b_true, "Gaussian", 0.02)
    delta = float(delta)
    A_dense = np.asarray(A.mat)
    # anti-inverse-crime data carries model error beyond the additive noise;
    # DP needs the total discrepancy or it is unattainable (lam -> 0)
    delta_total = float(np.linalg.norm(
        np.asarray(b).reshape(-1) - A_dense @ np.asarray(x_true).reshape(-1)))

    results = {}
    x, k = tSVD_sol(A_dense, b, regparam="dp", delta=delta)
    results[f"TSVD (dp, k={k})"] = relerr(x, x_true)

    L_sq = np.vstack([first_derivative_matrix(n).toarray(), np.zeros((1, n))])
    x, k = tGSVD_sol(A_dense, L_sq, b, regparam="dp", delta=delta)
    results[f"TGSVD (dp, k={k})"] = relerr(x, x_true)

    x, lam = Tikhonov(A_dense, b, np.eye(n), regparam="dp", delta=delta)
    results[f"Tikhonov (dp, lam={lam:.2e})"] = relerr(x, x_true)

    x, info = Hybrid_GMRES(A, b, n_iter=args.iters, regparam="dp",
                           delta=delta_total, reorth=True)
    results["Hybrid GMRES (dp)"] = relerr(x, x_true)

    x, info = Hybrid_LSQR(A, b, n_iter=args.iters, regparam="dp",
                          delta=delta_total, reorth=True)
    results["Hybrid LSQR (dp)"] = relerr(x, x_true)

    L = FirstDerivative1D(n)
    x, info = GKS(A, b.reshape(-1), L, projection_dim=3, n_iter=args.iters,
                  regparam="dp", delta=delta)
    results["GKS (dp)"] = relerr(x, x_true)

    for name, err in results.items():
        print(f"{name:35s} relative error = {err:.4f}")

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.plot(x_true, label="x_true")
        plt.plot(np.asarray(x).reshape(-1), label="GKS")
        plt.legend()
        plt.savefig("demo_1d_deblurring.png", bbox_inches="tight")
        print("saved demo_1d_deblurring.png")


if __name__ == "__main__":
    main()
