"""Tomography demo — mirrors demo_Tomo_small_scale / _large_scale of the
reference: native fan-beam projector (ASTRA replacement), tectonic/grains
phantoms, TSVD, GKS, Hybrid LSQR, MMGKS.

Run: python demos/demo_tomography.py [--n 32 --views 30] [--large]
"""
import argparse

import _bootstrap  # noqa: F401
import numpy as np

from trips_tpu.operators import FirstDerivative2D
from trips_tpu.problems import Tomography
from trips_tpu.solvers import GKS, MMGKS, Hybrid_LSQR, tSVD_sol


def relerr(x, xt):
    x = np.asarray(x).reshape(-1)
    xt = np.asarray(xt).reshape(-1)
    return np.linalg.norm(x - xt) / np.linalg.norm(xt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--views", type=int, default=30)
    ap.add_argument("--large", action="store_true",
                    help="256x256, 60 views, grains, 0.1% noise (demo config)")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    np.random.seed(0)
    if args.large:
        n, views, phantom_name, noise = 256, 60, "grains", 0.001
    else:
        n, views, phantom_name, noise = args.n, args.views, "tectonic", 0.01

    tomo = Tomography(CommitCrime=False)
    x_true, nx, ny = tomo.gen_true(phantom_name, nx=n, ny=n, phantom_seed=0)
    OP, b, p, q, A = tomo.gen_data(x_true, nx, ny, views)
    b_noisy, delta = tomo.add_noise(b, "Gaussian", noise)
    delta = float(delta)
    bv = b_noisy.reshape(-1)

    results = {}
    if n <= 64:
        x, k = tSVD_sol(A.toarray(), bv, regparam="dp", delta=delta)
        results[f"TSVD (dp, k={k})"] = relerr(x, x_true)

    L = FirstDerivative2D(nx, ny)
    x, info = GKS(OP, bv, L, projection_dim=3, n_iter=args.iters,
                  regparam="dp", delta=delta, x_true=x_true)
    results["GKS (dp)"] = relerr(x, x_true)

    x, _ = Hybrid_LSQR(OP, bv, n_iter=args.iters, regparam="dp", delta=delta,
                       reorth=True)
    results["Hybrid LSQR (dp)"] = relerr(x, x_true)

    x, _ = MMGKS(OP, bv, L, pnorm=2, qnorm=1, projection_dim=3,
                 n_iter=args.iters, regparam="dp", delta=delta)
    results["MMGKS p2 q1 (dp)"] = relerr(x, x_true)

    for name, err in results.items():
        print(f"{name:30s} relative error = {err:.4f}")


if __name__ == "__main__":
    main()
