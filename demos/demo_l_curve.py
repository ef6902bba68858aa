"""L-curve demo — mirrors demo_l_curve.ipynb of the reference: GKS and
MMGKS with regparam='l_curve' vs 'dp', Hybrid LSQR with gcv vs l_curve,
on a small tomography problem.

Run: python demos/demo_l_curve.py [--n 64 --views 30]
"""
import argparse

import _bootstrap  # noqa: F401
import numpy as np

from trips_tpu.operators import FirstDerivative2D
from trips_tpu.problems import Tomography
from trips_tpu.solvers import GKS, MMGKS, Hybrid_LSQR


def relerr(x, xt):
    x = np.asarray(x).reshape(-1)
    xt = np.asarray(xt).reshape(-1)
    return np.linalg.norm(x - xt) / np.linalg.norm(xt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--views", type=int, default=30)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    np.random.seed(0)
    tomo = Tomography(CommitCrime=False)
    x_true, nx, ny = tomo.gen_true("tectonic", nx=args.n, ny=args.n)
    OP, b, p, q, A = tomo.gen_data(x_true, nx, ny, args.views)
    b_noisy, delta = tomo.add_noise(b, "Gaussian", 0.01)
    delta = float(delta)
    bv = b_noisy.reshape(-1)
    L = FirstDerivative2D(nx, ny)

    results = {}
    for rp in ["l_curve", "dp"]:
        x, info = GKS(OP, bv, L, projection_dim=3, n_iter=args.iters,
                      regparam=rp, delta=delta)
        results[f"GKS ({rp})"] = (relerr(x, x_true), info["regParam"])
        x, info = MMGKS(OP, bv, L, pnorm=2, qnorm=1, projection_dim=3,
                        n_iter=args.iters, regparam=rp, delta=delta)
        results[f"MMGKS ({rp})"] = (relerr(x, x_true), info["regParam"])
    for rp in ["gcv", "l_curve"]:
        x, info = Hybrid_LSQR(OP, bv, n_iter=args.iters, regparam=rp,
                              delta=delta)
        results[f"Hybrid LSQR ({rp})"] = (relerr(x, x_true), info["regParam"])

    for name, (err, lam) in results.items():
        print(f"{name:25s} relative error = {err:.4f}  (lam = {lam:.3e})")


if __name__ == "__main__":
    main()
