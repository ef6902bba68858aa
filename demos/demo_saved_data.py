"""Saved-data tomography demo — mirrors demo_Tomo_saved_data.ipynb of the
reference: pre-saved A matrix + sinogram bundles ('head' + CT200 etc.),
GKS(lam=1) and MMGKS(lam=0.001).

Requires the reference's .mat bundles under ./data/image_data (no network
egress here); exits with guidance otherwise.

Run: python demos/demo_saved_data.py [--dataset head]
"""
import argparse

import _bootstrap  # noqa: F401
import numpy as np

from trips_tpu.operators import FirstDerivative2D
from trips_tpu.problems import Tomography
from trips_tpu.solvers import GKS, MMGKS
from trips_tpu.sparse import EllOperator


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="head")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    tomo = Tomography()
    try:
        A, x_true, b = tomo.gen_saved_data(
            args.dataset if args.dataset == "head" else int(args.dataset)
        )
    except FileNotFoundError as e:
        print(f"saved-data bundles unavailable: {e}")
        print("place SL60/SL90/head + CT60/CT90/CT200 .mat files under "
              "./data/image_data to run this demo.")
        return

    n = int(np.sqrt(A.shape[1]))
    op = EllOperator.from_scipy(A)
    L = FirstDerivative2D(n, n)
    bv = np.asarray(b).reshape(-1)
    x1, _ = GKS(op, bv, L, projection_dim=3, n_iter=args.iters, regparam=1.0)
    x2, _ = MMGKS(op, bv, L, pnorm=2, qnorm=1, projection_dim=3,
                  n_iter=args.iters, regparam=0.001)
    xt = np.asarray(x_true).reshape(-1)
    for name, x in [("GKS (lam=1)", x1), ("MMGKS (lam=1e-3)", x2)]:
        err = np.linalg.norm(np.asarray(x).reshape(-1) - xt) / np.linalg.norm(xt)
        print(f"{name:20s} relative error = {err:.4f}")


if __name__ == "__main__":
    main()
