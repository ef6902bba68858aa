"""User-image deblurring pipeline — mirrors demo_2D_Deblurring_your_data of
the reference: convert an image to the framework's .mat format, blur, add
noise, reconstruct with GKS(gcv).

Without an input image it falls back to the synthetic 'H' image so the
pipeline runs offline.

Run: python demos/demo_your_data.py [--image path.jpg] [--n 64]
"""
import argparse

import _bootstrap  # noqa: F401
import numpy as np

from trips_tpu.operators import FirstDerivative2D
from trips_tpu.problems import Deblurring2D
from trips_tpu.solvers import GKS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", default=None)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--iters", type=int, default=25)
    args = ap.parse_args()

    np.random.seed(0)
    n = args.n
    prob = Deblurring2D()
    A = prob.forward_Op([5, 5], (1.5, 1.5), n, n)

    if args.image:
        from trips_tpu.utils.helpers import convert_image_for_trips

        X, path = convert_image_for_trips(args.image, dataset="mydata", size=(n, n))
        prob.nx = prob.ny = n
        x_true = X
        print(f"converted {args.image} -> {path}")
    else:
        x_true = prob.gen_true("h_im", nx=n, ny=n)
        print("no --image given; using the synthetic 'H' image")

    b_true = prob.gen_data(np.asarray(x_true).reshape(-1, 1))
    b, delta = prob.add_noise(b_true, "Gaussian", 0.01)
    L = FirstDerivative2D(n, n)
    x, info = GKS(A, b.reshape(-1), L, projection_dim=3, n_iter=args.iters,
                  regparam="gcv")
    err = np.linalg.norm(np.asarray(x).reshape(-1) - np.asarray(x_true).reshape(-1)) / \
        np.linalg.norm(np.asarray(x_true))
    print(f"GKS (gcv) relative error = {err:.4f}")


if __name__ == "__main__":
    main()
