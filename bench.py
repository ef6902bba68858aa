"""Benchmark: nnz/s per chip for SpMV inside the fused CGLS loop.

Config: the reference's large-scale tomography demo
(demo_Tomo_large_scale.ipynb — 256x256 image, 60 fan-beam views; see
SURVEY.md §6). Each CGLS iteration performs one A·p and one A^T·r, so the
metric is iterations * 2 * nnz / wall_seconds.

Baseline: scipy.sparse CSR on the host CPU — the reference's compute
substrate for matrix-based problems. ``vs_baseline`` = ours / scipy.

Prints exactly ONE JSON line to stdout; diagnostics go to stderr.
"""
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def scipy_baseline(A, b, iters=30):
    x = np.zeros(A.shape[1], dtype=A.dtype)
    r = b - A @ x
    p = t = A.T @ r
    gamma = float(t @ t)
    # warm cache
    _ = A @ p
    t0 = time.perf_counter()
    for _ in range(iters):
        w = A @ p
        delta = float(w @ w) or np.finfo(float).eps
        beta = gamma / delta
        x = x + beta * p
        r = r - beta * w
        t = A.T @ r
        gamma_new = float(t @ t)
        p = t + (gamma_new / gamma) * p
        gamma = gamma_new
    dt = time.perf_counter() - t0
    return iters * 2 * A.nnz / dt, dt


def device_cgls_rate(op, b, iters, jax, jnp):
    from trips_tpu.krylov import cgls

    x0 = jnp.zeros(op.shape[1], b.dtype)
    # compile + warmup
    x, k = cgls(op, b, x0, 2, 0.0)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    x, k = cgls(op, b, x0, iters, 0.0)
    jax.block_until_ready(x)
    dt = time.perf_counter() - t0
    return int(k) * 2 * op.nnz / dt, dt, int(k)


def main():
    nx, views, iters = 256, 60, 30
    log(f"building fan-beam matrix {nx}x{nx}, {views} views ...")
    t0 = time.perf_counter()
    from trips_tpu.problems.phantoms import grains
    from trips_tpu.problems.projector import fan_beam_matrix

    A = fan_beam_matrix(nx, views=views).astype(np.float32)
    log(f"  A {A.shape} nnz={A.nnz} built in {time.perf_counter()-t0:.1f}s")
    x_true = grains(nx, seed=0).reshape(-1).astype(np.float32)
    b_host = (A @ x_true).astype(np.float32)

    base_rate, base_dt = scipy_baseline(A.astype(np.float64), b_host.astype(np.float64), iters)
    log(f"scipy CSR baseline: {base_rate/1e9:.3f} Gnnz/s ({base_dt:.2f}s)")

    import jax
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    log(f"jax backend: {platform} {jax.devices()}")
    b = jnp.asarray(b_host)

    from trips_tpu.sparse import BsrOperator, EllOperator

    candidates = {}
    try:
        ell = EllOperator.from_scipy(A)
        rate, dt, k = device_cgls_rate(ell, b, iters, jax, jnp)
        candidates["ell"] = rate
        log(f"ELL gather SpMV: {rate/1e9:.3f} Gnnz/s ({dt:.2f}s, {k} iters)")
    except Exception as e:
        log(f"ELL path failed: {type(e).__name__}: {e}")

    if platform == "tpu":
        for bdt, name in ((np.float32, "bsr_f32"),):
            try:
                bsr = BsrOperator.from_scipy(A, block_dtype=bdt)
                log(f"  BSR stored density {bsr.stored_density:.3f} "
                    f"({bsr.blocks.shape[0]} blocks)")
                rate, dt, k = device_cgls_rate(bsr, b, iters, jax, jnp)
                candidates[name] = rate
                log(f"BSR Pallas SpMV [{name}]: {rate/1e9:.3f} Gnnz/s ({dt:.2f}s)")
            except Exception as e:
                log(f"BSR path [{name}] failed: {type(e).__name__}: {e}")

    if not candidates:
        log("no device path succeeded")
        sys.exit(1)
    best = max(candidates.values())
    print(json.dumps({
        "metric": "spmv_nnz_per_s_cgls_tomo256x60",
        "value": round(best, 1),
        "unit": "nnz/s",
        "vs_baseline": round(best / base_rate, 3),
    }))


if __name__ == "__main__":
    main()
