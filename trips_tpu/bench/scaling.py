"""nnz/s scaling-efficiency harness (1 chip -> N chips / hosts).

BASELINE target: >=80% nnz/s scaling efficiency at 2+ hosts. This harness
runs the fused CGLS loop over the row-sharded operator on 1, 2, ..., N
devices of whatever backend is available and reports the efficiency curve.
On the CI/dev CPU backend (simulated devices) the numbers are functional
smoke only; on a real pod slice every host runs this same entry point after
``parallel.init_multihost``.
"""
from __future__ import annotations

import time

import numpy as np


def run(nx=256, views=60, iters=50, device_counts=None):
    import jax
    import jax.numpy as jnp

    from ..krylov import cgls
    from ..parallel import ShardedBsrOperator, make_mesh
    from ..problems.projector import fan_beam_matrix

    devices = jax.devices()
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= len(devices)]

    A = fan_beam_matrix(nx, views=views).astype(np.float32)
    b = jnp.asarray((A @ np.random.default_rng(0).random(A.shape[1])).astype(np.float32))

    results = []
    for nd in device_counts:
        mesh = make_mesh({"rows": nd}, devices=devices[:nd])
        # the TPU-recommended format: sharded BSR block stream
        # (bf16 blocks on TPU halve the HBM stream; f32 on CPU sim)
        sop = ShardedBsrOperator.from_scipy(
            A, mesh, block_shape=(32, 128),
            block_dtype=jnp.bfloat16 if devices[0].platform == "tpu"
            else None)
        bp = jnp.pad(b, (0, sop.shape[0] - b.shape[0]))
        x0 = jnp.zeros(sop.shape[1], jnp.float32)
        x, k = cgls(sop, bp, x0, 2, 0.0)
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        x, k = cgls(sop, bp, x0, iters, 0.0)
        jax.block_until_ready(x)
        dt = time.perf_counter() - t0
        rate = int(k) * 2 * A.nnz / dt
        results.append((nd, rate))
    base = results[0][1]
    return [
        {"devices": nd, "nnz_per_s": rate, "efficiency": rate / (base * nd)}
        for nd, rate in results
    ]


if __name__ == "__main__":
    for row in run(nx=64, views=20, iters=20):
        print(row)
