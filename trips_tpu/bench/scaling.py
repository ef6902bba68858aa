"""nnz/s scaling-efficiency harness (1 chip -> N chips / hosts).

BASELINE target: >=80% nnz/s scaling efficiency at 2+ hosts. This harness
runs the fused CGLS loop over the sharded operators on 1, 2, ..., N
devices of whatever backend is available and reports the efficiency curve
for BOTH distributed formats:

- ``banded``: the angle-sharded banded projector
  (``parallel/sharded_banded.py``) — the format the TPU perf path actually
  recommends (single-chip champion, VERDICT r2 item 4);
- ``bsr``: the row-sharded BSR block stream (``parallel/sharded_bsr.py``).

On the CI/dev CPU backend (simulated devices) the numbers are functional
smoke only — XLA collectives over host-platform devices share one set of
cores, so "efficiency" there validates plumbing, not ICI scaling; the
emitted artifact is labeled accordingly. On a real pod slice every host
runs this same entry point after ``parallel.init_multihost``.

Run ``python -m trips_tpu.bench.scaling [out.json]`` to write the artifact.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


# -- analytic ICI communication-cost model (VERDICT r3 item 3) ------------
#
# The merged sharded applies issue exactly ONE psum of one (n_pad^2, f32)
# image per normal/adjoint apply (pinned by
# tests/test_parallel.py::test_sharded_banded_single_psum_per_apply), and
# the angle-sharded weight stream is embarrassingly parallel. Per-iteration
# time on D chips is therefore modeled as
#
#   t(D) = t1 / D                      (compute+stream, perfectly sharded)
#        + 2 * B_psum * (D-1)/D / BW_ici   (ring all-reduce payload)
#        + L_coll                      (collective launch/latency floor)
#
# with B_psum = n_pad^2 * 4 bytes, BW_ici the per-chip ICI bandwidth and
# L_coll a per-collective latency floor. v5e: 1600 Gbps ICI per chip (2-D
# torus; ICI spans hosts within a pod slice, so >=2-host collectives ride
# ICI, not DCN). t1 comes from the measured single-chip champion
# (BENCH_r03: 9.47 Gnnz/s fused A^T A -> t1 = 2*nnz/9.47e9 for the
# tomo256x60 config).

V5E_ICI_BYTES_PER_S = 200e9  # 1600 Gbps per chip
V5E_COLLECTIVE_LATENCY_S = 5e-6


def predict_ici_efficiency(t1_s, psum_bytes, device_counts,
                           ici_bw=V5E_ICI_BYTES_PER_S,
                           latency_s=V5E_COLLECTIVE_LATENCY_S):
    """Predicted nnz/s scaling efficiency of the single-psum banded apply.

    Returns [{devices, t_compute_s, t_comm_s, predicted_efficiency}].
    """
    out = []
    for d in device_counts:
        t_comp = t1_s / d
        t_comm = (2.0 * psum_bytes * (d - 1) / d / ici_bw
                  + (latency_s if d > 1 else 0.0))
        out.append({
            "devices": int(d),
            "t_compute_s": t_comp,
            "t_comm_s": t_comm,
            "predicted_efficiency": t1_s / d / (t_comp + t_comm),
        })
    return out


def predicted_section(nnz=5_077_264, n_pad=256,
                      champion_gnnzps=9.47,
                      device_counts=(1, 2, 4, 8, 16, 32, 64),
                      label="tomo256x60_bf16_g32_fused_ata"):
    """Predicted-efficiency artifact block for a measured champion config."""
    t1 = 2.0 * nnz / (champion_gnnzps * 1e9)
    psum_bytes = n_pad * n_pad * 4
    return {
        "label": label,
        "t1_per_iter_s": t1,
        "psum_bytes_per_apply": psum_bytes,
        "ici_bytes_per_s": V5E_ICI_BYTES_PER_S,
        "collective_latency_s": V5E_COLLECTIVE_LATENCY_S,
        "psums_per_normal_apply": 1,
        "curve": predict_ici_efficiency(t1, psum_bytes, device_counts),
    }


def _measure(op, b, iters):
    import jax
    import jax.numpy as jnp

    from ..krylov import cgls

    bp = jnp.pad(jnp.asarray(b), (0, op.shape[0] - b.shape[0]))
    x0 = jnp.zeros(op.shape[1], jnp.float32)
    x, k = cgls(op, bp, x0, 2, 0.0)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    x, k = cgls(op, bp, x0, iters, 0.0)
    jax.block_until_ready(x)
    return int(k) * 2 / (time.perf_counter() - t0)  # applies of A per sec


def run(nx=256, views=60, iters=50, device_counts=None, formats=("banded",
                                                                 "bsr",
                                                                 "dynamic")):
    import jax
    import jax.numpy as jnp

    from ..parallel import (ShardedBandedProjector, ShardedBsrOperator,
                            make_mesh)
    from ..problems.projector import fan_beam_matrix
    from ..sparse import BandedProjector

    devices = jax.devices()
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= len(devices)]
    on_tpu = devices[0].platform == "tpu"

    A = fan_beam_matrix(nx, views=views).astype(np.float32)
    b = (A @ np.random.default_rng(0).random(A.shape[1])).astype(np.float32)

    out = {}
    for fmt in formats:
        results = []
        bop = dop = None
        if fmt == "dynamic":
            from ..parallel.sharded_dynamic_banded import (
                ShardedDynamicBandedOperator)
            from ..problems.dynamic import generate_synthetic_dynamic
            from .. import sparse as _sp

            nt = max(2, device_counts[-1] // 2)
            _, bd, AAd, _, nxd, _, _, _, _, al = generate_synthetic_dynamic(
                nx=min(nx, 64), nt=nt, views=max(views // 4, 8),
                noise_level=0.01, return_angles=True)
            dop = _sp.DynamicBandedOperator.from_frames(
                AAd, nxd, al, n_groups=16,
                dtype=jnp.bfloat16 if on_tpu else None)
            b_dyn = bd.astype(np.float32)
        if fmt == "banded":
            bop = BandedProjector.from_scipy_fan(
                A, nx, views, n_groups=16,
                dtype=jnp.bfloat16 if on_tpu else None)
        for nd in device_counts:
            if fmt == "dynamic":
                t_sh = 2 if (nd % 2 == 0 and dop.nt % 2 == 0) else 1
                if dop.nt % max(t_sh, 1):
                    continue
                mesh = make_mesh({"time": t_sh, "angles": nd // t_sh},
                                 devices=devices[:nd])
                sop = ShardedDynamicBandedOperator.from_dynamic(dop, mesh)
                rate = _measure(sop, b_dyn, iters) * dop.nnz
                results.append((nd, rate))
                continue
            if fmt == "banded":
                mesh = make_mesh({"angles": nd}, devices=devices[:nd])
                sop = ShardedBandedProjector.from_banded(
                    bop, mesh, axis="angles")
            else:
                mesh = make_mesh({"rows": nd}, devices=devices[:nd])
                sop = ShardedBsrOperator.from_scipy(
                    A, mesh, block_shape=(32, 128),
                    block_dtype=jnp.bfloat16 if on_tpu else None)
            rate = _measure(sop, b, iters) * A.nnz
            results.append((nd, rate))
        base = results[0][1]
        out[fmt] = [
            {"devices": nd, "nnz_per_s": rate,
             "efficiency": rate / (base * nd)}
            for nd, rate in results
        ]
    return out


def main(out_path="SCALING.json", nx=64, views=24, iters=20):
    import jax

    platform = jax.devices()[0].platform
    results = run(nx=nx, views=views, iters=iters)
    artifact = {
        "config": {"nx": nx, "views": views, "iters": iters},
        "platform": f"{platform} x{len(jax.devices())}",
        # simulated host-platform devices share physical cores: this
        # artifact validates that the sharded formats + collectives
        # compile and execute at every device count, NOT ICI scaling
        "label": ("functional_smoke_simulated_devices"
                  if platform != "tpu" else "measured"),
        "formats": results,
        # analytic ICI model for the real-hardware claim (the smoke above
        # validates plumbing only): champion tomo256x60 and the
        # STEMPO-real-scale dynamic config (640^2 image psum, 6.5 Gnnz/s
        # measured single-chip frame rate)
        "predicted": [
            predicted_section(),
            predicted_section(nnz=5_077_264, n_pad=640,
                              champion_gnnzps=6.5,
                              label="stempo560_dynamic_per_frame_slab"),
        ],
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact))
    return artifact


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["SCALING.json"]))
