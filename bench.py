"""Benchmark: nnz/s per chip for SpMV inside the fused CGLS loop.

Config: the reference's large-scale tomography demo
(demo_Tomo_large_scale.ipynb — 256x256 image, 60 fan-beam views; SURVEY.md
§6). Each CGLS iteration performs one A·p and one A^T·r, so the metric is
iterations * 2 * nnz / wall_seconds, measured over a fused device-side CGLS
loop (one program per run).

Tunnel-resilient design (round-1 postmortem: both device paths died in a
single 360 s SIGALRM with nothing recorded):

- Paths are ordered cheapest-first: the zero-transfer on-the-fly projector
  runs before any stored-matrix path, and each path first compiles the
  *small* ``while_loop`` program (one step body) before attempting the
  faster scan-unrolled program (a ~25x larger XLA program whose compile can
  outlast a contended tunnel).
- Every phase gets its own SIGALRM budget carved out of a global deadline;
  a timeout skips that phase only.
- The final JSON line is emitted from a ``finally`` block with the best
  result so far — a late failure can no longer zero the artifact. Exit code
  is 0 whenever at least one device path produced a rate.
- Methodology hardening (VERDICT r1 item 8): median-of-3 on both the scipy
  baseline and every device path, plus a post-run baseline sentinel re-run
  recorded in the JSON so contention-inflated ``vs_baseline`` readings are
  self-diagnosing. Per-path diagnostics (compile/transfer/run seconds, all
  run rates) are persisted under ``paths``.

Baseline: scipy.sparse CSR CGLS on the host CPU — the reference's compute
substrate (``trips/solvers/CGLS.py:57-83`` recurrence).

Prints exactly ONE JSON line to stdout; diagnostics go to stderr.
Env knobs: BENCH_BUDGET_S (global seconds, default 820), BENCH_ITERS
(CGLS iterations, default 100), BENCH_FAST=1 (20 iters, tiny budgets —
smoke mode).
"""
import contextlib
import json
import os
import signal
import sys
import time

import numpy as np

if os.environ.get("BENCH_PLATFORM"):
    # the sitecustomize registers the axon TPU at interpreter start; both the
    # env var and the config update are needed to switch (see tests/conftest)
    os.environ["JAX_PLATFORMS"] = os.environ["BENCH_PLATFORM"]
    import jax

    jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

T_START = time.monotonic()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "820"))
ITERS = int(os.environ.get("BENCH_ITERS", "100"))
FAST = os.environ.get("BENCH_FAST", "") == "1"
if FAST:
    BUDGET_S = min(BUDGET_S, 300.0)
    ITERS = 20
EMIT_RESERVE_S = 15.0  # time kept back for the final emit


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def remaining():
    return BUDGET_S - (time.monotonic() - T_START)


class PhaseTimeout(Exception):
    pass


@contextlib.contextmanager
def phase(name, max_seconds, report):
    """Run a block under a SIGALRM budget; timeout or error skips the block."""
    report["paths"].setdefault(name, {})
    budget = int(min(max_seconds, remaining() - EMIT_RESERVE_S))
    if budget <= 2:
        log(f"[{name}] skipped (no budget left)")
        report["paths"][name]["status"] = "skipped_no_budget"
        yield False
        return

    def handler(signum, frame):
        raise PhaseTimeout(f"{name} exceeded {budget}s")

    old = signal.signal(signal.SIGALRM, handler)
    signal.alarm(budget)
    t0 = time.monotonic()
    try:
        yield True
        report["paths"].setdefault(name, {})["status"] = "ok"
    except Exception as e:  # noqa: BLE001 — a failed path must not kill the bench
        log(f"[{name}] failed: {type(e).__name__}: {e}")
        info = report["paths"].setdefault(name, {})
        info["status"] = f"{type(e).__name__}: {e}"
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
        report["paths"].setdefault(name, {})["seconds"] = round(
            time.monotonic() - t0, 1)


def scipy_cgls_rate(A, b, iters):
    x = np.zeros(A.shape[1], dtype=A.dtype)
    r = b - A @ x
    p = t = A.T @ r
    gamma = float(t @ t)
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
    return iters * 2 * A.nnz / dt


def measure_device(fn, op, b, nnz, iters, info, runs=3):
    """Compile once, then median-of-N timed runs.

    Synchronization is a 4-byte scalar fetch (``float(norm(x))``), not an
    array download: ``block_until_ready`` does not actually block through
    the axon tunnel, and bulk device->host downloads can take minutes under
    tunnel congestion (measured r2) — either would poison the timing.
    """
    import jax.numpy as jnp

    x0 = jnp.zeros(op.shape[1], b.dtype)
    t0 = time.perf_counter()
    x, _ = fn(op, b, x0, iters)
    info["x_norm"] = float(jnp.linalg.norm(x))  # scalar sync
    info["compile_s"] = round(time.perf_counter() - t0, 1)
    log(f"    compile+warmup {info['compile_s']}s")
    rates = []
    info["runs_gnnzps"] = []
    for _ in range(runs):
        t0 = time.perf_counter()
        x, _ = fn(op, b, x0, iters)
        _ = float(jnp.linalg.norm(x))
        rates.append(iters * 2 * nnz / (time.perf_counter() - t0))
        # record incrementally so a mid-loop timeout still counts
        info["runs_gnnzps"].append(round(rates[-1] / 1e9, 3))
        info["gnnzps"] = round(float(np.median(rates)) / 1e9, 3)
        if remaining() < EMIT_RESERVE_S + 5 and rates:
            break
    rate = float(np.median(rates))
    log(f"    {iters} iters -> {info['gnnzps']} Gnnz/s "
        f"(median of {len(rates)}: {info['runs_gnnzps']})")
    return rate


def main():
    report = {"paths": {}, "iters": ITERS}
    best = {"name": None, "rate": 0.0}
    emitted = False

    # SIGTERM (external timeout) must still run the finally-emit
    signal.signal(signal.SIGTERM, lambda s, f: sys.exit(143))

    def emit(rc_hint=None):
        nonlocal emitted
        if emitted:
            return
        emitted = True
        # pick up any path that recorded a median rate but never returned
        # (mid-measurement timeout)
        for name, info in report["paths"].items():
            if isinstance(info, dict) and info.get("gnnzps"):
                if info["gnnzps"] * 1e9 > best["rate"]:
                    best.update(name=name, rate=info["gnnzps"] * 1e9)
        base = report.get("baseline_gnnzps")
        out = {
            "metric": "spmv_nnz_per_s_cgls_tomo256x60",
            "value": round(best["rate"], 1),
            "unit": "nnz/s",
            "vs_baseline": (round(best["rate"] / (base * 1e9), 3)
                            if base and best["rate"] else None),
        }
        out.update(report)
        out["best_path"] = best["name"]
        print(json.dumps(out), flush=True)

    try:
        nx, views = 256, 60
        t0 = time.perf_counter()
        from trips_tpu.problems.phantoms import grains
        from trips_tpu.problems.projector import fan_beam_matrix

        A = fan_beam_matrix(nx, views=views).astype(np.float32)
        log(f"A {A.shape} nnz={A.nnz} built in {time.perf_counter()-t0:.1f}s")
        x_true = grains(nx, seed=0).reshape(-1).astype(np.float32)
        b_host = (A @ x_true).astype(np.float32)
        report["nnz"] = int(A.nnz)

        with phase("baseline_scipy", 120, report) as ok:
            if ok:
                runs = [scipy_cgls_rate(A.astype(np.float64),
                                        b_host.astype(np.float64), ITERS)
                        for _ in range(3)]
                report["baseline_gnnzps"] = round(
                    float(np.median(runs)) / 1e9, 3)
                report["baseline_runs_gnnzps"] = [
                    round(r / 1e9, 3) for r in runs]
                log(f"scipy CSR baseline: {report['baseline_gnnzps']} Gnnz/s "
                    f"(median of 3: {report['baseline_runs_gnnzps']})")

        import jax
        import jax.numpy as jnp

        from trips_tpu.krylov import cgls, cgls_fixed

        platform = jax.devices()[0].platform
        report["platform"] = f"{platform} {jax.devices()}"
        log(f"jax backend: {report['platform']}")
        b = jnp.asarray(b_host)

        def cgls_while(op, bb, x0, iters):
            return cgls(op, bb, x0, iters, 0.0)

        def consider(name, rate):
            if rate and rate > best["rate"]:
                best.update(name=name, rate=float(rate))

        # ---- path 0: banded bf16 n_groups=32 — the fast-compiling
        # near-champion (5.3 Gnnz/s, ~10s compile): runs FIRST so a strong
        # number is banked within the first minute even under tunnel
        # contention (r2 smoke: a 240s shear compile starved the budget).
        bop32 = bop16 = None
        if platform == "tpu":
            from trips_tpu.sparse.banded import BandedProjector

            bop32 = None
            with phase("banded_bf16_g32_build", 60, report) as ok:
                if ok:
                    bop32 = BandedProjector.from_scipy_fan(
                        A, nx, views, n_groups=32, dtype=jnp.bfloat16)
                    report["paths"]["banded_bf16_g32_build"]["stored_mb"] = (
                        round(bop32.stored_bytes / 1e6, 1))
            if bop32 is not None:
                info = report["paths"].setdefault("banded_bf16_g32", {})
                with phase("banded_bf16_g32", 180, report) as ok:
                    if ok:
                        consider("banded_bf16_g32", measure_device(
                            cgls_while, bop32, b, A.nnz, ITERS, info))

        # ---- path 1: shear-rotate fan projector (zero transfer; all dense
        # VPU/MXU work against a device-built constant) -------------------
        sf = None
        with phase("shear_fan_while", 240, report) as ok:
            if ok:
                from trips_tpu.operators import ShearFanProjector

                sf = ShearFanProjector(
                    nx, views=views, dtype=jnp.float32,
                    g_dtype=jnp.bfloat16 if platform == "tpu"
                    else jnp.float32)
                info = report["paths"]["shear_fan_while"]
                consider("shear_fan_while", measure_device(
                    cgls_while, sf, b, A.nnz, ITERS, info))

        # ---- path 2: banded bf16 n_groups=16 — the measured champion
        # (6.7 Gnnz/s, r2 sweep) whose compile has hit 300s+ under tunnel
        # contention, hence its own generous budget after the anchors ----
        if platform == "tpu":
            bop16 = None
            with phase("banded_bf16_g16_build", 60, report) as ok:
                if ok:
                    bop16 = BandedProjector.from_scipy_fan(
                        A, nx, views, n_groups=16, dtype=jnp.bfloat16)
                    report["paths"]["banded_bf16_g16_build"]["stored_mb"] = (
                        round(bop16.stored_bytes / 1e6, 1))
            if bop16 is not None:
                info = report["paths"].setdefault("banded_bf16_g16", {})
                with phase("banded_bf16_g16", 420, report) as ok:
                    if ok:
                        consider("banded_bf16_g16", measure_device(
                            cgls_while, bop16, b, A.nnz, ITERS, info))
            # exact-f32 banded datapoint (bit-exact matrix apply)
            with phase("banded_f32", 180, report) as ok:
                if ok:
                    bop = BandedProjector.from_scipy_fan(A, nx, views)
                    info = report["paths"]["banded_f32"]
                    info["stored_mb"] = round(bop.stored_bytes / 1e6, 1)
                    consider("banded_f32", measure_device(
                        cgls_while, bop, b, A.nnz, ITERS, info))

        # ---- path 2: on-the-fly fan projector (zero transfer; small
        # while-loop program compiles fast — the reliability anchor) ----
        with phase("onthefly_fan_while", 200, report) as ok:
            if ok:
                from trips_tpu.operators import OnTheFlyFanProjector

                otf = OnTheFlyFanProjector(nx, views=views, dtype=jnp.float32)
                info = report["paths"]["onthefly_fan_while"]
                consider("onthefly_fan_while", measure_device(
                    cgls_while, otf, b, A.nnz, ITERS, info))

        # ---- path 3: stored BSR bf16 (32,128) — round-1 champion -------
        op16 = None
        if platform == "tpu":
            with phase("bsr_bf16_transfer", 240, report) as ok:
                if ok:
                    from trips_tpu.sparse import BsrOperator

                    t0 = time.perf_counter()
                    op16 = BsrOperator.from_scipy(
                        A, block_shape=(32, 128), block_dtype=jnp.bfloat16,
                        prefer_pallas=False)
                    jax.block_until_ready(op16.blocks)
                    info = report["paths"]["bsr_bf16_transfer"]
                    info["stored_mb"] = round(op16.stored_bytes / 1e6, 1)
                    info["transfer_s"] = round(time.perf_counter() - t0, 1)
                    log(f"BSR(32,128)bf16: {info['stored_mb']} MB "
                        f"in {info['transfer_s']}s")
            if op16 is not None:
                info = report["paths"].setdefault("bsr_bf16_while", {})
                with phase("bsr_bf16_while", 200, report) as ok:
                    if ok:
                        consider("bsr_bf16_while", measure_device(
                            cgls_while, op16, b, A.nnz, ITERS, info))
                # the scan-unrolled program is ~2x faster at runtime but
                # compiles a much larger program — only worth it with time
                # to spare
                info = report["paths"].setdefault("bsr_bf16_scan", {})
                with phase("bsr_bf16_scan", 200, report) as ok:
                    if ok:
                        consider("bsr_bf16_scan", measure_device(
                            cgls_fixed, op16, b, A.nnz, ITERS, info))
            # int8 per-block quantized: halves the HBM stream again vs bf16
            # (the (32,128) regime is stream-bound, not index-bound);
            # reconstruction parity within the blockmax/254 budget is
            # pinned by tests/test_sparse.py
            op8 = None
            with phase("bsr_int8_transfer", 180, report) as ok:
                if ok:
                    from trips_tpu.sparse import BsrOperator

                    t0 = time.perf_counter()
                    op8 = BsrOperator.from_scipy(
                        A, block_shape=(32, 128), block_dtype=jnp.int8,
                        prefer_pallas=False)
                    jax.block_until_ready(op8.blocks)
                    info = report["paths"]["bsr_int8_transfer"]
                    info["stored_mb"] = round(op8.stored_bytes / 1e6, 1)
                    info["transfer_s"] = round(time.perf_counter() - t0, 1)
            if op8 is not None:
                info = report["paths"].setdefault("bsr_int8_scan", {})
                with phase("bsr_int8_scan", 200, report) as ok:
                    if ok:
                        consider("bsr_int8_scan", measure_device(
                            cgls_fixed, op8, b, A.nnz, ITERS, info))
        else:
            with phase("ell_cpu", 120, report) as ok:
                if ok:
                    from trips_tpu.sparse import EllOperator

                    op = EllOperator.from_scipy(A)
                    info = report["paths"]["ell_cpu"]
                    consider("ell_cpu", measure_device(
                        cgls_while, op, b, A.nnz, ITERS, info))

        # ---- scan-unrolled run for the current champion (the scan program
        # is faster per-iteration but compiles much larger) ----------------
        champ_op = {"shear_fan_while": sf, "banded_bf16_g32": bop32,
                    "banded_bf16_g16": bop16}.get(best["name"])
        if champ_op is not None:
            cname = best["name"].replace("_while", "") + "_scan"
            info = report["paths"].setdefault(cname, {})
            with phase(cname, 200, report) as ok:
                if ok:
                    consider(cname, measure_device(
                        cgls_fixed, champ_op, b, A.nnz, ITERS, info))

        # ---- second chance: headline paths whose measurement timed out
        # under tunnel contention retry with the leftover budget (the op
        # object survives its phase; compiles are cached on retry) -------
        for rname, rop in (("banded_bf16_g32", bop32),
                           ("banded_bf16_g16", bop16),
                           ("shear_fan_while", sf)):
            if rop is None or report["paths"].get(rname, {}).get("gnnzps"):
                continue
            if remaining() < 90:
                break
            info = report["paths"].setdefault(rname + "_retry", {})
            with phase(rname + "_retry", 300, report) as ok:
                if ok:
                    consider(rname + "_retry", measure_device(
                        cgls_while, rop, b, A.nnz, ITERS, info))

        # ---- contention sentinel: re-run the host baseline --------------
        with phase("baseline_sentinel", 60, report) as ok:
            if ok and "baseline_gnnzps" in report:
                r = scipy_cgls_rate(A.astype(np.float64),
                                    b_host.astype(np.float64), ITERS)
                report["baseline_sentinel_gnnzps"] = round(r / 1e9, 3)
                log(f"baseline sentinel: {report['baseline_sentinel_gnnzps']}"
                    " Gnnz/s")
    finally:
        emit()

    if best["rate"] <= 0:
        log("no device path succeeded")
        sys.exit(1)
    log(f"best path: {best['name']} ({best['rate']/1e9:.3f} Gnnz/s)")


if __name__ == "__main__":
    main()
