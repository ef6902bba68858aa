"""Benchmark: nnz/s per chip for SpMV inside the fused CGLS loop.

Config: the reference's large-scale tomography demo
(demo_Tomo_large_scale.ipynb — 256x256 image, 60 fan-beam views; SURVEY.md
§6). Each CGLS iteration performs one A·p and one A^T·r, so the metric is
iterations * 2 * nnz / wall_seconds, measured over a fused device-side CGLS
loop (one program per run).

Tunnel-resilient design (round-2 postmortem: a full-dark axon outage ate all
three headline phase budgets sequentially — 781 s of dead compiles — and the
artifact recorded value 0.0 while the cheap reliability anchor never ran):

- **Tunnel probe**: before every device phase, a 1-element jitted op runs
  under its own 25 s alarm. On failure the bench sleeps and re-probes in a
  loop that consumes *idle* time (bounded only by the global deadline), not
  phase budgets — a dead tunnel no longer burns phase allocations.
- **Cheapest-compile-first banking**: the on-the-fly projector (~6 s
  compile, exact-matrix class) runs before anything else, so ``value`` and
  ``value_exact_matrix`` are nonzero within ~90 s of the tunnel being up.
  Headliners (banded bf16, shear) run only after a number is banked.
- Every phase gets its own SIGALRM budget carved out of a global deadline;
  a timeout skips that phase only, and headline paths that timed out are
  retried with leftover budget (compile caches survive the phase).
- The final JSON line is emitted from a ``finally`` block with the best
  result so far; exit code 0 whenever at least one device path produced a
  rate.
- Median-of-3 on the scipy baseline and every device path; a post-run
  baseline sentinel re-run makes contention-inflated ``vs_baseline``
  readings self-diagnosing.

Metric classes (VERDICT r2 item 3): each path carries
``matrix_class`` ∈ {"exact", "quantized", "surrogate"} and a boolean
``exact_matrix``:

- ``exact``    — applies the stored Siddon fan-beam matrix in f32 (banded
                 f32 repack is bit-exact; the on-the-fly generator matches
                 it to ~1e-6 f32 roundoff).
- ``quantized``— same matrix, values stored bf16/int8 (<1%-of-norm recon
                 deviation, pinned by tests).
- ``surrogate``— the ShearFanProjector's own discretization of the same fan
                 geometry (recon-parity-tested, not matrix-equal); its rate
                 uses the Siddon matrix's nnz as "effective nnz/s".

The summary line reports ``value`` (best overall) **and**
``value_exact_matrix`` (best exact-class path).

Roofline fields (VERDICT r2 item 2): stored-matrix paths record
``streamed_gb`` (bytes of operator stream over the measured run: 2 applies
per iteration), ``gbps``, and ``pct_peak_bw`` against the v5e HBM peak
(819 GB/s).

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
# Device paths run more iterations per dispatch: the axon tunnel adds a
# measured ~26-30 ms round trip per call (r5: a trivial 800-iteration
# device loop times the same as a 50-iteration one), which at 100
# iterations inflated champion wall time ~30%. 400 iterations amortize it
# to <3% while the metric definition (iters * 2 * nnz / wall, one
# dispatch included) is unchanged. The scipy host baseline keeps ITERS
# (no tunnel; 400 iters would cost 8+ s per run).
DEV_ITERS = int(os.environ.get("BENCH_DEV_ITERS", "400"))
FAST = os.environ.get("BENCH_FAST", "") == "1"
if FAST:
    BUDGET_S = min(BUDGET_S, 300.0)
    ITERS = 20
    DEV_ITERS = 20
EMIT_RESERVE_S = 15.0  # time kept back for the final emit
PEAK_HBM_GBPS = 819.0  # TPU v5e HBM peak


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def remaining():
    return BUDGET_S - (time.monotonic() - T_START)


class PhaseTimeout(Exception):
    pass


@contextlib.contextmanager
def alarm(seconds):
    def handler(signum, frame):
        raise PhaseTimeout(f"alarm {seconds}s")

    old = signal.signal(signal.SIGALRM, handler)
    signal.alarm(max(1, int(seconds)))
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


_PROBE = {"fn": None}


def tunnel_ok(timeout_s=25):
    """One 1-element jitted round-trip under its own alarm."""
    try:
        with alarm(timeout_s):
            import jax
            import jax.numpy as jnp

            if _PROBE["fn"] is None:
                _PROBE["fn"] = jax.jit(lambda x: (x + 1.0).sum())
            return abs(float(_PROBE["fn"](jnp.ones(8, jnp.float32))) - 16.0) < 1e-3
    except Exception as e:  # noqa: BLE001 — probe failure means tunnel down
        log(f"[probe] {type(e).__name__}: {e}")
        return False


def await_tunnel(report, name):
    """Probe the tunnel; on failure sleep+re-probe on *idle* time until it
    returns or only the emit reserve remains. Returns tunnel-up bool."""
    retries = 0
    while remaining() > EMIT_RESERVE_S + 40:
        if tunnel_ok():
            if retries:
                log(f"[probe:{name}] tunnel back after {retries} retries")
            report["probe_retries"] = report.get("probe_retries", 0) + retries
            return True
        retries += 1
        if retries == 1:
            log(f"[probe:{name}] tunnel dark — waiting on idle time")
        time.sleep(min(20.0, max(1.0, remaining() - EMIT_RESERVE_S - 30)))
    report["probe_retries"] = report.get("probe_retries", 0) + retries
    log(f"[probe:{name}] tunnel never returned (budget exhausted)")
    return False


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


def measure_device(fn, op, b, nnz, iters, info, runs=3, stream_factor=2):
    """Compile once, then median-of-N timed runs.

    Synchronization is a 4-byte scalar fetch (``float(norm(x))``), not an
    array download: ``block_until_ready`` does not actually block through
    the axon tunnel, and bulk device->host downloads can take minutes under
    tunnel congestion (measured r2) — either would poison the timing.
    """
    import jax.numpy as jnp

    x0 = jnp.zeros(op.shape[1], b.dtype)
    t0 = time.perf_counter()
    x, k = fn(op, b, x0, iters)
    info["x_norm"] = float(jnp.linalg.norm(x))  # scalar sync
    info["compile_s"] = round(time.perf_counter() - t0, 1)
    # credit only iterations the solver actually ran: cgls_normal's
    # quantized-delta guard can terminate before `iters` near convergence
    k_done = int(k) if np.ndim(k) == 0 else iters
    info["iters_done"] = k_done
    log(f"    compile+warmup {info['compile_s']}s")
    rates = []
    info["runs_gnnzps"] = []
    for _ in range(runs):
        t0 = time.perf_counter()
        x, _ = fn(op, b, x0, iters)
        _ = float(jnp.linalg.norm(x))
        wall = time.perf_counter() - t0
        rates.append(k_done * 2 * nnz / wall)
        # record incrementally so a mid-loop timeout still counts
        info["runs_gnnzps"].append(round(rates[-1] / 1e9, 3))
        info["gnnzps"] = round(float(np.median(rates)) / 1e9, 3)
        stored = info.get("stored_mb")
        if stored:  # roofline: operator streamed stream_factor times per
            # iteration (2 = separate fwd+adj; 1 = fused A^T A kernel)
            streamed = stream_factor * k_done * stored * 1e6
            info["streamed_gb"] = round(streamed / 1e9, 2)
            # derive from the median wall so gbps/pct_peak_bw share the
            # headline gnnzps's basis (ADVICE r3); best-run kept separately
            med_wall = iters * 2 * nnz / float(np.median(rates))
            info["gbps"] = round(streamed / med_wall / 1e9, 1)
            info["pct_peak_bw"] = round(100 * info["gbps"] / PEAK_HBM_GBPS, 1)
            best_wall = iters * 2 * nnz / max(rates)
            info["gbps_best"] = round(streamed / best_wall / 1e9, 1)
        if remaining() < EMIT_RESERVE_S + 5 and rates:
            break
    rate = float(np.median(rates))
    log(f"    {iters} iters -> {info['gnnzps']} Gnnz/s "
        f"(median of {len(rates)}: {info['runs_gnnzps']})"
        + (f" | {info.get('gbps')} GB/s = {info.get('pct_peak_bw')}% peak"
           if info.get("gbps") else ""))
    return rate


# matrix_class per path family (see module docstring)
CLASSES = {
    "onthefly_fan_while": "exact",
    "banded_f32": "exact",
    "banded_f32_buck": "exact",
    "bsr_f32_while": "exact",
    "shear_fan": "surrogate",
    "banded_bf16_g32": "quantized",
    "banded_bf16_buck": "quantized",
    "banded_int8_buck": "quantized",
    "banded_bf16_g16": "quantized",
    "bsr_bf16_while": "quantized",
    "bsr_bf16_scan": "quantized",
    "bsr_int8_scan": "quantized",
    "shear_fan_while": "surrogate",
    "ell_cpu": "exact",
}


def classify(name):
    base = name.replace("_retry", "").replace("_scan", "").replace(
        "_while", "").replace("_ata", "")
    for key, cls in CLASSES.items():
        if key.replace("_while", "").replace("_scan", "") == base:
            return cls
    return CLASSES.get(name, "exact")


def main():
    report = {"paths": {}, "iters": ITERS, "device_iters": DEV_ITERS,
              "peak_hbm_gbps": PEAK_HBM_GBPS}
    best = {"name": None, "rate": 0.0}
    best_exact = {"name": None, "rate": 0.0}
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
                info.setdefault("matrix_class", classify(name))
                info.setdefault("exact_matrix",
                                info["matrix_class"] == "exact")
                r = info["gnnzps"] * 1e9
                if r > best["rate"]:
                    best.update(name=name, rate=r)
                if info["exact_matrix"] and r > best_exact["rate"]:
                    best_exact.update(name=name, rate=r)
        base = report.get("baseline_gnnzps")
        platform = str(report.get("platform", ""))[:60]
        out = {
            "metric": "spmv_nnz_per_s_cgls_tomo256x60",
            "value": round(best["rate"], 1),
            "unit": "nnz/s",
            "vs_baseline": (round(best["rate"] / (base * 1e9), 3)
                            if base and best["rate"] else None),
            "best_path": best["name"],
            "value_exact_matrix": round(best_exact["rate"], 1),
            "best_path_exact_matrix": best_exact["name"],
            "baseline_gnnzps": base,
            "baseline_sentinel_gnnzps": report.get("baseline_sentinel_gnnzps"),
            "platform": platform,
            "nnz": report.get("nnz"),
            "iters": report.get("device_iters", report.get("iters")),
            "report_file": "BENCH_report.json",
        }
        # Driver contract (CLAUDE.md / VERDICT r4 weak #1): stdout carries
        # exactly ONE compact JSON line — the driver's capture window is
        # ~2000 chars, and r3/r4's full-report line (~4 KB) truncated its own
        # head, leaving BENCH_r03/r04.json unparseable. The per-path report
        # goes to a side file and stderr instead.
        report["summary"] = out
        try:
            with open("BENCH_report.json", "w") as f:
                json.dump(report, f, indent=1)
        except OSError as e:
            log(f"could not write BENCH_report.json: {e}")
        log("full report: " + json.dumps(report))
        line = json.dumps(out)
        if len(line) >= 1500:  # keep the one-line contract: shed optional
            # fields rather than abort the emit
            for drop in ("platform", "report_file", "baseline_sentinel_gnnzps",
                         "best_path_exact_matrix", "best_path"):
                out.pop(drop, None)
                line = json.dumps(out)
                if len(line) < 1500:
                    break
            line = line[:1499] if len(line) >= 1500 else line
        print(line, flush=True)

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

        from trips_tpu.krylov import cgls, cgls_fixed, cgls_normal

        platform = jax.devices()[0].platform
        report["platform"] = f"{platform} {jax.devices()}"
        log(f"jax backend: {report['platform']}")
        b = jnp.asarray(b_host)

        def cgls_while(op, bb, x0, iters):
            return cgls(op, bb, x0, iters, 0.0)

        def consider(name, rate):
            info = report["paths"].get(name, {})
            info["matrix_class"] = classify(name)
            info["exact_matrix"] = info["matrix_class"] == "exact"
            if rate and rate > best["rate"]:
                best.update(name=name, rate=float(rate))
            if rate and info["exact_matrix"] and rate > best_exact["rate"]:
                best_exact.update(name=name, rate=float(rate))

        def run_path(name, op, budget, solver=None, nnz_eff=None,
                     stream_factor=2):
            """probe-await, then measure one path under its own budget."""
            if op is None:
                return
            if report["paths"].get(name, {}).get("gnnzps"):
                return  # already measured (e.g. banked earlier)
            if not await_tunnel(report, name):
                report["paths"].setdefault(name, {})["status"] = \
                    "skipped_tunnel_dark"
                return
            info = report["paths"].setdefault(name, {})
            if getattr(op, "stored_bytes", 0):
                info["stored_mb"] = round(op.stored_bytes / 1e6, 1)
            with phase(name, budget, report) as ok:
                if ok:
                    consider(name, measure_device(
                        solver or cgls_while, op, b, nnz_eff or A.nnz,
                        DEV_ITERS, info, stream_factor=stream_factor))

        if platform != "tpu":
            op = None
            if await_tunnel(report, "ell_cpu"):
                from trips_tpu.sparse import EllOperator

                op = EllOperator.from_scipy(A)
            run_path("ell_cpu", op, 120)
            run_tpu_paths = False
        else:
            run_tpu_paths = True

        otf = bop32 = bopf32 = bop16 = sf = op16 = op8 = None
        buckf32 = buck16 = buck8 = None

        # ---- path 0: on-the-fly fan projector — cheapest compile (~6 s),
        # exact-matrix class, zero transfer. Runs FIRST so both headline
        # values are nonzero within ~90 s of tunnel availability. --------
        if run_tpu_paths:
            from trips_tpu.operators import OnTheFlyFanProjector

            otf = OnTheFlyFanProjector(nx, views=views, dtype=jnp.float32)
            run_path("onthefly_fan_while", otf, 120)

        # ---- path 1: banded bf16 n_groups=32 — fast-compiling
        # near-champion (5.3 Gnnz/s, ~10 s compile) ----------------------
        if run_tpu_paths:
            from trips_tpu.sparse.banded import BandedProjector

            with phase("banded_bf16_g32_build", 60, report) as ok:
                if ok:
                    bop32 = BandedProjector.from_scipy_fan(
                        A, nx, views, n_groups=32, dtype=jnp.bfloat16)
            run_path("banded_bf16_g32", bop32, 150)
            # fused A^T A variant: CG on the normal equations streams the
            # stored band ONCE per iteration (same fwd+adj arithmetic)
            run_path("banded_bf16_g32_ata", bop32, 150, solver=cgls_normal,
                     stream_factor=1)

            # ---- path 2: banded f32 — the exact-stored-matrix champion
            # (bit-exact Siddon repack; 2.75 Gnnz/s r2) ------------------
            with phase("banded_f32_build", 60, report) as ok:
                if ok:
                    bopf32 = BandedProjector.from_scipy_fan(A, nx, views)
            run_path("banded_f32", bopf32, 150)
            run_path("banded_f32_ata", bopf32, 150, solver=cgls_normal,
                     stream_factor=1)
            # Ta-bucketed f32 exact pack: per-bucket tap widths cut the
            # streamed slab ~27% at zero added compute (r4 finding:
            # +10% on this stream-heavier f32 path; bf16 gains ~2%)
            with phase("banded_f32_buck_build", 60, report) as ok:
                if ok:
                    from trips_tpu.sparse import BucketedBandedProjector

                    buckf32 = BucketedBandedProjector.from_scipy_fan(
                        A, nx, views, n_groups=32, n_buckets=4)
            run_path("banded_f32_buck_ata", buckf32, 150,
                     solver=cgls_normal, stream_factor=1)
            with phase("banded_bf16_buck_build", 60, report) as ok:
                if ok:
                    buck16 = BucketedBandedProjector.from_scipy_fan(
                        A, nx, views, n_groups=32, n_buckets=4,
                        dtype=jnp.bfloat16)
            run_path("banded_bf16_buck_ata", buck16, 150,
                     solver=cgls_normal, stream_factor=1)
            # int8-stored bucketed pack (r5): per-angle absmax scales
            # dequantized in VMEM — half the bf16 stream; measured
            # 10.76-10.79 Gnnz/s vs 10.28 same-session bf16
            with phase("banded_int8_buck_build", 60, report) as ok:
                if ok:
                    buck8 = BucketedBandedProjector.from_scipy_fan(
                        A, nx, views, n_groups=32, n_buckets=4,
                        dtype="int8")
            run_path("banded_int8_buck_ata", buck8, 150,
                     solver=cgls_normal, stream_factor=1)

            # ---- path 3: banded bf16 n_groups=16 — measured champion
            # (6.7 Gnnz/s r2 sweep); its compile has hit 300 s+ under
            # tunnel contention, hence a generous budget after anchors ---
            with phase("banded_bf16_g16_build", 60, report) as ok:
                if ok:
                    bop16 = BandedProjector.from_scipy_fan(
                        A, nx, views, n_groups=16, dtype=jnp.bfloat16)
            run_path("banded_bf16_g16", bop16, 300)
            run_path("banded_bf16_g16_ata", bop16, 150, solver=cgls_normal,
                     stream_factor=1)

            # ---- path 4: shear-rotate fan projector (surrogate class:
            # own discretization, zero stored matrix; effective-nnz/s) ---
            with phase("shear_fan_build", 30, report) as ok:
                if ok:
                    from trips_tpu.operators import ShearFanProjector

                    sf = ShearFanProjector(
                        nx, views=views, dtype=jnp.float32,
                        g_dtype=jnp.bfloat16)
            run_path("shear_fan_while", sf, 240)
            # fused A^T A: G streamed once per iteration (r4 kernel;
            # default-off — measured a wash vs the einsum pair — but
            # recorded here so the artifact tracks it per chip state)
            os.environ["TRIPS_TPU_SHEAR_ATA"] = "1"
            try:
                run_path("shear_fan_ata", sf, 150, solver=cgls_normal,
                         stream_factor=1)
            finally:
                os.environ.pop("TRIPS_TPU_SHEAR_ATA", None)

        # ---- path 5: stored BSR bf16/int8 (32,128) — round-1 champions -
        if run_tpu_paths and remaining() > 150:
            with phase("bsr_bf16_transfer", 180, report) as ok:
                if ok:
                    from trips_tpu.sparse import BsrOperator

                    t0 = time.perf_counter()
                    op16 = BsrOperator.from_scipy(
                        A, block_shape=(32, 128), block_dtype=jnp.bfloat16)
                    jax.block_until_ready(op16.blocks)
                    info = report["paths"]["bsr_bf16_transfer"]
                    info["stored_mb"] = round(op16.stored_bytes / 1e6, 1)
                    info["transfer_s"] = round(time.perf_counter() - t0, 1)
            run_path("bsr_bf16_scan", op16, 150, solver=cgls_fixed)
        if run_tpu_paths and remaining() > 150:
            with phase("bsr_int8_transfer", 150, report) as ok:
                if ok:
                    from trips_tpu.sparse import BsrOperator

                    t0 = time.perf_counter()
                    op8 = BsrOperator.from_scipy(
                        A, block_shape=(32, 128), block_dtype=jnp.int8)
                    jax.block_until_ready(op8.blocks)
                    info = report["paths"]["bsr_int8_transfer"]
                    info["stored_mb"] = round(op8.stored_bytes / 1e6, 1)
                    info["transfer_s"] = round(time.perf_counter() - t0, 1)
            run_path("bsr_int8_scan", op8, 150, solver=cgls_fixed)

        # ---- scan-unrolled run for the current champion (the scan program
        # is faster per-iteration but compiles much larger) ---------------
        champ_op = {"shear_fan_while": sf, "banded_bf16_g32": bop32,
                    "banded_bf16_g16": bop16, "banded_f32": bopf32,
                    "onthefly_fan_while": otf}.get(best["name"])
        if champ_op is not None and remaining() > 120:
            cname = best["name"].replace("_while", "") + "_scan"
            run_path(cname, champ_op, 180, solver=cgls_fixed)

        # ---- second chance: headline paths whose measurement timed out
        # under tunnel contention retry with the leftover budget (the op
        # object survives its phase; compiles are cached on retry) -------
        for rname, rop, rsolver, sfac in (
                ("banded_bf16_g16", bop16, None, 2),
                ("banded_bf16_g32", bop32, None, 2),
                ("banded_f32", bopf32, None, 2),
                ("banded_bf16_g32_ata", bop32, cgls_normal, 1),
                ("banded_f32_ata", bopf32, cgls_normal, 1),
                ("banded_f32_buck_ata", buckf32, cgls_normal, 1),
                ("banded_bf16_buck_ata", buck16, cgls_normal, 1),
                ("shear_fan_while", sf, None, 2)):
            if rop is None or report["paths"].get(rname, {}).get("gnnzps"):
                continue
            if remaining() < 90:
                break
            run_path(rname + "_retry", rop, 300, solver=rsolver,
                     stream_factor=sfac)

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
    log(f"best path: {best['name']} ({best['rate']/1e9:.3f} Gnnz/s); "
        f"best exact-matrix: {best_exact['name']} "
        f"({best_exact['rate']/1e9:.3f} Gnnz/s)")


if __name__ == "__main__":
    main()
