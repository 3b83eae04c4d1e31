#!/usr/bin/env python
"""DASP-TPU benchmark driver.

Runs the packed SpMV on the benchmark suite on the available accelerator,
against the jax.experimental.sparse BCOO baseline (the role cuSPARSE plays
in ``main_f64.cu:19-100``), with the reference's warmup+timed protocol
(``dasp_f64.h:1285-1286``).

Prints a summary JSON line
  {"metric": "spmv_gflops_geomean", "value": <geomean dasp GFLOP/s over the
   suite x {f32, bf16, f64}>, "unit": "GFLOP/s",
   "vs_baseline": <geomean speedup of dasp-f32 over BCOO-f32>}
INCREMENTALLY: the running summary is re-printed after every completed
(matrix, dtype) arm, and a SIGTERM/SIGALRM/SIGINT handler prints the final
summary before dying, so a timeout kill still leaves a complete record of
everything measured so far (the last JSON line on stdout is always the most
complete one).

Arm ordering is DTYPE-MAJOR: every matrix at f32 (cheapest nnz first),
then every matrix at bf16, then f64 — so a wall-budget kill costs the
least-important tail (round 2 ran dtypes matrix-inner and lost all three
livejournal arms to the same f64 arms it had already measured elsewhere).
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import sys
import time

import numpy as np

# nnz above which the BCOO baseline is DEFERRED to after the final summary:
# its buffers crashed the TPU worker process at >19 Mnnz in round 1, which
# poisons every later arm — run the risky arms only once nothing is left to
# poison (the ratio, if it survives, is appended and the summary re-printed).
BCOO_RISK_NNZ = 19_000_000

# bump when the WPlan on-disk format or packer semantics change (stale
# cached plans also fail load_wplan and rebuild transparently)
# v2: W8_CLASSES intermediate widths + cost-argmin width selection
# v3: stride-switch margin (narrower strides must win by >20% — hidden
#     P-cost; same-window scircuit f32 A/B v2 37-39 vs v3 42-43 GF)
# v4: round tag moved from slot to cell bits (wplan.py)
# v5: window-capacity w8 floor + MED_BUCKETS 32/64 classes (R-MAT)
# v6: s_rows-aware stream-merge fixed cost
# v7: row length-grouping composes with sym relabel
PLAN_CACHE_VER = 8     # v8: realized-fill dump (config.fill_dump) +
#                        residue sub-plan escape (RES_REPACK_MIN)


class _Summary:
    """Running suite summary; emitted after every arm and from signal
    handlers so the driver's capture can never end up empty again
    (round-1 failure mode: rc=124 with no JSON line printed)."""

    def __init__(self):
        self.gflops = []
        self.ratios = []
        self.done = 0
        self.total = 0

    def line(self) -> str:
        from dasp_tpu.bench import geomean
        return json.dumps({
            "metric": "spmv_gflops_geomean",
            "value": round(geomean(self.gflops), 3),
            "unit": "GFLOP/s",
            "vs_baseline": round(geomean(self.ratios), 3)
            if self.ratios else 0.0,
            "arms_done": self.done, "arms_total": self.total})

    def emit(self) -> None:
        if self.gflops:
            print(self.line(), flush=True)


SUMMARY = _Summary()


def _install_handlers(deadline: float) -> None:
    def die(signum, frame):
        SUMMARY.emit()
        sys.stdout.flush()
        os._exit(0)

    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, die)
    if deadline > 0:
        signal.signal(signal.SIGALRM, die)
        signal.alarm(int(deadline))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="small suite + few iters (smoke test)")
    ap.add_argument("--dtypes", default="f32,bf16,f64")
    ap.add_argument("--warmup", type=int, default=None)
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--names", default=None,
                    help="comma-separated suite subset")
    ap.add_argument("--csv-dir", default="data")
    ap.add_argument("--deadline", type=float,
                    default=float(os.environ.get("DASP_BENCH_DEADLINE",
                                                 3600)),
                    help="self-imposed wall budget (s); the summary is "
                         "printed and the process exits 0 when it fires "
                         "(0 disables).  Default is ABOVE the observed "
                         "~40 min a warm complete suite needs: the "
                         "summary line is re-printed incrementally, so "
                         "an external kill still leaves the most "
                         "complete record — a self-deadline that fires "
                         "EARLY can only truncate arms_done.")
    # The reference's tunables were argv[2]/argv[3] before being hardcoded
    # (main_f64.cu:121-125); expose them so they can be swept on TPU.
    ap.add_argument("--block-longest", type=int, default=None,
                    help="long-row threshold (reference default 256)")
    ap.add_argument("--threshold", type=float, default=None,
                    help="SELL occupancy target (reference default 0.75)")
    ap.add_argument("--relabel", default=None,
                    choices=["auto", "off", "first_touch"],
                    help="column relabel policy override")
    ap.add_argument("--row-sort", default=None,
                    choices=["auto", "off", "on"],
                    help="row length-grouping policy override")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of one timed run "
                         "into DIR (the reference ships -lineinfo for "
                         "nsight, Makefile:10; this is the TPU analog)")
    ap.add_argument("--mtx", nargs="*", default=None,
                    help="benchmark these .mtx files instead of the suite")
    ap.add_argument("--multichip", action="store_true",
                    help="bench the row-partitioned multi-chip operator "
                         "over all local devices (skips with a note on a "
                         "single device; set DASP_FORCE_CPU=8 to time the "
                         "8-virtual-device CPU mesh instead)")
    args = ap.parse_args()

    if os.environ.get("DASP_FORCE_CPU"):
        # sitecustomize pins JAX_PLATFORMS=axon; env overrides are too
        # late once jax initializes, so flip the config knob here
        n = int(os.environ["DASP_FORCE_CPU"])
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   f" --xla_force_host_platform_device_"
                                   f"count={n}")
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")

    _install_handlers(args.deadline)

    import jax
    from dasp_tpu import SpMVOperator, load_matrix
    from dasp_tpu.bench import (BCOOBaseline, append_record, bench_spmv,
                                build_suite, geomean, record_from,
                                update_baseline)
    from dasp_tpu.config import DaspConfig, DEFAULT_CONFIG
    from dasp_tpu.utils import enable_compile_cache

    enable_compile_cache()

    config = DEFAULT_CONFIG
    overrides = {k: v for k, v in [
        ("block_longest", args.block_longest),
        ("threshold", args.threshold),
        ("relabel", args.relabel),
        ("row_sort", args.row_sort)] if v is not None}
    if overrides:
        import dataclasses
        config = dataclasses.replace(config, **overrides)

    print(f"# devices: {jax.devices()}", file=sys.stderr)
    warmup = args.warmup if args.warmup is not None else (10 if args.quick
                                                          else 100)
    # 100 timed iterations: the two-loop-length differencing makes the
    # reference's 1000 (dasp_f64.h:1286) unnecessary for stable numbers,
    # and round 1's 300 blew the driver's wall budget mid-suite.
    iters = args.iters if args.iters is not None else (50 if args.quick
                                                       else 100)
    dtypes = args.dtypes.split(",")

    if args.mtx:
        suite = [(p.rsplit("/", 1)[-1], load_matrix(p)) for p in args.mtx]
    else:
        names = args.names.split(",") if args.names else None
        if args.quick and not names:
            names = ["cop20k_like", "wikitalk_like"]
        suite = build_suite(names)
    # Cheapest arms first: a wall-budget kill then costs the least data.
    suite.sort(key=lambda t: t[1].nnz)

    if args.multichip:
        # Row-partitioned multi-chip timing (reference has no analog —
        # this is the new distributed dimension, SURVEY.md §5): each
        # chip owns a row slab, x replicates via all_gather over ICI.
        n_dev = len(jax.devices())
        if n_dev < 2:
            print(f"# --multichip: {n_dev} device visible, skipping "
                  "(set DASP_FORCE_CPU=8 for a simulated-mesh timing)",
                  file=sys.stderr)
            print(json.dumps({"metric": "spmv_multichip_geomean",
                              "value": 0.0, "unit": "GFLOP/s",
                              "vs_baseline": 0.0, "skipped": True}))
            return 0
        from dasp_tpu.parallel import MultiChipSpMV
        SUMMARY.total = len(suite) * len(dtypes)
        for dtype in dtypes:
            for name, csr in suite:
                x = np.random.default_rng(1).standard_normal(csr.n_cols)
                op = MultiChipSpMV(csr, dtype=dtype, config=config)
                res = bench_spmv(op, x, dtype, warmup=warmup, iters=iters)
                SUMMARY.gflops.append(res.gflops)
                SUMMARY.done += 1
                print(f"# {name} {dtype} x{n_dev}: {res.gflops:.2f} "
                      f"GFLOP/s ({res.seconds_per_iter*1e6:.1f} us/iter, "
                      f"balance {op.stats['balance']:.2f}, pad "
                      f"{sum(op.stats.get('pad_vregs', [0]))}/"
                      f"{sum(op.stats.get('real_vregs', [1]))} vregs, "
                      f"resident {op.stats.get('resident', False)})",
                      file=sys.stderr)
                SUMMARY.emit()
        return 0

    SUMMARY.total = len(suite) * len(dtypes)
    deferred_bcoo = []       # (name, dtype, bdt, csr, x): post-summary runs
    paired_arms = []         # (name, dtype, plan): resident arms whose
    #                          streamed variant is timed AFTER the suite
    #                          (reference records both f16 variants per
    #                          matrix, dasp_f16.h:1542-1718)

    # The BCOO competitor runs PER DTYPE (the reference runs cuSPARSE in
    # both its binaries, main_f64.cu:65-86 / main_f16.cu:57-58): f32 and
    # bf16 natively; the f64 arm's baseline computes in f32 — TPU has no
    # f64 datapath, the analog of the reference's f16 binary running
    # cuSPARSE at fp32 compute — so it REUSES the f32 measurement and the
    # CSV's baseline_dtype column records the substitution.  A rough
    # ratio needs few iterations: the baseline is ~300x slower, so its
    # loops clear the overhead floor at iters=10.
    bcoo_cache = {}          # (name, bdt) -> BenchResult | None

    # The BCOO numbers are properties of (matrix, dtype) alone, so they
    # PERSIST across runs (data/baseline_cache.json): each costs 10+
    # timed iterations of a ~300x-slower operator plus its compile —
    # ~3-6 min per full suite that the wall budget can spend on dasp
    # arms instead.  Suite matrices are deterministic; --mtx arms are
    # keyed by (name, nnz) too, which is as stable as their files.
    bcoo_disk_path = f"{args.csv_dir}/baseline_cache.json"
    try:
        with open(bcoo_disk_path) as f:
            bcoo_disk = json.load(f)
    except Exception:
        bcoo_disk = {}

    def run_bcoo(name, dtype, csr, x):
        from dasp_tpu.bench.harness import BenchResult
        bdt = "f32" if dtype == "f64" else dtype
        if (name, bdt) in bcoo_cache:
            return bcoo_cache[(name, bdt)], bdt
        dk = f"{name}|{bdt}|{csr.nnz}"
        if dk in bcoo_disk:
            res = BenchResult(**bcoo_disk[dk])
            bcoo_cache[(name, bdt)] = res
            return res, bdt
        try:
            base = BCOOBaseline(csr, bdt)
            res = bench_spmv(base, x, bdt, iters=min(iters, 10), trials=2)
            bcoo_disk[dk] = res.as_dict()
            try:
                os.makedirs(args.csv_dir, exist_ok=True)
                with open(bcoo_disk_path, "w") as f:
                    json.dump(bcoo_disk, f, indent=1)
            except Exception:
                pass
        except Exception as e:  # baseline may be unsupported
            print(f"# BCOO baseline failed on {name} {bdt}: {e}",
                  file=sys.stderr)
            res = None
        bcoo_cache[(name, bdt)] = res
        return res, bdt

    def get_plan(name, csr):
        # The pack plan is dtype-independent: build it ONCE per matrix
        # and share it across the dtype arms (the reference re-packs per
        # dtype binary; dasp_pre still records the full standalone cost).
        # Suite plans are additionally CACHED on disk: the suite matrices
        # are deterministic (bench/suite.py) and a plan is a pure
        # function of (matrix, config), while packing the 69M-nnz
        # livejournal arm costs minutes of this box's one bursty vCPU.
        # dasp_pre reports the pack time MEASURED when the plan was built
        # (stored in plan.stats) — the SpMV timing never touches the
        # cache.  Within one driver run, plans stay in host memory across
        # the dtype passes (the box has 125 GB).
        if name in plan_mem:
            return plan_mem[name]
        shared_plan, pre_shared = None, 0.0
        try:
            from dasp_tpu.ops.pallas_backend import SLAB_COLS
            from dasp_tpu.wplan import build_wplan, load_wplan, save_wplan
            if (jax.devices()[0].platform == "tpu"
                    and csr.n_cols <= SLAB_COLS):
                cpath = None
                if not args.mtx:
                    import dataclasses as _dc
                    import json as _json
                    import zlib as _z
                    ch = _z.crc32(_json.dumps(
                        _dc.asdict(config), sort_keys=True,
                        default=str).encode())
                    cpath = (f".plan_cache/{name}_{csr.nnz}"
                             f"_{ch:08x}_v{PLAN_CACHE_VER}.npz")
                if cpath and os.path.exists(cpath):
                    try:
                        shared_plan = load_wplan(cpath)
                        pre_shared = float(
                            shared_plan.stats.get("pack_seconds", 0.0))
                        print(f"# {name}: plan cache hit", file=sys.stderr)
                    except Exception:
                        shared_plan = None      # stale format: rebuild
                if shared_plan is None:
                    t0 = time.perf_counter()
                    shared_plan = build_wplan(csr, config)
                    pre_shared = time.perf_counter() - t0
                    shared_plan.stats["pack_seconds"] = pre_shared
                    if cpath:
                        try:
                            os.makedirs(".plan_cache", exist_ok=True)
                            save_wplan(shared_plan, cpath)
                        except Exception as e:
                            print(f"# plan cache save failed: {e}",
                                  file=sys.stderr)
        except Exception as e:
            print(f"# shared pack failed on {name}: {e}", file=sys.stderr)
        plan_mem[name] = (shared_plan, pre_shared)
        return shared_plan, pre_shared

    plan_mem = {}            # name -> (plan | None, pack_seconds)
    xs = {}                  # name -> benchmark x vector
    dasp_f32 = {}            # name -> dasp f32 GFLOP/s (deferred ratios)
    for name, csr in suite:
        xs[name] = np.random.default_rng(1).standard_normal(csr.n_cols)

    for dtype in dtypes:
        # f32/bf16 run cheapest-first (a kill costs the least data); the
        # LAST dtype pass runs most-expensive-first instead — round 3
        # lost livejournal f64 three rounds running because the priciest
        # arm sat at the very end of the whole suite (VERDICT r3), while
        # the small f64 arms it displaces finish in seconds.
        ordered = (suite if dtype != dtypes[-1]
                   else sorted(suite, key=lambda t: -t[1].nnz))
        for name, csr in ordered:
            x = xs[name]
            base_res, bdt = None, dtype
            if csr.nnz <= BCOO_RISK_NNZ:
                base_res, bdt = run_bcoo(name, dtype, csr, x)
            else:
                deferred_bcoo.append((name, dtype,
                                      "f32" if dtype == "f64" else dtype,
                                      csr, x))

            shared_plan, pre_shared = get_plan(name, csr)
            op = SpMVOperator(shared_plan if shared_plan is not None
                              else csr, dtype=dtype, config=config)
            # dasp_pre keeps the reference's semantics (full pack + setup
            # for this matrix+dtype as if run standalone)
            op.preprocess_seconds += pre_shared
            if op.plan is not None:
                op.plan.stats.setdefault("pack_seconds", pre_shared)
            if args.profile:
                import jax.profiler
                with jax.profiler.trace(args.profile):
                    loop = op.timing_loop(8)
                    np.asarray(jax.tree.leaves(loop(op._prep_x(x)))[0]
                               .ravel()[:4])
            try:
                res = bench_spmv(op, x, dtype, warmup=warmup, iters=iters)
            except Exception as e:
                # the tunneled runtime throws transient FailedPrecondition
                # errors; one retry recovers (observed 2026-08-17)
                print(f"# retrying {name} {dtype} after: {e}",
                      file=sys.stderr)
                res = bench_spmv(op, x, dtype, warmup=warmup, iters=iters)
            SUMMARY.gflops.append(res.gflops)
            SUMMARY.done += 1
            if dtype == "f32":
                dasp_f32[name] = res.gflops
                if base_res is not None:
                    SUMMARY.ratios.append(res.gflops / base_res.gflops)
            if op.plan is not None:   # slabbed operators carry no one plan
                append_record(f"{args.csv_dir}/spmv_{dtype}_record.csv",
                              record_from(op.plan, res, name, dtype,
                                          base_res, baseline_dtype=bdt,
                                          variant=("resident"
                                                   if getattr(op, "resident",
                                                              False)
                                                   else "streamed")))
                if getattr(op, "resident", False):
                    paired_arms.append((name, dtype, op.plan))
            print(f"# {name} {dtype}: {res.gflops:.2f} GFLOP/s "
                  f"({res.seconds_per_iter*1e6:.1f} us/iter, "
                  f"bw {res.bandwidth2_gbs:.1f} GB/s model2)"
                  + (f"  BCOO {bdt}: {base_res.gflops:.2f}"
                     if base_res else ""),
                  file=sys.stderr)
            SUMMARY.emit()

    # Every suite arm is recorded; now the PAIRED streamed rows for the
    # resident-eligible arms (both executor variants per matrix, like the
    # reference's two f16 kernels, dasp_f16.h:1542-1718).  These are
    # extra CSV rows, not summary arms — a deadline kill here still
    # leaves a complete 21-arm summary as the last JSON line.
    from dasp_tpu.ops.pallas_backend import PallasSpMV
    for name, dtype, plan in paired_arms:
        try:
            sop = PallasSpMV(plan, dtype=dtype, config=config,
                             force_streamed=True)
            sres = bench_spmv(sop, xs[name], dtype,
                              warmup=min(warmup, 20), iters=iters)
            append_record(f"{args.csv_dir}/spmv_{dtype}_record.csv",
                          record_from(plan, sres, name, dtype, None,
                                      baseline_dtype="",
                                      variant="streamed"))
            print(f"# {name} {dtype} paired streamed: "
                  f"{sres.gflops:.2f} GFLOP/s "
                  f"({sres.seconds_per_iter*1e6:.1f} us/iter)",
                  file=sys.stderr)
            del sop
        except Exception as e:
            print(f"# paired streamed failed on {name} {dtype}: {e}",
                  file=sys.stderr)

    # All dasp arms are recorded; now the risky outsized BCOO baselines
    # (a worker crash here can no longer lose any dasp measurement —
    # the complete summary is already the last JSON line).
    for name, dtype, bdt, csr, x in deferred_bcoo:
        base_res, _ = run_bcoo(name, dtype, csr, x)
        if base_res is not None:
            if dtype == "f32" and name in dasp_f32:
                SUMMARY.ratios.append(dasp_f32[name] / base_res.gflops)
            update_baseline(f"{args.csv_dir}/spmv_{dtype}_record.csv",
                            name, base_res, bdt)
            print(f"# {name} BCOO {bdt} (deferred): "
                  f"{base_res.gflops:.2f} GFLOP/s", file=sys.stderr)
            SUMMARY.emit()
    return 0


if __name__ == "__main__":
    sys.exit(main())
