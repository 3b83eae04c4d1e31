#!/usr/bin/env python
"""DASP-TPU benchmark driver.

Runs the packed SpMV on the benchmark suite on the available accelerator,
against the jax.experimental.sparse BCOO baseline (the role cuSPARSE plays
in ``main_f64.cu:19-100``), with the reference's warmup+timed protocol
(``dasp_f64.h:1285-1286``).

Prints ONE summary JSON line:
  {"metric": "spmv_gflops_geomean", "value": <geomean dasp GFLOP/s over the
   suite x {f32, bf16, f64}>, "unit": "GFLOP/s",
   "vs_baseline": <geomean speedup of dasp-f32 over BCOO-f32>}
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


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
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of one timed run "
                         "into DIR (the reference ships -lineinfo for "
                         "nsight, Makefile:10; this is the TPU analog)")
    ap.add_argument("--mtx", nargs="*", default=None,
                    help="benchmark these .mtx files instead of the suite")
    args = ap.parse_args()

    import jax
    from dasp_tpu import SpMVOperator, load_matrix
    from dasp_tpu.bench import (BCOOBaseline, append_record, bench_spmv,
                                build_suite, geomean, record_from)
    from dasp_tpu.utils import enable_compile_cache

    enable_compile_cache()

    print(f"# devices: {jax.devices()}", file=sys.stderr)
    warmup = args.warmup if args.warmup is not None else (10 if args.quick
                                                          else 100)
    iters = args.iters if args.iters is not None else (50 if args.quick
                                                       else 300)
    dtypes = args.dtypes.split(",")

    if args.mtx:
        suite = [(p.rsplit("/", 1)[-1], load_matrix(p)) for p in args.mtx]
    else:
        names = args.names.split(",") if args.names else None
        if args.quick and not names:
            names = ["cop20k_like", "wikitalk_like"]
        suite = build_suite(names)

    all_gflops = []
    ratios = []
    for name, csr in suite:
        rng = np.random.default_rng(1)
        x = rng.standard_normal(csr.n_cols)

        base_res = None
        # BCOO's buffers at >19M nnz crashed the TPU worker process
        # (which poisons every later arm); the baseline ratio is already
        # established on the default suite
        if csr.nnz <= 19_000_000:
            try:
                base = BCOOBaseline(csr, "f32")
                base_res = bench_spmv(base, x, "f32",
                                      warmup=min(warmup, 10),
                                      iters=min(iters, 100))
            except Exception as e:  # baseline may be unsupported
                print(f"# BCOO baseline failed on {name}: {e}",
                      file=sys.stderr)

        for dtype in dtypes:
            op = SpMVOperator(csr, dtype=dtype)
            if args.profile:
                import jax.profiler
                with jax.profiler.trace(args.profile):
                    loop = op.timing_loop(8)
                    import numpy as _np
                    _np.asarray(jax.tree.leaves(loop(op._prep_x(x)))[0]
                                .ravel()[:4])
            try:
                res = bench_spmv(op, x, dtype, warmup=warmup, iters=iters)
            except Exception as e:
                # the tunneled runtime throws transient FailedPrecondition
                # errors; one retry recovers (observed 2026-08-17)
                print(f"# retrying {name} {dtype} after: {e}",
                      file=sys.stderr)
                res = bench_spmv(op, x, dtype, warmup=warmup, iters=iters)
            all_gflops.append(res.gflops)
            if dtype == "f32" and base_res is not None:
                ratios.append(res.gflops / base_res.gflops)
            append_record(f"{args.csv_dir}/spmv_{dtype}_record.csv",
                          record_from(op.plan, res, name, dtype,
                                      base_res if dtype == "f32" else None))
            print(f"# {name} {dtype}: {res.gflops:.2f} GFLOP/s "
                  f"({res.seconds_per_iter*1e6:.1f} us/iter, "
                  f"bw {res.bandwidth2_gbs:.1f} GB/s model2)"
                  + (f"  BCOO: {base_res.gflops:.2f}"
                     if dtype == "f32" and base_res else ""),
                  file=sys.stderr)

    value = geomean(all_gflops)
    vs = geomean(ratios) if ratios else 0.0
    print(json.dumps({"metric": "spmv_gflops_geomean",
                      "value": round(value, 3),
                      "unit": "GFLOP/s",
                      "vs_baseline": round(vs, 3)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
