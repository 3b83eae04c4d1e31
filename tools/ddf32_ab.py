"""Same-window A/B of the dd f32-COLSUM tier (pallas_backend.DD_F32_COLSUM_P)
on the HBM-streamed f64 path — the round-3 lever for the round-heavy graph
arms (wikitalk/livejournal f64), where the dd VPU EFT chains, not the
gathers, bound the streams (docs/DESIGN.md §7b).  Streams with P >= the
threshold compute products and sublane sums in plain f32; downstream
reductions stay compensated dd.  Variants run interleaved so the tunneled
chip's time-of-day drift cancels.

Usage:  python tools/ddf32_ab.py [wikitalk_like ...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    names = sys.argv[1:] or ["wikitalk_like"]
    import jax
    from dasp_tpu.bench import bench_spmv, build_suite
    from dasp_tpu.ops import pallas_backend as pb
    from dasp_tpu.spmv import SpMVOperator
    from dasp_tpu.utils import enable_compile_cache
    from dasp_tpu.wplan import build_wplan
    from dasp_tpu.config import DEFAULT_CONFIG

    enable_compile_cache()
    print("# devices:", jax.devices(), file=sys.stderr)
    variants = (("off", 0), ("p8", 8), ("p1", 1))
    suite = build_suite(names)
    for name, csr in suite:
        t0 = time.perf_counter()
        plan = build_wplan(csr, DEFAULT_CONFIG)
        print(f"# {name}: packed in {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        rng = np.random.default_rng(1)
        x = rng.standard_normal(csr.n_cols)
        gold = csr.spmv(x)
        scale = np.max(np.abs(gold)) + 1e-30
        ops = {}
        pb.DD_F32_FORCE = True          # plan sizes vary; force the gate
        for tag, thresh in variants:
            pb.DD_F32_COLSUM_P = thresh
            ops[tag] = SpMVOperator(plan, dtype="f64")
            m = ops[tag]._meta
            print(f"# {name} {tag}: streams {m.streams} dd_f32 {m.dd_f32} "
                  f"resident={ops[tag].resident}", file=sys.stderr,
                  flush=True)
        err = np.max(np.abs(np.asarray(ops[variants[-1][0]](x), np.float64)
                            - gold)) / scale
        print(f"# {name} err({variants[-1][0]}) = {err:.2e}",
              file=sys.stderr, flush=True)
        for rep in range(3):
            for tag, _ in variants:
                res = bench_spmv(ops[tag], x, "f64", warmup=20, iters=50)
                print(f"{name} rep{rep} {tag}: {res.gflops:.2f} GF "
                      f"({res.seconds_per_iter*1e6:.0f} us)", flush=True)


if __name__ == "__main__":
    main()
