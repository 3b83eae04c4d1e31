"""Same-window A/B of the dd lo-value stream dtype (f32 vs bf16) on the
HBM-streamed f64 path — the VERDICT r1 item 8 lever for the graph arms
(webbase/wikitalk dd streams can't go VMEM-resident; the lo stream is 40%
of their HBM traffic).  Variants run interleaved so the tunneled chip's
time-of-day drift cancels.

Usage:  python tools/ddlo_ab.py [webbase_like wikitalk_like ...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    names = sys.argv[1:] or ["webbase_like"]
    import jax
    from dasp_tpu.bench import bench_spmv, build_suite
    from dasp_tpu.ops import pallas_backend as pb
    from dasp_tpu.spmv import SpMVOperator
    from dasp_tpu.utils import enable_compile_cache
    from dasp_tpu.wplan import build_wplan
    from dasp_tpu.config import DEFAULT_CONFIG

    enable_compile_cache()
    print("# devices:", jax.devices(), file=sys.stderr)
    suite = build_suite(names)
    for name, csr in suite:
        t0 = time.perf_counter()
        plan = build_wplan(csr, DEFAULT_CONFIG)
        print(f"# {name}: packed in {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        rng = np.random.default_rng(1)
        x = rng.standard_normal(csr.n_cols)
        ops = {}
        for tag, gate in (("f32lo", 1 << 62), ("bf16lo", 0)):
            pb.DD_LO16_MIN_BYTES = gate
            ops[tag] = SpMVOperator(plan, dtype="f64")
            lo_dt = {str(e["vals_lo"].dtype)
                     for e in ops[tag]._arrays["streams"]}
            print(f"# {name} {tag}: lo dtypes {lo_dt} "
                  f"resident={ops[tag].resident}", file=sys.stderr)
        for rep in range(3):
            for tag in ("f32lo", "bf16lo"):
                res = bench_spmv(ops[tag], x, "f64", warmup=20, iters=50)
                print(f"{name} rep{rep} {tag}: {res.gflops:.2f} GF "
                      f"({res.seconds_per_iter*1e6:.0f} us)", flush=True)


if __name__ == "__main__":
    main()
