"""Sweep the two GPU-shaped packing constants on TPU (VERDICT r1 #6).

The reference hardcodes block_longest=256 and threshold=0.75, tuned for
8-row MMA fragments on sm_80 (``main_f64.cu:121-125``).  Nothing says
those are right for 128-lane strided slices; this sweep measures them.

    python tools/sweep_constants.py [arm ...]   # default: scircuit+webbase

Prints one line per (arm, block_longest, threshold): pack seconds, fill
rate, GFLOP/s from a 100-iteration in-jit loop (same protocol as
bench.py).  Run back-to-back — the tunneled chip drifts with time of
day, so only within-sweep comparisons are meaningful.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    from dasp_tpu.bench.suite import build_suite
    from dasp_tpu.bench import harness
    from dasp_tpu.config import DaspConfig
    from dasp_tpu.ops import pallas_backend as pb
    from dasp_tpu.utils import enable_compile_cache

    enable_compile_cache()
    arms = sys.argv[1:] or ["scircuit_like", "webbase_like"]
    combos = [(256, 0.75),           # reference defaults (baseline)
              (128, 0.75), (512, 0.75), (1024, 0.75),
              (256, 0.6), (256, 0.9)]
    for name in arms:
        _, csr = build_suite([name])[0]
        base = None
        for bl, th in combos:
            cfg = DaspConfig(block_longest=bl, threshold=th)
            t0 = time.perf_counter()
            try:
                op = pb.PallasSpMV(csr, "f32", config=cfg)
            except Exception as e:                    # noqa: BLE001
                print(f"{name} bl={bl} th={th}: pack FAILED {e}",
                      flush=True)
                continue
            pack_s = time.perf_counter() - t0
            fill = op.plan.stats.get("rate_fill0", -1.0)
            x = np.random.default_rng(0).standard_normal(csr.n_cols)
            try:
                sec = harness.time_loop(op, op._prep_x(x), iters=100)
            except Exception as e:                    # noqa: BLE001
                print(f"{name} bl={bl} th={th}: run FAILED "
                      f"{str(e)[:120]}", flush=True)
                continue
            gf = 2.0 * csr.nnz / sec / 1e9
            mark = ""
            if (bl, th) == (256, 0.75):
                base = gf
            elif base:
                mark = f"  ({(gf / base - 1) * 100:+.1f}% vs default)"
            print(f"{name} bl={bl:4d} th={th:.2f}: pack {pack_s:5.1f}s "
                  f"fill {fill:5.3f} resident={int(bool(op.resident))} "
                  f"{gf:6.1f} GF{mark}", flush=True)


if __name__ == "__main__":
    main()
