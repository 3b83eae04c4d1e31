"""Sweep the two GPU-shaped packing constants on TPU (VERDICT r1 #6).

The reference hardcodes block_longest=256 and threshold=0.75, tuned for
8-row MMA fragments on sm_80 (``main_f64.cu:121-125``).  Nothing says
those are right for 128-lane strided slices; this sweep measures them.

    python tools/sweep_constants.py [arm ...]   # default: scircuit+webbase

block_longest is structurally capped at 256 on TPU: the widest SELL
slice is W8=32 vregs x 8 sublanes = 256 row slots (config.py validation),
so the reference's GPU default is also this design's ceiling — the sweep
explores DOWN plus the occupancy threshold.

Measurement: the tunneled chip drifts +-2x within minutes, so a
sequential sweep is uninterpretable (a first pass measured the SAME plan
at 334/118/52 GF across ten minutes).  Each candidate is therefore
INTERLEAVED with the default back-to-back, several alternations, and the
report is the ratio of per-pair minima — chip drift cancels to first
order.  A candidate whose plan signature equals the default's (identical
fill + stream shapes) is reported as "plan identical" without timing.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def _sig(plan):
    return (round(plan.stats["rate_fill0"], 6),
            tuple((s.P, s.stride, s.n_vregs) for s in plan.streams))


def main():
    from dasp_tpu.bench.suite import build_suite
    from dasp_tpu.bench import harness
    from dasp_tpu.config import DaspConfig
    from dasp_tpu.ops import pallas_backend as pb
    from dasp_tpu.utils import enable_compile_cache

    enable_compile_cache()
    arms = sys.argv[1:] or ["scircuit_like", "webbase_like"]
    combos = [(128, 0.75), (64, 0.75), (192, 0.75),
              (256, 0.6), (256, 0.9)]
    PAIRS = 3
    for name in arms:
        _, csr = build_suite([name])[0]
        x = np.random.default_rng(0).standard_normal(csr.n_cols)
        t0 = time.perf_counter()
        op0 = pb.PallasSpMV(csr, "f32", config=DaspConfig())
        print(f"{name} default 256/0.75: pack {time.perf_counter()-t0:.1f}s "
              f"fill {op0.plan.stats['rate_fill0']:.3f} "
              f"resident={int(bool(op0.resident))}", flush=True)
        x0 = op0._prep_x(x)
        for bl, th in combos:
            try:
                cfg = DaspConfig(block_longest=bl, threshold=th)
            except ValueError as e:
                print(f"{name} bl={bl} th={th}: invalid config ({e})",
                      flush=True)
                continue
            t0 = time.perf_counter()
            try:
                op = pb.PallasSpMV(csr, "f32", config=cfg)
            except Exception as e:                    # noqa: BLE001
                print(f"{name} bl={bl} th={th}: pack FAILED {e}",
                      flush=True)
                continue
            pack_s = time.perf_counter() - t0
            fill = op.plan.stats.get("rate_fill0", -1.0)
            if _sig(op.plan) == _sig(op0.plan):
                print(f"{name} bl={bl:4d} th={th:.2f}: plan IDENTICAL to "
                      f"default (fill {fill:.3f}) — not timed", flush=True)
                continue
            xc = op._prep_x(x)
            try:
                ratios = []
                for _ in range(PAIRS):
                    s_base = harness.time_loop(op0, x0, iters=100,
                                               trials=1)
                    s_cand = harness.time_loop(op, xc, iters=100,
                                               trials=1)
                    ratios.append(s_base / s_cand)
            except Exception as e:                    # noqa: BLE001
                print(f"{name} bl={bl} th={th}: run FAILED "
                      f"{str(e)[:120]}", flush=True)
                continue
            best = max(ratios)   # speedup of candidate vs default
            med = sorted(ratios)[len(ratios) // 2]
            print(f"{name} bl={bl:4d} th={th:.2f}: pack {pack_s:5.1f}s "
                  f"fill {fill:5.3f} resident={int(bool(op.resident))} "
                  f"speedup med {med:5.2f}x best {best:5.2f}x "
                  f"(>1 = candidate wins)", flush=True)


if __name__ == "__main__":
    main()
