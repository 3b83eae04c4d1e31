"""Pack one suite arm and print the plan's fill/stream statistics.

Usage: python tools/packstat.py <arm> [--save <path>]

Prints the per-kind slot/element split the CSV schema records
(fill0_nnz_reg / nnz_irreg etc.), the per-stream (P, stride, vregs)
table, and the COO residue — the host-side half of a perf A/B (the
device half is bench.py --names <arm>).
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "livejournal_like"
    from dasp_tpu.bench.suite import build_suite
    from dasp_tpu.config import DEFAULT_CONFIG
    from dasp_tpu.wplan import build_wplan, save_wplan
    from dasp_tpu.utils import gc_paused

    [(_nm, csr)] = build_suite([name])
    print(f"{name}: {csr.n_rows}x{csr.n_cols} nnz={csr.nnz}", flush=True)
    t0 = time.time()
    plan = build_wplan(csr, DEFAULT_CONFIG)
    dt = time.time() - t0
    plan.stats["pack_seconds"] = dt
    print(f"pack {dt:.1f}s", flush=True)
    st, c = plan.stats, plan.census
    print(f"census: {c}")
    for k in ("origin_nnz_reg", "fill0_nnz_reg", "nnz_irreg",
              "fill0_nnz_short", "fill0_nnz_long", "rate_fill0"):
        print(f"  {k:18s} {st.get(k)}")
    tot_slots = sum(s.vals.size for s in plan.streams)
    tot_vregs = sum(s.n_vregs for s in plan.streams)
    print(f"  total slots {tot_slots} ({tot_slots/max(plan.nnz,1):.2f} "
          f"slots/nnz), vregs {tot_vregs}")
    print(f"  residue {plan.overflow.nnz if plan.overflow is not None else 0}"
          f"  row_perm!=col_perm: "
          f"{plan.row_perm is not None and plan.col_perm is not None and not np.array_equal(plan.row_perm, plan.col_perm)}")
    print("  streams (P, stride, vregs, fill%):")
    pcost = 0
    for s in plan.streams:
        nz = int(np.count_nonzero(s.vals))
        pcost += s.P * s.n_vregs
        print(f"    P={s.P:4d} s={s.stride}  nv={s.n_vregs:7d}  "
              f"fill {100.0*nz/max(s.vals.size,1):5.1f}%")
    print(f"  P-cost (sum P*nv) {pcost}")
    if "--save" in sys.argv:
        path = sys.argv[sys.argv.index("--save") + 1]
        gc_paused(save_wplan)(plan, path)
        print(f"saved -> {path}")


if __name__ == "__main__":
    main()
