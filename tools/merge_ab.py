"""Back-to-back A/B of the s_rows-aware stream merge (PLAN_CACHE_VER
5 -> 6) on the real TPU: time the cached v5 plan, repack with the new
merge, time the v6 plan in the same process, interleaved (chip drift
makes separate runs incomparable; CLAUDE.md).

Usage: python -u tools/merge_ab.py [matrix]
"""
import glob
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from dasp_tpu.utils import enable_compile_cache

enable_compile_cache()

from dasp_tpu.bench.harness import time_loop_stats
from dasp_tpu.ops.pallas_backend import PallasSpMV
from dasp_tpu.wplan import build_wplan, load_wplan, save_wplan

name = sys.argv[1] if len(sys.argv) > 1 else "livejournal_like"

from dasp_tpu.bench.suite import build_suite

csr = build_suite([name])[0][1]
rng = np.random.default_rng(0)
x = rng.standard_normal(csr.n_cols)
nnz2 = 2.0 * csr.nnz

old = sorted(glob.glob(f".plan_cache/{name}_{csr.nnz}_*_v5.npz"),
             reverse=True)
plan5 = load_wplan(old[0]) if old else None
print(f"# v5 plan: {old[0] if old else 'MISSING (skipping A side)'}",
      flush=True)

new = sorted(glob.glob(f".plan_cache/{name}_{csr.nnz}_*_v6.npz"),
             reverse=True)
if new:
    plan6 = load_wplan(new[0])
    print(f"# v6 plan cache hit: {new[0]}", flush=True)
else:
    t0 = time.time()
    plan6 = build_wplan(csr)
    print(f"# v6 pack {time.time() - t0:.1f}s", flush=True)
    if old:
        save_wplan(plan6, old[0].replace("_v5.npz", "_v6.npz"))
print(f"# v6 streams="
      f"{[(s.P, s.stride, s.vals.shape[0] // 8) for s in plan6.streams]}",
      flush=True)

ops = {}
for tag, plan in (("v5", plan5), ("v6", plan6)):
    if plan is None:
        continue
    op = PallasSpMV(plan, dtype="f32")
    ops[tag] = (op, op._prep_x(x))

for rep in range(2):
    for tag, (op, xd) in ops.items():
        per, spread, n = time_loop_stats(op, xd)
        print(f"[{name}] {tag} pass{rep}: {per * 1e6:8.2f} us/iter "
              f"({nnz2 / per / 1e9:6.2f} GF, spread {spread:.3f}, "
              f"n={n})", flush=True)
