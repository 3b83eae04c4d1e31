"""Same-window A/B of the fused multi-stream colsum (DASP_FUSED_COLSUM)
on the real TPU: the same cached plan timed through two operators, one
traced with the per-stream kernels, one with the fused kernel,
interleaved.

Usage: python -u tools/fused_ab.py [matrix] [reps]
"""
import glob
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from dasp_tpu.utils import enable_compile_cache

enable_compile_cache()

from dasp_tpu.bench.harness import time_loop_stats
from dasp_tpu.ops import pallas_backend as pb
from dasp_tpu.wplan import load_wplan

name = sys.argv[1] if len(sys.argv) > 1 else "livejournal_like"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

from bench import PLAN_CACHE_VER
from dasp_tpu.bench.suite import build_suite

csr = build_suite([name])[0][1]
rng = np.random.default_rng(0)
x = rng.standard_normal(csr.n_cols)
nnz2 = 2.0 * csr.nnz

plans = sorted(glob.glob(f".plan_cache/{name}_{csr.nnz}_*_v"
                         f"{PLAN_CACHE_VER}.npz"), reverse=True)
plan = load_wplan(plans[0])
print(f"# plan: {plans[0]}", flush=True)

ops = {}
for tag, flag in (("perstream", False), ("fused", True)):
    pb.FUSED_COLSUM = flag
    op = pb.PallasSpMV(plan, dtype="f32")
    xd = op._prep_x(x)
    per, spread, n = time_loop_stats(op, xd)   # traces with current flag
    ops[tag] = (op, xd)
    print(f"[{name}] {tag} warm: {per * 1e6:8.2f} us/iter "
          f"({nnz2 / per / 1e9:6.2f} GF, spread {spread:.3f})",
          flush=True)

for rep in range(reps):
    for tag, (op, xd) in ops.items():
        per, spread, n = time_loop_stats(op, xd)
        print(f"[{name}] {tag} pass{rep}: {per * 1e6:8.2f} us/iter "
              f"({nnz2 / per / 1e9:6.2f} GF, spread {spread:.3f}, n={n})",
              flush=True)
