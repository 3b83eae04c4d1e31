"""Time ONE suite arm through the real operator + harness on the TPU,
reusing the driver's plan cache.  Usage:
    python -u tools/arm_time.py [arm=rmat_like] [dtype=f32]
"""
import sys, glob, time
sys.path.insert(0, "/root/repo")
import numpy as np
from dasp_tpu.utils import enable_compile_cache
enable_compile_cache()
import jax
from dasp_tpu.bench.suite import build_suite
from dasp_tpu.bench import harness
from dasp_tpu.ops import pallas_backend as pb
from dasp_tpu.wplan import load_wplan
from bench import PLAN_CACHE_VER

name = sys.argv[1] if len(sys.argv) > 1 else "rmat_like"
csr = build_suite([name])[0][1]
pat = sorted(glob.glob(f".plan_cache/{name}_{csr.nnz}_*_v{PLAN_CACHE_VER}.npz"), reverse=True)[0]
plan = load_wplan(pat)
print("# plan", pat, flush=True)
dt = sys.argv[2] if len(sys.argv) > 2 else "f32"
op = pb.PallasSpMV(plan, dt)
print("resident", op.resident, flush=True)
rng = np.random.default_rng(0)
x = rng.standard_normal(csr.n_cols)
res = harness.bench_spmv(op, op.perm_in(x), dt, iters=64)
print(f"{name} {dt}: {res.seconds_per_iter*1e6:.1f} us/iter = "
      f"{res.gflops:.2f} GF (spread {res.spread:.2f}, n {res.timed_iters})",
      flush=True)
