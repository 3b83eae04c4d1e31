"""A/B: real spmv_fn under static vs traced loop bound on the real TPU.

Isolates the rmat_like 12x discrepancy (ablate replica 5.2 ms/iter with a
static fori_loop vs recorded 63 ms/iter through the operator's traced-bound
while_loop timing loop).  Usage: python -u tools/loop_ab.py [matrix] [iters]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from dasp_tpu.utils import enable_compile_cache

enable_compile_cache()

from dasp_tpu.bench.harness import call_overhead
from dasp_tpu.ops import pallas_backend as pb

name = sys.argv[1] if len(sys.argv) > 1 else "rmat_like"
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 200

from dasp_tpu.bench.suite import build_suite
csr = build_suite([name])[0][1]
rng = np.random.default_rng(0)
plan = None
import glob
from bench import PLAN_CACHE_VER
for pat in sorted(glob.glob(f".plan_cache/{name}_{csr.nnz}_*_v"
                            f"{PLAN_CACHE_VER}.npz"), reverse=True):
    try:
        from dasp_tpu.wplan import load_wplan
        plan = load_wplan(pat)
        print(f"# plan cache hit: {pat}", flush=True)
        break
    except Exception:
        pass
if plan is None:
    plan = pb.build_wplan(csr)
meta, arrays = pb.plan_to_arrays(plan)
arrays = jax.device_put(arrays)
x2d = jax.device_put(pb.prep_x(meta, rng.standard_normal(csr.n_cols)))


def body(_, x2d):
    y = pb.spmv_fn(meta, arrays, x2d)
    tap = (y["hi"] if isinstance(y, dict) else y)[0]
    tap = tap.astype(jnp.float32) * jnp.float32(1e-36)
    return x2d + tap


@jax.jit
def loop_static(arrays, x2d):
    x2d = jax.lax.fori_loop(0, iters, body, x2d)
    return pb.spmv_fn(meta, arrays, x2d)


@jax.jit
def loop_traced(arrays, x2d, it):
    x2d = jax.lax.fori_loop(0, it, body, x2d)
    return pb.spmv_fn(meta, arrays, x2d)


co = call_overhead()
for label, call in (
        ("static", lambda: loop_static(arrays, x2d)),
        ("traced", lambda: loop_traced(arrays, x2d, jnp.int32(iters)))):
    t0 = time.perf_counter()
    np.asarray(jax.tree.leaves(call())[0].ravel()[:4])
    print(f"[{name}] {label} compile+run {time.perf_counter()-t0:.1f}s",
          flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(call())[0].ravel()[:4])
        best = min(best, time.perf_counter() - t0)
    per = max(best - co, 0) / (iters + 1)
    print(f"[{name}] {label:7s}: {per*1e6:9.2f} us/iter", flush=True)
