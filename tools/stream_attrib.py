"""Per-stream colsum attribution on the real TPU: time each (P, stride,
NV) stream's colsum alone in an in-jit loop, so the plan's round-class
cost structure is measured, not modeled.  Round-4 livejournal ask
(VERDICT r3 item 1): where do the 6.2 ms/iter go?

Usage: python -u tools/stream_attrib.py [matrix] [iters]
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
from dasp_tpu.ops.pallas_backend import _make_colsum

name = sys.argv[1] if len(sys.argv) > 1 else "livejournal_like"
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
meta, arrays = pb.plan_to_arrays(plan if plan is not None
                                 else pb.build_wplan(csr))
arrays = jax.device_put(arrays)
x2d = jax.device_put(pb.prep_x(meta, rng.standard_normal(csr.n_cols)))
co = call_overhead()


def stream_loop(si):
    P, stride, NV = meta.streams[si]
    call = _make_colsum(P, meta.s_rows, NV, meta.interpret, stride)

    @jax.jit
    def loop(st, x2d):
        def body(_, x2d):
            p = call(st["wins"], st["vals"], st["idx"], x2d)
            return x2d + p[0, 0] * jnp.float32(1e-36)
        return jax.lax.fori_loop(0, iters, body, x2d)

    return loop


tot = 0.0
print(f"{'si':>3} {'P':>4} {'st':>3} {'NV':>7} {'us/iter':>9} "
      f"{'ns/vreg':>8} {'GB/s':>7}")
for si, (P, stride, NV) in enumerate(meta.streams):
    loop = stream_loop(si)
    st = arrays["streams"][si]
    np.asarray(loop(st, x2d)[:1, :8])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(st, x2d)[:1, :8])
        best = min(best, (time.perf_counter() - t0 - co) / iters)
    tot += best
    by = NV * 8 * 128 * 6
    print(f"{si:>3} {P:>4} {stride:>3} {NV:>7} {best*1e6:>9.2f} "
          f"{best/NV*1e9:>8.2f} {by/best/1e9:>7.1f}", flush=True)
print(f"sum of stream times: {tot*1e6:.1f} us/iter")
