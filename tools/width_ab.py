"""Same-window A/B: v1 (power-of-two W8 ladder) vs v2 (cost-argmin with
intermediate widths) pack plans on the real TPU.

Round-3 probe: the full-suite pass measured scircuit f32 at 39 GF where
round-2 best-window records said 83 GF — is that chip drift or a width-
class regression?  Loads both cached plans (identical matrix bytes) and
times them back-to-back in one process, so chip drift cancels.

Usage: python tools/width_ab.py [name] [dtype]
"""
import sys
import numpy as np

sys.path.insert(0, "/root/repo")
from dasp_tpu.wplan import load_wplan
from dasp_tpu.ops import pallas_backend as pb
from dasp_tpu.bench.harness import bench_spmv

name = sys.argv[1] if len(sys.argv) > 1 else "scircuit_like_958936"
dtype = sys.argv[2] if len(sys.argv) > 2 else "f32"

rng = np.random.default_rng(1)
ops = {}
for ver in ("v1", "v2"):
    plan = load_wplan(f".plan_cache/{name}_c1d8025a_{ver}.npz")
    op = pb.PallasSpMV(plan, dtype)
    ops[ver] = op
    print(f"{ver}: streams={[(s.P, s.stride, s.n_vregs) for s in plan.streams]}"
          f" resident={op.resident}", flush=True)

x = rng.standard_normal(ops["v1"].n_cols)
for rep in range(2):                       # interleaved: drift cancels
    for ver, op in ops.items():
        res = bench_spmv(op, x, dtype, iters=100, trials=2)
        print(f"rep{rep} {ver}: {res.gflops:.2f} GF "
              f"({res.seconds_per_iter*1e6:.1f} us/iter)", flush=True)
