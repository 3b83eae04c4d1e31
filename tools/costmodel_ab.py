"""Same-window A/B: DASP_COST_MODEL=slots (shipped default) vs =ns
(round-aware) width/stride selection, on the real TPU.

VERDICT r3 item 3: the ns model (price gather rounds, not just slots;
calibrated NS_A/NS_B in wplan.py) exists behind an env var but was never
A/B'd to a decision.  Builds both plans per matrix in-process (the env
var is read at pack time), then times them interleaved so chip drift
cancels.

Usage: python -u tools/costmodel_ab.py [names...] [--dtype f32]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from dasp_tpu.utils import enable_compile_cache

enable_compile_cache()

names = [a for a in sys.argv[1:] if not a.startswith("--")] or \
    ["poisson3d_fem", "cop20k_like", "scircuit_like"]
dtype = "f32"
for a in sys.argv[1:]:
    if a.startswith("--dtype="):
        dtype = a.split("=", 1)[1]

from dasp_tpu.bench import build_suite
from dasp_tpu.bench.harness import bench_spmv
from dasp_tpu.config import DEFAULT_CONFIG
from dasp_tpu.ops import pallas_backend as pb
from dasp_tpu.wplan import build_wplan

suite = dict(build_suite(names))

for name in names:
    csr = suite[name]
    ops = {}
    for model in ("slots", "ns"):
        os.environ["DASP_COST_MODEL"] = model
        t0 = time.perf_counter()
        plan = build_wplan(csr, DEFAULT_CONFIG)   # itself gc_paused
        dt = time.perf_counter() - t0
        op = pb.PallasSpMV(plan, dtype)
        ops[model] = op
        sl = sum(s.n_vregs * 1024 for s in plan.streams)
        print(f"{name} {model}: pack {dt:.1f}s, "
              f"vregs={sum(s.n_vregs for s in plan.streams)}, "
              f"slots/nnz={sl/csr.nnz:.2f}, "
              f"P-cost={sum(s.P * s.n_vregs for s in plan.streams)}, "
              f"streams={[(s.P, s.stride, s.n_vregs) for s in plan.streams]}"
              f" resident={op.resident}", flush=True)
    os.environ.pop("DASP_COST_MODEL", None)
    x = np.random.default_rng(1).standard_normal(csr.n_cols)
    for rep in range(3):                    # interleaved: drift cancels
        for model, op in ops.items():
            res = bench_spmv(op, x, dtype, iters=100, trials=2)
            print(f"{name} rep{rep} {model}: {res.gflops:.2f} GF "
                  f"({res.seconds_per_iter*1e6:.1f} us/iter)", flush=True)
