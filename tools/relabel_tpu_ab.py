"""A/B the column relabel on the real TPU: wikitalk_like GFLOP/s.

Usage: python -u tools/relabel_tpu_ab.py off|on [matrix] [iters]
Run both arms back-to-back (the tunneled chip's speed drifts with time of
day, CLAUDE.md).
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from dasp_tpu.utils import enable_compile_cache

enable_compile_cache()

from dasp_tpu.bench.harness import bench_spmv
from dasp_tpu.bench.suite import SUITE
from dasp_tpu.config import DaspConfig
from dasp_tpu.ops.pallas_backend import PallasSpMV

arm = sys.argv[1] if len(sys.argv) > 1 else "on"
name = sys.argv[2] if len(sys.argv) > 2 else "wikitalk_like"
iters = int(sys.argv[3]) if len(sys.argv) > 3 else 300

rng = np.random.default_rng(0 + abs(hash(name)) % 1000)
csr = SUITE[name](rng)
cfg = DaspConfig(relabel={"on": "first_touch", "off": "off",
                          "auto": "auto"}[arm])
t0 = time.time()
op = PallasSpMV(csr, dtype="f32", config=cfg)
print(f"[{name} relabel={arm}] pack {time.time()-t0:.1f}s", flush=True)
x = rng.standard_normal(csr.n_cols)
res = bench_spmv(op, x, "f32", iters=iters)
print(f"[{name} relabel={arm}] {res.gflops:.2f} GF  "
      f"{res.seconds_per_iter*1e6:.1f} us/iter  "
      f"bw1={res.bandwidth1_gbs:.1f} GB/s", flush=True)
g = csr.spmv(x)
s = np.maximum(np.abs(g), 1.0)
print("max rel err", float(np.abs((op(x) - g) / s).max()), flush=True)
