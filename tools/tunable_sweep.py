"""Sweep the reference's GPU-shaped constants on TPU (VERDICT r1 #6).

block_longest=256 / threshold=0.75 were tuned for 8-row GPU MMA
fragments (main_f64.cu:121-125); this sweeps them for 128-lane slices:
axis sweeps around the default, same-window back-to-back timing.

Usage: python -u tools/tunable_sweep.py [matrix ...]
"""
import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from dasp_tpu.utils import enable_compile_cache

enable_compile_cache()

from dasp_tpu.bench.harness import bench_spmv
from dasp_tpu.bench.suite import SUITE
from dasp_tpu.config import DEFAULT_CONFIG
from dasp_tpu.ops import pallas_backend as pb

mats = sys.argv[1:] or ["cop20k_like", "webbase_like"]
CONFIGS = [
    ("default-256/0.75", {}),
    ("bl=128", {"block_longest": 128}),
    ("bl=512", {"block_longest": 512}),
    ("bl=1024", {"block_longest": 1024}),
    ("th=0.6", {"threshold": 0.6}),
    ("th=0.9", {"threshold": 0.9}),
]

for name in mats:
    rng = np.random.default_rng(0 + abs(hash(name)) % 1000)
    csr = SUITE[name](rng)
    x = rng.standard_normal(csr.n_cols)
    g = csr.spmv(x)
    for tag, over in CONFIGS:
        cfg = dataclasses.replace(DEFAULT_CONFIG, **over)
        t0 = time.perf_counter()
        op = pb.PallasSpMV(csr, "f32", cfg)
        pre = time.perf_counter() - t0
        rel = np.abs(op(x) - g) / np.maximum(1.0, np.abs(g))
        res = bench_spmv(op, x, "f32", iters=100)
        print(f"{name:15s} {tag:16s}: {res.gflops:7.2f} GF "
              f"({res.seconds_per_iter*1e6:7.1f} us) pre {pre:5.1f}s "
              f"err {rel.max():.1e} resident={op.resident}", flush=True)
