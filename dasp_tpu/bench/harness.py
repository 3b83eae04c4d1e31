"""Benchmark harness: the reference's measurement protocol on TPU.

Timing mirrors ``dasp_f64.h:1285-1398``: N warmup iterations, M timed
iterations bracketed by full device synchronization (``block_until_ready``
playing the role of ``cudaDeviceSynchronize``), throughput = ``2*nnz/time``
GFLOP/s with padding FLOPs excluded (``dasp_f64.h:1395``), plus the two
bandwidth models (``dasp_f64.h:1162-1172``):
  * model 1: A values + column ids once, x and y once each;
  * model 2: same but x counted once per nonzero.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np

# Reference protocol (dasp_f64.h:1285-1286); override for quick runs.
WARMUP = 100
ITERS = 1000


@dataclasses.dataclass
class BenchResult:
    seconds_per_iter: float
    gflops: float
    bandwidth1_gbs: float
    bandwidth2_gbs: float
    preprocess_seconds: float = 0.0

    def as_dict(self) -> Dict[str, float]:
        return dataclasses.asdict(self)


def _val_bytes(dtype: str) -> int:
    return {"f32": 4, "bf16": 2, "f64": 8}[dtype]


def data_models(n_rows: int, n_cols: int, nnz: int, dtype: str):
    """The two data-volume models of ``dasp_f64.h:1162-1172`` (bytes)."""
    vb = _val_bytes(dtype)
    ib = 4
    data1 = nnz * (vb + ib) + (n_rows + n_cols) * vb
    data2 = nnz * (vb + ib + vb) + n_rows * vb
    return data1, data2


def time_fn(fn: Callable[[], object], warmup: int = WARMUP,
            iters: int = ITERS) -> float:
    """Average seconds per call, fully synchronized."""
    out = None
    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_spmv(op, x, dtype: str, warmup: int = WARMUP,
               iters: int = ITERS) -> BenchResult:
    """Benchmark an SpMVOperator (or any object with .device_call, ._prep_x,
    .n_rows/.n_cols/.nnz)."""
    x_dev = op._prep_x(x)
    sec = time_fn(lambda: op.device_call(x_dev), warmup, iters)
    d1, d2 = data_models(op.n_rows, op.n_cols, op.nnz, dtype)
    return BenchResult(
        seconds_per_iter=sec,
        gflops=2.0 * op.nnz / sec / 1e9,
        bandwidth1_gbs=d1 / sec / 1e9,
        bandwidth2_gbs=d2 / sec / 1e9,
        preprocess_seconds=getattr(op, "preprocess_seconds", 0.0))
