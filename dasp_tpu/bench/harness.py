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
import math
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
    # relative max-min range of the per-trial differenced timings
    # (drift diagnostic; the CSV records it as dasp_spread)
    spread: float = 0.0
    # iteration count the adaptive loop actually timed with
    timed_iters: int = 0
    # wall time of the first (compiling) timing-loop invocations — split
    # from the host pack time so the CSV's dasp_pre can be decomposed into
    # pack_seconds + compile_seconds (the reference's f16 preprocessing
    # metric is host pack alone, dasp_f16.h:1021,1444-1446; compiles are
    # a TPU-runtime cost with no CUDA analog and amortize via the
    # persistent cache)
    compile_seconds: float = 0.0

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


def _sync(out) -> None:
    """Force completion.  Under the axon tunnel ``block_until_ready`` does
    not reliably wait for device work, so fetch a few real bytes."""
    leaves = jax.tree.leaves(out)
    if leaves:
        np.asarray(leaves[0].ravel()[:8])


_CALL_OVERHEAD: Optional[float] = None


def call_overhead() -> float:
    """Fixed per-jitted-call round-trip latency of this runtime (measured
    once).  ~30 ms under the axon TPU tunnel, ~50 us locally."""
    global _CALL_OVERHEAD
    if _CALL_OVERHEAD is None:
        import jax.numpy as jnp
        f = jax.jit(lambda v: v + 1.0)
        v = jnp.zeros(8, jnp.float32)
        _sync(f(v))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            _sync(f(v))
            ts.append(time.perf_counter() - t0)
        _CALL_OVERHEAD = min(ts)
    return _CALL_OVERHEAD


def time_fn(fn: Callable[[], object], warmup: int = WARMUP,
            iters: int = ITERS) -> float:
    """Average seconds per call, fully synchronized (includes per-call
    dispatch overhead; prefer ``time_loop`` for sub-ms kernels)."""
    out = None
    for _ in range(warmup):
        out = fn()
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / iters


# Runaway bound for the adaptive loop-length scaling below.
MAX_LOOP_ITERS = 200_000


def time_loop_stats(op, x_dev, iters: int = ITERS, trials: int = 3):
    """See _time_loop_stats; returns (seconds_per_iter, spread, n)."""
    per, spread, n, _ = _time_loop_stats(op, x_dev, iters, trials)
    return per, spread, n


def _time_loop_stats(op, x_dev, iters: int = ITERS, trials: int = 3):
    """Seconds per SpMV using the operator's in-jit timing loop: N chained
    iterations run in ONE device call (the reference's 100-warmup/1000-iter
    protocol, dasp_f64.h:1285-1286, adapted to a runtime with per-call
    dispatch overhead).  Returns ``(seconds_per_iter, spread, n)`` where
    ``spread`` is the relative max-min range of the per-trial differenced
    timings (0 = perfectly repeatable; the tunneled chip's speed drifts
    +-2x with time of day, so the CSV records this next to the number).

    Two loop lengths (N and 2N) are timed back to back and DIFFERENCED so
    the ~26 ms per-call overhead cancels — subtracting a separately
    measured overhead estimate is catastrophically noise-sensitive when
    the whole N-iteration loop wall is comparable to the overhead.

    N is scaled ADAPTIVELY until the differenced real work itself
    dominates the overhead (>= ~6x): with N too small the difference is
    a few ms riding on two ~26 ms calls, and a single vCPU burst between
    the back-to-back calls fabricates a 10-40x outlier (observed:
    scircuit bf16 "1722 us/iter" vs its true ~60 us).  The iteration
    count is a runtime scalar to the jitted loop, so rescaling costs no
    recompile."""
    ovh = call_overhead()
    floor = max(6.0 * ovh, 0.02)
    n = max(iters, 1)
    loop1 = op.timing_loop(n)
    loop2 = op.timing_loop(2 * n)
    tc0 = time.perf_counter()
    _sync(loop1(x_dev))         # compile + warm caches
    _sync(loop2(x_dev))
    compile_s = time.perf_counter() - tc0
    for _ in range(3):          # probe, rescale while under the floor
        t0 = time.perf_counter()
        _sync(loop1(x_dev))
        t1 = time.perf_counter()
        _sync(loop2(x_dev))
        t2 = time.perf_counter()
        d = (t2 - t1) - (t1 - t0)
        if d >= floor or 2 * n >= MAX_LOOP_ITERS:
            break
        # optimistic per-iter estimate (fastest window seen) -> the N
        # whose differenced work lands ~1.5x past the floor
        per_est = max(d, (t1 - t0) - ovh) / n
        if per_est <= 0:
            per_est = (t1 - t0) / (4.0 * n)
        n_new = int(min(max(math.ceil(1.5 * floor / per_est), 2 * n),
                        MAX_LOOP_ITERS // 2))
        n = n_new
        loop1 = op.timing_loop(n)
        loop2 = op.timing_loop(2 * n)
        _sync(loop1(x_dev))
        _sync(loop2(x_dev))
    # Difference WITHIN each trial (back-to-back loop1/loop2 runs see the
    # same chip state under the drift; differencing independent per-loop
    # minima could pair timings from different drift regimes and bias or
    # negate the difference).
    diffs = []
    best1 = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        _sync(loop1(x_dev))
        t1 = time.perf_counter()
        _sync(loop2(x_dev))
        t2 = time.perf_counter()
        diffs.append((t2 - t1) - (t1 - t0))
        best1 = min(best1, t1 - t0)
    pos = sorted(d for d in diffs if d > 0)
    if pos:
        # median, NOT min: under the chip's +-2x drift the distribution of
        # per-trial differences is wide, and min-of-positive picks the
        # near-zero outliers — a quick run once "measured" a dd plan at
        # 3x its f32 sibling (physically impossible).  The median is
        # drift-robust and still cancels the ~26 ms dispatch overhead.
        med = pos[len(pos) // 2]
        per = med / n
        spread = (pos[-1] - pos[0]) / med if len(pos) > 1 else 0.0
    else:                       # noise swamped the difference: fall back
        per = max(best1 - call_overhead(), 1e-9) / (n + 1)
        spread = float("inf")
    return per, spread, n, compile_s


def time_loop(op, x_dev, iters: int = ITERS, trials: int = 3) -> float:
    return time_loop_stats(op, x_dev, iters, trials)[0]


def bench_spmv(op, x, dtype: str, warmup: int = WARMUP,
               iters: int = ITERS, trials: int = 3) -> BenchResult:
    """Benchmark an SpMVOperator (or any object with .timing_loop, ._prep_x,
    .n_rows/.n_cols/.nnz)."""
    del warmup  # the in-jit loop needs no separate warmup phase
    x_dev = op._prep_x(x)
    sec, spread, n, compile_s = _time_loop_stats(op, x_dev, iters, trials)
    d1, d2 = data_models(op.n_rows, op.n_cols, op.nnz, dtype)
    return BenchResult(
        seconds_per_iter=sec,
        gflops=2.0 * op.nnz / sec / 1e9,
        bandwidth1_gbs=d1 / sec / 1e9,
        bandwidth2_gbs=d2 / sec / 1e9,
        preprocess_seconds=getattr(op, "preprocess_seconds", 0.0),
        spread=spread, timed_iters=n, compile_seconds=compile_s)
