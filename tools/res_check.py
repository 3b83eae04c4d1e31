"""One-arm resident-mode check on the real TPU: residency, correctness,
and timing for a named suite arm + dtype.

    timeout 570 python -u tools/res_check.py wikitalk_like f32
"""
import glob
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

name, dtype = sys.argv[1], sys.argv[2]

import jax  # noqa: E402
from dasp_tpu import SpMVOperator  # noqa: E402
from dasp_tpu.bench.suite import build_suite  # noqa: E402
from dasp_tpu.bench.harness import bench_spmv  # noqa: E402
from dasp_tpu.utils import enable_compile_cache  # noqa: E402
from dasp_tpu.wplan import load_wplan  # noqa: E402

enable_compile_cache()
print(f"# devices: {jax.devices()}", flush=True)

pairs = build_suite([name])
csr = pairs[0][1]
plan = None
hits = glob.glob(f".plan_cache/{name}_{csr.nnz}_*.npz")
if hits:
    plan = load_wplan(hits[0])
    print(f"# plan cache hit: {hits[0]}", flush=True)

t0 = time.perf_counter()
op = SpMVOperator(plan if plan is not None else csr, dtype=dtype)
print(f"# setup {time.perf_counter()-t0:.1f}s  resident={getattr(op, "resident", False)}",
      flush=True)

rng = np.random.default_rng(1)
x = rng.standard_normal(csr.n_cols)

# correctness vs CPU golden.  bf16: golden on bf16-rounded inputs, same
# as tests/test_spmv.py — the remaining deviation is accumulation error
# only (values stream bf16; a 100k-nnz row's value-rounding error is
# ~0.002*sqrt(k) absolute, which no fixed rel tol survives).
y = np.asarray(op(x))
if dtype == "bf16":
    import ml_dtypes
    from dasp_tpu.sparse import CSRMatrix
    rcsr = CSRMatrix(csr.n_rows, csr.n_cols, csr.row_ptr, csr.col_idx,
                     csr.values.astype(ml_dtypes.bfloat16).astype(np.float64))
    # x stays f32 in the kernel (prep_x) — round only the value stream
    ref = rcsr.spmv(x.astype(np.float32).astype(np.float64))
else:
    ref = csr.spmv(x.astype(np.float64))
tol = {"f32": 2e-5, "bf16": 3e-2, "f64": 1e-9}[dtype]
scale = np.maximum(np.abs(ref), 1.0)
err = float(np.max(np.abs(y - ref) / scale))
print(f"# max rel err {err:.3e} (tol {tol})  "
      f"{'OK' if err < tol else 'FAIL'}", flush=True)

res = bench_spmv(op, x, dtype, warmup=20, iters=100)
print(f"# {name} {dtype}: {res.gflops:.2f} GFLOP/s "
      f"({res.seconds_per_iter*1e6:.1f} us/iter, bw {res.bandwidth2_gbs:.1f} GB/s)",
      flush=True)
