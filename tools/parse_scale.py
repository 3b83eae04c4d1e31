"""Prove the native Matrix Market parser at benchmark scale.

Writes a suite arm out as a real .mtx file (reference surface: SuiteSparse
files fed to ``mmio_allinone``, /root/reference/src/mmio_highlevel.h:608-774),
parses it back through native/mmio.cpp, diffs the CSR against the generator
exactly, and reports parse throughput.  Usage:

    python -u tools/parse_scale.py [arm=livejournal_like] [path=/tmp/<arm>.mtx]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

from dasp_tpu.bench.suite import build_suite
from dasp_tpu.io import mmio, native

arm = sys.argv[1] if len(sys.argv) > 1 else "livejournal_like"
path = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/{arm}.mtx"

csr = build_suite([arm])[0][1]
print(f"{arm}: {csr.n_rows}x{csr.n_cols} nnz={csr.nnz}", flush=True)

if not os.path.exists(path):
    t0 = time.perf_counter()
    mmio.write_mtx(path, csr)
    print(f"write {time.perf_counter()-t0:.1f}s", flush=True)
size = os.path.getsize(path)
print(f"file {size/1e9:.2f} GB", flush=True)

assert native.available(), "native parser not built (make -C native)"
t0 = time.perf_counter()
got = native.read_mtx(path, dtype=np.float64)
dt = time.perf_counter() - t0
print(f"native parse {dt:.1f}s = {size/dt/1e6:.0f} MB/s "
      f"({csr.nnz/dt/1e6:.1f} Mnnz/s)", flush=True)

assert got.n_rows == csr.n_rows and got.n_cols == csr.n_cols
assert got.nnz == csr.nnz
np.testing.assert_array_equal(got.row_ptr, csr.row_ptr)
np.testing.assert_array_equal(got.col_idx, csr.col_idx)
# the native parser's branchless digit loop parses %.17g to within 1 ulp
# (digit*10 accumulation + power-of-ten scale, native/mmio.cpp) — the
# structure is exact, values to ~2^-52 relative
np.testing.assert_allclose(got.values, csr.values, rtol=1e-14, atol=0)
print("CSR match vs generator (structure exact, values <=1e-14 rel)",
      flush=True)
