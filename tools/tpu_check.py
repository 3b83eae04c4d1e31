#!/usr/bin/env python
"""On-TPU verification sweep: every suite matrix x every dtype vs the CPU
golden.  Catches Mosaic-lowering issues that CPU interpret mode can't (run
manually; the pytest suite runs on simulated CPU devices).

Usage: python tools/tpu_check.py [suite names...]
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import dasp_tpu
    from dasp_tpu.bench.suite import SUITE, build_suite
    from dasp_tpu.sparse import random_csr

    names = sys.argv[1:] or list(SUITE)
    rng = np.random.default_rng(42)
    failures = 0

    extra = [
        ("tall", random_csr(4000, 300, rng.integers(0, 30, 4000), rng)),
        ("wide", random_csr(300, 300_000, rng.integers(1, 40, 300), rng)),
    ]
    cases = build_suite(names) + extra

    tol = {"f32": 1e-4, "bf16": 0.08, "f64": 1e-9}
    for name, csr in cases:
        x = rng.standard_normal(csr.n_cols)
        golden = csr.spmv(x)
        scale = np.maximum(np.abs(golden), 1.0)
        for dtype in ("f32", "bf16", "f64"):
            op = dasp_tpu.SpMVOperator(csr, dtype=dtype)
            y = np.asarray(op(x), dtype=np.float64)
            if dtype == "bf16":
                # the Pallas path rounds values to bf16 but keeps x in f32
                import ml_dtypes
                from dasp_tpu.sparse import CSRMatrix
                rcsr = CSRMatrix(csr.n_rows, csr.n_cols, csr.row_ptr,
                                 csr.col_idx,
                                 csr.values.astype(ml_dtypes.bfloat16)
                                 .astype(np.float64))
                golden_d = rcsr.spmv(x)
            else:
                golden_d = golden
            err = float(np.abs((y - golden_d) / scale).max())
            ok = err <= tol[dtype]
            failures += 0 if ok else 1
            print(f"{name:16s} {dtype:5s} err {err:.3e} "
                  f"{'OK' if ok else 'FAIL'}", flush=True)
    print("ALL OK" if failures == 0 else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
