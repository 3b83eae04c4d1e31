"""Benchmark harness smoke tests (CPU)."""

import numpy as np

from dasp_tpu import SpMVOperator
from dasp_tpu.bench import bench_spmv, geomean, record_from, BCOOBaseline
from dasp_tpu.sparse import mixed_categories


def test_bench_protocol_runs(rng, tmp_path):
    csr = mixed_categories(300, rng)
    x = rng.standard_normal(csr.n_cols)
    op = SpMVOperator(csr, dtype="f32", backend="xla")
    res = bench_spmv(op, x, "f32", iters=3)
    assert res.seconds_per_iter > 0
    assert res.gflops > 0
    row = record_from(op.plan, res, "t", "f32")
    assert row["nnzA"] == csr.nnz
    from dasp_tpu.bench import append_record
    p = tmp_path / "rec.csv"
    append_record(str(p), row)
    append_record(str(p), row)
    lines = p.read_text().strip().splitlines()
    assert len(lines) == 3 and lines[0].startswith("filename")


def test_bcoo_baseline_correct(rng):
    csr = mixed_categories(200, rng)
    x = rng.standard_normal(csr.n_cols)
    base = BCOOBaseline(csr, "f32")
    y = base(x)
    golden = csr.spmv(x)
    scale = np.maximum(np.abs(golden), 1.0)
    np.testing.assert_allclose(y / scale, golden / scale, rtol=2e-5,
                               atol=2e-5)


def test_geomean():
    assert abs(geomean([1.0, 4.0]) - 2.0) < 1e-12
    assert geomean([]) == 0.0
