"""Multi-chip row-partitioned SpMV on 8 simulated host devices."""

import jax
import numpy as np
import pytest

from dasp_tpu.parallel import MultiChipSpMV, partition_rows, slab_csr
from dasp_tpu.sparse import mixed_categories, powerlaw_like, random_csr


def test_partition_balanced(rng):
    csr = powerlaw_like(1000, 1.9, 3000, rng)
    slabs = partition_rows(csr, 8)
    assert slabs[0][0] == 0 and slabs[-1][1] == csr.n_rows
    for (a, b), (c, d) in zip(slabs, slabs[1:]):
        assert b == c
    nnzs = [int(csr.row_ptr[e] - csr.row_ptr[s]) for s, e in slabs]
    assert sum(nnzs) == csr.nnz
    # No slab should exceed ~2x the mean (loose balance check, long rows
    # can't be split across slabs).
    assert max(nnzs) <= 2.5 * csr.nnz / 8 + max(csr.row_lengths)


def test_slab_extraction(rng):
    csr = mixed_categories(300, rng)
    sub = slab_csr(csr, 50, 120)
    sub.check()
    np.testing.assert_array_equal(sub.to_dense(), csr.to_dense()[50:120])


@pytest.mark.parametrize("dtype", ["f32", "f64"])
def test_multichip_matches_golden(rng, dtype):
    assert len(jax.devices()) == 8, "conftest must provide 8 host devices"
    csr = mixed_categories(900, rng)
    op = MultiChipSpMV(csr, dtype=dtype)
    assert op.n_devices == 8
    x = rng.standard_normal(csr.n_cols)
    y = op(x)
    golden = csr.spmv(x)
    scale = np.maximum(np.abs(golden), 1.0)
    # dd remainder tails renormalize via a separate scatter buffer +
    # dd.add combine (xla_backend._remainder_scatter), so the multi-chip
    # executor holds full dd accuracy like the single-chip path.
    tol = 1e-5 if dtype == "f32" else 1e-10
    np.testing.assert_allclose(y / scale, golden / scale, rtol=tol, atol=tol)


def test_multichip_powerlaw(rng):
    csr = powerlaw_like(800, 1.8, 4000, rng)
    op = MultiChipSpMV(csr, dtype="f32")
    x = rng.standard_normal(csr.n_cols)
    golden = csr.spmv(x)
    scale = np.maximum(np.abs(golden), 1.0)
    np.testing.assert_allclose(op(x) / scale, golden / scale,
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("dtype", ["f32", "f64"])
def test_windowed_multichip_matches_golden(rng, dtype):
    """Row-partitioned multi-chip SpMV on the windowed Pallas backend:
    per-chip plans harmonized to one shape signature, x allgathered."""
    from dasp_tpu.parallel import WMultiChipSpMV
    csr = mixed_categories(1200, rng)
    op = WMultiChipSpMV(csr, dtype=dtype)
    assert op.n_devices == 8
    x = rng.standard_normal(csr.n_cols)
    y = op(x)
    golden = csr.spmv(x)
    scale = np.maximum(np.abs(golden), 1.0)
    tol = 2e-5 if dtype == "f32" else 1e-10
    np.testing.assert_allclose(y / scale, golden / scale, rtol=tol, atol=tol)


def test_windowed_multichip_powerlaw(rng):
    from dasp_tpu.parallel import WMultiChipSpMV
    csr = powerlaw_like(2000, 1.8, 4000, rng, col_alpha=1.6)
    op = WMultiChipSpMV(csr, dtype="f32")
    x = rng.standard_normal(csr.n_cols)
    golden = csr.spmv(x)
    scale = np.maximum(np.abs(golden), 1.0)
    np.testing.assert_allclose(op(x) / scale, golden / scale,
                               rtol=2e-5, atol=2e-5)


def test_windowed_multichip_relabel(rng):
    """Global column relabel composes with the row-partitioned multichip
    path (one shared perm, applied in _prep_x before sharding)."""
    from dasp_tpu.config import DaspConfig
    from dasp_tpu.parallel import WMultiChipSpMV
    csr = powerlaw_like(2000, 1.8, 4000, rng, col_alpha=1.6)
    op = WMultiChipSpMV(csr, dtype="f32",
                        config=DaspConfig(relabel="first_touch"))
    assert op.col_perm is not None
    x = rng.standard_normal(csr.n_cols)
    golden = csr.spmv(x)
    scale = np.maximum(np.abs(golden), 1.0)
    np.testing.assert_allclose(op(x) / scale, golden / scale,
                               rtol=2e-5, atol=2e-5)
