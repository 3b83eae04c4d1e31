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
    """The portable scatter-executor fallback (backend="xla")."""
    assert len(jax.devices()) == 8, "conftest must provide 8 host devices"
    csr = mixed_categories(900, rng)
    op = MultiChipSpMV(csr, dtype=dtype, backend="xla")
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
    op = MultiChipSpMV(csr, dtype="f32", backend="xla")
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


def test_multichip_scale_balance_and_padding(rng):
    """At 100k+ rows with a power-law tail: per-slab nnz stays within
    1.5x of the mean, and the harmonization padding overhead (padded vs
    real value-tile vregs per chip) is recorded and bounded (round-3
    review ask: harmonize_wplans pads every chip to elementwise-max
    shapes; this measures what that costs)."""
    from dasp_tpu.parallel import WMultiChipSpMV
    csr = powerlaw_like(120_000, 1.8, 600_000, rng, col_alpha=1.6)
    op = WMultiChipSpMV(csr, dtype="f32")
    nnzs = op.stats["slab_nnz"]
    assert sum(nnzs) + sum(o.nnz if o is not None else 0
                           for o in op.overflows) >= csr.nnz * 0.99
    assert op.stats["balance"] <= 1.5, op.stats
    real = sum(op.stats["real_vregs"])
    pad = sum(op.stats["pad_vregs"])
    # Measured history on this input class: ~2.2-2.6x with contiguous
    # nnz-balanced slabs, 0.48x after strip-interleaving + the pinned
    # class merge (round 4).  Round 5 rebuilt the union signature —
    # rank-matched slice ladders, cost-weighed class coalescing, rank
    # spill-up (harmonize_wplans), plus 2-D (nnz, long-mass) strip
    # balance (partition_strips) — measuring 0.20x on the 8-chip
    # power-law dryrun.  Bound with headroom for generator drift.
    assert pad <= 0.3 * real, (pad, real)
    x = rng.standard_normal(csr.n_cols)
    golden = csr.spmv(x)
    # Condition-aware scale: the 100k-nnz hub row's dot product cancels
    # to ~1e-1 from ~1e5 of absolute mass, so ANY f32 accumulation
    # carries ~eps*sum|a_i x_i| of error — normalize by that mass
    # (standard backward-error metric), not by |y|.
    csr_abs = csr.values.copy()
    import dasp_tpu.sparse as sp
    mass = sp.CSRMatrix(csr.n_rows, csr.n_cols, csr.row_ptr,
                        csr.col_idx, np.abs(csr_abs)).spmv(np.abs(x))
    scale = np.maximum(mass, 1.0)
    np.testing.assert_allclose(op(x) / scale, golden / scale,
                               rtol=2e-6, atol=2e-6)


def test_multichip_timing_loop(rng):
    """The bench --multichip chained-iteration loop compiles and matches
    a plain call on the CPU mesh."""
    csr = mixed_categories(900, rng)
    op = MultiChipSpMV(csr, dtype="f32")
    x_dev = op._prep_x(rng.standard_normal(csr.n_cols))
    loop = op.timing_loop(3)
    y = np.asarray(jax.tree.leaves(loop(x_dev))[0])
    assert np.isfinite(y).all()


def test_multichip_resident_loop(rng):
    """Round-4: per-chip slabs run the VMEM-resident iterated kernel
    under shard_map (uniform prepare: no per-chip compression tiers, the
    SMEM-driven dynamic outgather).  The chained loop must agree with
    the streamed per-chip step — the 1e-36 perturbation is below f32
    resolution, so N resident iterations reproduce one SpMV."""
    csr = mixed_categories(900, rng)
    op = MultiChipSpMV(csr, dtype="f32")
    assert op.stats.get("resident") is True
    x_dev = op._prep_x(rng.standard_normal(csr.n_cols))
    y_str = np.asarray(op._step(op._arrays, x_dev))
    y_res = np.asarray(op.timing_loop(3)(x_dev))
    np.testing.assert_allclose(y_res, y_str, rtol=2e-5, atol=2e-4)


def test_multichip_resident_f64_streams(rng):
    """dd plans stay streamed under shard_map (the cascade split is
    per-chip data-dependent; resident.prepare(uniform=True) docstring)."""
    csr = mixed_categories(900, rng)
    op = MultiChipSpMV(csr, dtype="f64")
    assert op.stats.get("resident") is False
    x = rng.standard_normal(csr.n_cols)
    golden = csr.spmv(x)
    scale = np.maximum(np.abs(golden), 1.0)
    np.testing.assert_allclose(op(x) / scale, golden / scale,
                               rtol=1e-10, atol=1e-10)


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
