"""VMEM-resident iterated SpMV (ops/resident.py) vs the per-call path.

Interpret-mode (CPU) equality tests; the TPU compile/perf path is
exercised by bench.py.  Reference protocol being modeled:
``dasp_f64.h:1285-1286`` (1000 chained iterations over one matrix).
"""

import numpy as np
import pytest

from dasp_tpu.ops import pallas_backend as pb
from dasp_tpu.ops import resident
from dasp_tpu.sparse import (CSRMatrix, circuit_like, fem_like,
                             mixed_categories, powerlaw_like)


def _op(csr, dtype="f32"):
    return pb.PallasSpMV(csr, dtype)


@pytest.mark.parametrize("builder,seed", [
    (lambda rng: mixed_categories(500, rng), 0),
    (lambda rng: circuit_like(2000, rng), 1),
    (lambda rng: powerlaw_like(1500, 1.8, 700, rng, col_alpha=1.8), 2),
    # segments LONGER than SEG_CHUNK slices (regression: the fold loop
    # once advanced by chunk index instead of slice index, which only
    # plans with >8-slice segments exposed)
    (lambda rng: fem_like(6000, 24, rng), 3),
])
def test_resident_matches_spmv(builder, seed):
    rng = np.random.default_rng(seed)
    csr = builder(rng)
    op = _op(csr)
    assert op.resident, "suite-scale plans must be resident-eligible"
    x = rng.standard_normal(csr.n_cols)
    golden = csr.spmv(x)
    y_call = op(x)
    loop = op.timing_loop(1)
    y_res = op.perm_out(np.asarray(loop(op._prep_x(x))))
    np.testing.assert_allclose(y_call, golden, rtol=0, atol=2e-4 *
                               max(1.0, np.abs(golden).max()))
    np.testing.assert_allclose(y_res, y_call, rtol=0, atol=1e-5 *
                               max(1.0, np.abs(golden).max()))


def test_resident_chained_iters_stay_close():
    rng = np.random.default_rng(3)
    csr = mixed_categories(400, rng)
    op = _op(csr)
    x = rng.standard_normal(csr.n_cols)
    y1 = op.perm_out(np.asarray(op.timing_loop(1)(op._prep_x(x))))
    y3 = op.perm_out(np.asarray(op.timing_loop(3)(op._prep_x(x))))
    # the 1e-36 chain perturbation must not visibly move the result
    np.testing.assert_allclose(y3, y1, rtol=0,
                               atol=1e-5 * max(1.0, np.abs(y1).max()))


def test_resident_bf16():
    rng = np.random.default_rng(4)
    csr = circuit_like(1500, rng)
    op = _op(csr, "bf16")
    assert op.resident
    x = rng.standard_normal(csr.n_cols)
    golden = csr.spmv(x)
    y = op.perm_out(np.asarray(op.timing_loop(2)(op._prep_x(x)))
                    .astype(np.float64))
    err = np.abs(y - golden) / np.maximum(1.0, np.abs(golden))
    assert err.max() < 0.1


def test_uniform_scatter_plans_stay_static():
    """Uniform random columns at scale: the packer's window caps keep
    every stream statically classed (P <= 32), so the plan is
    resident-eligible (the P>32 residency bar died with the
    dynamic-round kernels in round 5)."""
    rng = np.random.default_rng(5)
    from dasp_tpu.sparse import random_csr
    lens = np.full(6000, 64)
    csr = random_csr(6000, 6000, lens, rng)
    op = _op(csr)
    assert all(P <= 32 for P, _, _ in op._meta.streams)


@pytest.mark.parametrize("builder,seed", [
    (lambda rng: mixed_categories(500, rng), 10),
    (lambda rng: circuit_like(2000, rng), 11),
    (lambda rng: powerlaw_like(1500, 1.8, 700, rng, col_alpha=1.8), 12),
])
def test_resident_dd_matches_golden(builder, seed):
    """f64 (double-double) resident path: hi/lo carried end to end; the
    long-row composition's f32 incidence matmul is fan-in gated so even
    long rows stay far inside the 1e-5 contract (main_f64.cu:8)."""
    from dasp_tpu.ops import dd
    rng = np.random.default_rng(seed)
    csr = builder(rng)
    op = _op(csr, "f64")
    assert op.resident, "dd plans at suite scale must be resident-eligible"
    x = rng.standard_normal(csr.n_cols)
    golden = csr.spmv(x)
    y_call = op(x)                         # streamed dd path
    loop = op.timing_loop(1)
    out = loop(op._prep_x(x))
    y_res = op.perm_out(dd.to_f64(np.asarray(out["hi"]),
                                  np.asarray(out["lo"])))
    scale = max(1.0, np.abs(golden).max())
    np.testing.assert_allclose(y_call, golden, rtol=0, atol=1e-10 * scale)
    # resident dd: dd-accurate except the gated long-row matmul (~1e-6)
    np.testing.assert_allclose(y_res, golden, rtol=0, atol=2e-6 * scale)


def test_split_incidence_cascade():
    """High-fan-in incidence matrices split into big2 @ big1 with every
    level's per-row add count capped at W and EXACT reconstruction (the
    kernel's cascade is then algebraically the single matmul, with the
    f32 accumulation error bounded per level instead of per row)."""
    rng = np.random.default_rng(7)
    W = 8
    big = np.zeros((16, 256), np.float32)
    for p in range(11):
        cols = rng.choice(256, size=rng.integers(1, 60), replace=False)
        big[p, cols] = rng.integers(1, 4, cols.size)
    assert (big != 0).sum(axis=1).max() > W
    big1, big2 = resident.split_incidence(big, W)
    assert np.array_equal(big2 @ big1, big)          # exact: 0/1 selection
    assert (big1 != 0).sum(axis=1).max() <= W
    assert (big2 != 0).sum(axis=1).max() <= W
    assert big1.shape[0] % 8 == 0 and big2.shape == (16, big1.shape[0])
    # below the cap: no split needed
    assert resident.split_incidence(big, 64) is None
    # beyond W*W blocks per row: cascade cannot cap level 2
    wide = np.zeros((8, 64), np.float32)
    wide[0, :] = 1.0
    assert resident.split_incidence(wide, 2) == "over"


def test_resident_dd_split_kernel(monkeypatch):
    """Force the cascade on a real plan (one 150k-nnz row; cap lowered to
    2 so its 3-vreg scalar splits) and golden-check the resident kernel
    end to end with the split active."""
    from dasp_tpu.ops import dd
    from dasp_tpu.sparse import random_csr
    monkeypatch.setattr(resident, "DD_LONG_FANIN_MAX", 2)
    rng = np.random.default_rng(3)
    n = 2000
    lens = rng.integers(1, 6, n)
    lens[0] = 150_000
    csr = random_csr(n, n, lens, rng)
    op = _op(csr, "f64")
    assert op.resident
    res = op._arrays["resident"]
    assert res["split"], "the lowered cap must trigger a split"
    x = rng.standard_normal(n)
    golden = csr.spmv(x)
    out = op.timing_loop(1)(op._prep_x(x))
    y = op.perm_out(dd.to_f64(np.asarray(out["hi"]),
                              np.asarray(out["lo"])))
    scale = max(1.0, np.abs(golden).max())
    np.testing.assert_allclose(y, golden, rtol=0, atol=2e-6 * scale)


def test_budget_gate():
    rng = np.random.default_rng(7)
    csr = circuit_like(1200, rng)
    meta, arrays = pb.plan_to_arrays(pb.build_wplan(csr))
    resident.prepare(meta, arrays)
    assert arrays["resident"] is not None
    assert resident.resident_bytes(meta, arrays) < resident.RESIDENT_BUDGET


def test_resident_compression_when_over_budget(monkeypatch):
    """Plans slightly over the VMEM budget compress resident operands
    instead of falling back to streaming: the outgather lane table is
    COMPACTED to the used (chunk, slot) pairs as int8, and — for dd —
    the lo-value streams go bf16 (lo is hi's rounding residual, so bf16
    still bounds the value error at ~2^-33; the webbase-class f64 plans
    fit exactly this way).  Golden-checked with both compressions
    active."""
    from dasp_tpu.ops import dd
    from dasp_tpu.ops.resident import _ru
    rng = np.random.default_rng(9)
    csr = mixed_categories(600, rng)
    meta, arrays = pb.plan_to_arrays(pb.build_wplan(csr), "f64")
    resident.prepare(meta, arrays)     # full footprint incl. res extras
    assert arrays["resident"] is not None
    need = resident.resident_bytes(meta, arrays)
    lo_total = sum(st["vals_lo"].nbytes for st in arrays["streams"])
    # exact savings of the tiers before lo16, so the forced budget lands
    # between (perm compaction + bigs-int8) and (those + lo16)
    RU = _ru(meta.interpret)
    Z = meta.n_y2_rows
    used = sum(1 for u in range(meta.B_pad // RU)
               for sk in range(meta.k_used)
               if not (arrays["out_src"][u * RU:(u + 1) * RU, sk]
                       == Z).all())
    s_perm = arrays["out_perm"].nbytes - max(used, 1) * RU * 128
    s_bigs = sum(a.nbytes * 3 // 4
                 for a in arrays["resident"].get("bigs", {}).values()
                 if a.max(initial=0) <= 127)
    forced = need - s_perm - s_bigs - lo_total // 2
    monkeypatch.setattr(resident, "RESIDENT_BUDGET", forced)
    op = pb.PallasSpMV(pb.build_wplan(csr), "f64")
    # rebuild through prepare under the lowered budget
    meta2, arrays2 = pb.plan_to_arrays(op.plan, "f64")
    resident.prepare(meta2, arrays2)
    assert arrays2["resident"] is not None
    assert arrays2["resident"].get("perm_c") is not None
    assert arrays2["resident"].get("lo16") is not None
    import jax
    op._meta = meta2
    # mirror PallasSpMV.__init__: residue-routing entries (> n_y2_rows)
    # are stripped from the resident og program
    op._src_host = np.minimum(arrays2["out_src"], meta2.n_y2_rows)
    op._arrays = jax.device_put(arrays2)
    op._resident_jit = None
    assert op.resident
    x = rng.standard_normal(csr.n_cols)
    golden = csr.spmv(x)
    out = op.timing_loop(1)(op._prep_x(x))
    y = op.perm_out(dd.to_f64(np.asarray(out["hi"]),
                              np.asarray(out["lo"])))
    scale = max(1.0, np.abs(golden).max())
    # lo-bf16 degrades ~1e-13 to ~1e-9; still far inside the 1e-5 contract
    np.testing.assert_allclose(y, golden, rtol=0, atol=1e-7 * scale)


def test_resident_output_not_in_vmem_budget():
    """The output buffer lives in HBM (assembled chunks DMA'd from a
    double-buffered staging scratch), so resident_bytes must charge only
    the small staging — not B_pad*LANES*4*pair (8-19 MB on webbase/
    wikitalk-class plans, previously the margin that forced the removed
    bf16-scratch tier and its Mosaic-alignment failure)."""
    rng = np.random.default_rng(11)
    csr = mixed_categories(600, rng)
    meta, arrays = pb.plan_to_arrays(pb.build_wplan(csr), "f64")
    resident.prepare(meta, arrays)
    assert arrays["resident"] is not None
    base = resident.resident_bytes(meta, arrays)
    # recompute the non-output terms by hand; the gap to resident_bytes
    # must be exactly the fixed staging scratch, independent of B_pad
    n = sum(a.nbytes for st in arrays["streams"]
            for k, a in st.items() if k != "wins")
    n += arrays["out_perm"].nbytes
    n += meta.s_rows * 128 * 4 * 2
    n += max(NV * (8 // st) for _, st, NV in meta.streams) * 128 * 4 * 2
    n += (meta.n_y2_rows + 1) * 128 * 4 * 2
    res = arrays["resident"]
    n += sum(a.nbytes for a in res.get("bigs", {}).values())
    if res.get("rowsel") is not None:
        n += res["rowsel"].nbytes + res["lanesel"].nbytes
    # staging only, no B_pad term — and the budget must charge the SAME
    # staging size the kernel allocates (2*CH_ROWS; ADVICE r3)
    assert base - n == resident._staging_rows(meta) * 128 * 4 * 2


def _hetero_csr(n=20000, split=10000, seed=6):
    """Half banded 8-nnz rows + half scattered 16-nnz rows: packs into
    MULTIPLE streams with distinct round counts (P=2/12/24 at this
    scale), which the f32-colsum tier tests need (test-scale matrices
    otherwise merge into one stream)."""
    rng = np.random.default_rng(seed)
    rows, cols = [], []
    for r in range(n):
        c = ((r + rng.integers(-60, 60, size=8)) % n if r < split
             else rng.integers(0, n, size=16))
        rows += [r] * len(c)
        cols += list(c)
    rows, cols = np.array(rows), np.array(cols)
    vals = rng.standard_normal(rows.size)
    key = rows.astype(np.int64) * n + cols
    order = np.argsort(key)
    rows, cols, vals = rows[order], cols[order], vals[order]
    keep = np.concatenate([[True], np.diff(key[order]) != 0])
    rows, cols, vals = rows[keep], cols[keep], vals[keep]
    rpt = np.zeros(n + 1, np.int64)
    np.add.at(rpt, rows + 1, 1)
    return CSRMatrix(n, n, np.cumsum(rpt).astype(np.int32),
                     cols.astype(np.int32), vals)


@pytest.mark.parametrize("p_thresh", [1, 12])
def test_resident_dd_f32_colsum_tier(monkeypatch, p_thresh):
    """The DD_F32_COLSUM tier inside the RESIDENT kernel: flagged
    streams run plain-f32 colsum over the hi halves (their lo-value
    operands are never shipped and their lo partials are implicit
    zeros); downstream folds stay compensated dd.  p_thresh=1 flags
    every stream (the x-lo operand and lo scratch halves are dropped
    entirely); p_thresh=12 exercises the MIXED kernel (P=2 stream
    all-dd alongside flagged P=12/24 streams).  Error contract:
    ~2^-23 of row mass, inside main_f64.cu:8's 1e-5."""
    from dasp_tpu.config import DaspConfig
    from dasp_tpu.ops import dd
    monkeypatch.setattr(pb, "DD_F32_FORCE", True)
    monkeypatch.setattr(pb, "DD_F32_COLSUM_P", p_thresh)
    csr = _hetero_csr()
    op = pb.PallasSpMV(csr, "f64", DaspConfig(relabel="off"))
    flags = op._meta.dd_f32
    assert any(flags)
    if p_thresh == 1:
        assert all(flags)
    else:
        assert not all(flags), "p_thresh must split the streams"
    assert op.resident
    rng = np.random.default_rng(1)
    x = rng.standard_normal(csr.n_cols)
    golden = csr.spmv(x)
    out = op.timing_loop(1)(op._prep_x(x))
    y = op.perm_out(dd.to_f64(np.asarray(out["hi"]),
                              np.asarray(out["lo"])))
    scale = max(1.0, np.abs(golden).max())
    np.testing.assert_allclose(y, golden, rtol=0, atol=1e-5 * scale)
    # the budget accounting runs on the shipped arrays (device arrays
    # expose .nbytes too) and must stay consistent with the tier
    assert resident.resident_bytes(op._meta, op._arrays) > 0
