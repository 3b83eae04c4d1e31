"""Windowed plan (wplan) + Pallas backend tests, on CPU in interpret mode."""

import numpy as np
import pytest

from dasp_tpu.sparse import (CSRMatrix, circuit_like, fem_like,
                             mixed_categories, powerlaw_like, random_csr)
from dasp_tpu.wplan import build_wplan, SUB, LANES, VREG


def _emulate(plan, x):
    """Numpy emulation of the colsum + outgather kernels (independent
    implementation of the device semantics)."""
    from dasp_tpu.wplan import LONG_PACK, K_SOURCES
    n = x.size
    xpad = np.zeros(plan.s_rows * LANES)
    if plan.col_perm is not None:
        xpad[plan.col_perm] = x
    else:
        xpad[:n] = x
    x2d = xpad.reshape(plan.s_rows, LANES)
    decode = (lambda y: y[plan.row_perm]) if plan.row_perm is not None \
        else (lambda y: y)

    partials = []
    vreg_totals_all = []
    for s in plan.streams:
        nv = s.n_vregs
        R = SUB // s.stride
        part = np.zeros((nv * R, LANES))
        tot = np.zeros(nv)
        for v in range(nv):
            idx = s.idx[v * SUB:(v + 1) * SUB]
            vals = s.vals[v * SUB:(v + 1) * SUB]
            lam = idx & 127
            q = (idx >> 7) & 7
            crnd = idx >> 10          # round tag is CELL data (at (i, lam))
            xsel = np.zeros((SUB, LANES))
            for p in range(s.P):
                w = s.wins[v, p]
                xw = x2d[w:w + SUB]
                xsel += np.where(crnd == p,
                                 xw[q, np.arange(LANES)[None, :]], 0.0)
            g = xsel[np.arange(SUB)[:, None], lam]
            prod = vals * g
            for L in range(R):
                part[v * R + L] = prod[L * s.stride:(L + 1) * s.stride
                                       ].sum(0)
            tot[v] = prod.sum()
        partials.append(part)
        vreg_totals_all.append(tot)

    y2_parts = []
    for seg in plan.sell:
        R_st = SUB // plan.streams[seg.stream].stride
        R = SUB // seg.stride
        F = R_st // R
        p = partials[seg.stream][seg.vreg_offset * R_st:
                                 (seg.vreg_offset
                                  + seg.n_slices * seg.w8) * R_st]
        y2_parts.append(p.reshape(seg.n_slices, seg.w8, R, F, LANES)
                        .sum((1, 3)).reshape(seg.n_slices * R, LANES))
    if plan.n_long:
        souts, spos = [], []
        for lg in plan.longs:
            totals = np.concatenate([vreg_totals_all[lg.stream], [0.0]])
            idx = np.minimum(lg.idx, totals.size - 1)
            souts.append(totals[idx].sum(1))
            spos.append(lg.scalar_pos)
        scalars = np.zeros(plan.n_long)
        # a long row's vregs may split across round-class streams; each
        # stream's group contributes partial sums that accumulate here
        np.add.at(scalars, np.concatenate(spos), np.concatenate(souts))
        n_lr = -(-plan.n_long // LONG_PACK)
        pad = np.zeros(n_lr * LONG_PACK)
        pad[:plan.n_long] = scalars
        srows = np.concatenate([pad.reshape(n_lr, LONG_PACK),
                                np.zeros((n_lr, 1))], axis=1)
        y2_parts.append(srows)
    y2_parts.append(np.zeros((1, LANES)))
    y2 = np.concatenate(y2_parts, axis=0)

    B = plan.out_src.shape[0]
    out = np.zeros((B, LANES))
    for b in range(B):
        for k in range(K_SOURCES):
            src = min(plan.out_src[b, k], y2.shape[0] - 1)
            out[b] += y2[src][plan.out_perm[b * K_SOURCES + k]]
    y = out.reshape(-1)[:plan.n_rows]
    if plan.overflow is not None:
        # overflow lives in the internal (possibly relabeled) spaces
        y = y + plan.overflow.spmv(xpad[:plan.n_cols])
    return decode(y)


CASES = {
    "tiny": lambda rng: random_csr(10, 12, np.array(
        [0, 1, 2, 3, 4, 5, 9, 2, 0, 7]), rng),
    "fem": lambda rng: fem_like(400, 20, rng),
    "mixed": lambda rng: mixed_categories(500, rng),
    "powerlaw": lambda rng: powerlaw_like(400, 1.8, 3000, rng),
    "scattered": lambda rng: random_csr(
        300, 5000, rng.integers(1, 60, 300), rng),
    "wide_cols": lambda rng: random_csr(
        64, 300_000, rng.integers(1, 40, 64), rng),
    # regression: duplicate columns + rem2 leftover fragments + misrouted
    # overflow attribution (er not filtered with its siblings)
    "powerlaw_deg": lambda rng: powerlaw_like(20_000, 1.7, 20_000, rng,
                                              col_alpha=1.6),
    # long rows with uniform columns over a wide range: windows per vreg
    # exceed the static budget by far, forcing the dynamic-round (P > 32)
    # stream classes and kernels
    "scattered_long": lambda rng: random_csr(
        200, 400_000, np.where(np.arange(200) % 50 == 0, 2000, 3), rng),
    # circuit archetype: short rows (strided buckets) + sparse medium
    # rows (dumped to the length-bucketed med slices) + a few rails
    "circuit": lambda rng: circuit_like(6000, rng),
}


def test_length_buckets_activate(rng):
    """Short AND medium length buckets must engage on the circuit
    archetype (strides 2/4 for 1-4 nnz rows, med slices for dumped 5-16
    nnz rows) and the result must match golden through the emulator."""
    csr = CASES["circuit"](rng)
    plan = build_wplan(csr)
    # logical (segment) strides: streams may merge to the min stride
    strides = {seg.stride for seg in plan.sell}
    assert 2 in strides and 4 in strides, f"short buckets inactive: {strides}"
    # med bucket slices show up as extra y2 sources on out_src: at least
    # some blocks must use more than 3 sources (primary+2 shorts)
    used = (plan.out_src < plan.n_y2_rows).sum(axis=1)
    assert used.max() >= 4
    x = rng.standard_normal(csr.n_cols)
    y = _emulate(plan, x)
    golden = csr.spmv(x)
    scale = np.maximum(np.abs(golden), 1.0)
    np.testing.assert_allclose(y / scale, golden / scale,
                               rtol=1e-12, atol=1e-12)


def test_scattered_long_stays_static(rng):
    """Uniform scattered long rows (windows per 1024-chunk far beyond
    the 32-window static budget) must be absorbed by static window
    bin-packing: every stream class stays P <= 32 — the packer's window
    caps make that structural (ceil(n_win/32) <= 32*ceil(len/1024), see
    wplan.py's DYN_PAD_MAX note; the dynamic-round kernels were removed
    in round 5) — and the result must match golden at both dtypes."""
    from dasp_tpu.config import DaspConfig
    cfg = DaspConfig(relabel="off")   # auto would collapse the windows
    csr = CASES["scattered_long"](rng)
    plan = build_wplan(csr, cfg)
    assert all(s.P <= 32 for s in plan.streams), \
        f"P>32 stream escaped the packer caps: {[s.P for s in plan.streams]}"
    # the scattered rows really did exceed the per-chunk window budget
    # (otherwise this archetype stopped exercising the bin-packing path)
    assert any(s.P >= 16 for s in plan.streams), \
        f"archetype no longer scattered enough: {[s.P for s in plan.streams]}"
    from dasp_tpu.ops.pallas_backend import PallasSpMV
    for dtype, tol in (("f32", 2e-5), ("f64", 1e-10)):
        op = PallasSpMV(csr, dtype=dtype, config=cfg)
        x = rng.standard_normal(csr.n_cols)
        y = op(x)
        golden = csr.spmv(x)
        scale = np.maximum(np.abs(golden), 1.0)
        np.testing.assert_allclose(y / scale, golden / scale,
                                   rtol=tol, atol=tol)


@pytest.mark.parametrize("name", list(CASES))
def test_wplan_emulation_matches_golden(rng, name):
    csr = CASES[name](rng)
    plan = build_wplan(csr)
    x = rng.standard_normal(csr.n_cols)
    y = _emulate(plan, x)
    golden = csr.spmv(x)
    scale = np.maximum(np.abs(golden), 1.0)
    np.testing.assert_allclose(y / scale, golden / scale,
                               rtol=1e-12, atol=1e-12)


def test_wplan_accounting(rng):
    csr = mixed_categories(400, rng)
    plan = build_wplan(csr)
    # every nonzero is either packed or overflowed
    packed = sum(int(np.count_nonzero(s.vals)) for s in plan.streams)
    over = plan.overflow.nnz if plan.overflow is not None else 0
    n_explicit_zeros = int(np.sum(csr.values == 0.0))
    assert packed + over + n_explicit_zeros == csr.nnz
    # overflow should be a small fraction
    assert over < 0.05 * csr.nnz + 50


@pytest.mark.parametrize("name", ["tiny", "fem", "powerlaw"])
def test_pallas_interpret_matches_golden(rng, name):
    from dasp_tpu.ops.pallas_backend import PallasSpMV
    csr = CASES[name](rng)
    op = PallasSpMV(csr, dtype="f32")
    x = rng.standard_normal(csr.n_cols)
    y = op(x)
    golden = csr.spmv(x)
    scale = np.maximum(np.abs(golden), 1.0)
    np.testing.assert_allclose(y / scale, golden / scale,
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("dtype", ["f32", "f64"])
def test_pallas_residue_subplan_matches_golden(rng, dtype, monkeypatch):
    """Large COO residues are repacked as a sub-plan and run as a second
    windowed SpMV (WMeta.res; plan_to_arrays).  Force the path by
    dropping the threshold so ANY residue triggers it, then golden-check
    an input whose packer leaves a residue."""
    from dasp_tpu.ops import pallas_backend as pb
    monkeypatch.setattr(pb, "RES_REPACK_MIN", 1)
    # wide + scattered short rows: blocks span many windows, so cell
    # conflicts leave a residue (the rmat_like failure mode in miniature)
    n = 40_000
    csr = random_csr(n, n, rng.integers(1, 8, size=n), rng)
    plan = build_wplan(csr)
    assert plan.overflow is not None and plan.overflow.nnz, \
        "fixture must produce a residue"
    op = pb.PallasSpMV(plan, dtype=dtype)
    assert op._meta.res is not None, "sub-plan path not taken"
    x = rng.standard_normal(csr.n_cols)
    y = op(x)
    golden = csr.spmv(x)
    scale = np.maximum(np.abs(golden), 1.0)
    tol = 2e-5 if dtype == "f32" else 1e-10
    np.testing.assert_allclose(y / scale, golden / scale,
                               rtol=tol, atol=tol)


@pytest.mark.parametrize("name", ["tiny", "mixed", "powerlaw"])
def test_pallas_f64_dd_precision(rng, name):
    """The dd-f64 path must hold ~double precision end to end (the
    reference's fp64 contract is 1e-5, main_f64.cu:8; we target 1e-10)."""
    from dasp_tpu.ops.pallas_backend import PallasSpMV
    csr = CASES[name](rng)
    op = PallasSpMV(csr, dtype="f64")
    x = rng.standard_normal(csr.n_cols)
    y = op(x)
    golden = csr.spmv(x)
    scale = np.maximum(np.abs(golden), 1.0)
    np.testing.assert_allclose(y / scale, golden / scale,
                               rtol=1e-10, atol=1e-10)


def test_wplan_save_load_roundtrip(tmp_path, rng):
    from dasp_tpu.wplan import save_wplan, load_wplan
    csr = CASES["mixed"](rng)
    plan = build_wplan(csr)
    p = tmp_path / "w.npz"
    save_wplan(plan, p)
    plan2 = load_wplan(p)
    x = rng.standard_normal(csr.n_cols)
    y1 = _emulate(plan, x)
    y2 = _emulate(plan2, x)
    np.testing.assert_allclose(y1, y2, rtol=0, atol=0)


def test_column_slabs(rng):
    """n_cols beyond the VMEM x-table budget splits into column slabs."""
    from dasp_tpu.ops.pallas_backend import SlabbedPallasSpMV
    # columns spread over all slabs but locally clustered (fast routing)
    n, m = 128, 180_000
    lens = rng.integers(1, 30, n)
    rpt = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=rpt[1:])
    rows = np.repeat(np.arange(n), lens)
    cols = np.clip(rows * (m // n) + rng.integers(0, 500, int(lens.sum())),
                   0, m - 1).astype(np.int32)
    order = np.lexsort((cols, rows))
    csr = CSRMatrix(n, m, rpt, cols[order],
                    rng.standard_normal(int(lens.sum())))
    op = SlabbedPallasSpMV(csr, dtype="f32", slab_cols=64_000)
    assert len(op.slabs) == 3
    x = rng.standard_normal(csr.n_cols)
    y = op(x)
    golden = csr.spmv(x)
    scale = np.maximum(np.abs(golden), 1.0)
    np.testing.assert_allclose(y / scale, golden / scale, rtol=2e-5,
                               atol=2e-5)


def test_matmat_multivector(rng):
    """SpMM (Y = A @ X) via vmap over the packed kernels."""
    from dasp_tpu.ops.pallas_backend import PallasSpMV
    csr = CASES["mixed"](rng)
    op = PallasSpMV(csr, dtype="f32")
    X = rng.standard_normal((csr.n_cols, 4))
    Y = op.matmat(X)
    assert Y.shape == (csr.n_rows, 4)
    for j in range(4):
        golden = csr.spmv(X[:, j])
        scale = np.maximum(np.abs(golden), 1.0)
        np.testing.assert_allclose(Y[:, j] / scale, golden / scale,
                                   rtol=2e-5, atol=2e-5)


def test_matmat_f64_dd_tier(rng):
    """f64 SpMM cross-product tier (spmm_fn_dd): the hi/lo A streams
    are read once per kv vectors; error bound matches the streamed
    DD_F32_COLSUM tier (~2^-24 of row mass).  strict_f64 keeps the
    full-dd vmapped path."""
    from dasp_tpu.config import DaspConfig
    from dasp_tpu.ops.pallas_backend import PallasSpMV
    csr = CASES["mixed"](rng)
    op = PallasSpMV(csr, dtype="f64")
    assert op._spmm_dd_kv() > 1, "fixture must take the dd SpMM tier"
    X = rng.standard_normal((csr.n_cols, 5))     # forces chunk padding
    Y = op.matmat(X)
    assert Y.shape == (csr.n_rows, 5)
    for j in range(5):
        golden = csr.spmv(X[:, j])
        scale = np.maximum(np.abs(golden), 1.0)
        np.testing.assert_allclose(Y[:, j] / scale, golden / scale,
                                   rtol=2e-6, atol=2e-6)
    strict = PallasSpMV(build_wplan(csr, DaspConfig(strict_f64=True)),
                        dtype="f64", config=DaspConfig(strict_f64=True))
    assert strict._spmm_dd_kv() == 1


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5, 6, 7, 8])
def test_fuzz_packer_vs_golden(seed):
    """Randomized packer fuzz across all matrix archetypes (uniform,
    power-law, circuit, mixed): random shapes/densities/configs, emulator
    vs golden."""
    from dasp_tpu.config import DaspConfig
    rng = np.random.default_rng(seed)
    kind = seed % 4
    if kind == 0:
        n = int(rng.integers(5, 600))
        m = int(rng.integers(5, 3000))
        lens = rng.integers(0, min(m, int(rng.integers(2, 400))), size=n)
        csr = random_csr(n, m, lens, rng)
    elif kind == 1:
        csr = powerlaw_like(int(rng.integers(100, 3000)),
                            1.6 + rng.random(),
                            int(rng.integers(100, 4000)), rng,
                            col_alpha=float(rng.choice([0, 1.5, 2.5])))
    elif kind == 2:
        csr = circuit_like(int(rng.integers(200, 4000)), rng,
                           spread=int(rng.integers(10, 1000)))
    else:
        csr = mixed_categories(int(rng.integers(50, 1200)), rng,
                               block_longest=int(rng.choice([64, 128, 256])))
    cfg = DaspConfig(
        block_longest=int(rng.choice([64, 256])),
        threshold=float(rng.choice([0.5, 0.75, 0.9])))
    plan = build_wplan(csr, cfg)
    plan.check()
    x = rng.standard_normal(csr.n_cols)
    y = _emulate(plan, x)
    golden = csr.spmv(x)
    scale = np.maximum(np.abs(golden), 1.0)
    np.testing.assert_allclose(y / scale, golden / scale,
                               rtol=1e-11, atol=1e-11)


# ---------------------------------------------------------------------------
# Column relabel (runtime x-permutation, dasp_tpu/relabel.py)
# ---------------------------------------------------------------------------


def _relabel_cfg():
    from dasp_tpu.config import DaspConfig
    return DaspConfig(relabel="first_touch")


@pytest.mark.parametrize("name", ["powerlaw", "powerlaw_deg", "circuit"])
def test_relabel_matches_golden(rng, name):
    """Operators built with config.relabel must be transparent: same x in,
    same y out (the perm is applied internally in prep_x)."""
    from dasp_tpu.ops.pallas_backend import PallasSpMV
    csr = CASES[name](rng)
    op = PallasSpMV(csr, dtype="f32", config=_relabel_cfg())
    assert op.plan.col_perm is not None
    op.plan.check()
    x = rng.standard_normal(csr.n_cols)
    y = op(x)
    golden = csr.spmv(x)
    scale = np.maximum(np.abs(golden), 1.0)
    np.testing.assert_allclose(y / scale, golden / scale,
                               rtol=2e-5, atol=2e-5)


def test_relabel_reduces_vector_cost(rng):
    """On a no-locality power-law matrix the relabel must cut P-weighted
    vector cost (the win measured in tools/relabel_experiment.py)."""
    csr = CASES["powerlaw_deg"](rng)
    base = build_wplan(csr)
    rel = build_wplan(csr, _relabel_cfg())
    cost = lambda p: sum(s.P * s.n_vregs for s in p.streams)
    assert cost(rel) <= cost(base)


def test_native_perm_kernels_match_numpy(rng):
    """The C++ relabel kernels (native/perm.cpp: dasp_first_touch,
    dasp_sym_perm, dasp_col_perm) must reproduce the numpy fallbacks
    EXACTLY — same hub ordering (descending degree, ties by ascending
    old id), same first-touch tail order, same within-row ascending
    columns after the permutation."""
    from dasp_tpu.io import native as nat
    if nat._load() is None:
        pytest.skip("libdasp_host.so not built")
    csr = CASES["powerlaw"](rng)
    for hub in (0, 1, 4, 50):
        ft = nat.first_touch(csr.col_idx, csr.n_cols, hub)
        # numpy reference (pre-native first_touch_perm body)
        deg = np.bincount(csr.col_idx, minlength=csr.n_cols)
        hubs = np.flatnonzero(deg >= hub)
        hubs = hubs[np.argsort(-deg[hubs], kind="stable")]
        is_hub = np.zeros(csr.n_cols, bool)
        is_hub[hubs] = True
        fp = np.empty(csr.n_cols, np.int64)
        fp[csr.col_idx[::-1]] = np.arange(csr.nnz - 1, -1, -1,
                                          dtype=np.int64)
        tail = np.flatnonzero((deg > 0) & ~is_hub)
        tail = tail[np.argsort(fp[tail], kind="stable")]
        unt = np.flatnonzero((deg == 0) & ~is_hub)
        order = np.concatenate([hubs, tail, unt])
        ft_np = np.empty(csr.n_cols, np.int64)
        ft_np[order] = np.arange(csr.n_cols)
        np.testing.assert_array_equal(ft, ft_np)
    perm = ft_np
    lens = np.diff(csr.row_ptr)
    rows = np.repeat(np.arange(csr.n_rows, dtype=np.int64), lens)
    new_r, new_c = perm[rows], perm[csr.col_idx]
    o = np.lexsort((new_c, new_r))
    lens_new = np.zeros(csr.n_rows, np.int64)
    lens_new[perm] = lens
    rp_np = np.zeros(csr.n_rows + 1, np.int64)
    np.cumsum(lens_new, out=rp_np[1:])
    rp, c2, v2 = nat.sym_perm(csr.row_ptr, csr.col_idx, csr.values, perm)
    np.testing.assert_array_equal(rp, rp_np)
    np.testing.assert_array_equal(c2, new_c[o].astype(np.int32))
    np.testing.assert_array_equal(v2, csr.values[o])
    o2 = np.lexsort((new_c, rows))
    c3, v3 = nat.col_perm(csr.row_ptr, csr.col_idx, csr.values, perm)
    np.testing.assert_array_equal(c3, new_c[o2].astype(np.int32))
    np.testing.assert_array_equal(v3, csr.values[o2])


def test_relabel_save_load_roundtrip(tmp_path, rng):
    from dasp_tpu.wplan import save_wplan, load_wplan
    csr = CASES["powerlaw"](rng)
    plan = build_wplan(csr, _relabel_cfg())
    p = tmp_path / "w.npz"
    save_wplan(plan, p)
    plan2 = load_wplan(p)
    np.testing.assert_array_equal(plan.col_perm, plan2.col_perm)
    x = rng.standard_normal(csr.n_cols)
    y1 = _emulate(plan, x)
    y2 = _emulate(plan2, x)
    np.testing.assert_allclose(y1, y2, rtol=0, atol=0)


def test_relabel_f64_matmat(rng):
    """dd-f64 path and multi-vector SpMM both honor the perm."""
    from dasp_tpu.ops.pallas_backend import PallasSpMV
    csr = CASES["powerlaw"](rng)
    op = PallasSpMV(csr, dtype="f64", config=_relabel_cfg())
    x = rng.standard_normal(csr.n_cols)
    golden = csr.spmv(x)
    scale = np.maximum(np.abs(golden), 1.0)
    np.testing.assert_allclose(op(x) / scale, golden / scale,
                               rtol=1e-10, atol=1e-10)
    X = rng.standard_normal((csr.n_cols, 3))
    Y = PallasSpMV(csr, dtype="f32", config=_relabel_cfg()).matmat(X)
    G = np.stack([csr.spmv(X[:, j]) for j in range(3)], axis=1)
    scale = np.maximum(np.abs(G), 1.0)
    np.testing.assert_allclose(Y / scale, G / scale, rtol=2e-5, atol=2e-5)


def test_relabel_auto_policy(rng):
    """auto must relabel scattered power-law columns and leave banded/FEM
    matrices alone (measured: relabel is +10-16% on the former and a large
    regression on the latter)."""
    from dasp_tpu.config import DaspConfig
    cfg = DaspConfig(relabel="auto")
    fem = CASES["fem"](rng)
    assert build_wplan(fem, cfg).col_perm is None
    pl = CASES["powerlaw_deg"](rng)
    plan = build_wplan(pl, cfg)
    # decision must match the spread criterion
    from dasp_tpu.relabel import choose_relabel
    want = choose_relabel(pl)
    assert (plan.col_perm is None) == (want is None)
    # either way the operator stays transparent
    from dasp_tpu.ops.pallas_backend import PallasSpMV
    op = PallasSpMV(pl, dtype="f32", config=cfg)
    x = rng.standard_normal(pl.n_cols)
    golden = pl.spmv(x)
    scale = np.maximum(np.abs(golden), 1.0)
    np.testing.assert_allclose(op(x) / scale, golden / scale,
                               rtol=2e-5, atol=2e-5)


def test_relabel_symmetric_square(rng):
    """Square matrices relabel SYMMETRICALLY: x and y share one internal
    index space (on-device iteration can feed y back into x), and the
    operator decodes y to original order at the exit."""
    from dasp_tpu.config import DaspConfig
    from dasp_tpu.ops.pallas_backend import PallasSpMV
    csr = powerlaw_like(1500, 1.7, 1500, rng, col_alpha=1.6)
    # row_sort="off" pins the shared space (the default "auto" may
    # compose an independent length-grouping on top, trading the shared
    # space for fill — see test_row_sort_composes_with_sym_relabel)
    cfg = DaspConfig(relabel="first_touch", row_sort="off")
    plan = build_wplan(csr, cfg)
    assert plan.row_perm is not None
    assert plan.row_perm is plan.col_perm or np.array_equal(
        plan.row_perm, plan.col_perm)
    op = PallasSpMV(csr, dtype="f32", config=cfg)
    x = rng.standard_normal(csr.n_cols)
    golden = csr.spmv(x)
    scale = np.maximum(np.abs(golden), 1.0)
    np.testing.assert_allclose(op(x) / scale, golden / scale,
                               rtol=2e-5, atol=2e-5)
    # perm_in / perm_out are inverse maps between the two spaces
    v = rng.standard_normal(csr.n_cols)
    np.testing.assert_array_equal(op.perm_out(op.perm_in(v)), v)
    # x and y share ONE internal space: the raw device call's output,
    # encoded back, equals golden (i.e. y_dev could feed straight back
    # into the next iteration's x without any reordering)
    y_dev = np.asarray(op.device_call(op._prep_x(x)))
    y_int = np.empty_like(golden)
    y_int[op.plan.row_perm] = golden
    si = np.maximum(np.abs(y_int), 1.0)
    np.testing.assert_allclose(y_dev / si, y_int / si,
                               rtol=2e-5, atol=2e-5)
    # SpMM through the symmetric perm (multi-x colsum + row decode)
    X = rng.standard_normal((csr.n_cols, 3))
    G = np.stack([csr.spmv(X[:, j]) for j in range(3)], axis=1)
    sg = np.maximum(np.abs(G), 1.0)
    np.testing.assert_allclose(op.matmat(X) / sg, G / sg,
                               rtol=2e-5, atol=2e-5)


def test_relabel_sym_save_load(tmp_path, rng):
    """row_perm (symmetric relabel) survives serialization."""
    from dasp_tpu.wplan import save_wplan, load_wplan
    from dasp_tpu.config import DaspConfig
    csr = powerlaw_like(1200, 1.7, 1200, rng, col_alpha=1.6)
    plan = build_wplan(csr, DaspConfig(relabel="first_touch"))
    assert plan.row_perm is not None
    p = tmp_path / "w.npz"
    save_wplan(plan, p)
    plan2 = load_wplan(p)
    assert plan2.row_perm is not None
    np.testing.assert_array_equal(plan.row_perm, plan2.row_perm)
    x = rng.standard_normal(csr.n_cols)
    np.testing.assert_allclose(_emulate(plan2, x), csr.spmv(x),
                               rtol=1e-11, atol=1e-11)


def test_bfs_perm_mesh_locality(rng):
    """BFS (Cuthill-McKee-style) relabel: a scrambled 2D grid Laplacian
    — uniform degree, so first-touch degenerates to a degree sort — must
    recover window locality via the BFS candidate, stay a valid
    permutation, and keep the operator transparent."""
    from dasp_tpu.relabel import bfs_perm, choose_relabel, window_spread
    from dasp_tpu.sparse import from_coo
    side = 120
    n = side * side
    scramble = rng.permutation(n)
    ii, jj = np.divmod(np.arange(n), side)
    rows, cols = [], []
    for di, dj in ((0, 0), (0, 1), (0, -1), (1, 0), (-1, 0)):
        ni, nj = ii + di, jj + dj
        ok = (0 <= ni) & (ni < side) & (0 <= nj) & (nj < side)
        rows.append(scramble[(ii * side + jj)[ok]])
        cols.append(scramble[(ni * side + nj)[ok]])
    rows, cols = np.concatenate(rows), np.concatenate(cols)
    csr = from_coo(n, n, rows, cols, rng.standard_normal(rows.size))
    perm = bfs_perm(csr)
    assert perm is not None
    assert np.array_equal(np.sort(perm), np.arange(n))   # a permutation
    sp0 = window_spread(csr)
    sp1 = window_spread(csr, perm, symmetric=True)
    assert sp1 < 0.5 * sp0, (sp0, sp1)
    # auto policy picks it up for the scrambled mesh
    chosen = choose_relabel(csr, symmetric=True)
    assert chosen is not None
    # non-square input: no BFS
    from dasp_tpu.sparse import random_csr
    rect = random_csr(64, 256, np.full(64, 4), rng)
    assert bfs_perm(rect) is None
    # end-to-end transparency with the symmetric relabel active
    from dasp_tpu.config import DaspConfig
    from dasp_tpu.ops.pallas_backend import PallasSpMV
    op = PallasSpMV(csr, dtype="f32", config=DaspConfig(relabel="auto"))
    x = rng.standard_normal(n)
    golden = csr.spmv(x)
    scale = np.maximum(np.abs(golden), 1.0)
    np.testing.assert_allclose(op(x) / scale, golden / scale,
                               rtol=2e-5, atol=2e-5)


def test_row_sort_length_grouping(rng):
    """Independent row length-grouping (order_rid analog): mixed-length
    power-law rows with popularity-localized columns must trigger the
    auto policy, cut the quantized-width mass, stay a permutation, and
    keep the operator transparent through perm_out; banded matrices must
    refuse (their locality is row-correlated)."""
    from dasp_tpu.config import DaspConfig
    from dasp_tpu.relabel import apply_row_perm, choose_row_sort
    from dasp_tpu.sparse import random_csr
    n = 3072
    lens = np.minimum(rng.zipf(1.7, size=n), 200)
    rpt = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=rpt[1:])
    nnz = int(rpt[-1])
    cols = (np.minimum(rng.zipf(1.5, size=nnz), n) - 1).astype(np.int32)
    rows = np.repeat(np.arange(n), lens)
    order = np.lexsort((cols, rows))
    csr = CSRMatrix(n, n, rpt, cols[order], rng.standard_normal(nnz))
    perm = choose_row_sort(csr)
    assert perm is not None
    assert np.array_equal(np.sort(perm), np.arange(n))
    # apply_row_perm reorders rows, preserves per-row content
    p = apply_row_perm(csr, perm)
    r = rng.integers(0, n)
    np.testing.assert_array_equal(
        np.sort(p.col_idx[p.row_ptr[perm[r]]:p.row_ptr[perm[r] + 1]]),
        np.sort(csr.col_idx[csr.row_ptr[r]:csr.row_ptr[r + 1]]))
    # banded: refuse
    fem = CASES["fem"](rng)
    assert choose_row_sort(fem) is None
    # end-to-end transparency (plan carries independent row_perm)
    from dasp_tpu.ops.pallas_backend import PallasSpMV
    op = PallasSpMV(csr, dtype="f32", config=DaspConfig())
    if op.plan.row_perm is not None and op.plan.col_perm is None:
        pass  # the auto policy engaged inside the packer too
    x = rng.standard_normal(n)
    golden = csr.spmv(x)
    scale = np.maximum(np.abs(golden), 1.0)
    np.testing.assert_allclose(op(x) / scale, golden / scale,
                               rtol=2e-5, atol=2e-5)
    # save/load round-trips the independent row_perm
    import tempfile, os
    from dasp_tpu.wplan import save_wplan, load_wplan
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "p.npz")
        save_wplan(op.plan, path)
        p2 = load_wplan(path)
        if op.plan.row_perm is not None:
            np.testing.assert_array_equal(p2.row_perm, op.plan.row_perm)


def test_row_sort_composes_with_sym_relabel(rng):
    """Length-grouping COMPOSES with the symmetric relabel
    (row_perm = rs[col_perm], wplan.py): a power-law square matrix whose
    relabeled blocks mix 2-nnz and 200-nnz rows must end up with
    row_perm != col_perm, a much lower quantized-width mass than the
    relabel alone, and a transparent operator (op(x) == golden in
    original order).  The livejournal_like finding behind this:
    19%-fill SELL streams, 24x modeled slot cut (tools/rowsort_model.py)."""
    from dasp_tpu.config import DaspConfig
    from dasp_tpu.ops.pallas_backend import PallasSpMV
    csr = powerlaw_like(2000, 1.7, 2000, rng, col_alpha=1.5)
    plan = build_wplan(csr, DaspConfig(relabel="first_touch"))
    assert plan.col_perm is not None
    assert plan.row_perm is not None
    assert not np.array_equal(plan.row_perm, plan.col_perm), \
        "auto length-grouping should engage on mixed-length power law"
    plan.check()
    x = rng.standard_normal(csr.n_cols)
    golden = csr.spmv(x)
    np.testing.assert_allclose(_emulate(plan, x), golden,
                               rtol=1e-11, atol=1e-11)
    op = PallasSpMV(plan, dtype="f32",
                    config=DaspConfig(relabel="first_touch"))
    scale = np.maximum(np.abs(golden), 1.0)
    np.testing.assert_allclose(op(x) / scale, golden / scale,
                               rtol=2e-5, atol=2e-5)
