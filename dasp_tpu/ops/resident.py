"""VMEM-resident iterated SpMV: N chained iterations in ONE pallas_call.

Motivation.  The reference's benchmark protocol re-runs one matrix 1000
times (``dasp_f64.h:1285-1286``); on an A100 the packed streams of every
small/mid matrix live in the 40 MB L2 after the first pass, so its
steady-state numbers are L2-resident, not HBM-resident.  The TPU has no
hardware cache — its analog is the explicitly managed VMEM (128 MB on
v5e).  This module runs the whole SpMV (colsum gathers, segment folds,
long-row reduction, output assembly) inside one Pallas kernel whose
grid dimension is the ITERATION count and whose packed streams are
un-blocked VMEM operands: Pallas DMAs them in once (the index map is
constant across grid steps) and every iteration reads them at VMEM
bandwidth.  Measured on v5e (tools/resident_probe.py): ~925-1450 GB/s
effective vs the ~550-600 GB/s HBM streaming ceiling, up to 100 MB of
resident operands.

Each grid step computes a full y and feeds a scaled copy back into the
resident x table (x += y_row0 * 1e-36), mirroring the standard timing
loop's data chain.  The only per-call (not per-iteration) work is the
COO-dreg overflow correction (<0.01% of nnz by construction,
wplan.py): it is applied by XLA once on the final y and documented in
the bench notes.

Structure baked statically from the plan (all shapes compile-time):
  * per-stream colsum with the same 2-stage gather + masked round tree
    as ops.pallas_backend._make_colsum, writing a partials scratch;
  * sell-segment folds (w8 x F reshape-sums) into the y2 scratch;
  * long rows: per-vreg scalar totals -> one 0/1 matmul per referenced
    stream (vreg -> long scalar incidence, composed offline from the
    long gather tables) -> a RowSel/LaneSel matmul pair that scatters
    the scalars into the 127-packed long y2 rows on the MXU;
  * outgather (scratch row assembly + lane gathers), identical math to
    ops.pallas_backend._make_outgather, against the y2 scratch.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..wplan import SUB, LANES, LONG_PACK
from ..utils import gc_paused

# Confirmed working at 100.7 MB of resident operands (resident_probe.py).
# The margin to the 128 MB capacity is NOT slack: Mosaic's compiled
# program carries ~33 MB of its own window/temporary allocations on top
# of our operand accounting (measured on the 106 MB webbase dd plan,
# which compiled to a 139.2 MB program and was rejected).  Overridable
# for probes.
import os as _os
RESIDENT_BUDGET = int(_os.environ.get("DASP_RES_BUDGET",
                                      96 * 1024 * 1024))
VMEM_LIMIT = 128 * 1024 * 1024
SMEM_BUDGET = 512 * 1024
SEG_CHUNK = 8        # slices folded per segment-loop step
# f64 long rows: a scalar summing k vreg totals through the f32 incidence
# matmul carries ~k*2^-24 relative accumulation error; cap k per matmul
# LEVEL at 64 (~4e-6 worst case per level).  Rows over the cap use a
# two-level cascade (see ``prepare``), supporting fan-ins to 64*64 vregs
# (~4 Mnnz rows) at ~8e-6 worst case -- still inside the 1e-5 contract.
DD_LONG_FANIN_MAX = 64


def _ru(interpret: bool) -> int:
    if interpret:
        return 8
    import os
    return int(os.environ.get("DASP_RES_RU", "32"))


def _staging_rows(meta) -> int:
    """Rows of the double-buffered output staging scratch — the SAME
    formula make_resident_loop uses (2 x CH_ROWS, CH_ROWS = OG_GROUP*RU),
    shared so resident_bytes can't undercount when DASP_RES_RU is raised
    above its default 32 (CH_ROWS can reach 8*RU)."""
    ru = _ru(meta.interpret)
    og_group = max(1, min(8, (meta.B_pad // ru + 1) // 2))
    return 2 * og_group * ru


def _dd_f32(meta):
    """Per-stream f32-colsum flags for dd plans (see DD_F32_COLSUM_P in
    pallas_backend: products + sublane sums over the hi halves in plain
    f32; every downstream reduction stays compensated dd).  In resident
    mode the tier additionally collapses the dd colsum's live-vector set
    (the 42.5 MiB register-spill overhead that barred wikitalk-class dd
    plans from residency) and drops the flagged streams' lo-value
    operands from VMEM."""
    if meta.dtype != "f64":
        return (False,) * len(meta.streams)
    return meta.dd_f32 or (False,) * len(meta.streams)


def resident_bytes(meta, arrays) -> int:
    """Total VMEM footprint of operands + scratch for the resident call."""
    dd_f32 = _dd_f32(meta)
    n = 0
    for si, st in enumerate(arrays["streams"]):
        for k, a in st.items():
            if k == "wins":
                continue
            if k == "vals_lo" and dd_f32[si]:
                continue          # f32-colsum streams ship hi only
            n += a.nbytes if hasattr(a, "nbytes") else 0
    n += arrays["out_perm"].nbytes
    pair = 2 if meta.dtype == "f64" else 1    # dd carries hi/lo pairs
    # og_f32 (every stream on the f32-colsum tier): the whole kernel
    # body past the compensated folds runs single-f32 — no lo halves of
    # x/partials/y2/staging at all (see prepare / make_resident_loop)
    if pair == 2 and all(dd_f32):
        pair = 1
    # x input stays in HBM (ANY space, DMA'd into scratch at t==0):
    # only the x_scr copy occupies VMEM
    n += meta.s_rows * LANES * 4 * pair       # x scratch
    # partials are SINGLE-BUFFERED: each stream's colsum is folded into
    # y2 (and its long totals taken) before the next stream runs, so the
    # scratch holds one stream at a time — max, not sum.  f32-colsum
    # streams write hi partials only (their lo is an implicit zero).
    part_rows = max(NV * (SUB // st) for _, st, NV in meta.streams)
    n += part_rows * LANES * 4 * pair         # partials scratch
    n += (meta.n_y2_rows + 1) * LANES * 4 * pair   # y2 scratch
    # the OUTPUT buffer lives in HBM (memory_space=ANY; assembled chunks
    # are DMA'd out of a double-buffered staging scratch) — only the
    # staging counts against VMEM
    n += _staging_rows(meta) * LANES * 4 * pair   # output staging (2xCH_ROWS)
    res = arrays.get("resident")
    if res:
        split = res.get("split", {})
        for si, a in res.get("bigs", {}).items():
            if si in split:       # split streams ship big1+big2, not big
                n += split[si][0].nbytes + split[si][1].nbytes
            else:
                n += a.nbytes
        # f32-upcast value copies replace the bf16 streams (whose 2-byte
        # sizes were already counted above): add the difference
        for a in res.get("vals32", []):
            n += a.nbytes // 2
        if res.get("rowsel") is not None:
            n += res["rowsel"].nbytes + res["lanesel"].nbytes
        # compressed resident operands replace the full-width ones
        if res.get("perm_c") is not None:
            n -= arrays["out_perm"].nbytes - res["perm_c"].nbytes
        if res.get("lo16") is not None:
            # only streams that actually ship lo were counted above
            n -= sum(st["vals_lo"].nbytes // 2
                     for si, st in enumerate(arrays["streams"])
                     if not dd_f32[si])
    return n


def smem_bytes(meta, arrays, static_og: bool = True) -> int:
    # SMEM charges per ROW (each row pads to a full 512 B word line), so
    # the scalar tables are stored TRANSPOSED: (P+1, NV) / (k, B_pad).
    # With the statically specialized outgather (the production path —
    # PallasSpMV always hands make_resident_loop the host src table) the
    # (k, B_pad) src_t table is baked into the program and never shipped,
    # so it must not count against the SMEM gate (it alone is ~450 KB on
    # wikitalk-class plans and wrongly blocked them from resident mode).
    def row_cost(rows, cols):
        return rows * max(-(-cols // LANES) * LANES, LANES) * 4
    n = 0 if static_og else row_cost(meta.k_used, meta.B_pad)
    for (P, _, NV) in meta.streams:
        n += row_cost(P + 1, NV)
    return n


def eligible(meta, arrays) -> bool:
    """Resident mode preconditions (structural; size checked separately).

    f64 (double-double) is eligible too: the kernel carries hi/lo pairs
    end to end (colsum products, segment folds, lane folds), except the
    long-row vreg->scalar composition whose 0/1-incidence matmul
    accumulates each scalar's vreg totals in f32.  ``prepare`` gates that
    path per matmul level (see DD_LONG_FANIN_MAX), splitting high-fan-in
    streams into a two-level cascade, so the accumulated error stays
    ~1e-6, well inside the reference's 1e-5 contract (main_f64.cu:8)."""
    if meta.dtype not in ("f32", "bf16", "f64"):
        return False
    return True


def split_incidence(big, W):
    """Split an incidence matrix whose per-row add count (nonzero
    columns) exceeds ``W`` into a two-level cascade ``big == big2 @
    big1`` where every row of ``big1`` (up to W of one scalar's nonzero
    columns) and of ``big2`` (0/1 per-scalar chunk sums) has at most W
    nonzeros -- so each f32 matmul level accumulates at most W adds.
    Returns None when no row exceeds W (single matmul is fine), "over"
    when even the cascade cannot cap level 2 (> W*W adds in a row),
    else the ``(big1, big2)`` float32 pair."""
    adds = (big != 0).sum(axis=1)
    if int(adds.max(initial=0)) <= W:
        return None
    if int(adds.max()) > W * W:
        return "over"
    P_pad2, NV_pad2 = big.shape
    rows1, owner = [], []
    for p in range(P_pad2):
        nz = np.nonzero(big[p])[0]
        for c0 in range(0, nz.size, W):       # chunk the row's OWN
            row = np.zeros(NV_pad2, np.float32)   # nonzeros, not fixed
            cols = nz[c0:c0 + W]                  # column blocks: level-2
            row[cols] = big[p, cols]              # fan-in = ceil(adds/W)
            rows1.append(row)
            owner.append(p)
    B1 = len(rows1)
    B1_pad = -(-max(B1, 1) // SUB) * SUB
    big1 = np.zeros((B1_pad, NV_pad2), np.float32)
    big1[:B1] = np.array(rows1)
    big2 = np.zeros((P_pad2, B1_pad), np.float32)
    big2[owner, np.arange(B1)] = 1.0
    return big1, big2


@gc_paused
def prepare(meta, arrays, uniform: bool = False) -> None:
    """Attach the resident-mode numpy constants to ``arrays`` (call BEFORE
    device_put).  No-op when the plan is ineligible or over budget.

    ``uniform``: multichip mode (parallel.MultiChipSpMV) — chips run ONE
    SPMD program under shard_map, so every chip's resident constants must
    share one shape signature.  Harmonized plans already share stream /
    long / outgather shapes; the remaining divergence is the
    data-dependent compression tiers, so uniform mode skips them: the
    incidence column-band trim (per-chip bands differ), perm_c
    compaction (per-chip used-slot sets differ), lo16, and the dd
    cascade split (per-chip fan-ins differ) — dd plans stay streamed
    under shard_map.  Per-chip slabs are ~1/N of the matrix, so the
    full-width constants still fit the budget for every suite arm."""
    if not eligible(meta, arrays):
        return
    if uniform and meta.dtype == "f64":
        return
    res: Dict = {}
    # The streamed executor routes COO-residue sums through extra y2 rows
    # (out_src entries > n_y2_rows; see plan_to_arrays) — those rows do
    # not exist inside the resident kernel's y2 scratch, so strip them to
    # the zero row here; the resident wrapper applies the residue as a
    # (tiny) sorted scatter after the kernel instead.
    src_r = np.minimum(np.asarray(arrays["out_src"]), meta.n_y2_rows)
    if meta.n_long:
        # Compose (long groups' take-sum) o (long_gat gather-sum) into one
        # 0/1 incidence matrix per referenced stream:
        #   scalars = sum_s BIG_s @ totals_s
        # where totals_s[v] is the grand total of stream s's vreg v.
        n_long = meta.n_long
        P_pad = -(-n_long // SUB) * SUB
        cat_rows: List = []        # concat order of souts rows
        for (stream, li) in meta.long_groups:
            idxm = np.asarray(arrays["long_idx"][li])
            cat_rows.append((stream, idxm))
        cat_len = sum(m.shape[0] for _, m in cat_rows)
        gat = np.asarray(arrays["long_gat"])          # (n_long, mult)
        bigs: Dict[int, np.ndarray] = {}
        base = 0
        bounds = []
        for stream, idxm in cat_rows:
            bounds.append((stream, base, idxm))
            base += idxm.shape[0]
        # G[p, c] = multiplicity of concat row c in scalar p
        for stream, b0, idxm in bounds:
            NV_pad = dict((i, nv) for i, (_, _, nv) in
                          enumerate(meta.streams))[stream]
            big = bigs.setdefault(stream, np.zeros((P_pad, NV_pad),
                                                   np.float32))
            # rows of this group referenced by gat
            sel = (gat >= b0) & (gat < b0 + idxm.shape[0])
            ps, ms = np.nonzero(sel)
            local = gat[ps, ms] - b0
            # for each (p, local row j): add idxm[j, :] (clip pad -> drop)
            for p, j in zip(ps, local):
                vv = idxm[j]
                vv = vv[vv < NV_pad]
                np.add.at(big[p], vv, 1.0)
        res["bigs"] = bigs
        # Column-band trim (exact): long groups are packed contiguously
        # within each stream, so every incidence matrix's nonzero columns
        # form one contiguous band (measured: band width == nnz-column
        # count on wikitalk-class plans).  Ship only the band — the
        # kernel slices the totals scratch at tot_base[si]+c0.  8-aligned
        # for clean sublane slicing; saves ~35% of the bigs footprint
        # and the same fraction of the incidence-matmul MXU work.
        res["big_c0"] = {}
        for si, big in (() if uniform else list(bigs.items())):
            nzc = np.nonzero(big.any(axis=0))[0]
            if nzc.size == 0:
                continue
            c0 = int(nzc[0]) // SUB * SUB
            c1 = min(-(-(int(nzc[-1]) + 1) // SUB) * SUB, big.shape[1])
            if c0 > 0 or c1 < big.shape[1]:
                bigs[si] = np.ascontiguousarray(big[:, c0:c1])
                res["big_c0"][si] = c0
        res["split"] = {}
        if meta.dtype == "f64":
            # The incidence matmul f32-accumulates one add per nonzero
            # column; when a scalar's add count exceeds DD_LONG_FANIN_MAX,
            # split that stream's incidence into a two-level cascade
            # big2 @ big1 (column-block partials, then per-scalar sums)
            # so each level stays under the cap regardless of total
            # fan-in (error ~2*cap*2^-24, still ~10x inside the 1e-5
            # contract of main_f64.cu:8).
            for si, big in bigs.items():
                pair = split_incidence(big, DD_LONG_FANIN_MAX)
                if pair == "over":
                    return    # >W*W vregs (~64 Mnnz) in one row: streamed
                if pair is not None:
                    res["split"][si] = pair
        # scalars (P_pad,1) -> (n_long_rows, 128) 127-packed rows:
        #   U = RowSel @ (s * LaneSel)
        rows = meta.n_long_rows
        rowsel = np.zeros((max(rows, 1), P_pad), np.float32)
        lanesel = np.zeros((P_pad, LANES), np.float32)
        for p in range(n_long):
            rowsel[p // LONG_PACK, p] = 1.0
            lanesel[p, p % LONG_PACK] = 1.0
        res["rowsel"] = rowsel
        res["lanesel"] = lanesel
    if meta.dtype == "f64" and all(_dd_f32(meta)):
        # og_f32 mode: with EVERY stream on the f32-colsum tier, the
        # kernel body past the folds also runs single-f32 (folds stay
        # COMPENSATED — dd.sum_axis collapsed to its correctly-rounded
        # f32 total; the outgather adds <= K_SOURCES + overflow terms in
        # f32).  End-to-end error ~2^-23 of row mass (measured ~1e-7),
        # inside main_f64.cu:8's 1e-5 contract — and the lo halves of
        # x/partials/y2/staging plus the unrolled outgather's dd EFT
        # chains disappear, which is what fits wikitalk-class dd plans
        # (147.4M program, 42.9M register spills) into the 128M VMEM.
        res["og_f32"] = True
        # the long-row incidence matrices hold small integer
        # multiplicities: ship them int8 (exact; the kernel upcasts
        # before the MXU matmul) — ~21M -> ~5M on wikitalk-class plans
        if meta.n_long:
            def _i8a(a):
                return a.astype(np.int8) if a.max(initial=0) <= 127 else a
            res["bigs"] = {si: _i8a(a) for si, a in res["bigs"].items()}
            res["split"] = {si: (_i8a(p[0]), _i8a(p[1]))
                            for si, p in res.get("split", {}).items()}
    # transposed scalar tables (see smem_bytes): wide rows, few of them
    res["wins_t"] = [np.ascontiguousarray(st["wins"].T)
                     for st in arrays["streams"]]
    res["src_t"] = np.ascontiguousarray(src_r.T)
    if meta.dtype == "bf16":
        # bf16's halved value stream only pays for HBM bandwidth; once
        # resident in VMEM the per-use bf16->f32 unpack costs VPU time
        # in the compute-bound kernel (measured: cop20k bf16 72 GF vs
        # f32 119 GF).  Upcast the resident copy to f32 when the bigger
        # footprint still fits; keep bf16 when that is what makes the
        # plan fit at all.
        res["vals32"] = [st["vals"].astype(np.float32)
                         for st in arrays["streams"]]
    arrays["resident"] = res
    if smem_bytes(meta, arrays) > SMEM_BUDGET:
        arrays["resident"] = None
        return
    if resident_bytes(meta, arrays) > RESIDENT_BUDGET:
        res.pop("vals32", None)
    if uniform:
        # no data-dependent compression tiers (see docstring): the plan
        # is resident iff the full-width constants fit
        if resident_bytes(meta, arrays) > RESIDENT_BUDGET:
            arrays["resident"] = None
        return
    if resident_bytes(meta, arrays) > RESIDENT_BUDGET:
        # Operand compression, applied only when it is what makes the plan
        # fit (full-width operands cost nothing once resident, so small
        # plans keep them):
        # (a) COMPACT the outgather lane-permutation table: the static
        #     program skips (chunk, slot) pairs whose sources are all the
        #     zero row, so only used slots ship — as int8 (lanes 0..127;
        #     the kernel upcasts per chunk).  Typically 2-4x smaller than
        #     the full (k_used, B_pad, 128) table on power-law plans.
        #     The dynamic-outgather fallback keeps the full table.
        src = src_r
        perm = arrays["out_perm"]       # (K_SOURCES, B_pad, LANES)
        RU = _ru(meta.interpret)
        Z = meta.n_y2_rows
        used_rows = []
        for u in range(meta.B_pad // RU):
            for sk in range(meta.k_used):
                if not (src[u * RU:(u + 1) * RU, sk] == Z).all():
                    used_rows.append(perm[sk, u * RU:(u + 1) * RU, :])
        res["perm_c"] = (np.stack(used_rows).astype(np.int8) if used_rows
                         else np.zeros((1, RU, LANES), np.int8))
    if resident_bytes(meta, arrays) > RESIDENT_BUDGET and meta.n_long:
        # (b) the long-row incidence matrices hold small integer
        #     multiplicities (0/1 almost everywhere; measured max 58 on
        #     wikitalk-class plans) in dense f32 — 44 MB for ~5k nonzeros
        #     on wikitalk.  Store them int8 (exact; kernel upcasts before
        #     the MXU matmul, a ~µs VPU convert) when that is what makes
        #     the plan fit.  Values over int8 range keep f32 (unobserved).
        def _i8(a):
            return a.astype(np.int8) if a.max(initial=0) <= 127 else a
        res["bigs"] = {si: _i8(a) for si, a in res["bigs"].items()}
        res["split"] = {si: (_i8(p[0]), _i8(p[1]))
                        for si, p in res.get("split", {}).items()}
    if resident_bytes(meta, arrays) > RESIDENT_BUDGET and meta.dtype == "f64":
        # (c) dd lo-value streams as bf16: lo carries hi's rounding
        #     residual (<= 2^-24 |v|), so bf16's 8-bit mantissa still
        #     bounds the value error at ~2^-33 |v| — end-to-end ~1e-9
        #     instead of ~1e-13, far inside the reference's 1e-5
        #     contract (main_f64.cu:8).  This is what brings the
        #     webbase-class dd footprint under the VMEM budget.
        #     f32-colsum streams never ship their lo at all (None).
        import ml_dtypes
        dd_f32 = _dd_f32(meta)
        res["lo16"] = [None if dd_f32[si]
                       else st["vals_lo"].astype(ml_dtypes.bfloat16)
                       for si, st in enumerate(arrays["streams"])]
    if resident_bytes(meta, arrays) > RESIDENT_BUDGET:
        arrays["resident"] = None


def _og_program(src_np, Z: int, RU: int):
    """Compile the static out_src table into a per-chunk run program:
    [chunk][slot] -> None (all unused) or [(kind, scr_off, len, y2row)]
    with kind 'consec' (rows r..r+len-1), 'const' (row r repeated), or
    'one'.  Z (the zero row) participates as a normal const source."""
    B, K = src_np.shape
    prog = []
    for u in range(B // RU):
        chunk = []
        for sk in range(K):
            v = src_np[u * RU:(u + 1) * RU, sk].astype(np.int64)
            if (v == Z).all():
                chunk.append(None)
                continue
            runs = []
            i = 0
            while i < RU:
                j = i + 1
                if j < RU and v[j] == v[i]:
                    while j < RU and v[j] == v[i]:
                        j += 1
                    runs.append(("const", i, j - i, int(v[i])))
                elif j < RU and v[j] == v[i] + 1:
                    while j < RU and v[j] == v[j - 1] + 1:
                        j += 1
                    runs.append(("consec", i, j - i, int(v[i])))
                else:
                    runs.append(("one", i, 1, int(v[i])))
                i = j
            chunk.append(runs)
        prog.append(chunk)
    return prog


def make_resident_loop(meta, src_static=None, big_c0_static=None):
    """Build fn(arrays, x2d, iters) -> y (n_rows,) running ``iters``
    chained iterations resident in VMEM.  ``iters`` may be a TRACED
    scalar: the grid dimension is dynamic, so one compile serves every
    iteration count (remote compiles of the fused kernel cost minutes).
    Call only when arrays["resident"] is a dict (see ``prepare``).
    ``src_static``: host copy of the (B_pad, k_used) out_src table —
    enables the statically specialized outgather (falls back to the
    SMEM-driven dynamic one when None)."""
    interpret = meta.interpret
    RU = _ru(interpret)
    # output staging: OG_GROUP og-chunks per HBM DMA (the out buffer
    # lives in HBM; see the outgather section)
    CH_ROWS = _staging_rows(meta) // 2    # shared with resident_bytes
    OG_GROUP = CH_ROWS // RU
    og_prog = (_og_program(np.asarray(src_static), meta.n_y2_rows, RU)
               if src_static is not None else None)
    S = meta.s_rows
    n_streams = len(meta.streams)
    R2 = meta.n_y2_rows + 1
    Z = meta.n_y2_rows
    # Partials are SINGLE-BUFFERED: every stream's colsum output is
    # consumed (sell folds + long totals) before the next stream's
    # colsum overwrites the scratch, so it is sized for the LARGEST
    # stream, not the sum — on webbase-class dd plans this halves the
    # partials footprint (14.2 -> 7.0 MB) and is part of what brings
    # them under the resident budget.
    PART_ROWS = max(NV * (SUB // st) for (_, st, NV) in meta.streams)
    # y2 destination offset of each sell segment, in sell_segs order
    # (the folds now run grouped by stream, so the running-offset
    # bookkeeping must be precomputed)
    seg_y2_off, _acc = [], 0
    for (_, _, n_slices, _, stride_seg) in meta.sell_segs:
        seg_y2_off.append(_acc)
        _acc += n_slices * (SUB // stride_seg)
    # long-referenced streams, in a fixed order
    long_streams = []
    tot_base, tacc = {}, 0

    DD = meta.dtype == "f64"
    dd_f32 = _dd_f32(meta)
    # full_dd_any: some stream still runs the all-dd colsum, so the x-lo
    # table and the lo half of the partials scratch must exist.  When
    # every stream is on the f32-colsum tier both are dropped (lo enters
    # only through the folds' compensated sums).
    full_dd_any = DD and not all(dd_f32)
    # og_f32 mode (prepare): every stream f32cs => the kernel BODY is the
    # single-f32 kernel running on the hi halves — only the folds stay
    # compensated (collapsed to their correctly-rounded f32 totals).
    # DDK gates the kernel/body structure; DD still gates the operator's
    # dict(hi, lo) interface in fn().
    OGF32 = DD and all(dd_f32) and len(dd_f32) > 0
    DDK = DD and not OGF32
    if DD:
        from . import dd

    def kernel_factory(res_keys, og_prog, split_keys=frozenset(),
                       big_c0=None, compact_perm=False):
        have_long = bool(meta.n_long)
        big_c0 = big_c0 or {}

        def kernel(*refs):
            i = 0
            wins, vals, idx = [], [], []
            for si_ in range(n_streams):
                wins.append(refs[i]); i += 1
                if DDK and not dd_f32[si_]:
                    vals.append((refs[i], refs[i + 1])); i += 2
                elif DDK:
                    vals.append((refs[i], None)); i += 1
                else:
                    vals.append(refs[i]); i += 1
                idx.append(refs[i]); i += 1
            if DDK and full_dd_any:
                x_in = (refs[i], refs[i + 1]); i += 2
            elif DDK:
                x_in = (refs[i], None); i += 1
            else:
                x_in = refs[i]; i += 1
            if og_prog is None:
                src_ref = refs[i]; i += 1
            perm_ref = refs[i]; i += 1
            big_refs = {}
            for sidx in res_keys:
                if sidx in split_keys:
                    big_refs[sidx] = (refs[i], refs[i + 1]); i += 2
                else:
                    big_refs[sidx] = refs[i]; i += 1
            if have_long:
                rowsel_ref = refs[i]; i += 1
                lanesel_ref = refs[i]; i += 1
            if DDK:
                out_ref = (refs[i], refs[i + 1]); i += 2
                if full_dd_any:
                    x_scr = (refs[i], refs[i + 1]); i += 2
                    part = (refs[i], refs[i + 1]); i += 2
                else:
                    x_scr = (refs[i], None); i += 1
                    part = (refs[i], None); i += 1
                y2 = (refs[i], refs[i + 1]); i += 2
                if have_long:
                    tot = (refs[i], refs[i + 1]); i += 2
                scr = (refs[i], refs[i + 1]); i += 2
                ostage = (refs[i], refs[i + 1]); i += 2
            else:
                out_ref = refs[i]; i += 1
                x_scr = refs[i]; i += 1
                part = refs[i]; i += 1
                y2 = refs[i]; i += 1
                if have_long:
                    tot = refs[i]; i += 1
                scr = refs[i]; i += 1
                ostage = refs[i]; i += 1
            o_sem = refs[i]; i += 1
            x_sem = refs[i]; i += 1

            t = pl.program_id(0)

            @pl.when(t == 0)
            def _init():
                # x arrives in HBM (memory_space=ANY: no VMEM input block
                # — the resident copy lives only in x_scr, saving
                # S*LANES*4*pair bytes of the budget) and is DMA'd into
                # the scratch once; every iteration reads/updates x_scr.
                if DDK:
                    for j in (0, 1) if full_dd_any else (0,):
                        cp = pltpu.make_async_copy(x_in[j], x_scr[j], x_sem)
                        cp.start()
                        cp.wait()
                    z1 = jnp.zeros((1, LANES), jnp.float32)
                    y2[0][pl.ds(Z, 1), :] = z1
                    y2[1][pl.ds(Z, 1), :] = z1
                else:
                    cp = pltpu.make_async_copy(x_in, x_scr, x_sem)
                    cp.start()
                    cp.wait()
                    y2[pl.ds(Z, 1), :] = jnp.zeros((1, LANES), jnp.float32)

            # ---- per-stream: colsum -> sell folds -> long totals ------
            # The partials scratch is single-buffered (sized for the
            # largest stream): each stream's partials are consumed by its
            # own segment folds and long-total reductions before the next
            # stream's colsum overwrites the buffer.
            for si, (P, stride, NV) in enumerate(meta.streams):
                R = SUB // stride
                base = 0
                w_ref, v_ref, i_ref = wins[si], vals[si], idx[si]

                def cs_body(u, _, P=P, R=R, stride=stride, base=base,
                            w_ref=w_ref, v_ref=v_ref, i_ref=i_ref,
                            f32cs=dd_f32[si]):
                    parts = []
                    parts_l = []
                    for k in range(RU):
                        v = u * RU + k
                        ix = i_ref[pl.ds(v * SUB, SUB), :].astype(jnp.int32)
                        lam = jax.lax.bitwise_and(ix, 127)
                        q = jax.lax.bitwise_and(
                            jax.lax.shift_right_logical(ix, 7), 7)
                        crnd = (jax.lax.shift_right_logical(ix, 10)
                                if P > 1 else None)

                        def gat_s(tab, p):
                            # sublane-gathered window (pre lane gather)
                            w = pl.multiple_of(w_ref[1 + p, v], SUB)
                            xw = tab[pl.ds(w, SUB), :]
                            return jnp.take_along_axis(xw, q, axis=0)

                        def gat(tab):
                            # per-CELL round select over the sublane-
                            # gathered windows, then ONE lane gather (the
                            # round tag is cell data, wplan.py; 1.82 ->
                            # 0.89 ns/vreg/round, tools/roundcost_ab.py)
                            if P == 1:
                                s = gat_s(tab, 0)
                            else:
                                terms = [jnp.where(crnd == p,
                                                   gat_s(tab, p), 0.0)
                                         for p in range(P)]
                                while len(terms) > 1:
                                    terms = [terms[j] + terms[j + 1]
                                             if j + 1 < len(terms)
                                             else terms[j]
                                             for j in range(0,
                                                            len(terms), 2)]
                                s = terms[0]
                            return jnp.take_along_axis(s, lam, axis=1)

                        if DDK and f32cs:
                            # f32-colsum tier (DD_F32_COLSUM_P): products
                            # and sublane sums over the hi halves in
                            # plain f32; lo partials are an implicit
                            # zero, every downstream reduction stays
                            # compensated dd.  Error ~2^-23 of the row's
                            # absolute mass (inside main_f64.cu:8's 1e-5
                            # contract) — and the dd EFT chains whose
                            # live-vector set caused the 42.5 MiB
                            # register-spill overhead disappear.
                            vh = v_ref[0][pl.ds(v * SUB, SUB), :]
                            prod = vh * gat(x_scr[0])
                            for L in range(R):
                                parts.append(jnp.sum(
                                    prod[L * stride:(L + 1) * stride],
                                    axis=0, keepdims=True))
                            continue
                        if DDK:
                            vh = v_ref[0][pl.ds(v * SUB, SUB), :]
                            # lo may be stored bf16 (footprint compression,
                            # see prepare); upcast is a no-op for f32
                            vl = v_ref[1][pl.ds(v * SUB, SUB), :].astype(
                                jnp.float32)
                            gh = gat(x_scr[0])
                            gl = gat(x_scr[1])
                            ph_, pl_ = dd.mul(vh, vl, gh, gl)
                            for L in range(R):
                                sh, sl = dd.sum_axis(
                                    ph_[L * stride:(L + 1) * stride],
                                    pl_[L * stride:(L + 1) * stride], 0)
                                parts.append(sh[None])
                                parts_l.append(sl[None])
                            continue
                        va = v_ref[pl.ds(v * SUB, SUB), :]
                        prod = va.astype(jnp.float32) * gat(x_scr)
                        for L in range(R):
                            parts.append(jnp.sum(
                                prod[L * stride:(L + 1) * stride], axis=0,
                                keepdims=True))
                    if DDK and f32cs:
                        part[0][pl.ds(base + u * RU * R, RU * R), :] = \
                            jnp.concatenate(parts, 0)
                    elif DDK:
                        part[0][pl.ds(base + u * RU * R, RU * R), :] = \
                            jnp.concatenate(parts, 0)
                        part[1][pl.ds(base + u * RU * R, RU * R), :] = \
                            jnp.concatenate(parts_l, 0)
                    else:
                        part[pl.ds(base + u * RU * R, RU * R), :] = \
                            jnp.concatenate(parts, 0)
                    return 0

                jax.lax.fori_loop(0, NV // RU, cs_body, 0)

                # -- this stream's sell-segment folds into y2 --
                for seg_i, (stream, off, n_slices, w8, stride_seg) in \
                        enumerate(meta.sell_segs):
                    if stream != si:
                        continue
                    R_st = SUB // meta.streams[stream][1]
                    R_seg = SUB // stride_seg
                    F = R_st // R_seg
                    seg_base = off * R_st
                    rows_per = w8 * R_st
                    seg_row = seg_y2_off[seg_i]

                    # i0 is in SLICE units everywhere (the fori passes
                    # i * SEG_CHUNK) — a chunk-index/slice-index mixup
                    # here produced overlapping folds that only surfaced
                    # on plans with segments longer than one chunk.
                    def fold(i0, count, seg_row=seg_row, base=seg_base,
                             rows_per=rows_per, w8=w8, R=R_seg, F=F,
                             f32cs=dd_f32[si]):
                        sl_rows = pl.ds(base + i0 * rows_per,
                                        count * rows_per)
                        dst = pl.ds(seg_row + i0 * R, count * R)
                        if DDK:
                            vh = part[0][sl_rows, :]
                            # f32-colsum streams: lo partials are an
                            # implicit zero (never written); the dd fold
                            # still captures the fold's own rounding
                            vl = (jnp.zeros_like(vh) if f32cs
                                  else part[1][sl_rows, :])
                            if w8 == 1 and F == 1:
                                fh, fl = vh, vl
                            else:
                                sh = vh.reshape(count, w8, R, F, LANES)
                                sl_ = vl.reshape(count, w8, R, F, LANES)
                                if F > 1:
                                    sh, sl_ = dd.sum_axis(sh, sl_, 3)
                                else:
                                    sh = sh.reshape(count, w8, R, LANES)
                                    sl_ = sl_.reshape(count, w8, R, LANES)
                                sh, sl_ = dd.sum_axis(sh, sl_, 1)
                                fh = sh.reshape(count * R, LANES)
                                fl = sl_.reshape(count * R, LANES)
                            y2[0][dst, :] = fh
                            y2[1][dst, :] = fl
                            return
                        v = part[sl_rows, :]
                        if w8 == 1 and F == 1:
                            f = v
                        elif OGF32:
                            # og_f32: folds stay COMPENSATED (collapsed
                            # to the correctly-rounded f32 total) so the
                            # end-to-end error stays ~2^-23 of row mass
                            # even for 128-term folds
                            sh = v.reshape(count, w8, R, F, LANES)
                            zl = jnp.zeros_like(sh)
                            if F > 1:
                                sh, zl = dd.sum_axis(sh, zl, 3)
                            else:
                                sh = sh.reshape(count, w8, R, LANES)
                                zl = zl.reshape(count, w8, R, LANES)
                            sh, zl = dd.sum_axis(sh, zl, 1)
                            f = (sh + zl).reshape(count * R, LANES)
                        else:
                            f = v.reshape(count, w8, R, F, LANES) \
                                 .sum((1, 3)).reshape(count * R, LANES)
                        y2[dst, :] = f

                    nfull = n_slices // SEG_CHUNK
                    tail = n_slices % SEG_CHUNK
                    if nfull:
                        jax.lax.fori_loop(
                            0, nfull,
                            lambda i, _, fold=fold: (
                                fold(i * SEG_CHUNK, SEG_CHUNK), 0)[1],
                            0)
                    if tail:
                        fold(nfull * SEG_CHUNK, tail)

                # -- this stream's long-row per-vreg totals --
                if have_long and si in long_streams:
                    R_st = SUB // stride
                    tb = tot_base[si]

                    def tl_body(u, _, R_st=R_st, tb=tb, f32cs=dd_f32[si]):
                        rows = pl.ds(u * RU * R_st, RU * R_st)
                        dst = pl.ds(tb + u * RU, RU)
                        if DDK:
                            ph_t = part[0][rows, :].reshape(RU, R_st, LANES)
                            pl_t = (jnp.zeros_like(ph_t) if f32cs
                                    else part[1][rows, :].reshape(
                                        RU, R_st, LANES))
                            th, tl = dd.sum_axis(ph_t, pl_t, 1)
                            tot[0][dst, :] = th
                            tot[1][dst, :] = tl
                        elif OGF32:
                            v = part[rows, :].reshape(RU, R_st, LANES)
                            th, tl = dd.sum_axis(v, jnp.zeros_like(v), 1)
                            tot[dst, :] = th + tl
                        else:
                            v = part[rows, :]
                            tot[dst, :] = \
                                v.reshape(RU, R_st, LANES).sum(axis=1)
                        return 0

                    jax.lax.fori_loop(0, NV // RU, tl_body, 0)

            # ---- long rows: scalar composition ------------------------
            # Per-vreg totals are kept LANE-WIDE throughout (Mosaic's
            # layout inference rejects rank-1 / 1-lane intermediates):
            # totals rows hold per-lane partial sums; the lane fold is an
            # all-ones MXU matmul fused into the scalar composition.
            if have_long:
                def mm(a, b):
                    return jnp.dot(a, b,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)

                if DDK:
                    # hi/lo pass separately through the 0/1 incidence
                    # matmul (fan-in gated in ``prepare``); streams
                    # combine with compensated adds
                    s_h = s_l = None
                    for si in long_streams:
                        br = big_refs[si]
                        # trimmed incidence width (big_c0): slice the
                        # totals at the band offset
                        W = (br[0] if isinstance(br, tuple) else br).shape[1]
                        tb = tot_base[si] + big_c0.get(si, 0)
                        t_h = tot[0][pl.ds(tb, W), :]
                        t_l = tot[1][pl.ds(tb, W), :]
                        if isinstance(br, tuple):
                            # fan-in > cap: two-level cascade (prepare)
                            b1 = br[0][...].astype(jnp.float32)
                            b2 = br[1][...].astype(jnp.float32)
                            th = mm(b2, mm(b1, t_h))
                            tl = mm(b2, mm(b1, t_l))
                        else:
                            b = br[...].astype(jnp.float32)
                            th = mm(b, t_h)
                            tl = mm(b, t_l)
                        if s_h is None:
                            s_h, s_l = th, tl
                        else:
                            s_h, s_l = dd.add(s_h, s_l, th, tl)
                    # dd lane fold: log2(128) rotate-and-add passes keep
                    # every intermediate full-width (Mosaic rejects
                    # rank-1/1-lane shapes), leaving the total in every
                    # lane — the scatter matmuls below are then exact
                    # one-hot selections
                    for shft in (64, 32, 16, 8, 4, 2, 1):
                        rh = jnp.roll(s_h, shft, axis=1)
                        rl = jnp.roll(s_l, shft, axis=1)
                        s_h, s_l = dd.add(s_h, s_l, rh, rl)
                    dst = pl.ds(Z - meta.n_long_rows, meta.n_long_rows)
                    lsel = lanesel_ref[...]
                    y2[0][dst, :] = mm(rowsel_ref[...], s_h * lsel)
                    y2[1][dst, :] = mm(rowsel_ref[...], s_l * lsel)
                else:
                    s_row = None
                    for si in long_streams:
                        br = big_refs[si]
                        # og_f32 keeps the dd fan-in cascade (prepare
                        # splits for dtype f64): the f32 accumulation
                        # per matmul LEVEL stays capped
                        W = (br[0] if isinstance(br, tuple)
                             else br).shape[1]
                        tb = tot_base[si] + big_c0.get(si, 0)
                        t_h = tot[pl.ds(tb, W), :]
                        if isinstance(br, tuple):
                            b1 = br[0][...].astype(jnp.float32)
                            b2 = br[1][...].astype(jnp.float32)
                            term = mm(b2, mm(b1, t_h))
                        else:
                            term = mm(br[...].astype(jnp.float32), t_h)
                        s_row = term if s_row is None else s_row + term
                    # broadcast the per-scalar lane sum across lanes, then
                    # scatter scalars to their 127-packed (row, lane) homes
                    ones = jnp.ones((LANES, LANES), jnp.float32)
                    s_b = mm(s_row, ones)
                    u_rows = mm(rowsel_ref[...], s_b * lanesel_ref[...])
                    y2[pl.ds(Z - meta.n_long_rows, meta.n_long_rows), :] = \
                        u_rows

            # ---- outgather against y2 ---------------------------------
            def scr_fill(dst_scr, src_y2, runs):
                for kind, o, L, r in runs:
                    if kind == "consec":
                        dst_scr[o:o + L, :] = src_y2[r:r + L, :]
                    elif kind == "const":
                        dst_scr[o:o + L, :] = jnp.broadcast_to(
                            src_y2[r:r + 1, :], (L, LANES))
                    else:
                        dst_scr[o:o + 1, :] = src_y2[r:r + 1, :]

            # The output buffer lives in HBM (memory_space=ANY): keeping
            # it out of VMEM frees B_pad*128*4*pair bytes of the resident
            # budget (8-19 MB on webbase/wikitalk-class plans), and the
            # per-iteration HBM write matches the reference kernel's
            # global-memory Y stores (dasp_f64.h:178-183).  Assembled
            # chunks are staged in a double-buffered VMEM scratch and
            # DMA'd out OG_GROUP og-chunks at a time; a buffer is only
            # refilled after its previous copy completed.
            def _stage_write(buf, k, ah, al=None):
                r0 = buf * CH_ROWS + k * RU
                if DDK:
                    ostage[0][r0:r0 + RU, :] = ah
                    ostage[1][r0:r0 + RU, :] = al
                else:
                    ostage[r0:r0 + RU, :] = ah

            def _group_copy(buf, base, rows_n, dyn=False):
                """Start the HBM copy of ``rows_n`` staged rows; returns
                the copy descriptors (callers wait before buffer reuse)."""
                s0 = buf * CH_ROWS
                cps = []
                srcs = (ostage if DDK else (ostage,))
                dsts = (out_ref if DDK else (out_ref,))
                for j, (sref, dref) in enumerate(zip(srcs, dsts)):
                    cp = pltpu.make_async_copy(
                        sref.at[pl.ds(s0, rows_n)],
                        dref.at[pl.ds(base, rows_n)],
                        o_sem.at[buf, j])
                    cp.start()
                    cps.append(cp)
                return cps

            if og_prog is not None:
                # STATIC program: out_src is pack-time data, so the row
                # assembly is fully specialized — runs of consecutive
                # source rows become one block copy, rows shared by a run
                # of blocks (bucket/rem slices span consecutive blocks)
                # become one broadcast, and all-unused slots are skipped.
                # This collapses the per-block (1,128) copy chain that
                # issue-limits the dynamic outgather.
                n_u = meta.B_pad // RU
                pending = [None, None]
                m_used = 0      # running used-slot index (compact table
                                # order matches prepare's (u, sk) scan)
                for u in range(n_u):
                    g, k = divmod(u, OG_GROUP)
                    buf = g & 1
                    if k == 0 and pending[buf] is not None:
                        for cp in pending[buf]:
                            cp.wait()
                        pending[buf] = None
                    acc2 = None
                    for sk, runs in enumerate(og_prog[u]):
                        if runs is None:
                            continue
                        if compact_perm:
                            pr = perm_ref[m_used].astype(jnp.int32)
                            m_used += 1
                        else:
                            pr = perm_ref[
                                sk, u * RU:(u + 1) * RU, :].astype(
                                jnp.int32)
                        if DDK:
                            scr_fill(scr[0], y2[0], runs)
                            scr_fill(scr[1], y2[1], runs)
                            gh = jnp.take_along_axis(scr[0][0:RU, :], pr,
                                                     axis=1)
                            gl = jnp.take_along_axis(scr[1][0:RU, :], pr,
                                                     axis=1)
                            acc2 = ((gh, gl) if acc2 is None
                                    else dd.add(acc2[0], acc2[1], gh, gl))
                        else:
                            scr_fill(scr, y2, runs)
                            g_ = jnp.take_along_axis(scr[0:RU, :], pr,
                                                     axis=1)
                            acc2 = g_ if acc2 is None else acc2 + g_
                    zz = jnp.zeros((RU, LANES), jnp.float32)
                    if DDK:
                        ah, al = acc2 if acc2 is not None else (zz, zz)
                        _stage_write(buf, k, ah, al)
                    else:
                        _stage_write(buf, k,
                                     acc2 if acc2 is not None else zz)
                    if k == OG_GROUP - 1 or u == n_u - 1:
                        pending[buf] = _group_copy(
                            buf, g * OG_GROUP * RU, (k + 1) * RU)
                for buf in (0, 1):
                    if pending[buf] is not None:
                        for cp in pending[buf]:
                            cp.wait()
            else:
                # dynamic fallback (no host src table): assemble one
                # og-chunk into stage buffer 0, then a SYNCHRONOUS copy
                # per chunk — correctness-first; the production path is
                # the static program above.
                def og_body(u, _):
                    rows = pl.ds(u * RU, RU)
                    acc2 = None
                    for sk in range(meta.k_used):
                        if DDK:
                            for k in range(RU):
                                r = pl.ds(src_ref[sk, u * RU + k], 1)
                                scr[0][pl.ds(k, 1), :] = y2[0][r, :]
                                scr[1][pl.ds(k, 1), :] = y2[1][r, :]
                        else:
                            for k in range(RU):
                                scr[pl.ds(k, 1), :] = \
                                    y2[pl.ds(src_ref[sk, u * RU + k], 1), :]
                        pr = perm_ref[sk, rows, :].astype(jnp.int32)
                        if DDK:
                            gh = jnp.take_along_axis(scr[0][0:RU, :], pr,
                                                     axis=1)
                            gl = jnp.take_along_axis(scr[1][0:RU, :], pr,
                                                     axis=1)
                            acc2 = ((gh, gl) if acc2 is None
                                    else dd.add(acc2[0], acc2[1], gh, gl))
                        else:
                            g = jnp.take_along_axis(scr[0:RU, :], pr,
                                                    axis=1)
                            acc2 = g if acc2 is None else acc2 + g
                    if DDK:
                        ostage[0][0:RU, :] = acc2[0]
                        ostage[1][0:RU, :] = acc2[1]
                    else:
                        ostage[0:RU, :] = acc2
                    srcs = (ostage if DDK else (ostage,))
                    dsts = (out_ref if DDK else (out_ref,))
                    for j, (sref, dref) in enumerate(zip(srcs, dsts)):
                        cp = pltpu.make_async_copy(
                            sref.at[pl.ds(0, RU)],
                            dref.at[pl.ds(u * RU, RU)],
                            o_sem.at[0, j])
                        cp.start()
                        cp.wait()
                    return 0

                jax.lax.fori_loop(0, meta.B_pad // RU, og_body, 0)

            # ---- chain: perturb resident x by the fresh result --------
            # (sourced from y2, this iteration's folded output — the HBM
            # out buffer is no longer VPU-readable)
            if DDK:
                x_scr[0][...] = x_scr[0][...] + \
                    y2[0][pl.ds(0, 1), :] * jnp.float32(1e-36)
            else:
                x_scr[...] = x_scr[...] + y2[pl.ds(0, 1), :] * \
                    jnp.float32(1e-36)

        return kernel

    def build(arrays, iters):
        res = arrays["resident"]
        res_keys = sorted(res["bigs"].keys()) if meta.n_long else []
        nonlocal long_streams, tot_base, tacc
        long_streams = res_keys
        tot_base, tacc = {}, 0
        for si in res_keys:
            tot_base[si] = tacc
            tacc += meta.streams[si][2]

        in_specs = []
        operands = []
        for si, ((P, stride, NV), st) in enumerate(
                zip(meta.streams, arrays["streams"])):
            in_specs.append(pl.BlockSpec((P + 1, NV), lambda t: (0, 0),
                                         memory_space=pltpu.SMEM))
            operands.append(res["wins_t"][si])
            vspec = pl.BlockSpec((NV * SUB, LANES), lambda t: (0, 0),
                                 memory_space=pltpu.VMEM)
            if DDK:
                in_specs.append(vspec)
                operands.append(st["vals_hi"])
                if not dd_f32[si]:
                    in_specs.append(vspec)
                    lo16 = res.get("lo16")
                    operands.append(
                        lo16[si] if lo16 is not None
                        and lo16[si] is not None else st["vals_lo"])
            elif DD:                  # og_f32: ship the hi halves only
                in_specs.append(vspec)
                operands.append(st["vals_hi"])
            else:
                in_specs.append(vspec)
                v32 = res.get("vals32")
                operands.append(v32[si] if v32 is not None else st["vals"])
            in_specs.append(pl.BlockSpec((NV * SUB, LANES),
                                         lambda t: (0, 0),
                                         memory_space=pltpu.VMEM))
            operands.append(st["idx"])
        x_spec_idx = len(in_specs)
        # x stays in HBM (ANY): the kernel DMAs it into x_scr at t==0, so
        # no VMEM input block is allocated for it (see _init)
        xspec = pl.BlockSpec(memory_space=pl.ANY)
        in_specs.append(xspec)
        if full_dd_any:
            in_specs.append(xspec)
        if og_prog is None:
            in_specs.append(pl.BlockSpec((meta.k_used, meta.B_pad),
                                         lambda t: (0, 0),
                                         memory_space=pltpu.SMEM))
            operands.append(res["src_t"])
        perm_c = res.get("perm_c")
        compact_perm = og_prog is not None and perm_c is not None
        if compact_perm:
            in_specs.append(pl.BlockSpec(
                perm_c.shape, lambda t: (0, 0, 0),
                memory_space=pltpu.VMEM))
            operands.append(perm_c)
        else:
            in_specs.append(pl.BlockSpec(
                (meta.k_used, meta.B_pad, LANES), lambda t: (0, 0, 0),
                memory_space=pltpu.VMEM))
            operands.append(arrays["out_perm"])
        split = res.get("split", {}) if meta.n_long else {}
        for si in res_keys:
            for big in (split[si] if si in split else (res["bigs"][si],)):
                in_specs.append(pl.BlockSpec(big.shape, lambda t: (0, 0),
                                             memory_space=pltpu.VMEM))
                operands.append(big)
        if meta.n_long:
            in_specs.append(pl.BlockSpec(res["rowsel"].shape,
                                         lambda t: (0, 0),
                                         memory_space=pltpu.VMEM))
            operands.append(res["rowsel"])
            in_specs.append(pl.BlockSpec(res["lanesel"].shape,
                                         lambda t: (0, 0),
                                         memory_space=pltpu.VMEM))
            operands.append(res["lanesel"])

        rep = 2 if DDK else 1
        # x-lo scratch and lo partials exist only while some stream still
        # runs the all-dd colsum (see full_dd_any above)
        xrep = 2 if full_dd_any else 1
        scratch = []
        scratch += [pltpu.VMEM((S, LANES), jnp.float32)] * xrep  # x_scr
        scratch += [pltpu.VMEM((PART_ROWS, LANES),
                               jnp.float32)] * xrep             # partials
        scratch += [pltpu.VMEM((R2, LANES), jnp.float32)] * rep  # y2
        if meta.n_long:
            scratch += [pltpu.VMEM((max(tacc, 8), LANES),
                                   jnp.float32)] * rep
        scratch += [pltpu.VMEM((RU, LANES), jnp.float32)] * rep  # og scr
        # double-buffered output staging (the out buffer itself is HBM)
        scratch += [pltpu.VMEM((2 * CH_ROWS, LANES), jnp.float32)] * rep
        scratch.append(pltpu.SemaphoreType.DMA((2, rep)))  # out copies
        scratch.append(pltpu.SemaphoreType.DMA)      # x HBM->VMEM copy

        ospec = pl.BlockSpec(memory_space=pl.ANY)
        oshape = jax.ShapeDtypeStruct((meta.B_pad, LANES), jnp.float32)
        call = pl.pallas_call(
            kernel_factory(res_keys, og_prog, frozenset(split),
                           big_c0_static, compact_perm),
            grid=(iters,),
            in_specs=in_specs,
            out_specs=(ospec, ospec) if DDK else ospec,
            out_shape=(oshape, oshape) if DDK else oshape,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT),
            interpret=interpret,
        )
        return call, operands, x_spec_idx

    def fn(arrays, x2d, iters):
        call, operands, _ = build(arrays, iters)
        # operands list excludes x; insert it at its position
        full = []
        n_lead = sum(3 + (1 if DD and not dd_f32[si] else 0)
                     for si in range(n_streams))
        full.extend(operands[:n_lead])
        if DD:
            full.append(x2d["hi"])
            if full_dd_any:
                full.append(x2d["lo"])
        else:
            full.append(x2d)
        full.extend(operands[n_lead:])
        out = call(*full)
        if DD:
            from . import dd
            if OGF32:
                # og_f32: the kernel emits a single f32 y; lo enters
                # only through the overflow correction below
                yh = out.reshape(-1)[:meta.n_rows]
                yl = jnp.zeros_like(yh)
            else:
                yh = out[0].reshape(-1)[:meta.n_rows]
                yl = out[1].reshape(-1)[:meta.n_rows].astype(jnp.float32)
            if arrays["overflow"] is not None:
                # mirror of the streamed dd overflow correction
                # (pallas_backend._spmv_dd): per-row compensated
                # octave-tree sums placed exactly, then one dd add
                # (the resident kernel's y2 scratch has no residue
                # rows, so the y2 route does not apply here)
                o = arrays["overflow"]
                gh = jnp.take(x2d["hi"].reshape(-1), o["cols"],
                              mode="clip")
                gl = jnp.take(x2d["lo"].reshape(-1), o["cols"],
                              mode="clip")
                ph, plo = dd.mul(o["vals_hi"], o["vals_lo"], gh, gl,
                                 safe=True)
                ph = jnp.concatenate([ph, jnp.zeros(1, jnp.float32)])
                plo = jnp.concatenate([plo, jnp.zeros(1, jnp.float32)])
                parts_h, parts_l = [], []
                for t in o["trees"]:
                    if t.shape[1] > 1:
                        sh, sl = dd.sum_axis(
                            jnp.take(ph, t, mode="clip"),
                            jnp.take(plo, t, mode="clip"), 1, safe=True)
                    else:
                        sh = jnp.take(ph, t[:, 0], mode="clip")
                        sl = jnp.take(plo, t[:, 0], mode="clip")
                    parts_h.append(sh)
                    parts_l.append(sl)
                ch = jnp.take(jnp.concatenate(parts_h), o["sort_back"])
                cl = jnp.take(jnp.concatenate(parts_l), o["sort_back"])
                zh = jnp.zeros_like(yh).at[o["tree_rows"]].set(
                    ch, mode="drop", indices_are_sorted=True,
                    unique_indices=True)
                zl = jnp.zeros_like(yl).at[o["tree_rows"]].set(
                    cl, mode="drop", indices_are_sorted=True,
                    unique_indices=True)
                yh, yl = dd.add(yh, yl, zh, zl, safe=True)
            return dict(hi=yh, lo=yl)
        y = out.reshape(-1)[:meta.n_rows]
        if arrays["overflow"] is not None:
            # pre-sum duplicates through the octave trees so the
            # scatter-add runs unique+sorted (see plan_to_arrays)
            o = arrays["overflow"]
            xg = jnp.take(x2d.reshape(-1), o["cols"], mode="clip")
            pc = jnp.concatenate([o["vals"] * xg,
                                  jnp.zeros(1, jnp.float32)])
            parts = [jnp.take(pc, t, mode="clip").sum(axis=1)
                     if t.shape[1] > 1 else
                     jnp.take(pc, t[:, 0], mode="clip")
                     for t in o["trees"]]
            c = jnp.take(jnp.concatenate(parts), o["sort_back"])
            y = y.at[o["tree_rows"]].add(c, mode="drop",
                                         indices_are_sorted=True,
                                         unique_indices=True)
        if meta.dtype == "bf16":
            y = y.astype(jnp.bfloat16)
        return y

    return fn
