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

# Confirmed working at 100.7 MB of resident operands (resident_probe.py);
# leave headroom for Mosaic's own scratch.
RESIDENT_BUDGET = 96 * 1024 * 1024
VMEM_LIMIT = 128 * 1024 * 1024
SMEM_BUDGET = 512 * 1024
SEG_CHUNK = 8        # slices folded per segment-loop step


def _ru(interpret: bool) -> int:
    if interpret:
        return 8
    import os
    return int(os.environ.get("DASP_RES_RU", "32"))


def resident_bytes(meta, arrays) -> int:
    """Total VMEM footprint of operands + scratch for the resident call."""
    n = 0
    for st in arrays["streams"]:
        for k, a in st.items():
            if k != "wins":
                n += a.nbytes if hasattr(a, "nbytes") else 0
    n += arrays["out_perm"].nbytes
    n += meta.s_rows * LANES * 4 * 2          # x operand + x scratch
    part_rows = sum(NV * (SUB // st) for _, st, NV in meta.streams)
    n += part_rows * LANES * 4                # partials scratch
    n += (meta.n_y2_rows + 1) * LANES * 4     # y2 scratch
    n += meta.B_pad * LANES * 4               # output
    res = arrays.get("resident")
    if res:
        for a in res.get("bigs", {}).values():
            n += a.nbytes
        if res.get("rowsel") is not None:
            n += res["rowsel"].nbytes + res["lanesel"].nbytes
    return n


def smem_bytes(meta, arrays) -> int:
    # SMEM charges per ROW (each row pads to a full 512 B word line), so
    # the scalar tables are stored TRANSPOSED: (P+1, NV) / (k, B_pad).
    def row_cost(rows, cols):
        return rows * max(-(-cols // LANES) * LANES, LANES) * 4
    n = row_cost(meta.k_used, meta.B_pad)
    for (P, _, NV) in meta.streams:
        n += row_cost(P + 1, NV)
    return n


def eligible(meta, arrays) -> bool:
    """Resident mode preconditions (structural; size checked separately)."""
    if meta.dtype not in ("f32", "bf16"):
        return False
    if any(P > 32 for P, _, _ in meta.streams):
        return False               # dynamic-round streams stay HBM-streamed
    return True


def prepare(meta, arrays) -> None:
    """Attach the resident-mode numpy constants to ``arrays`` (call BEFORE
    device_put).  No-op when the plan is ineligible or over budget."""
    if not eligible(meta, arrays):
        return
    res: Dict = {}
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
    # transposed scalar tables (see smem_bytes): wide rows, few of them
    res["wins_t"] = [np.ascontiguousarray(st["wins"].T)
                     for st in arrays["streams"]]
    res["src_t"] = np.ascontiguousarray(arrays["out_src"].T)
    arrays["resident"] = res
    if (resident_bytes(meta, arrays) > RESIDENT_BUDGET
            or smem_bytes(meta, arrays) > SMEM_BUDGET):
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


def make_resident_loop(meta, src_static=None):
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
    og_prog = (_og_program(np.asarray(src_static), meta.n_y2_rows, RU)
               if src_static is not None else None)
    S = meta.s_rows
    n_streams = len(meta.streams)
    R2 = meta.n_y2_rows + 1
    Z = meta.n_y2_rows
    part_base, acc = [], 0
    for (_, st, NV) in meta.streams:
        part_base.append(acc)
        acc += NV * (SUB // st)
    PART_ROWS = acc
    # long-referenced streams, in a fixed order
    long_streams = []
    tot_base, tacc = {}, 0

    def kernel_factory(res_keys, og_prog):
        have_long = bool(meta.n_long)

        def kernel(*refs):
            i = 0
            wins, vals, idx = [], [], []
            for _ in range(n_streams):
                wins.append(refs[i]); vals.append(refs[i + 1])
                idx.append(refs[i + 2]); i += 3
            x_in = refs[i]; i += 1
            if og_prog is None:
                src_ref = refs[i]; i += 1
            perm_ref = refs[i]; i += 1
            big_refs = {}
            for sidx in res_keys:
                big_refs[sidx] = refs[i]; i += 1
            if have_long:
                rowsel_ref = refs[i]; i += 1
                lanesel_ref = refs[i]; i += 1
            out_ref = refs[i]; i += 1
            x_scr = refs[i]; i += 1
            part = refs[i]; i += 1
            y2 = refs[i]; i += 1
            if have_long:
                tot = refs[i]; i += 1
            scr = refs[i]; i += 1

            t = pl.program_id(0)

            @pl.when(t == 0)
            def _init():
                x_scr[...] = x_in[...]
                y2[pl.ds(Z, 1), :] = jnp.zeros((1, LANES), jnp.float32)

            # ---- colsum into partials scratch -------------------------
            for si, (P, stride, NV) in enumerate(meta.streams):
                R = SUB // stride
                base = part_base[si]
                w_ref, v_ref, i_ref = wins[si], vals[si], idx[si]

                def cs_body(u, _, P=P, R=R, stride=stride, base=base,
                            w_ref=w_ref, v_ref=v_ref, i_ref=i_ref):
                    parts = []
                    for k in range(RU):
                        v = u * RU + k
                        ix = i_ref[pl.ds(v * SUB, SUB), :].astype(jnp.int32)
                        va = v_ref[pl.ds(v * SUB, SUB), :]
                        lam = jax.lax.bitwise_and(ix, 127)
                        q = jax.lax.bitwise_and(
                            jax.lax.shift_right_logical(ix, 7), 7)
                        if P == 1:
                            w = pl.multiple_of(w_ref[1, v], SUB)
                            xw = x_scr[pl.ds(w, SUB), :]
                            g = jnp.take_along_axis(xw, q, axis=0)
                            g = jnp.take_along_axis(g, lam, axis=1)
                        else:
                            rnd = jax.lax.shift_right_logical(ix, 10)
                            terms = []
                            for p in range(P):
                                w = pl.multiple_of(w_ref[1 + p, v], SUB)
                                xw = x_scr[pl.ds(w, SUB), :]
                                gp = jnp.take_along_axis(xw, q, axis=0)
                                gp = jnp.take_along_axis(gp, lam, axis=1)
                                terms.append(jnp.where(rnd == p, gp, 0.0))
                            while len(terms) > 1:
                                terms = [terms[j] + terms[j + 1]
                                         if j + 1 < len(terms) else terms[j]
                                         for j in range(0, len(terms), 2)]
                            g = terms[0]
                        prod = va.astype(jnp.float32) * g
                        for L in range(R):
                            parts.append(jnp.sum(
                                prod[L * stride:(L + 1) * stride], axis=0,
                                keepdims=True))
                    part[pl.ds(base + u * RU * R, RU * R), :] = \
                        jnp.concatenate(parts, 0)
                    return 0

                jax.lax.fori_loop(0, NV // RU, cs_body, 0)

            # ---- sell-segment folds into y2 ---------------------------
            seg_row = 0
            for (stream, off, n_slices, w8, stride_seg) in meta.sell_segs:
                R_st = SUB // meta.streams[stream][1]
                R = SUB // stride_seg
                F = R_st // R
                base = part_base[stream] + off * R_st
                rows_per = w8 * R_st

                # i0 is in SLICE units everywhere (the fori passes
                # i * SEG_CHUNK) — a chunk-index/slice-index mixup here
                # produced overlapping folds that only surfaced on plans
                # with segments longer than one chunk.
                def fold(i0, count, seg_row=seg_row, base=base,
                         rows_per=rows_per, w8=w8, R=R, F=F):
                    v = part[pl.ds(base + i0 * rows_per, count * rows_per), :]
                    if w8 == 1 and F == 1:
                        f = v
                    else:
                        f = v.reshape(count, w8, R, F, LANES).sum((1, 3)) \
                             .reshape(count * R, LANES)
                    y2[pl.ds(seg_row + i0 * R, count * R), :] = f

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
                seg_row += n_slices * R

            # ---- long rows --------------------------------------------
            # Per-vreg totals are kept LANE-WIDE throughout (Mosaic's
            # layout inference rejects rank-1 / 1-lane intermediates):
            # totals rows hold per-lane partial sums; the lane fold is an
            # all-ones MXU matmul fused into the scalar composition.
            if have_long:
                for si in long_streams:
                    P, stride, NV = meta.streams[si]
                    R_st = SUB // stride
                    base = part_base[si]
                    tb = tot_base[si]

                    def tl_body(u, _, base=base, R_st=R_st, tb=tb):
                        v = part[pl.ds(base + u * RU * R_st, RU * R_st), :]
                        tv = v.reshape(RU, R_st, LANES).sum(axis=1)
                        tot[pl.ds(tb + u * RU, RU), :] = tv
                        return 0

                    jax.lax.fori_loop(0, NV // RU, tl_body, 0)
                s_row = None
                for si in long_streams:
                    NV = meta.streams[si][2]
                    term = jnp.dot(big_refs[si][...],
                                   tot[pl.ds(tot_base[si], NV), :],
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
                    s_row = term if s_row is None else s_row + term
                # broadcast the per-scalar lane sum across lanes, then
                # scatter scalars to their 127-packed (row, lane) homes
                ones = jnp.ones((LANES, LANES), jnp.float32)
                s_b = jnp.dot(s_row, ones,
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
                u_rows = jnp.dot(rowsel_ref[...], s_b * lanesel_ref[...],
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
                y2[pl.ds(Z - meta.n_long_rows, meta.n_long_rows), :] = u_rows

            # ---- outgather against y2 ---------------------------------
            if og_prog is not None:
                # STATIC program: out_src is pack-time data, so the row
                # assembly is fully specialized — runs of consecutive
                # source rows become one block copy, rows shared by a run
                # of blocks (bucket/rem slices span consecutive blocks)
                # become one broadcast, and all-unused slots are skipped.
                # This collapses the per-block (1,128) copy chain that
                # issue-limits the dynamic outgather.
                for u in range(meta.B_pad // RU):
                    acc2 = None
                    for sk, runs in enumerate(og_prog[u]):
                        if runs is None:
                            continue
                        for kind, o, L, r in runs:
                            if kind == "consec":
                                scr[o:o + L, :] = y2[r:r + L, :]
                            elif kind == "const":
                                scr[o:o + L, :] = jnp.broadcast_to(
                                    y2[r:r + 1, :], (L, LANES))
                            else:
                                scr[o:o + 1, :] = y2[r:r + 1, :]
                        pr = perm_ref[sk, u * RU:(u + 1) * RU, :]
                        g = jnp.take_along_axis(scr[0:RU, :], pr, axis=1)
                        acc2 = g if acc2 is None else acc2 + g
                    if acc2 is None:
                        acc2 = jnp.zeros((RU, LANES), jnp.float32)
                    out_ref[u * RU:(u + 1) * RU, :] = acc2
            else:
                def og_body(u, _):
                    rows = pl.ds(u * RU, RU)
                    acc2 = None
                    for sk in range(meta.k_used):
                        for k in range(RU):
                            scr[pl.ds(k, 1), :] = \
                                y2[pl.ds(src_ref[sk, u * RU + k], 1), :]
                        pr = perm_ref[sk, rows, :]
                        g = jnp.take_along_axis(scr[0:RU, :], pr, axis=1)
                        acc2 = g if acc2 is None else acc2 + g
                    out_ref[rows, :] = acc2
                    return 0

                jax.lax.fori_loop(0, meta.B_pad // RU, og_body, 0)

            # ---- chain: perturb resident x by the fresh output --------
            x_scr[...] = x_scr[...] + out_ref[pl.ds(0, 1), :] * \
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
            in_specs.append(pl.BlockSpec((NV * SUB, LANES),
                                         lambda t: (0, 0),
                                         memory_space=pltpu.VMEM))
            operands.append(st["vals"])
            in_specs.append(pl.BlockSpec((NV * SUB, LANES),
                                         lambda t: (0, 0),
                                         memory_space=pltpu.VMEM))
            operands.append(st["idx"])
        x_spec_idx = len(in_specs)
        in_specs.append(pl.BlockSpec((S, LANES), lambda t: (0, 0),
                                     memory_space=pltpu.VMEM))
        if og_prog is None:
            in_specs.append(pl.BlockSpec((meta.k_used, meta.B_pad),
                                         lambda t: (0, 0),
                                         memory_space=pltpu.SMEM))
            operands.append(res["src_t"])
        in_specs.append(pl.BlockSpec(
            (meta.k_used, meta.B_pad, LANES), lambda t: (0, 0, 0),
            memory_space=pltpu.VMEM))
        operands.append(arrays["out_perm"])
        for si in res_keys:
            big = res["bigs"][si]
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

        scratch = [
            pltpu.VMEM((S, LANES), jnp.float32),          # x_scr
            pltpu.VMEM((PART_ROWS, LANES), jnp.float32),  # partials
            pltpu.VMEM((R2, LANES), jnp.float32),         # y2
        ]
        if meta.n_long:
            scratch.append(pltpu.VMEM((max(tacc, 8), LANES), jnp.float32))
        scratch.append(pltpu.VMEM((RU, LANES), jnp.float32))

        call = pl.pallas_call(
            kernel_factory(res_keys, og_prog),
            grid=(iters,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((meta.B_pad, LANES), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((meta.B_pad, LANES),
                                           jnp.float32),
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
        n_lead = 3 * n_streams
        full.extend(operands[:n_lead])
        full.append(x2d)
        full.extend(operands[n_lead:])
        out = call(*full)
        y = out.reshape(-1)[:meta.n_rows]
        if arrays["overflow"] is not None:
            o = arrays["overflow"]
            xg = jnp.take(x2d.reshape(-1), o["cols"], mode="clip")
            y = y.at[o["rows"]].add(o["vals"] * xg, mode="drop")
        if meta.dtype == "bf16":
            y = y.astype(jnp.bfloat16)
        return y

    return fn
