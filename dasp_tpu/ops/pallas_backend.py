"""Pallas executor: windowed-gather SpMV kernels (see wplan.py).

Two kernels cover the whole SpMV:

* **colsum** streams vreg tiles (vals, idx) from HBM with x resident in VMEM
  as an (S,128) table; per vreg it runs the 2-stage vreg-local gather per
  window round, multiplies, and emits per-vreg column sums.  It replaces the
  reference's fused ``dasp_spmv2`` strategy dispatch (``dasp_f64.h:77-484``):
  category differences live in how the plan routed slots, not in divergent
  device code.
* **outgather** assembles y: block b of the output is the sum of up to K
  lane-gathered source rows of the stacked partial matrix y2 (primary
  slice, remainder tails, long scalars).  It replaces the reference's
  order_rid un-permutation (``dasp_f64.h:959-976``) and the irregular-tail
  accumulation (``dasp_f64.h:184-195``) with zero scatters.

Between them sit only cheap XLA reshape-sums over the (NV,128) partials.
"""

from __future__ import annotations

import os
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import gc_paused
from ..wplan import (WPlan, SUB, LANES, LONG_PACK, K_SOURCES, build_wplan)
from . import xla_backend

BV = 128         # vregs per colsum grid step
BV_SMALL = 32    # small streams (< BV_SMALL_MAX vregs) pipeline poorly at
                 # 2-3 grid steps; finer blocks recover ~25% (measured
                 # NV=256: 7.9us @ BV128 -> 6.0us @ BV32)
BV_SMALL_MAX = 384
UNROLL = 32      # outgather rows per inner group (its own sweet spot)
CS_UNROLL = 64   # colsum vregs per inner unrolled group (tile sweep on
                 # v5e: 64/128 beats 32/128 by +5.5% cop20k, +11%
                 # scircuit, +3% wikitalk; 128/512 and 16/128 are worse)
UNROLL_INTERPRET = 8   # smaller unrolled bodies keep interpret-mode
                       # tracing (CPU tests) fast
BV_INTERPRET = 8       # small grid blocks avoid padding tiny test streams
                       # to 128 vregs (interpret execution is per-op slow)
OB = 64          # output blocks per outgather grid step


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _colsum_body(P, stride, BV, UNROLL, win_ref, vals_ref, idx_ref,
                 x_ref, out_ref):
    """Shared per-block colsum math (see _make_colsum's docstring): the
    unrolled per-vreg 2-stage gather + masked round tree + per-level
    sublane sums, writing (BV * 8//stride, 128) level rows."""
    R = SUB // stride

    def win(v, j):
        return win_ref[v, j]

    def body(u, _):
        parts = []
        for k in range(UNROLL):
            v = u * UNROLL + k
            idx = idx_ref[pl.ds(v * SUB, SUB), :].astype(jnp.int32)
            vals = vals_ref[pl.ds(v * SUB, SUB), :]
            lam = jax.lax.bitwise_and(idx, 127)
            q = jax.lax.bitwise_and(
                jax.lax.shift_right_logical(idx, 7), 7)
            if P == 1:
                w = pl.multiple_of(win(v, 1), SUB)
                xw = x_ref[pl.ds(w, SUB), :]
                g = jnp.take_along_axis(xw, q, axis=0)
                g = jnp.take_along_axis(g, lam, axis=1)
            else:
                # static round unroll: a dynamic (while) loop would
                # serialize the vector pipeline; fine-grained P classes
                # keep the padding small instead.  The round tag is
                # CELL data (wplan: one cell = one x word = one
                # window), so rounds combine BEFORE the lane gather by
                # a masked-sum TREE over the sublane-gathered windows
                # — one compare+select per round, the expensive lane
                # gather runs once per vreg (1.82 -> 0.89 ns/vreg/
                # round measured, tools/roundcost_ab.py).
                crnd = jax.lax.shift_right_logical(idx, 10)
                terms = []
                for p in range(P):
                    w = pl.multiple_of(win(v, 1 + p), SUB)
                    xw = x_ref[pl.ds(w, SUB), :]
                    sp = jnp.take_along_axis(xw, q, axis=0)
                    terms.append(jnp.where(crnd == p, sp, 0.0))
                while len(terms) > 1:
                    terms = [terms[i] + terms[i + 1]
                             if i + 1 < len(terms) else terms[i]
                             for i in range(0, len(terms), 2)]
                g = jnp.take_along_axis(terms[0], lam, axis=1)
            prod = vals.astype(jnp.float32) * g
            for L in range(R):
                parts.append(jnp.sum(
                    prod[L * stride:(L + 1) * stride], axis=0,
                    keepdims=True))
        out_ref[pl.ds(u * UNROLL * R, UNROLL * R), :] = \
            jnp.concatenate(parts, 0)
        return 0

    jax.lax.fori_loop(0, BV // UNROLL, body, 0)


def _make_colsum(P: int, S: int, NV: int, interpret: bool,
                 stride: int = SUB):
    """(wins (NV,P+1), vals (NV*8,128), idx (NV*8,128), x2d (S,128))
    -> per-level column sums (NV * 8//stride, 128) f32.

    wins[:, 0] is the per-vreg round count (diagnostic; the kernel uses
    only the static P); wins[:, 1+p] the window row offsets.  Rounds are statically
    unrolled per stream class P.  ``stride`` < 8 sums groups of ``stride``
    sublanes separately: a strided slice hosts 8/stride row LEVELS per
    lane (short-row packing, the TPU shape of the reference's
    short1/22/34 strategies, ``dasp_f64.h:283-483``)."""
    BV = BV_INTERPRET if interpret else (
        BV_SMALL if NV <= BV_SMALL_MAX else globals()["BV"])
    UNROLL = UNROLL_INTERPRET if interpret else min(CS_UNROLL, BV)
    R = SUB // stride

    def kernel(win_ref, vals_ref, idx_ref, x_ref, out_ref):
        _colsum_body(P, stride, BV, UNROLL, win_ref, vals_ref, idx_ref,
                     x_ref, out_ref)

    return pl.pallas_call(
        kernel,
        grid=(NV // BV,),
        in_specs=[
            pl.BlockSpec((BV, P + 1), lambda t: (t, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BV * SUB, LANES), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BV * SUB, LANES), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, LANES), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BV * R, LANES), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NV * R, LANES), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )


KV_SPMM = 4      # x vectors per multi-vector colsum pass (SpMM): the A
                 # stream (vals+idx, ~6 KB/vreg) is read ONCE for all
                 # KV vectors instead of once per vector
SPMM_X_VMEM_BYTES = 8 << 20   # budget for the multi-x kernel's stacked x
                 # tables (one un-blocked VMEM operand; see
                 # PallasSpMV._spmm_kv): stays far under the SpMV x-table
                 # ceiling because KV_SPMM tables ride alongside the
                 # A-stream pipeline buffers; wide-column SpMM falls back
                 # to the vmapped single-x path (kv halving)


def _make_colsum_multi(P: int, S: int, NV: int, interpret: bool,
                       stride: int = SUB, kv: int = KV_SPMM):
    """Multi-vector colsum: like _make_colsum but gathers from ``kv``
    stacked x tables (flattened to (kv*S, 128)) per A-tile load, emitting
    (kv, NV*R, 128) partials.  SpMM's A-stream cost amortizes across the
    vectors; only the per-vector gather work scales with kv."""
    UNROLL = UNROLL_INTERPRET if interpret else max(
        8, CS_UNROLL // kv)                # bound the unrolled body size
    BV = BV_INTERPRET if interpret else (
        BV_SMALL if NV <= BV_SMALL_MAX else globals()["BV"])
    R = SUB // stride

    def kernel(win_ref, vals_ref, idx_ref, x_ref, out_ref):
        def body(u, _):
            parts = [[] for _ in range(kv)]
            for k in range(UNROLL):
                v = u * UNROLL + k
                idx = idx_ref[pl.ds(v * SUB, SUB), :].astype(jnp.int32)
                vals = vals_ref[pl.ds(v * SUB, SUB), :].astype(jnp.float32)
                lam = jax.lax.bitwise_and(idx, 127)
                q = jax.lax.bitwise_and(
                    jax.lax.shift_right_logical(idx, 7), 7)
                crnd = (jax.lax.shift_right_logical(idx, 10)
                        if P > 1 else None)
                for j in range(kv):
                    if P == 1:
                        w = pl.multiple_of(win_ref[v, 1], SUB)
                        xw = x_ref[pl.ds(j * S + w, SUB), :]
                        g = jnp.take_along_axis(xw, q, axis=0)
                        g = jnp.take_along_axis(g, lam, axis=1)
                    else:
                        # per-cell round select before the lane gather
                        # (see _make_colsum)
                        terms = []
                        for p in range(P):
                            w = pl.multiple_of(win_ref[v, 1 + p], SUB)
                            xw = x_ref[pl.ds(j * S + w, SUB), :]
                            sp = jnp.take_along_axis(xw, q, axis=0)
                            terms.append(jnp.where(crnd == p, sp, 0.0))
                        while len(terms) > 1:
                            terms = [terms[i] + terms[i + 1]
                                     if i + 1 < len(terms) else terms[i]
                                     for i in range(0, len(terms), 2)]
                        g = jnp.take_along_axis(terms[0], lam, axis=1)
                    prod = vals * g
                    for L in range(R):
                        parts[j].append(jnp.sum(
                            prod[L * stride:(L + 1) * stride], axis=0,
                            keepdims=True))
            rows = pl.ds(u * UNROLL * R, UNROLL * R)
            for j in range(kv):
                out_ref[j, rows, :] = jnp.concatenate(parts[j], 0)
            return 0

        jax.lax.fori_loop(0, BV // UNROLL, body, 0)

    return pl.pallas_call(
        kernel,
        grid=(NV // BV,),
        in_specs=[
            pl.BlockSpec((BV, P + 1), lambda t: (t, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BV * SUB, LANES), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BV * SUB, LANES), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kv * S, LANES), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kv, BV * R, LANES), lambda t: (0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kv, NV * R, LANES), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )


# dd plans whose streams exceed this (= the VMEM-resident budget: they will
# stream from HBM every iteration) store the lo value stream as bf16
DD_LO16_MIN_BYTES = int(os.environ.get("DASP_DD_LO16_MIN",
                                       96 * 1024 * 1024))
# (The round-2 DASP_DD_XLO_DROP_P probe — drop the x-lo gather on high-P
# dd streams — was deleted after measuring only +5% streamed: the dd VPU
# EFT chains, not the gathers, bound round-heavy dd streams, and the
# per-cell round select now removes the per-round lane gathers anyway.)
# Big-streamed-plan tier (same gate as the bf16-lo store): dd streams with
# P >= this run their COLSUM in plain f32 (hi values x hi x, single
# rounding per product); every downstream reduction stays compensated dd,
# so the end-to-end error is ~2^-23 per element relative to the row's
# absolute mass, INDEPENDENT of row length — ~1e-7 vs the reference's
# 1e-5 verification contract (main_f64.cu:8).  The dd VPU arithmetic
# (mul/add EFT chains), not the gathers, bounds round-heavy dd streams
# (DESIGN.md §7b), so this is the lever for wikitalk/livejournal f64.
# Measured same-window on wikitalk_like f64 (2026-08-19, tools/ddf32_ab.py):
# off 7.7 GF, P>=8 8.4 GF, P>=1 9.4-11.2 GF; error on the real data 8.4e-8;
# bench-path back-to-back 7.73 -> 9.13 GF.  Default 1 = every stream of a
# streamed dd plan past the 16 MB latency floor.  0 disables.
# DASP_DD_F32_FORCE=1 applies it regardless of plan size (tests / probes).
DD_F32_COLSUM_P = int(os.environ.get("DASP_DD_F32_COLSUM_P", "1"))
DD_F32_FORCE = os.environ.get("DASP_DD_F32_FORCE", "0") == "1"


def _make_colsum_dd(P: int, S: int, NV: int, interpret: bool,
                    stride: int = SUB):
    """Double-double colsum: values and the x table are (hi, lo) float32
    pairs (the f32x2 emulation of the reference's fp64 path,
    ``main_f64.cu`` / ``dasp_f64.h``; see ops/dd.py).  ``stride`` as in
    _make_colsum: per-level sublane sums for strided (short-row) slices."""
    BV = BV_INTERPRET if interpret else (
        BV_SMALL if NV <= BV_SMALL_MAX else globals()["BV"])
    UNROLL = UNROLL_INTERPRET if interpret else min(CS_UNROLL, BV)
    R = SUB // stride
    from . import dd

    def kernel(win_ref, vh_ref, vl_ref, idx_ref, xh_ref, xl_ref,
               oh_ref, ol_ref):
        def body(u, _):
            parts_h, parts_l = [], []
            for k in range(UNROLL):
                v = u * UNROLL + k
                idx = idx_ref[pl.ds(v * SUB, SUB), :].astype(jnp.int32)
                vh = vh_ref[pl.ds(v * SUB, SUB), :]
                # lo may be stored bf16 (big-plan gate); no-op for f32
                vl = vl_ref[pl.ds(v * SUB, SUB), :].astype(jnp.float32)
                lam = jax.lax.bitwise_and(idx, 127)
                q = jax.lax.bitwise_and(
                    jax.lax.shift_right_logical(idx, 7), 7)

                def spair(p):
                    # sublane-gathered window pair (pre lane gather)
                    w = pl.multiple_of(win_ref[v, 1 + p], SUB)
                    sh = jnp.take_along_axis(xh_ref[pl.ds(w, SUB), :],
                                             q, axis=0)
                    sl = jnp.take_along_axis(xl_ref[pl.ds(w, SUB), :],
                                             q, axis=0)
                    return sh, sl

                if P == 1:
                    sh, sl = spair(0)
                else:
                    # per-cell round select before the one lane gather
                    # (see _make_colsum; the dd path saves TWO lane
                    # gathers per round)
                    crnd = jax.lax.shift_right_logical(idx, 10)
                    th, tl = [], []
                    for p in range(P):
                        ph_, pl_ = spair(p)
                        sel = crnd == p
                        th.append(jnp.where(sel, ph_, 0.0))
                        tl.append(jnp.where(sel, pl_, 0.0))
                    for terms in (th, tl):
                        while len(terms) > 1:
                            terms[:] = [terms[i] + terms[i + 1]
                                        if i + 1 < len(terms) else terms[i]
                                        for i in range(0, len(terms), 2)]
                    sh, sl = th[0], tl[0]
                gh = jnp.take_along_axis(sh, lam, axis=1)
                gl = jnp.take_along_axis(sl, lam, axis=1)
                ph, plo = dd.mul(vh, vl, gh, gl)
                # dd tree-sum over each level's sublanes
                for L in range(R):
                    sh, sl = dd.sum_axis(
                        ph[L * stride:(L + 1) * stride],
                        plo[L * stride:(L + 1) * stride], 0)
                    parts_h.append(sh[None])
                    parts_l.append(sl[None])
            oh_ref[pl.ds(u * UNROLL * R, UNROLL * R), :] = \
                jnp.concatenate(parts_h, 0)
            ol_ref[pl.ds(u * UNROLL * R, UNROLL * R), :] = \
                jnp.concatenate(parts_l, 0)
            return 0

        jax.lax.fori_loop(0, BV // UNROLL, body, 0)

    return pl.pallas_call(
        kernel,
        grid=(NV // BV,),
        in_specs=[
            pl.BlockSpec((BV, P + 1), lambda t: (t, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BV * SUB, LANES), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BV * SUB, LANES), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BV * SUB, LANES), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, LANES), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, LANES), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((BV * R, LANES), lambda t: (t, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((BV * R, LANES), lambda t: (t, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((NV * R, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((NV * R, LANES), jnp.float32)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )


def _make_outgather_dd(B: int, R2: int, K: int, interpret: bool):
    """dd variant of the output assembly: gathers hi/lo pairs and combines
    the K sources with compensated adds."""
    from . import dd

    def kernel(src_ref, perm_ref, yh_ref, yl_ref, oh_ref, ol_ref,
               sh_ref, sl_ref):
        def body(u, _):
            rows = pl.ds(u * UNROLL, UNROLL)
            ah = al = None
            for s in range(K):
                # assemble the 32 source rows through a VMEM scratch: a
                # 32-way concat of dynamic slices took Mosaic ~200s to
                # compile (superlinear in concat width); the scratch form
                # compiles in ~1s and runs ~6% faster
                for k in range(UNROLL):
                    r = pl.ds(src_ref[u * UNROLL + k, s], 1)
                    sh_ref[pl.ds(k, 1), :] = yh_ref[r, :]
                    sl_ref[pl.ds(k, 1), :] = yl_ref[r, :]
                pr = perm_ref[s, rows, :].astype(jnp.int32)
                gh = jnp.take_along_axis(sh_ref[0:UNROLL, :], pr, axis=1)
                gl = jnp.take_along_axis(sl_ref[0:UNROLL, :], pr, axis=1)
                if ah is None:
                    ah, al = gh, gl
                else:
                    ah, al = dd.add(ah, al, gh, gl)
            oh_ref[rows, :] = ah
            ol_ref[rows, :] = al
            return 0

        jax.lax.fori_loop(0, OB // UNROLL, body, 0)

    return pl.pallas_call(
        kernel,
        grid=(B // OB,),
        in_specs=[
            pl.BlockSpec((OB, K), lambda t: (t, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((K, OB, LANES), lambda t: (0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R2, LANES), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R2, LANES), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((OB, LANES), lambda t: (t, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((OB, LANES), lambda t: (t, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((B, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((B, LANES), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((UNROLL, LANES), jnp.float32),
                        pltpu.VMEM((UNROLL, LANES), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )


def _make_outgather(B: int, R2: int, K: int, interpret: bool):
    """(src (B,K) SMEM, perm (K,B,128), y2 (R2,128)) -> y blocks (B,128).

    out[b] = sum_k y2[src[b,k]][perm[k,b]]; unused sources point at the
    all-zero row R2-1.  Works on (8,128) stacks because Mosaic's
    dynamic_gather needs full-vreg operands.  K is the PLAN-WIDE max of
    used slots (slots are claimed densely per block): FEM/banded plans
    use only 2-3 of the K_SOURCES=7 table columns, and trimming the
    unroll statically also cuts the per-step perm DMA by the same factor.
    (A per-32-block-group dynamic round loop was tried and REVERTED:
    Mosaic serializes the loop body, -29% on scircuit.)"""

    def kernel(src_ref, perm_ref, y2_ref, out_ref, scr_ref):
        def body(u, _):
            rows = pl.ds(u * UNROLL, UNROLL)
            acc = None
            for s in range(K):
                # scratch assembly: see the dd variant's comment (the
                # 32-way concat form compiled in ~200s, this in ~1s)
                for k in range(UNROLL):
                    scr_ref[pl.ds(k, 1), :] = \
                        y2_ref[pl.ds(src_ref[u * UNROLL + k, s], 1), :]
                pr = perm_ref[s, rows, :].astype(jnp.int32)
                g = jnp.take_along_axis(scr_ref[0:UNROLL, :], pr, axis=1)
                acc = g if acc is None else acc + g
            out_ref[rows, :] = acc
            return 0

        jax.lax.fori_loop(0, OB // UNROLL, body, 0)

    return pl.pallas_call(
        kernel,
        grid=(B // OB,),
        in_specs=[
            pl.BlockSpec((OB, K), lambda t: (t, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((K, OB, LANES), lambda t: (0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R2, LANES), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((OB, LANES), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((UNROLL, LANES), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )


def _og_split(gmax: np.ndarray, k_used: int
              ) -> Tuple[Tuple[int, int, int], ...]:
    """Partition the outgather's OB groups into <= 3 contiguous ranges,
    each priced at its own static K (= max used slots in the range).

    Cost model: a range of L groups at K costs L*K group-slot units
    (~0.3 us each measured: 705 us / (592 groups x 4 slots) on
    livejournal); every extra launch pays LAUNCH_PEN for the pipeline
    ramp plus its share of the XLA output concat (~19 MB y copy on
    livejournal-size plans).  gmax: per-OB-group max used slots."""
    G = int(gmax.size)
    best_cost = float(G * k_used)
    best = ((0, G, k_used),)
    if G < 2:
        return ((0, G * OB, k_used),)
    LAUNCH_PEN = 96.0
    pre = np.maximum.accumulate(gmax)
    suf = np.maximum.accumulate(gmax[::-1])[::-1]
    cs = np.arange(1, G)
    cost2 = cs * pre[cs - 1] + (G - cs) * suf[cs] + LAUNCH_PEN
    i = int(np.argmin(cost2))
    if cost2[i] < best_cost:
        c = int(cs[i])
        best_cost = float(cost2[i])
        best = ((0, c, int(pre[c - 1])), (c, G, int(suf[c])))
    # 3-way: seed first-cut candidates where the suffix max drops (at
    # most k_used-1 positions; a heuristic — a beneficial first cut can
    # also sit where the prefix max rises, which this skips; the 2-way
    # scan above still covers one cut so results stay correct, only
    # possibly non-optimal), the second cut scans vectorized
    drops = (np.flatnonzero(np.diff(suf) != 0) + 1)[:8]
    for c1 in drops:
        c1 = int(c1)
        cs2 = np.arange(c1 + 1, G)
        if not cs2.size:
            continue
        mid = np.maximum.accumulate(gmax[c1:])
        cost3 = (c1 * pre[c1 - 1] + (cs2 - c1) * mid[cs2 - c1 - 1]
                 + (G - cs2) * suf[cs2] + 2 * LAUNCH_PEN)
        j = int(np.argmin(cost3))
        if cost3[j] < best_cost:
            c2 = int(cs2[j])
            best_cost = float(cost3[j])
            best = ((0, c1, int(pre[c1 - 1])),
                    (c1, c2, int(mid[c2 - c1 - 1])),
                    (c2, G, int(suf[c2])))
    return tuple((b0 * OB, b1 * OB, k) for b0, b1, k in best)


# ---------------------------------------------------------------------------
# Plan lowering
# ---------------------------------------------------------------------------


class WMeta(NamedTuple):
    dtype: str
    s_rows: int
    n_rows: int
    n_cols: int
    streams: Tuple[Tuple[int, int, int], ...]   # (P, stride, NV_padded)
    sell_segs: Tuple[Tuple[int, int, int, int, int], ...]
    # (stream, vreg_offset, n_slices, w8, stride), ordered by out_row
    long_groups: Tuple[Tuple[int, int], ...]    # (stream, long_idx index)
    n_long: int
    n_long_rows: int
    n_y2_rows: int
    B_pad: int
    overflow_meta: Optional[object]
    interpret: bool
    k_used: int = K_SOURCES
    # per-stream flag: colsum runs in plain f32 (dd plans over the
    # big-streamed-plan gate; see DD_F32_COLSUM_P).  () = all-dd.
    dd_f32: Tuple[bool, ...] = ()
    # Contiguous OB-aligned block ranges (b0, b1, K) for the streamed
    # outgather: slot usage is NOT uniform over blocks (length-grouped
    # livejournal: 37306 blocks use 2 slots, 373 blocks — concentrated at
    # the long/bucket front — use 3-4), and the kernel's cost is row
    # LOADS, K per block, zero-source slots included.  Splitting into a
    # few static-K launches prices each region at its own max
    # (tools/assembly_attrib.py: k_used=4 single-launch outgather 705
    # us/iter on livejournal, ~4.7 ns per block-slot).  () = one range
    # at k_used (multichip pins k_sources for cross-chip uniformity).
    og_ranges: Tuple[Tuple[int, int, int], ...] = ()
    # Large COO residues are REPACKED as a sub-plan and run as a second
    # windowed SpMV through the same kernels (y += y_sub): XLA's
    # per-element takes/scatters run at ~5-25 ns/element on TPU, so
    # rmat_like's 179k-element residue cost more than the whole packed
    # SpMV either way it was expressed in XLA (measured: 58 ms as a
    # tree+scatter, ~6 ms as gather-only y2 routing, ~0.4 ms repacked).
    # None = residue small enough for the XLA paths (or depth limit).
    res: Optional["WMeta"] = None


# Residue element count above which the COO correction is repacked as a
# sub-plan instead of running through XLA takes (see WMeta.res).  Below
# it, the terminal XLA correction is cheaper than a second outgather
# pass over all B_pad blocks.  Each sub level re-packs the previous
# level's rejects with fresh window cells; the residue decays ~2.2x per
# level on rmat_like (137k -> 64k -> 30k rows), so a few levels shrink
# the ~9 ns/row terminal scatter while each level adds only ~0.2 ms of
# well-streamed kernels.
RES_REPACK_MIN = 16384
RES_MAX_DEPTH = 3


@gc_paused
def plan_to_arrays(plan, dtype: str = "f32",
                   include_overflow: bool = True, k_sources=None,
                   strict_f64: bool = False, _res_depth: int = 0):
    # k_sources overrides the used-slot trim (multi-chip stacking needs
    # one shared K across chips)
    # strict_f64: keep the full dd pipeline on big plans (disables the
    # bf16-lo store and the f32-colsum tier; see DaspConfig.strict_f64)
    # _res_depth: recursion guard for the residue sub-plan (WMeta.res)
    from ..sparse import CSRMatrix
    if isinstance(plan, CSRMatrix):
        plan = build_wplan(plan)
    if dtype not in ("f32", "bf16", "f64"):
        raise ValueError("pallas backend supports f32/bf16/f64")
    import ml_dtypes
    from . import dd as _dd
    vdt = ml_dtypes.bfloat16 if dtype == "bf16" else np.float32

    arrays: Dict = {"streams": [], "long_idx": []}
    stream_shapes = []
    interp = not _on_tpu()
    for s in plan.streams:
        nv = s.n_vregs
        if s.P > 32:
            blk = BV_DYN
        elif interp:
            blk = BV_INTERPRET
        else:
            # match the kernels' small-stream block choice (nv_pad must be
            # a multiple of the grid block)
            blk = BV_SMALL if max(s.n_vregs, 1) <= BV_SMALL_MAX else BV
        nv_pad = -(-max(nv, 1) // blk) * blk
        # The packer caps every vreg's window list at LONG_WIN_CAP=32
        # (wplan.py: sequential chunking, bin packing and reject retries
        # all break at 32 windows), so every stream class is statically
        # unrolled.  A P>32 stream can only come from a stale pre-v7
        # cached plan — reject it rather than mis-executing.
        if s.P > 32:
            raise ValueError(
                f"stream P={s.P} > 32: dynamic-round streams are no "
                "longer produced (or executed); repack the plan")
        # round<<10|q<<7|lam with <=32 rounds fits int16: 25% less
        # HBM traffic on the index stream at fp32
        assert int(s.idx.max(initial=0)) <= np.iinfo(np.int16).max, \
            "slot metadata must fit int16 (p_cap <= 32)"
        idx_dt = np.int16
        idx = np.zeros((nv_pad * SUB, LANES), dtype=idx_dt)
        # wins[:, 0] = per-vreg round count; wins[:, 1:] = window offsets
        wins = np.zeros((nv_pad, s.P + 1), dtype=np.int32)
        idx[:nv * SUB] = s.idx
        wins[:nv, 1:] = s.wins
        if s.P > 1:
            wins[:nv, 0] = np.maximum(s.win_counts, 1)
        else:
            wins[:nv, 0] = 1
        entry = dict(idx=idx, wins=wins)
        if dtype == "f64":
            hi, lo = _dd.from_f64(s.vals)
            vh = np.zeros((nv_pad * SUB, LANES), dtype=np.float32)
            vl = np.zeros((nv_pad * SUB, LANES), dtype=np.float32)
            vh[:nv * SUB] = hi
            vl[:nv * SUB] = lo
            entry["vals_hi"], entry["vals_lo"] = vh, vl
        else:
            vals = np.zeros((nv_pad * SUB, LANES), dtype=vdt)
            vals[:nv * SUB] = s.vals.astype(vdt)
            entry["vals"] = vals
        arrays["streams"].append(entry)
        stream_shapes.append((s.P, s.stride, nv_pad))

    if dtype == "f64":
        # HBM-bandwidth gate: plans too big for VMEM residency stream every
        # iteration, and the dd lo-value stream is 40% of their traffic
        # (4B of 10B/slot).  lo carries hi's rounding residual
        # (<= 2^-24 |v|), so storing it bf16 bounds the value error at
        # ~2^-33 |v| — end-to-end ~1e-9 instead of ~1e-13, still four
        # digits inside the reference's 1e-5 verification contract
        # (main_f64.cu:8).  Small plans (every test, and anything the
        # resident executor can take) keep full f32 lo.
        sbytes = sum(a.nbytes for e in arrays["streams"]
                     for a in e.values())
        big_streamed = not strict_f64 and sbytes > DD_LO16_MIN_BYTES
        if big_streamed:
            for e in arrays["streams"]:
                e["vals_lo"] = e["vals_lo"].astype(ml_dtypes.bfloat16)
        # The f32-colsum tier has its OWN (lower) floor: any streamed dd
        # plan past the ~16 MB latency floor is VPU-EFT-bound, not
        # gather-bound (DESIGN §7b), and the measured win exists whether
        # or not the plan also crosses the bf16-lo threshold (wikitalk's
        # 79 MB of streams sit between the two).  Tiny test-scale plans
        # keep full dd colsum.
        f32cs_eligible = sbytes > DD_LO16_MIN_BYTES // 6
        if (not strict_f64 and DD_F32_COLSUM_P
                and (f32cs_eligible or DD_F32_FORCE)):
            dd_f32 = tuple(P >= DD_F32_COLSUM_P
                           for (P, _, _) in stream_shapes)
        else:
            dd_f32 = (False,) * len(stream_shapes)
    else:
        dd_f32 = ()

    sell_segs = tuple((g.stream, g.vreg_offset, g.n_slices, g.w8, g.stride)
                      for g in plan.sell)
    long_groups = []
    spos_all = []
    for li, lg in enumerate(plan.longs):
        arrays["long_idx"].append(lg.idx)
        long_groups.append((lg.stream, li))
        spos_all.append(lg.scalar_pos)
    if spos_all:
        # A long row may contribute from SEVERAL groups (its vregs are
        # classed per-vreg into different round-class streams), so the
        # scalar assembly is a gather-sum: scalars[p] = sum of concatenated
        # group outputs at long_gat[p, :] (pad -> the appended zero).
        concat_pos = np.concatenate(spos_all)
        order = np.argsort(concat_pos, kind="stable")
        sp = concat_pos[order]
        rank = np.arange(sp.size) - np.searchsorted(sp, sp, side="left")
        mult = int(rank.max()) + 1 if sp.size else 1
        gat = np.full((plan.n_long, mult), concat_pos.size, dtype=np.int32)
        gat[sp, rank] = order
        arrays["long_gat"] = gat
    else:
        arrays["long_gat"] = np.zeros((0, 1), dtype=np.int32)

    B = plan.out_src.shape[0]
    B_pad = max(OB, -(-B // OB) * OB)
    Z_final = plan.n_y2_rows                     # zero row index in y2
    src = np.full((B_pad, K_SOURCES), Z_final, dtype=np.int32)
    src[:B] = plan.out_src
    # k-major perm layout (K, B_pad, 128) for contiguous per-step reads.
    # int8 (lane ids are 0..127): the perm table is the outgather's
    # single biggest HBM stream — livejournal k_used=7 reads
    # 7*37888*128 = 34 MB/iter at int8 vs 136 MB at int32 (the kernels
    # upcast in-register before take_along_axis)
    perm = np.zeros((K_SOURCES, B_pad, LANES), dtype=np.int8)
    perm[:, :B] = plan.out_perm.reshape(B, K_SOURCES, LANES).transpose(
        1, 0, 2)
    used = src != Z_final
    last = (used * (np.arange(K_SOURCES, dtype=np.int32) + 1)).max(axis=1)

    # Conflict rejects were already re-routed into shared rem2/rem3 slices
    # by the packer; the final dregs run as a COO correction.  The old
    # single (R_o, max_len_pow2) reduction tree + sorted scatter-add was
    # catastrophic on community graphs: rmat_like's 179k-element residue
    # (137k rows, max 54/row but MEAN 1.3) built an 8.8M-index tree and a
    # 137k-row scatter (~25 ns/row measured on the XLA TPU scatter path)
    # = ~58 of its 63 ms/iter.  Now:
    #  * octave-grouped trees: rows bucketed by next-pow2 length, one
    #    (rows_o, w) gather-sum per octave (~1.1 slots/element instead of
    #    max_len for every row);
    #  * scatter-free placement: per-row sums are routed into y2 as one
    #    extra 128-lane row per residue block, consumed by the normal
    #    outgather through a free out_src slot (identity lane perm) —
    #    rows whose block has all K_SOURCES slots claimed (rare) fall
    #    back to the sorted scatter.
    overflow_meta = None
    arrays["overflow"] = None
    res_meta = None
    if include_overflow and plan.overflow is not None and plan.overflow.nnz:
        o = plan.overflow
        # Large residues: repack as a sub-plan (fresh slices, fresh
        # window cells — routing conflicts cannot recur) and run as a
        # second windowed SpMV (see WMeta.res).  The sub-plan shares the
        # main plan's x table (same n_cols, relabel/row_sort off) and is
        # memoized on the plan across dtype lowerings.  The resident
        # executor ignores it (its wrapper scatters the octave-tree sums
        # — residues this large never fit the resident budget anyway).
        if (o.nnz >= RES_REPACK_MIN and _res_depth < RES_MAX_DEPTH
                and k_sources is None):
            sub_plan = getattr(plan, "_res_plan", None)
            if sub_plan is None:
                import dataclasses as _dc
                subcfg = _dc.replace(plan.config, relabel="off",
                                     row_sort="off", fill_dump=0.0)
                sub_plan = build_wplan(o, subcfg, sym_ok=False)
                try:
                    plan._res_plan = sub_plan
                except Exception:
                    pass
            sub_meta, sub_arrays = plan_to_arrays(
                sub_plan, dtype, include_overflow=True,
                strict_f64=strict_f64, _res_depth=_res_depth + 1)
            if (sub_meta.s_rows == plan.s_rows
                    and sub_meta.n_rows == plan.n_rows):
                res_meta = sub_meta
                arrays["res"] = sub_arrays
        entry = dict(cols=o.col_idx.astype(np.int32))
        lens_o = o.row_lengths
        urows = np.flatnonzero(lens_o > 0)
        L = lens_o[urows].astype(np.int64)
        widths = np.maximum(
            1 << np.ceil(np.log2(np.maximum(L, 1))).astype(np.int64), 1)
        trees = []
        concat_idx = []                # urows-local index, concat order
        for w in np.unique(widths):
            sel = np.flatnonzero(widths == w)
            rw = urows[sel]
            tree = (o.row_ptr[rw][:, None]
                    + np.arange(w)[None, :]).astype(np.int32)
            tree[np.arange(w)[None, :] >= L[sel][:, None]] = o.nnz
            trees.append(tree)
            concat_idx.append(sel)
        concat_idx = np.concatenate(concat_idx)
        pos_of = np.empty(urows.size, dtype=np.int64)
        pos_of[concat_idx] = np.arange(urows.size)
        entry["trees"] = trees
        # concat order -> row-sorted order (resident scatter path)
        entry["sort_back"] = pos_of.astype(np.int32)
        entry["tree_rows"] = urows.astype(np.int32)
        # Terminal correction dispatch (static, recorded in
        # overflow_meta): XLA runs per-element takes at ~2.6 ns and the
        # sorted-unique scatter at ~9 ns on this chip (tools/take_probe,
        # loop-carried operands so LICM cannot hoist).  The y2 route
        # costs takes over lane_table (touched blocks x 128) + trees +
        # products; the scatter costs 9 ns x residue rows + the same
        # tree takes.  rmat's sub-plan residue (66k rows spread over
        # 15k blocks = 1.9M lane entries) measured 4.9 ms via the
        # route vs ~0.6 ms scattered — pick per plan.
        blk_o = urows // LANES
        res_blocks = np.unique(blk_o)
        tree_slots = int(sum(t.size for t in trees))
        route_cost = 2.6 * (res_blocks.size * LANES + o.nnz + tree_slots)
        scatter_cost = 9.0 * urows.size + 2.6 * (o.nnz + tree_slots
                                                 + urows.size)
        use_scatter = res_meta is None and scatter_cost < route_cost
        overflow_meta = ("scatter" if use_scatter else "route",)
        kslot = last[res_blocks]
        ok_b = (kslot < K_SOURCES
                if res_meta is None and not use_scatter
                else np.zeros(res_blocks.size, dtype=bool))
        keep_blocks = res_blocks[ok_b]
        row_ok = ok_b[np.searchsorted(res_blocks, blk_o)]
        if keep_blocks.size:
            bpos = np.searchsorted(keep_blocks, blk_o[row_ok])
            table = np.full(keep_blocks.size * LANES, urows.size,
                            dtype=np.int32)
            table[bpos * LANES + urows[row_ok] % LANES] = \
                pos_of[row_ok]
            entry["lane_table"] = table
            src[keep_blocks, kslot[ok_b]] = (
                Z_final + 1 + np.arange(keep_blocks.size))
            perm[kslot[ok_b], keep_blocks] = np.arange(
                LANES, dtype=np.int8)[None, :]
            used = src != Z_final
            last = (used * (np.arange(K_SOURCES, dtype=np.int32)
                            + 1)).max(axis=1)
        else:
            entry["lane_table"] = np.zeros(0, dtype=np.int32)
        # fallback scatter rows (their block had no free slot)
        fb = ~row_ok
        entry["fb_pos"] = pos_of[fb].astype(np.int32)
        entry["fb_rows"] = urows[fb].astype(np.int32)
        if dtype == "f64":
            from . import dd as _dd
            entry["vals_hi"], entry["vals_lo"] = _dd.from_f64(
                o.values.astype(np.float64))
        else:
            entry["vals"] = o.values.astype(np.float32)
        arrays["overflow"] = entry

    # Trim the source table to the plan-wide max of USED slots (slot k
    # unused = src points at the zero row; slots are claimed densely).
    # FEM/banded plans use 2-3 of the 7 columns: the outgather unroll and
    # its per-step perm DMA shrink by the same factor.
    k_used = k_sources if k_sources is not None else max(1, int(last.max()))
    arrays["out_src"] = src[:, :k_used].copy()
    arrays["out_perm"] = perm[:k_used].copy()

    # Range-split outgather (see WMeta.og_ranges): partition the OB
    # groups into <= 3 contiguous ranges, each launched at its own
    # static K.  Skipped when the caller pins k_sources (multichip needs
    # one shape signature across chips).
    og_ranges = ((0, B_pad, k_used),)
    if k_sources is None and k_used > 1:
        gmax = np.maximum(
            last.reshape(-1, OB).max(axis=1), 1).astype(np.int64)
        og_ranges = _og_split(gmax, k_used)
    if len(og_ranges) > 1:
        arrays["og_src"] = [src[b0:b1, :k].copy()
                            for b0, b1, k in og_ranges]
        arrays["og_perm"] = [perm[:k, b0:b1].copy()
                             for b0, b1, k in og_ranges]

    n_long_rows = -(-plan.n_long // LONG_PACK) if plan.n_long else 0
    meta = WMeta(dtype=dtype, s_rows=plan.s_rows, n_rows=plan.n_rows,
                 n_cols=plan.n_cols, streams=tuple(stream_shapes),
                 sell_segs=sell_segs, long_groups=tuple(long_groups),
                 n_long=plan.n_long, n_long_rows=n_long_rows,
                 n_y2_rows=plan.n_y2_rows, B_pad=B_pad,
                 overflow_meta=overflow_meta, interpret=not _on_tpu(),
                 k_used=k_used, dd_f32=dd_f32, og_ranges=og_ranges,
                 res=res_meta)
    return meta, arrays


def prep_x(meta: WMeta, x: np.ndarray, col_perm=None):
    """Host-side: pad x to the (s_rows,128) table shape (hi/lo pair for
    the f64 path).  ``col_perm`` (plan.col_perm, old->new) scatters x into
    relabeled column order when the plan was packed with config.relabel."""
    if meta.dtype == "f64":
        from . import dd as _dd
        xp = np.zeros(meta.s_rows * LANES, dtype=np.float64)
        if col_perm is not None:
            xp[col_perm] = np.asarray(x, dtype=np.float64)[:meta.n_cols]
        else:
            xp[:meta.n_cols] = np.asarray(x, dtype=np.float64)[:meta.n_cols]
        hi, lo = _dd.from_f64(xp)
        return dict(hi=hi.reshape(meta.s_rows, LANES),
                    lo=lo.reshape(meta.s_rows, LANES))
    xp = np.zeros(meta.s_rows * LANES, dtype=np.float32)
    if col_perm is not None:
        xp[col_perm] = np.asarray(x, dtype=np.float32)[:meta.n_cols]
    else:
        xp[:meta.n_cols] = np.asarray(x, dtype=np.float32)[:meta.n_cols]
    return xp.reshape(meta.s_rows, LANES)


# (A fused multi-stream colsum — one pallas_call covering every stream's
# grid span with clamped index maps — was built and measured a LOSS on
# livejournal v6: per-stream 6581 vs fused 8271 us/iter; the per-launch
# x-table reload it eliminates (~30 us x 11) is an order smaller than
# what the mono-kernel costs Mosaic's pipeliner across 37 blocked
# operands.  Deleted after the A/B; record in DESIGN §7c + git history.)


def spmv_fn(meta: WMeta, arrays: Dict, x2d):
    """Jittable windowed SpMV: x2d (s_rows,128) f32 (or {"hi","lo"} pair
    for f64) -> y (n_rows,)."""
    if meta.dtype == "f64":
        return _spmv_dd(meta, arrays, x2d)
    partials = []
    for si, ((P, stride, NV), st) in enumerate(zip(meta.streams,
                                                   arrays["streams"])):
        call = _make_colsum(P, meta.s_rows, NV, meta.interpret, stride)
        partials.append(call(st["wins"], st["vals"], st["idx"], x2d))
    y = _assemble_y(meta, arrays, partials, x2d)
    if meta.dtype == "bf16":
        return y.astype(jnp.bfloat16)
    return y


def _assemble_y(meta: WMeta, arrays: Dict, partials, x2d):
    """XLA glue from per-stream colsum partials to y (n_rows,): segment
    level sums -> y2 stack -> outgather -> COO-dreg correction."""
    y2_parts = []
    for stream, off, n_slices, w8, stride in meta.sell_segs:
        # the stream's kernel may run at a finer stride than this
        # segment's logical one (cross-stride stream merge): every F
        # consecutive partial rows form one logical level
        R_st = SUB // meta.streams[stream][1]
        R = SUB // stride
        F = R_st // R
        p = partials[stream][off * R_st:(off + n_slices * w8) * R_st]
        y2_parts.append(p.reshape(n_slices, w8, R, F, LANES).sum((1, 3))
                        .reshape(n_slices * R, LANES))

    if meta.n_long:
        vreg_totals = [None] * len(meta.streams)
        souts = []
        for stream, li in meta.long_groups:
            if vreg_totals[stream] is None:
                R_st = SUB // meta.streams[stream][1]
                t = partials[stream].reshape(-1, R_st * LANES).sum(axis=1)
                vreg_totals[stream] = jnp.concatenate(
                    [t, jnp.zeros(1, t.dtype)])
            idxm = arrays["long_idx"][li]
            souts.append(jnp.take(vreg_totals[stream], idxm,
                                  mode="clip").sum(axis=1))
        cat = jnp.concatenate(souts + [jnp.zeros(1, jnp.float32)])
        scalars = jnp.take(cat, arrays["long_gat"], mode="clip").sum(axis=1)
        pad = meta.n_long_rows * LONG_PACK - meta.n_long
        scalars = jnp.concatenate([scalars, jnp.zeros(pad, jnp.float32)])
        srows = scalars.reshape(meta.n_long_rows, LONG_PACK)
        srows = jnp.concatenate(
            [srows, jnp.zeros((meta.n_long_rows, 1), jnp.float32)], axis=1)
        y2_parts.append(srows)

    y2_parts.append(jnp.zeros((1, LANES), jnp.float32))      # zero row

    # COO residue: octave-tree per-row sums routed into y2 as one extra
    # 128-lane row per residue block (consumed by the outgather through
    # a reserved out_src slot — no scatter; see plan_to_arrays).  Large
    # residues run as a repacked sub-plan instead (meta.res).
    rsums = None
    if arrays["overflow"] is not None and meta.res is None:
        o = arrays["overflow"]
        xg = jnp.take(x2d.reshape(-1), o["cols"], mode="clip")
        pc = jnp.concatenate([o["vals"] * xg, jnp.zeros(1, jnp.float32)])
        parts = [jnp.take(pc, t, mode="clip").sum(axis=1)
                 if t.shape[1] > 1 else
                 jnp.take(pc, t[:, 0], mode="clip")
                 for t in o["trees"]]
        rsums = jnp.concatenate(parts + [jnp.zeros(1, jnp.float32)])
        if o["lane_table"].shape[0]:
            y2_parts.append(jnp.take(rsums, o["lane_table"],
                                     mode="clip").reshape(-1, LANES))
    y2 = jnp.concatenate(y2_parts, axis=0)

    if len(meta.og_ranges) > 1:
        parts = [
            _make_outgather(b1 - b0, y2.shape[0], k, meta.interpret)(
                s, p, y2)
            for (b0, b1, k), s, p in zip(meta.og_ranges,
                                         arrays["og_src"],
                                         arrays["og_perm"])]
        out = jnp.concatenate(parts, axis=0)
    else:
        out = _make_outgather(meta.B_pad, y2.shape[0], meta.k_used,
                              meta.interpret)(
            arrays["out_src"], arrays["out_perm"], y2)
    y = out.reshape(-1)[:meta.n_rows]

    if rsums is not None and arrays["overflow"]["fb_rows"].shape[0]:
        o = arrays["overflow"]
        y = y.at[o["fb_rows"]].add(
            jnp.take(rsums, o["fb_pos"], mode="clip"), mode="drop",
            indices_are_sorted=True, unique_indices=True)
    if meta.res is not None:
        y = y + spmv_fn(meta.res, arrays["res"],
                        x2d).astype(jnp.float32)
    return y


def spmm_fn(meta: WMeta, arrays: Dict, x3d, kv: int = KV_SPMM):
    """Jittable multi-vector SpMV (SpMM): x3d (kv*s_rows, 128) f32
    (kv stacked x tables) -> y (kv, n_rows).  Streams run through the
    multi-x colsum so the A stream is read once per kv vectors; the
    glue loops per vector."""
    assert meta.dtype != "f64", "SpMM fast path is f32/bf16 only"
    S = meta.s_rows
    multi: Dict[int, jnp.ndarray] = {}
    ys = []
    for j in range(kv):
        partials = []
        for si, ((P, stride, NV), st) in enumerate(
                zip(meta.streams, arrays["streams"])):
            if si not in multi:
                call = _make_colsum_multi(P, S, NV, meta.interpret,
                                          stride, kv=kv)
                multi[si] = call(st["wins"], st["vals"], st["idx"], x3d)
            partials.append(multi[si][j])
        y = _assemble_y(meta, arrays, partials, x3d[j * S:(j + 1) * S])
        ys.append(y)
    out = jnp.stack(ys)
    if meta.dtype == "bf16":
        return out.astype(jnp.bfloat16)
    return out


def spmm_fn_dd(meta: WMeta, arrays: Dict, x3d, kv: int = KV_SPMM):
    """f64 SpMM fast tier: the dd products decompose as vh*xh (the hi
    partial) + (vh*xl + vl*xh) (the lo partial, vl*xl ~ 2^-48 dropped),
    all computed as plain-f32 multi-x colsums — the hi and lo A value
    streams are each read ONCE per kv vectors instead of once per
    vector on the vmapped dd path.  Pass A runs vals_hi against the
    2*kv stacked (xh..., xl...) tables; pass B runs vals_lo against the
    kv xh tables.  Downstream reductions stay compensated dd
    (_assemble_dd), so the error bound matches the DD_F32_COLSUM_P
    streamed tier: ~2^-24 of the row's absolute mass (~1e-7 relative),
    inside the reference's 1e-5 contract (main_f64.cu:8) but below
    full-dd; full-accuracy callers use the vmapped executor
    (config.strict_f64).  x3d: {"hi","lo"} each (kv*s_rows, 128)."""
    S = meta.s_rows
    xh, xl = x3d["hi"], x3d["lo"]
    xcat = jnp.concatenate([xh, xl], axis=0)
    mA: Dict[int, jnp.ndarray] = {}
    mB: Dict[int, jnp.ndarray] = {}
    ys_h, ys_l = [], []
    for j in range(kv):
        partials = []
        for si, ((P, stride, NV), st) in enumerate(
                zip(meta.streams, arrays["streams"])):
            if si not in mA:
                mA[si] = _make_colsum_multi(
                    P, S, NV, meta.interpret, stride, kv=2 * kv)(
                    st["wins"], st["vals_hi"], st["idx"], xcat)
                mB[si] = _make_colsum_multi(
                    P, S, NV, meta.interpret, stride, kv=kv)(
                    st["wins"], st["vals_lo"], st["idx"], xh)
            partials.append((mA[si][j], mA[si][kv + j] + mB[si][j]))
        y = _assemble_dd(meta, arrays, partials,
                         xh[j * S:(j + 1) * S], xl[j * S:(j + 1) * S])
        ys_h.append(y["hi"])
        ys_l.append(y["lo"])
    return dict(hi=jnp.stack(ys_h), lo=jnp.stack(ys_l))


def _spmv_dd(meta: WMeta, arrays: Dict, x2d):
    """f64 (double-double) executor: hi/lo everywhere, compensated sums."""
    from . import dd
    xh, xl = x2d["hi"], x2d["lo"]
    dd_f32 = meta.dd_f32 or (False,) * len(meta.streams)
    partials = [None] * len(meta.streams)
    # Big-plan f32-colsum tier (DD_F32_COLSUM_P): products and sublane
    # sums in plain f32 over the hi halves; the lo partial is
    # identically zero and every downstream reduction stays compensated
    # dd, bounding the error at ~2^-23 of the row's absolute mass
    # (inside main_f64.cu:8's 1e-5 contract).
    for si, ((P, stride, NV), st, f32cs) in enumerate(
            zip(meta.streams, arrays["streams"], dd_f32)):
        if f32cs:
            call = _make_colsum(P, meta.s_rows, NV, meta.interpret,
                                stride)
            h = call(st["wins"], st["vals_hi"], st["idx"], xh)
            partials[si] = (h, jnp.zeros_like(h))
            continue
        call = _make_colsum_dd(P, meta.s_rows, NV, meta.interpret,
                               stride)
        partials[si] = call(st["wins"], st["vals_hi"], st["vals_lo"],
                            st["idx"], xh, xl)
    return _assemble_dd(meta, arrays, partials, xh, xl)


def _assemble_dd(meta: WMeta, arrays: Dict, partials, xh, xl):
    """dd glue from per-stream (hi, lo) partials to y {hi, lo}: shared
    by the single-vector dd executor and the dd SpMM tier."""
    from . import dd
    y2h_parts, y2l_parts = [], []
    for stream, off, n_slices, w8, stride in meta.sell_segs:
        R_st = SUB // meta.streams[stream][1]
        R = SUB // stride
        F = R_st // R
        ph = partials[stream][0][off * R_st:(off + n_slices * w8) * R_st]
        plo = partials[stream][1][off * R_st:(off + n_slices * w8) * R_st]
        shp = (n_slices, w8, R, F * LANES)
        sh, sl = ph.reshape(shp), plo.reshape(shp)
        if F > 1:
            sh = sh.reshape(n_slices, w8, R, F, LANES)
            sl = sl.reshape(n_slices, w8, R, F, LANES)
            sh, sl = dd.sum_axis(sh, sl, 3, safe=True)
        else:
            sh = sh.reshape(n_slices, w8, R, LANES)
            sl = sl.reshape(n_slices, w8, R, LANES)
        sh, sl = dd.sum_axis(sh, sl, 1, safe=True)
        y2h_parts.append(sh.reshape(n_slices * R, LANES))
        y2l_parts.append(sl.reshape(n_slices * R, LANES))

    if meta.n_long:
        vreg_totals = [None] * len(meta.streams)
        souts_h, souts_l = [], []
        for stream, li in meta.long_groups:
            if vreg_totals[stream] is None:
                R_st = SUB // meta.streams[stream][1]
                th, tl = dd.sum_axis(
                    partials[stream][0].reshape(-1, R_st * LANES),
                    partials[stream][1].reshape(-1, R_st * LANES), 1,
                    safe=True)
                vreg_totals[stream] = (
                    jnp.concatenate([th, jnp.zeros(1, th.dtype)]),
                    jnp.concatenate([tl, jnp.zeros(1, tl.dtype)]))
            idxm = arrays["long_idx"][li]
            th, tl = vreg_totals[stream]
            gh = jnp.take(th, idxm, mode="clip")
            gl = jnp.take(tl, idxm, mode="clip")
            sh, sl = dd.sum_axis(gh, gl, 1, safe=True)
            souts_h.append(sh)
            souts_l.append(sl)
        cat_h = jnp.concatenate(souts_h + [jnp.zeros(1, jnp.float32)])
        cat_l = jnp.concatenate(souts_l + [jnp.zeros(1, jnp.float32)])
        gh_s = jnp.take(cat_h, arrays["long_gat"], mode="clip")
        gl_s = jnp.take(cat_l, arrays["long_gat"], mode="clip")
        sc_h, sc_l = dd.sum_axis(gh_s, gl_s, 1, safe=True)
        pad = meta.n_long_rows * LONG_PACK - meta.n_long
        z = jnp.zeros(pad, jnp.float32)
        for parts, sc in ((y2h_parts, jnp.concatenate([sc_h, z])),
                          (y2l_parts, jnp.concatenate([sc_l, z]))):
            srows = sc.reshape(meta.n_long_rows, LONG_PACK)
            parts.append(jnp.concatenate(
                [srows, jnp.zeros((meta.n_long_rows, 1), jnp.float32)],
                axis=1))

    y2h_parts.append(jnp.zeros((1, LANES), jnp.float32))
    y2l_parts.append(jnp.zeros((1, LANES), jnp.float32))

    # COO residue via y2 routing (see _assemble_y), compensated sums;
    # large residues run as a repacked sub-plan instead (meta.res)
    rs = None
    if arrays["overflow"] is not None and meta.res is None:
        o = arrays["overflow"]
        gh = jnp.take(xh.reshape(-1), o["cols"], mode="clip")
        gl = jnp.take(xl.reshape(-1), o["cols"], mode="clip")
        ph, plo = dd.mul(o["vals_hi"], o["vals_lo"], gh, gl, safe=True)
        ph = jnp.concatenate([ph, jnp.zeros(1, jnp.float32)])
        plo = jnp.concatenate([plo, jnp.zeros(1, jnp.float32)])
        parts_h, parts_l = [], []
        for t in o["trees"]:
            if t.shape[1] > 1:
                sh, sl = dd.sum_axis(jnp.take(ph, t, mode="clip"),
                                     jnp.take(plo, t, mode="clip"), 1,
                                     safe=True)
            else:
                sh = jnp.take(ph, t[:, 0], mode="clip")
                sl = jnp.take(plo, t[:, 0], mode="clip")
            parts_h.append(sh)
            parts_l.append(sl)
        rs = (jnp.concatenate(parts_h + [jnp.zeros(1, jnp.float32)]),
              jnp.concatenate(parts_l + [jnp.zeros(1, jnp.float32)]))
        if o["lane_table"].shape[0]:
            y2h_parts.append(jnp.take(rs[0], o["lane_table"],
                                      mode="clip").reshape(-1, LANES))
            y2l_parts.append(jnp.take(rs[1], o["lane_table"],
                                      mode="clip").reshape(-1, LANES))
    y2h = jnp.concatenate(y2h_parts, axis=0)
    y2l = jnp.concatenate(y2l_parts, axis=0)

    if len(meta.og_ranges) > 1:
        phl = [
            _make_outgather_dd(b1 - b0, y2h.shape[0], k, meta.interpret)(
                s, p, y2h, y2l)
            for (b0, b1, k), s, p in zip(meta.og_ranges,
                                         arrays["og_src"],
                                         arrays["og_perm"])]
        oh = jnp.concatenate([a for a, _ in phl], axis=0)
        ol = jnp.concatenate([b for _, b in phl], axis=0)
    else:
        oh, ol = _make_outgather_dd(meta.B_pad, y2h.shape[0], meta.k_used,
                                    meta.interpret)(
            arrays["out_src"], arrays["out_perm"], y2h, y2l)
    yh = oh.reshape(-1)[:meta.n_rows]
    yl = ol.reshape(-1)[:meta.n_rows]

    if rs is not None and arrays["overflow"]["fb_rows"].shape[0]:
        o = arrays["overflow"]
        zh = jnp.zeros_like(yh).at[o["fb_rows"]].set(
            jnp.take(rs[0], o["fb_pos"], mode="clip"), mode="drop",
            indices_are_sorted=True, unique_indices=True)
        zl = jnp.zeros_like(yl).at[o["fb_rows"]].set(
            jnp.take(rs[1], o["fb_pos"], mode="clip"), mode="drop",
            indices_are_sorted=True, unique_indices=True)
        yh, yl = dd.add(yh, yl, zh, zl, safe=True)
    if meta.res is not None:
        y_sub = _spmv_dd(meta.res, arrays["res"], dict(hi=xh, lo=xl))
        yh, yl = dd.add(yh, yl, y_sub["hi"], y_sub["lo"], safe=True)
    return dict(hi=yh, lo=yl)


class PallasSpMV:
    """Operator wrapper with the same interface as the XLA path."""

    def __new__(cls, csr, dtype: str = "f32", config=None,
                force_streamed: bool = False):
        from ..sparse import CSRMatrix
        if isinstance(csr, CSRMatrix) and csr.n_cols > SLAB_COLS:
            return SlabbedPallasSpMV(csr, dtype, config)
        return super().__new__(cls)

    def __init__(self, csr, dtype: str = "f32", config=None,
                 force_streamed: bool = False):
        import time
        from ..config import DEFAULT_CONFIG
        t0 = time.perf_counter()
        # A prebuilt WPlan is accepted directly: the plan is
        # dtype-independent (values are carried f64 and converted in
        # plan_to_arrays), so one pack serves f32/bf16/f64 operators —
        # the reference instead re-packs per dtype binary
        # (main_f64.cu/main_f16.cu are separate runs).
        self.plan = (csr if isinstance(csr, WPlan)
                     else build_wplan(csr, config or DEFAULT_CONFIG))
        self.dtype = dtype
        self._meta, arrays = plan_to_arrays(
            self.plan, dtype,
            strict_f64=(config or DEFAULT_CONFIG).strict_f64)
        # VMEM-resident iterated mode (ops/resident.py): plans whose
        # packed streams fit VMEM run chained iterations at VMEM
        # bandwidth (the TPU analog of the reference benchmarking out of
        # the A100's L2).  Constants must be built before device_put.
        # force_streamed skips the residency probe: the bench driver uses
        # it to time BOTH executor variants per eligible arm, matching
        # the reference's two-variant f16 record (dasp_f16.h:1542-1718).
        from . import resident as _resident
        if not force_streamed:
            _resident.prepare(self._meta, arrays)
        # host copy of the out_src table: the resident outgather is
        # STATICALLY specialized from it (resident.py:_og_program).
        # Residue-routing entries (> n_y2_rows) are stripped to the zero
        # row — the resident kernel's y2 scratch has no residue rows
        # (its wrapper applies the residue as a post-kernel scatter).
        self._src_host = (np.minimum(arrays["out_src"],
                                     self._meta.n_y2_rows)
                          if arrays.get("resident") is not None else None)
        # incidence band offsets are STATIC kernel parameters (plain
        # ints): keep them host-side — device_put would turn them into
        # traced i32 scalars the kernel can't close over
        self._big_c0_host = (arrays["resident"].pop("big_c0", None)
                             if arrays.get("resident") is not None else None)
        self._arrays = jax.device_put(arrays)
        self._fn = jax.jit(spmv_fn, static_argnums=0)
        # full-dd matmat callers keep the vmapped executor (_spmm_dd_kv)
        self._strict_f64 = (config or DEFAULT_CONFIG).strict_f64
        self.preprocess_seconds = time.perf_counter() - t0

    n_rows = property(lambda self: self.plan.n_rows)
    n_cols = property(lambda self: self.plan.n_cols)
    nnz = property(lambda self: self.plan.nnz)
    backend = "pallas"

    def _prep_x(self, x):
        return jax.device_put(prep_x(self._meta, x, self.plan.col_perm))

    def device_call(self, x_dev):
        return self._fn(self._meta, self._arrays, x_dev)

    @property
    def resident(self) -> bool:
        """True when chained iterations run VMEM-resident (the packed
        streams fit VMEM; see ops/resident.py)."""
        return self._arrays.get("resident") is not None

    def timing_loop(self, iters: int):
        meta = self._meta
        if self.resident:
            from . import resident as _resident
            loop_r = getattr(self, "_resident_jit", None)
            if loop_r is None:
                rfn = _resident.make_resident_loop(meta, self._src_host,
                                                   self._big_c0_host)
                # dynamic grid needs a real Mosaic lowering; interpret
                # mode gets a static per-iters retrace instead (cheap)
                loop_r = self._resident_jit = jax.jit(
                    rfn, static_argnums=(2,) if meta.interpret else ())
            it = iters if meta.interpret else jnp.int32(iters)
            return lambda x_dev: loop_r(self._arrays, x_dev, it)

        # The iteration count is a RUNTIME scalar (fori_loop with a traced
        # bound lowers to while_loop): ONE compile serves every loop
        # length, so the harness can scale the loop adaptively until real
        # work dominates the ~26 ms dispatch overhead without paying a
        # fresh 60s-6min remote compile per length.
        loop = getattr(self, "_stream_loop_jit", None)
        if loop is None:
            @jax.jit
            def loop(arrays, x2d, it):
                def body(_, x2d):
                    y = spmv_fn(meta, arrays, x2d)
                    tap = (y["hi"] if isinstance(y, dict) else y)[0]
                    tap = tap.astype(jnp.float32) * jnp.float32(1e-36)
                    if isinstance(x2d, dict):
                        return dict(hi=x2d["hi"] + tap, lo=x2d["lo"])
                    return x2d + tap
                x2d = jax.lax.fori_loop(0, it, body, x2d)
                return spmv_fn(meta, arrays, x2d)
            self._stream_loop_jit = loop

        it = jnp.int32(iters)
        return lambda x_dev: loop(self._arrays, x_dev, it)

    def perm_in(self, v):
        """Host: original-order vector -> the operator's internal (possibly
        relabeled) index space, flat (for feeding device loops directly).
        Identity when the plan carries no permutation."""
        if self.plan.col_perm is None:
            return np.asarray(v)
        out = np.empty_like(np.asarray(v))
        out[self.plan.col_perm] = np.asarray(v)
        return out

    def perm_out(self, y):
        """Host: internal-order y -> original row order (the analog of
        verifying through the reference's order_rid, main_f64.cu:3-16).
        Identity when rows were not permuted."""
        if self.plan.row_perm is None:
            return np.asarray(y)
        return np.asarray(y)[self.plan.row_perm]

    def __call__(self, x):
        y = self.device_call(self._prep_x(x))
        if self.dtype == "f64":
            from . import dd
            return self.perm_out(
                dd.to_f64(np.asarray(y["hi"]), np.asarray(y["lo"])))
        return self.perm_out(np.asarray(y))

    def _spmm_kv(self) -> int:
        """x vectors per multi-x colsum pass.  The multi-x kernel stages
        all kv stacked x tables as ONE un-blocked VMEM operand, so kv is
        halved until the stack fits the footprint budget; kv=1 falls back
        to the vmapped single-vector kernel (whose table is blocked per
        batch index) — a wide matrix whose SpMV fits VMEM must not fail
        to allocate on SpMM."""
        per_table = self._meta.s_rows * LANES * 4
        kv = KV_SPMM
        while kv > 1 and kv * per_table > SPMM_X_VMEM_BYTES:
            kv //= 2
        return kv

    def _matmat_fn(self):
        # cached across calls: a per-operator jit (a fresh jit per call
        # would retrace+recompile every time, measured 1.1s/call)
        fn = getattr(self, "_matmat_jit", None)
        if fn is None:
            meta = self._meta
            kv = self._spmm_dd_kv() if self.dtype == "f64" \
                else self._spmm_kv()
            if kv == 1:
                fn = jax.jit(jax.vmap(lambda a, xd: spmv_fn(meta, a, xd),
                                      in_axes=(None, 0)))
            elif self.dtype == "f64":
                # dd cross-product tier: hi and lo A streams each read
                # once per kv vectors (see spmm_fn_dd)
                fn = jax.jit(lambda a, x3: spmm_fn_dd(meta, a, x3, kv))
            else:
                # multi-x colsum: the A stream is read once per kv
                # vectors instead of once per vector
                fn = jax.jit(lambda a, x3: spmm_fn(meta, a, x3, kv))
            self._matmat_jit = fn
        return fn

    def _spmm_dd_kv(self) -> int:
        """dd SpMM vectors per pass: pass A stages 2*kv x tables, so
        halve the f32 budget answer; kv=1 falls back to the vmapped dd
        executor (full-dd accuracy, A streams re-read per vector).
        Callers needing full-dd accuracy set config.strict_f64 (the
        operator then keeps the vmapped path regardless)."""
        if getattr(self, "_strict_f64", False):
            return 1
        return max(1, self._spmm_kv() // 2)

    def matmat(self, X):
        """Multi-vector SpMV (SpMM): Y = A @ X for X of shape (n_cols, k).
        f32/bf16 run the multi-x colsum (A streamed once per KV_SPMM
        vectors) when the stacked x tables fit VMEM, else the vmapped
        single-vector kernel; f64 vmaps the dd executor (the reference is
        SpMV-only)."""
        X = np.asarray(X)
        k = X.shape[1]
        if self.dtype == "f64":
            from . import dd
            kv = self._spmm_dd_kv()
            if kv == 1:
                stacked = jax.tree.map(
                    lambda *xs: jnp.stack(xs),
                    *[prep_x(self._meta, X[:, j], self.plan.col_perm)
                      for j in range(k)])
                y = self._matmat_fn()(self._arrays, stacked)
                out = dd.to_f64(np.asarray(y["hi"]),
                                np.asarray(y["lo"])).T
            else:
                S = self._meta.s_rows
                fn = self._matmat_fn()
                cols_h, cols_l = [], []
                for c0 in range(0, k, kv):
                    xs = [prep_x(self._meta, X[:, j], self.plan.col_perm)
                          for j in range(c0, min(c0 + kv, k))]
                    while len(xs) < kv:       # zero-pad the last chunk
                        xs.append(dict(
                            hi=np.zeros((S, LANES), np.float32),
                            lo=np.zeros((S, LANES), np.float32)))
                    x3 = dict(
                        hi=jnp.asarray(np.concatenate(
                            [x["hi"] for x in xs], axis=0)),
                        lo=jnp.asarray(np.concatenate(
                            [x["lo"] for x in xs], axis=0)))
                    y = fn(self._arrays, x3)
                    cols_h.append(np.asarray(y["hi"]))
                    cols_l.append(np.asarray(y["lo"]))
                out = dd.to_f64(np.concatenate(cols_h, axis=0)[:k],
                                np.concatenate(cols_l, axis=0)[:k]).T
        elif self._spmm_kv() == 1:
            stacked = jnp.asarray(np.stack(
                [prep_x(self._meta, X[:, j], self.plan.col_perm)
                 for j in range(k)]))
            y = self._matmat_fn()(self._arrays, stacked)
            out = np.asarray(y)[:k].T.astype(
                np.float64 if X.dtype == np.float64 else X.dtype)
        else:
            S = self._meta.s_rows
            kv = self._spmm_kv()
            cols = []
            fn = self._matmat_fn()
            for c0 in range(0, k, kv):
                xs = [prep_x(self._meta, X[:, j], self.plan.col_perm)
                      for j in range(c0, min(c0 + kv, k))]
                while len(xs) < kv:            # zero-pad the last chunk
                    xs.append(np.zeros((S, LANES), np.float32))
                x3 = jnp.asarray(np.concatenate(xs, axis=0))
                cols.append(np.asarray(fn(self._arrays, x3)))
            out = np.concatenate(cols, axis=0)[:k].T.astype(
                np.float64 if X.dtype == np.float64 else X.dtype)
        if self.plan.row_perm is not None:
            out = out[self.plan.row_perm]
        return out


# ---------------------------------------------------------------------------
# Column slabs: matrices whose x exceeds the VMEM-resident table budget are
# split into column ranges, one windowed plan per slab; y is the sum of the
# per-slab SpMVs.  (Single-chip; the row dimension is the multi-chip axis.)
# ---------------------------------------------------------------------------

# 6M columns -> (47k,128) f32 table = 24 MB VMEM (48 MB as a dd hi/lo
# pair), comfortably inside the 128 MB VMEM next to the streamed-mode
# per-step blocks.  wiki-Talk (2.39M) and soc-LiveJournal1 (4.85M) run
# UNSLABBED; the multi-x SpMM path has its own tighter table gate
# (PallasSpMV._spmm_kv).
SLAB_COLS = 6_291_456


def split_columns(csr, slab_cols: int = SLAB_COLS):
    """Split a CSR by column ranges; element order within rows preserved."""
    from ..sparse import CSRMatrix
    n_slabs = -(-csr.n_cols // slab_cols)
    rows = np.repeat(np.arange(csr.n_rows), csr.row_lengths)
    out = []
    for j in range(n_slabs):
        lo, hi = j * slab_cols, min((j + 1) * slab_cols, csr.n_cols)
        sel = (csr.col_idx >= lo) & (csr.col_idx < hi)
        rpt = np.zeros(csr.n_rows + 1, dtype=np.int64)
        np.cumsum(np.bincount(rows[sel], minlength=csr.n_rows),
                  out=rpt[1:])
        out.append((lo, CSRMatrix(csr.n_rows, hi - lo, rpt,
                                  (csr.col_idx[sel] - lo).astype(np.int32),
                                  csr.values[sel].copy())))
    return out


class SlabbedPallasSpMV:
    """PallasSpMV for n_cols beyond the VMEM x-table budget: y = sum over
    column slabs of slab_plan @ x[slab]."""

    backend = "pallas"

    def __init__(self, csr, dtype: str = "f32", config=None,
                 slab_cols: int = SLAB_COLS):
        import time
        from ..config import DEFAULT_CONFIG
        t0 = time.perf_counter()
        self.n_rows, self.n_cols, self.nnz = csr.n_rows, csr.n_cols, csr.nnz
        self.dtype = dtype
        self.slabs = []
        import dataclasses as _dc
        # per-slab y's sum elementwise, so every slab must keep original
        # row order: no symmetric relabel, no row length-grouping
        cfg = _dc.replace(config or DEFAULT_CONFIG, row_sort="off")
        for lo, sub in split_columns(csr, slab_cols):
            plan = build_wplan(sub, cfg, sym_ok=False)
            meta, arrays = plan_to_arrays(plan, dtype,
                                          strict_f64=cfg.strict_f64)
            self.slabs.append((lo, sub.n_cols, meta,
                               jax.device_put(arrays), plan.col_perm))
        self.plan = None
        self._fn = jax.jit(spmv_fn, static_argnums=0)
        self.preprocess_seconds = time.perf_counter() - t0

    def _prep_x(self, x):
        x = np.asarray(x)
        return [jax.device_put(prep_x(meta, x[lo:lo + w], perm))
                for lo, w, meta, _, perm in self.slabs]

    def device_call(self, x_devs):
        y = None
        for (lo, w, meta, arrays, _), xd in zip(self.slabs, x_devs):
            yj = self._fn(meta, arrays, xd)
            if y is None:
                y = yj
            elif meta.dtype == "f64":
                from . import dd
                h, l = dd.add(y["hi"], y["lo"], yj["hi"], yj["lo"],
                              safe=True)
                y = dict(hi=h, lo=l)
            else:
                y = y + yj
        return y

    def timing_loop(self, iters: int):
        from . import dd
        slabs = self.slabs

        # runtime iteration count: one compile serves every loop length
        # (see PallasSpMV.timing_loop)
        loop = getattr(self, "_slab_loop_jit", None)
        if loop is None:
            @jax.jit
            def loop(all_arrays, x_devs, it):
                def one(x_devs):
                    y = None
                    for (lo, w, meta, _, _), arrays, xd in zip(
                            slabs, all_arrays, x_devs):
                        yj = spmv_fn(meta, arrays, xd)
                        if y is None:
                            y = yj
                        elif isinstance(yj, dict):
                            h, l = dd.add(y["hi"], y["lo"],
                                          yj["hi"], yj["lo"], safe=True)
                            y = dict(hi=h, lo=l)
                        else:
                            y = y + yj
                    return y

                def body(_, x_devs):
                    y = one(x_devs)
                    tap = (y["hi"] if isinstance(y, dict) else y)[0]
                    tap = tap.astype(jnp.float32) * jnp.float32(1e-36)
                    def nudge(xd):
                        if isinstance(xd, dict):
                            return dict(hi=xd["hi"] + tap, lo=xd["lo"])
                        return xd + tap
                    return [nudge(xd) for xd in x_devs]

                x_devs = jax.lax.fori_loop(0, it, body, x_devs)
                return one(x_devs)
            self._slab_loop_jit = loop

        all_arrays = [a for _, _, _, a, _ in self.slabs]
        it = jnp.int32(iters)
        return lambda x_devs: loop(all_arrays, x_devs, it)

    def __call__(self, x):
        y = self.device_call(self._prep_x(x))
        if self.dtype == "f64":
            from . import dd
            return dd.to_f64(np.asarray(y["hi"]), np.asarray(y["lo"]))
        return np.asarray(y)

    def perm_in(self, v):
        """Column slabs never row-permute; per-slab column perms are
        internal to _prep_x."""
        return np.asarray(v)

    perm_out = perm_in

    def matmat(self, X) -> np.ndarray:
        """Multi-vector SpMV over column slabs (loops columns)."""
        X = np.asarray(X)
        return np.stack([self(X[:, j]) for j in range(X.shape[1])],
                        axis=1)
