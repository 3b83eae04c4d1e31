"""Attribute the _assemble_y glue cost on the real TPU: sell segment
sums, y2 concat, long-row tree, outgather, overflow — each in its own
in-jit timing loop over precomputed colsum partials.  Round-4
livejournal follow-up to tools/stream_attrib.py (stage 2 = 1.68 ms:
which third?).

Usage: python -u tools/assembly_attrib.py [matrix] [iters]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from dasp_tpu.utils import enable_compile_cache

enable_compile_cache()

from dasp_tpu.ops import pallas_backend as pb
from dasp_tpu.ops.pallas_backend import (LANES, LONG_PACK, SUB,
                                         _make_colsum, _make_outgather)
from dasp_tpu.wplan import load_wplan

name = sys.argv[1] if len(sys.argv) > 1 else "livejournal_like"
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 200

from dasp_tpu.bench.suite import build_suite

csr = build_suite([name])[0][1]
rng = np.random.default_rng(0)
import glob

from bench import PLAN_CACHE_VER

plan = None
for pat in sorted(glob.glob(f".plan_cache/{name}_{csr.nnz}_*_v"
                            f"{PLAN_CACHE_VER}.npz"), reverse=True):
    try:
        plan = load_wplan(pat)
        print(f"# plan cache hit: {pat}", flush=True)
        break
    except Exception:
        pass
meta, arrays = pb.plan_to_arrays(plan if plan is not None
                                 else pb.build_wplan(csr))
arrays = jax.device_put(arrays)
x2d = jax.device_put(pb.prep_x(meta, rng.standard_normal(csr.n_cols)))


@jax.jit
def colsum_all(arrays, x2d):
    partials = []
    for (P, stride, NV), st in zip(meta.streams, arrays["streams"]):
        call = _make_colsum(P, meta.s_rows, NV, meta.interpret, stride)
        partials.append(call(st["wins"], st["vals"], st["idx"], x2d))
    return partials


partials = jax.block_until_ready(colsum_all(arrays, x2d))
np.asarray(partials[0][:1])          # force sync (see CLAUDE.md)

# perturbation target: smallest stream's partials (loop-carried dep)
psml = min(range(len(partials)), key=lambda i: partials[i].size)


def sell_sums(partials):
    y2_parts = []
    for stream, off, n_slices, w8, stride in meta.sell_segs:
        R_st = SUB // meta.streams[stream][1]
        R = SUB // stride
        F = R_st // R
        p = partials[stream][off * R_st:(off + n_slices * w8) * R_st]
        y2_parts.append(p.reshape(n_slices, w8, R, F, LANES).sum((1, 3))
                        .reshape(n_slices * R, LANES))
    return y2_parts


def long_tree(partials):
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
    return jnp.concatenate(
        [srows, jnp.zeros((meta.n_long_rows, 1), jnp.float32)], axis=1)


def vreg_totals_only(partials):
    outs = []
    for stream in sorted({s for s, _ in meta.long_groups}):
        R_st = SUB // meta.streams[stream][1]
        outs.append(partials[stream].reshape(-1, R_st * LANES).sum(axis=1))
    return jnp.concatenate(outs)


def full_y2(partials):
    y2_parts = sell_sums(partials)
    if meta.n_long:
        y2_parts.append(long_tree(partials))
    y2_parts.append(jnp.zeros((1, LANES), jnp.float32))
    return jnp.concatenate(y2_parts, axis=0)


y2_const = jax.block_until_ready(jax.jit(full_y2)(partials))
np.asarray(y2_const[:1])


def time_loop(tag, fn, *args):
    """fn(i, *args) -> scalar; timed via in-jit fori_loop (CLAUDE.md)."""
    @jax.jit
    def loop(*args):
        def body(i, c):
            return c + fn(i, *args)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    r = loop(*args)
    np.asarray(r)
    t0 = time.perf_counter()
    r = loop(*args)
    np.asarray(r)
    dt = (time.perf_counter() - t0) / iters * 1e6
    print(f"[{name}] {tag:16s} {dt:9.2f} us/iter", flush=True)
    return dt


eps = jnp.float32(1e-36)


def perturb(i, partials):
    return [p + (i * eps if j == psml else 0) for j, p in
            enumerate(partials)]


time_loop("sell_sums", lambda i, ps: sum(
    p[0, 0] for p in sell_sums(perturb(i, ps))), partials)
time_loop("vreg_totals", lambda i, ps: vreg_totals_only(
    perturb(i, ps))[0], partials)
time_loop("long_tree", lambda i, ps: long_tree(
    perturb(i, ps))[0, 0], partials)
time_loop("y2_full", lambda i, ps: full_y2(
    perturb(i, ps))[0, 0], partials)


def og(i, y2):
    out = _make_outgather(meta.B_pad, y2.shape[0], meta.k_used,
                          meta.interpret)(
        arrays["out_src"], arrays["out_perm"], y2 + i * eps)
    return out[0, 0]


time_loop("outgather", og, y2_const)

if arrays["overflow"] is not None:
    o = arrays["overflow"]

    def ovf(i, x2d):
        xg = jnp.take(x2d.reshape(-1) + i * eps, o["cols"], mode="clip")
        pc = jnp.concatenate([o["vals"] * xg, jnp.zeros(1, jnp.float32)])
        parts = [jnp.take(pc, t, mode="clip").sum(axis=1)
                 if t.shape[1] > 1 else
                 jnp.take(pc, t[:, 0], mode="clip")
                 for t in o["trees"]]
        return jnp.take(jnp.concatenate(parts), o["sort_back"])[0]

    time_loop("overflow", ovf, x2d)
