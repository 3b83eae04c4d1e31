"""Like tools/ablate.py but with the TRACED-bound loop the real operator
uses, plus incremental real components: replica stage3 -> +real og_ranges
-> +residue sub-plan -> real spmv_fn.  Attributes the gap between the
static-replica numbers and the operator's recorded time."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from dasp_tpu.utils import enable_compile_cache

enable_compile_cache()

from dasp_tpu.bench.harness import call_overhead
from dasp_tpu.ops import pallas_backend as pb
from dasp_tpu.ops.pallas_backend import (LANES, LONG_PACK, SUB,
                                         _make_colsum, _make_outgather)

name = sys.argv[1] if len(sys.argv) > 1 else "rmat_like"
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 100

from dasp_tpu.bench.suite import build_suite
csr = build_suite([name])[0][1]
rng = np.random.default_rng(0)
plan = None
import glob
from bench import PLAN_CACHE_VER
for pat in sorted(glob.glob(f".plan_cache/{name}_{csr.nnz}_*_v"
                            f"{PLAN_CACHE_VER}.npz"), reverse=True):
    try:
        from dasp_tpu.wplan import load_wplan
        plan = load_wplan(pat)
        print(f"# plan cache hit: {pat}", flush=True)
        break
    except Exception:
        pass
meta, arrays = pb.plan_to_arrays(plan if plan is not None
                                 else pb.build_wplan(csr))
arrays = jax.device_put(arrays)
x2d = jax.device_put(pb.prep_x(meta, rng.standard_normal(csr.n_cols)))


def fn_replica3(arrays, x2d):
    """colsum + y2 assembly + single-range outgather (no overflow)."""
    partials = []
    for (P, stride, NV), st in zip(meta.streams, arrays["streams"]):
        call = _make_colsum(P, meta.s_rows, NV, meta.interpret, stride)
        partials.append(call(st["wins"], st["vals"], st["idx"], x2d))
    y2_parts = []
    for stream, off, n_slices, w8, stride in meta.sell_segs:
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
    y2_parts.append(jnp.zeros((1, LANES), jnp.float32))
    y2 = jnp.concatenate(y2_parts, axis=0)
    out = _make_outgather(meta.B_pad, y2.shape[0], meta.k_used,
                          meta.interpret)(
        arrays["out_src"], arrays["out_perm"], y2)
    return out.reshape(-1)[:meta.n_rows]


def fn_sub_only(arrays, x2d):
    """just the residue sub-plan SpMV"""
    return pb.spmv_fn(meta.res, arrays["res"], x2d)


def fn_real(arrays, x2d):
    return pb.spmv_fn(meta, arrays, x2d)


co = call_overhead()
for label, fn in (("replica3", fn_replica3),
                  ("sub_only", fn_sub_only) if meta.res is not None
                  else ("skip", None),
                  ("real", fn_real)):
    if fn is None:
        continue

    @jax.jit
    def loop(arrays, x2d, it):
        def body(_, x2d):
            y = fn(arrays, x2d)
            return x2d + y.ravel()[0].astype(jnp.float32) * jnp.float32(1e-36)
        x2d = jax.lax.fori_loop(0, it, body, x2d)
        return fn(arrays, x2d)

    it = jnp.int32(iters)
    t0 = time.perf_counter()
    np.asarray(jax.tree.leaves(loop(arrays, x2d, it))[0].ravel()[:4])
    print(f"[{name}] {label} compile+run {time.perf_counter()-t0:.1f}s",
          flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(loop(arrays, x2d, it))[0].ravel()[:4])
        best = min(best, time.perf_counter() - t0)
    per = max(best - co, 0) / (iters + 1)
    print(f"[{name}] {label:9s}: {per*1e6:9.2f} us/iter", flush=True)
