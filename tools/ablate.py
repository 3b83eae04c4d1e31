"""Component ablation of the windowed SpMV on the real TPU.

Times in-jit loops of progressively larger subgraphs of spmv_fn to
attribute wall time: colsum streams -> +y2 assembly -> +outgather ->
+overflow (= full).  Usage: python -u tools/ablate.py [matrix] [iters]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from dasp_tpu.utils import enable_compile_cache

enable_compile_cache()

from dasp_tpu.bench.harness import call_overhead
from dasp_tpu.bench.suite import SUITE
from dasp_tpu.ops import pallas_backend as pb
from dasp_tpu.ops.pallas_backend import (LANES, LONG_PACK, SUB,
                                         _make_colsum, _make_outgather)

name = sys.argv[1] if len(sys.argv) > 1 else "scircuit_like"
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 1000

from dasp_tpu.bench.suite import build_suite
csr = build_suite([name])[0][1]   # deterministic + .suite_cache-backed
rng = np.random.default_rng(0)
# reuse the bench driver's on-disk plan cache when present (packing the
# 69M-nnz livejournal arm costs ~240s of this box's one bursty vCPU)
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


def partial_spmv(stage):
    """stage: 1=colsum only, 2=+y2 assembly, 3=+outgather, 4=full."""
    def fn(arrays, x2d):
        partials = []
        for (P, stride, NV), st in zip(meta.streams, arrays["streams"]):
            call = _make_colsum(P, meta.s_rows, NV,
                                 meta.interpret, stride)
            partials.append(call(st["wins"], st["vals"], st["idx"], x2d))
        if stage == 1:
            return sum(p[0, 0] for p in partials)

        y2_parts = []
        for stream, off, n_slices, w8, stride in meta.sell_segs:
            R = SUB // stride
            p = partials[stream][off * R:(off + n_slices * w8) * R]
            y2_parts.append(p.reshape(n_slices, w8, R, LANES).sum(1)
                            .reshape(n_slices * R, LANES))
        if meta.n_long:
            vreg_totals = [None] * len(meta.streams)
            souts = []
            for stream, li in meta.long_groups:
                if vreg_totals[stream] is None:
                    t = partials[stream].sum(axis=1)
                    vreg_totals[stream] = jnp.concatenate(
                        [t, jnp.zeros(1, t.dtype)])
                idxm = arrays["long_idx"][li]
                souts.append(jnp.take(vreg_totals[stream], idxm,
                                      mode="clip").sum(axis=1))
            cat = jnp.concatenate(souts + [jnp.zeros(1, jnp.float32)])
            scalars = jnp.take(cat, arrays["long_gat"],
                               mode="clip").sum(axis=1)
            pad = meta.n_long_rows * LONG_PACK - meta.n_long
            scalars = jnp.concatenate([scalars, jnp.zeros(pad, jnp.float32)])
            srows = scalars.reshape(meta.n_long_rows, LONG_PACK)
            srows = jnp.concatenate(
                [srows, jnp.zeros((meta.n_long_rows, 1), jnp.float32)],
                axis=1)
            y2_parts.append(srows)
        y2_parts.append(jnp.zeros((1, LANES), jnp.float32))
        y2 = jnp.concatenate(y2_parts, axis=0)
        if stage == 2:
            # full-materialization tap: y2[0] alone lets XLA DCE most of
            # the assembly, which inflated the apparent outgather cost
            return jnp.sum(y2, axis=0)

        out = _make_outgather(meta.B_pad, y2.shape[0], meta.k_used,
                              meta.interpret)(
            arrays["out_src"], arrays["out_perm"], y2)
        y = out.reshape(-1)[:meta.n_rows]
        if stage == 3:
            return y

        if arrays["overflow"] is not None:
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
        return y

    @jax.jit
    def loop(arrays, x2d):
        def body(_, x2d):
            y = fn(arrays, x2d)
            return x2d + y.ravel()[0] * jnp.float32(1e-36)
        x2d = jax.lax.fori_loop(0, iters, body, x2d)
        return fn(arrays, x2d)

    return loop


co = call_overhead()
labels = {1: "colsum", 2: "+y2 assembly", 3: "+outgather", 4: "full"}
for stage in (1, 2, 3, 4):
    loop = partial_spmv(stage)
    np.asarray(jax.tree.leaves(loop(arrays, x2d))[0].ravel()[:4])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(loop(arrays, x2d))[0].ravel()[:4])
        best = min(best, time.perf_counter() - t0)
    per = max(best - co, 0) / (iters + 1)
    print(f"[{name}] stage {stage} ({labels[stage]:12s}): "
          f"{per*1e6:8.2f} us/iter", flush=True)
