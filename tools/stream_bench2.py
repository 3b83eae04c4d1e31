"""Find the colsum bandwidth cliff: add production features one at a
time to a 713 GB/s bare-copy synthetic (the retired round-1 probe
tools/stream_bench.py, conclusions in docs/DESIGN.md §2) and see which
one drops it to the observed ~330 GB/s.

Variants (all BV=128, UNROLL=32, NV=4096):
  A baseline      static window, small x
  B dynwin        per-vreg dynamic window offset from SMEM (big x table)
  C strided       stride-2 output (R=4 per-level sums)
  D p4            4 rounds + masked-sum tree (windows from SMEM)
  E p4 same-win   4 rounds but all windows equal (isolate DMA vs rounds)
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from dasp_tpu.utils import enable_compile_cache

enable_compile_cache()
from dasp_tpu.bench.harness import call_overhead

LANES, SUB = 128, 8
NV = 4096
BV, UNROLL = 128, 32
S = 1536                       # x table rows (like scircuit)

rng = np.random.default_rng(0)
vals = jnp.asarray(rng.standard_normal((NV * SUB, LANES)).astype(np.float32))
idxh = rng.integers(0, 1 << 10, (NV * SUB, LANES)).astype(np.int32)
x2d = jnp.asarray(rng.standard_normal((S, LANES)).astype(np.float32))


def make(variant, P=1, stride=SUB):
    R = SUB // stride

    def kernel(win_ref, vals_ref, idx_ref, x_ref, out_ref):
        def body(u, _):
            parts = []
            for k in range(UNROLL):
                v = u * UNROLL + k
                val = vals_ref[pl.ds(v * SUB, SUB), :]
                ix = idx_ref[pl.ds(v * SUB, SUB), :].astype(jnp.int32)
                lam = jax.lax.bitwise_and(ix, 127)
                q = jax.lax.bitwise_and(
                    jax.lax.shift_right_logical(ix, 7), 7)
                if P == 1:
                    if variant == "A":
                        xw = x_ref[0:SUB, :]
                    else:
                        w = pl.multiple_of(win_ref[v, 1], SUB)
                        xw = x_ref[pl.ds(w, SUB), :]
                    g = jnp.take_along_axis(xw, q, axis=0)
                    g = jnp.take_along_axis(g, lam, axis=1)
                else:
                    rnd = jax.lax.shift_right_logical(ix, 10)
                    terms = []
                    for p in range(P):
                        w = pl.multiple_of(win_ref[v, 1 + p], SUB)
                        xw = x_ref[pl.ds(w, SUB), :]
                        gp = jnp.take_along_axis(xw, q, axis=0)
                        gp = jnp.take_along_axis(gp, lam, axis=1)
                        terms.append(jnp.where(rnd == p, gp, 0.0))
                    while len(terms) > 1:
                        terms = [terms[i] + terms[i + 1]
                                 if i + 1 < len(terms) else terms[i]
                                 for i in range(0, len(terms), 2)]
                    g = terms[0]
                prod = val * g
                for L in range(R):
                    parts.append(jnp.sum(prod[L * stride:(L + 1) * stride],
                                         axis=0, keepdims=True))
            out_ref[pl.ds(u * UNROLL * R, UNROLL * R), :] = \
                jnp.concatenate(parts, 0)
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
            pl.BlockSpec((S, LANES), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BV * R, LANES), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NV * R, LANES), jnp.float32),
        interpret=False,
    )


def run(tag, variant, P=1, stride=SUB, idx_bits=True, same_win=False):
    ix = idxh.copy()
    if P > 1:
        ix |= rng.integers(0, P, (NV * SUB, LANES)).astype(np.int32) << 10
    idx = jnp.asarray(ix.astype(np.int16))
    wins = np.zeros((NV, P + 1), dtype=np.int32)
    wins[:, 0] = P
    for p in range(P):
        if same_win:
            wins[:, 1 + p] = 0
        else:
            wins[:, 1 + p] = rng.integers(0, (S - SUB) // SUB, NV) * SUB
    winsd = jnp.asarray(wins)
    fn = make(variant, P, stride)

    @jax.jit
    def loop(wins, vals, idx, x2d):
        def body(_, x):
            o = fn(wins, vals, idx, x)
            return x + o[0, 0] * jnp.float32(1e-36)
        x = jax.lax.fori_loop(0, 300, body, x2d)
        return fn(wins, vals, idx, x)

    np.asarray(loop(winsd, vals, idx, x2d)[:1])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(winsd, vals, idx, x2d)[:1])
        best = min(best, time.perf_counter() - t0)
    per = max(best - call_overhead(), 0) / 301
    BYTES = NV * SUB * LANES * 6 + NV * (SUB // stride) * LANES * 4
    print(f"{tag:14s}: {per*1e6:7.1f} us  {BYTES/per/1e9:6.1f} GB/s",
          flush=True)


run("A static-win", "A")
run("B dyn-win", "B")
run("C stride2", "B", stride=2)
run("D P4", "B", P=4)
run("E P4 same-win", "B", P=4, same_win=True)
run("F P2", "B", P=2)
