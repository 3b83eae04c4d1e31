"""Feasibility probe for VMEM-resident iterated SpMV.

Q1: does Pallas re-DMA an un-blocked operand whose index_map is constant
    across grid steps, or keep it resident?  (Time vs iteration count.)
Q2: how much VMEM can one kernel actually hold on this chip?
Q3: per-iteration cost of a resident colsum-like body vs the per-call
    streaming kernel (the ~550 GB/s HBM ceiling).
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

LANES, SUB = 128, 8
UNROLL = 32


def make(nv, iters):
    def kernel(vals_ref, idx_ref, x_ref, out_ref):
        def body(u, _):
            parts = []
            for k in range(UNROLL):
                v = u * UNROLL + k
                val = vals_ref[pl.ds(v * SUB, SUB), :]
                ix = idx_ref[pl.ds(v * SUB, SUB), :].astype(jnp.int32)
                lam = jax.lax.bitwise_and(ix, 127)
                q = jax.lax.bitwise_and(
                    jax.lax.shift_right_logical(ix, 7), 7)
                g = jnp.take_along_axis(x_ref[0:SUB, :], q, axis=0)
                g = jnp.take_along_axis(g, lam, axis=1)
                parts.append(jnp.sum(val * g, axis=0, keepdims=True))
            out_ref[pl.ds(u * UNROLL, UNROLL), :] = jnp.concatenate(parts, 0)
            return 0

        jax.lax.fori_loop(0, nv // UNROLL, body, 0)

    return pl.pallas_call(
        kernel,
        grid=(iters,),
        in_specs=[
            pl.BlockSpec((nv * SUB, LANES), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nv * SUB, LANES), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, LANES), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nv, LANES), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nv, LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )


def bench(nv, iters_a, iters_b):
    rng = np.random.default_rng(0)
    vals = jnp.asarray(
        rng.standard_normal((nv * SUB, LANES)).astype(np.float32))
    idx = jnp.asarray(
        rng.integers(0, 1024, (nv * SUB, LANES)).astype(np.int16))
    x2d = jnp.asarray(rng.standard_normal((64, LANES)).astype(np.float32))
    fa = jax.jit(lambda v, i, x: make(nv, iters_a)(v, i, x))
    fb = jax.jit(lambda v, i, x: make(nv, iters_b)(v, i, x))
    np.asarray(fa(vals, idx, x2d)[:1])
    np.asarray(fb(vals, idx, x2d)[:1])
    best = [1e9, 1e9]
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fa(vals, idx, x2d)[:1])
        t1 = time.perf_counter()
        np.asarray(fb(vals, idx, x2d)[:1])
        t2 = time.perf_counter()
        best[0] = min(best[0], t1 - t0)
        best[1] = min(best[1], t2 - t1)
    per = (best[1] - best[0]) / (iters_b - iters_a)
    bytes_per = nv * SUB * LANES * 6
    print(f"nv={nv:5d} ({bytes_per/1e6:6.1f} MB): {per*1e6:7.2f} us/iter "
          f"resident-BW {bytes_per/per/1e9:7.1f} GB/s", flush=True)


for nv in (512, 2048, 4096):
    bench(nv, 50, 150)
# VMEM capacity scan: vals+idx+out footprint per nv is nv*SUB*128*6+nv*512
for nv in (4096, 8192, 12288, 16384):
    try:
        bench(nv, 10, 30)
    except Exception as e:
        print(f"nv={nv}: FAILED {str(e)[:160]}", flush=True)
        break
