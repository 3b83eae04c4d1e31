"""Measure the practical Pallas HBM streaming ceiling on this chip, with
the colsum's operand mix (f32 vals + int16 idx + small SMEM), as a
function of block size BV and inner unroll.

If this tops out near what colsum already achieves (~300 GB/s), colsum is
bandwidth-bound and further kernel tuning is pointless; if it reaches
500+ GB/s there is headroom.
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
NV = 4096                      # vregs (24 MB of streams)

rng = np.random.default_rng(0)
vals = jnp.asarray(rng.standard_normal((NV * SUB, LANES)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, 1024, (NV * SUB, LANES)).astype(np.int16))
x2d = jnp.asarray(rng.standard_normal((64, LANES)).astype(np.float32))


def make(bv, unroll, gather):
    def kernel(vals_ref, idx_ref, x_ref, out_ref):
        def body(u, _):
            parts = []
            for k in range(unroll):
                v = u * unroll + k
                val = vals_ref[pl.ds(v * SUB, SUB), :]
                ix = idx_ref[pl.ds(v * SUB, SUB), :].astype(jnp.int32)
                if gather:
                    lam = jax.lax.bitwise_and(ix, 127)
                    q = jax.lax.bitwise_and(
                        jax.lax.shift_right_logical(ix, 7), 7)
                    g = jnp.take_along_axis(x_ref[0:SUB, :], q, axis=0)
                    g = jnp.take_along_axis(g, lam, axis=1)
                    prod = val * g
                else:
                    prod = val * ix.astype(jnp.float32)
                parts.append(jnp.sum(prod, axis=0, keepdims=True))
            out_ref[pl.ds(u * unroll, unroll), :] = jnp.concatenate(parts, 0)
            return 0

        jax.lax.fori_loop(0, bv // unroll, body, 0)

    return pl.pallas_call(
        kernel,
        grid=(NV // bv,),
        in_specs=[
            pl.BlockSpec((bv * SUB, LANES), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bv * SUB, LANES), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, LANES), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bv, LANES), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NV, LANES), jnp.float32),
        interpret=False,
    )


BYTES = NV * SUB * LANES * (4 + 2) + NV * LANES * 4
co = call_overhead()
for gather in (False, True):
    for bv, unroll in ((128, 32), (256, 32), (512, 32), (256, 64),
                       (512, 128), (1024, 64)):
        fn = make(bv, unroll, gather)

        @jax.jit
        def loop(vals, idx, x2d):
            def body(_, x):
                o = fn(vals, idx, x)
                return x + o[0, 0] * jnp.float32(1e-36)
            x = jax.lax.fori_loop(0, 300, body, x2d)
            return fn(vals, idx, x)

        np.asarray(loop(vals, idx, x2d)[:1])
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(loop(vals, idx, x2d)[:1])
            best = min(best, time.perf_counter() - t0)
        per = max(best - co, 0) / 301
        print(f"gather={int(gather)} BV={bv:5d} UNROLL={unroll:3d}: "
              f"{per*1e6:7.1f} us  {BYTES/per/1e9:6.1f} GB/s", flush=True)
