"""Per-round colsum cost A/B on the real TPU: current kernel vs factored
gather variants, on synthetic streams (timing only — the variants compute
different results on the same bits; correctness comes later with the
packer change).

Variants:
  cur   — per round: sublane gather + lane gather + cmp + select  (shipped)
  flane — per round: sublane gather + cmp + select; ONE lane gather after
          the round tree (valid if the round tag lives at cell positions)
  fboth — per round: cmp + select on the RAW window; ONE sublane gather +
          ONE lane gather after the tree (valid if the round tag lives at
          the word position (col%1024) and word positions are unique per
          vreg — the round-4 packer change under evaluation)

Usage: python -u tools/roundcost_ab.py [NV] [iters]
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

SUB, LANES = 8, 128
NV = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 400
BV = 128
UNROLL = 64


def make_colsum(P, S, NV, variant):
    def kernel(win_ref, vals_ref, idx_ref, x_ref, out_ref):
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
                    w = pl.multiple_of(win_ref[v, 1], SUB)
                    xw = x_ref[pl.ds(w, SUB), :]
                    g = jnp.take_along_axis(xw, q, axis=0)
                    g = jnp.take_along_axis(g, lam, axis=1)
                elif variant == "cur":
                    rnd = jax.lax.shift_right_logical(idx, 10)
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
                elif variant == "flane":
                    rnd = jax.lax.shift_right_logical(idx, 10)
                    terms = []
                    for p in range(P):
                        w = pl.multiple_of(win_ref[v, 1 + p], SUB)
                        xw = x_ref[pl.ds(w, SUB), :]
                        gp = jnp.take_along_axis(xw, q, axis=0)
                        terms.append(jnp.where(rnd == p, gp, 0.0))
                    while len(terms) > 1:
                        terms = [terms[i] + terms[i + 1]
                                 if i + 1 < len(terms) else terms[i]
                                 for i in range(0, len(terms), 2)]
                    g = jnp.take_along_axis(terms[0], lam, axis=1)
                else:  # fboth
                    rnd = jax.lax.shift_right_logical(idx, 10)
                    terms = []
                    for p in range(P):
                        w = pl.multiple_of(win_ref[v, 1 + p], SUB)
                        xw = x_ref[pl.ds(w, SUB), :]
                        terms.append(jnp.where(rnd == p, xw, 0.0))
                    while len(terms) > 1:
                        terms = [terms[i] + terms[i + 1]
                                 if i + 1 < len(terms) else terms[i]
                                 for i in range(0, len(terms), 2)]
                    g = jnp.take_along_axis(terms[0], q, axis=0)
                    g = jnp.take_along_axis(g, lam, axis=1)
                prod = vals.astype(jnp.float32) * g
                parts.append(jnp.sum(prod, axis=0, keepdims=True))
            out_ref[pl.ds(u * UNROLL, UNROLL), :] = \
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
        out_specs=pl.BlockSpec((BV, LANES), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NV, LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )


def bench_one(P, variant, S=4096):
    rng = np.random.default_rng(0)
    idx = (rng.integers(0, P, (NV * SUB, LANES)).astype(np.int32) << 10
           | rng.integers(0, SUB, (NV * SUB, LANES)).astype(np.int32) << 7
           | rng.integers(0, LANES, (NV * SUB, LANES)).astype(np.int32))
    idx = idx.astype(np.int16 if P <= 32 else np.int32)
    vals = rng.standard_normal((NV * SUB, LANES)).astype(np.float32)
    wins = np.zeros((NV, P + 1), dtype=np.int32)
    wins[:, 1:] = rng.integers(0, (S - SUB) // SUB, (NV, P)) * SUB
    x2d = rng.standard_normal((S, LANES)).astype(np.float32)
    call = make_colsum(P, S, NV, variant)
    wins_d, vals_d, idx_d, x_d = map(jax.device_put,
                                     (wins, vals, idx, x2d))

    @jax.jit
    def loop(wins, vals, idx, x2d, it):
        def body(_, x2d):
            out = call(wins, vals, idx, x2d)
            return x2d + out[0, 0] * jnp.float32(1e-36)
        return jax.lax.fori_loop(0, it, body, x2d)

    def run(it):
        return np.asarray(loop(wins_d, vals_d, idx_d, x_d,
                               jnp.int32(it))[:1, :8])

    run(ITERS)  # compile + warm
    co = call_overhead()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        run(ITERS)
        t1 = time.perf_counter()
        run(2 * ITERS)
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / ITERS)
    gbs = NV * SUB * LANES * 6 / best / 1e9
    return best, gbs


print(f"devices: {jax.devices()}", flush=True)
print(f"NV={NV} iters={ITERS}")
print(f"{'P':>4} {'variant':>7} {'us/iter':>9} {'GB/s':>7} "
      f"{'ns/vreg':>8}")
for P in (1, 4, 8, 16, 32):
    for variant in (("cur",) if P == 1 else ("cur", "flane", "fboth")):
        sec, gbs = bench_one(P, variant)
        print(f"{P:>4} {variant:>7} {sec*1e6:>9.2f} {gbs:>7.1f} "
              f"{sec/NV*1e9:>8.2f}", flush=True)
