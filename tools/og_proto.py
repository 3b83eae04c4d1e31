"""Prototype the mode-based outgather primitives on the real TPU.

Validates: (a) @pl.when-predicated rounds keyed on SMEM scalars,
(b) sublane take_along_axis from an (8,128) stack to (32,128),
(c) out_ref read-modify-write accumulation across predicated rounds.
Compares against a numpy model and times vs the direct-32-loads version.
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

LANES, G = 128, 32
OB = 64
K = 6
R2 = 4096
B = 1344          # blocks (multiple of OB)
NG = B // G

rng = np.random.default_rng(0)
y2 = rng.standard_normal((R2, LANES)).astype(np.float32)
y2[R2 - 1] = 0.0
Z = R2 - 1

# synthetic slot table: slot0 scattered (mode2), slots1-4 mode1 (<=8
# distinct per gang), slot5 all-Z (mode0) for half the gangs
src = np.full((B, K), Z, dtype=np.int32)
src[:, 0] = rng.integers(0, R2 - 1, B)
for s in range(1, 5):
    for g in range(NG):
        rows = rng.integers(0, R2 - 1, 5)
        src[g * G:(g + 1) * G, s] = rows[rng.integers(0, 5, G)]
src[: B // 2, 5] = rng.integers(0, R2 - 1, B // 2)
perm = rng.integers(0, LANES, (K, B, LANES)).astype(np.int32)

golden = np.zeros((B, LANES), np.float32)
for b in range(B):
    for s in range(K):
        golden[b] += y2[src[b, s]][perm[s, b]]

# mode tables
mode = np.zeros((NG, K), np.int32)
rows8 = np.full((NG, K * 8), Z, np.int32)
selpos = np.zeros((B, K), np.int32)
for g in range(NG):
    for s in range(K):
        col = src[g * G:(g + 1) * G, s]
        dist = np.unique(col)
        if (dist == Z).all():
            mode[g, s] = 0
        elif dist.size <= 8:
            mode[g, s] = 1
            rows8[g, s * 8:s * 8 + dist.size] = dist
            # fold the sub-row selector into the perm tile's high bits:
            # the kernel recovers sel = perm >> 8, lane = perm & 127
            sel = np.searchsorted(dist, col)
            perm[s, g * G:(g + 1) * G, :] |= (sel[:, None] << 8)
        else:
            mode[g, s] = 2


def make_modes(interpret=False):
    def kernel(mode_ref, rows8_ref, sel_ref, src_ref, perm_ref, y2_ref,
               out_ref):
        g0 = pl.program_id(0) * (OB // G)

        def body(u, _):
            rows = pl.ds(u * G, G)
            out_ref[rows, :] = jnp.zeros((G, LANES), jnp.float32)
            for s in range(K):
                m = mode_ref[g0 + u, s]

                @pl.when(m == 2)
                def _():
                    stack = jnp.concatenate(
                        [y2_ref[pl.ds(src_ref[u * G + k, s], 1), :]
                         for k in range(G)], 0)
                    pr = perm_ref[s, rows, :]
                    out_ref[rows, :] += jnp.take_along_axis(
                        stack, pr, axis=1)

                @pl.when(m == 1)
                def _():
                    stack8 = jnp.concatenate(
                        [y2_ref[pl.ds(rows8_ref[g0 + u, s * 8 + j], 1), :]
                         for j in range(8)], 0)
                    pr = perm_ref[s, rows, :]
                    sel = jax.lax.shift_right_logical(pr, 8)
                    lane = jax.lax.bitwise_and(pr, 127)
                    # sublane gather is (8,128)->(8,128) only: expand the
                    # 32 output rows as 4 single-vreg gathers with the
                    # selector streamed from the perm tile's high bits
                    subs = [jnp.take_along_axis(
                                stack8, sel[q * 8:(q + 1) * 8], axis=0)
                            for q in range(G // 8)]
                    stack = jnp.concatenate(subs, 0)
                    out_ref[rows, :] += jnp.take_along_axis(
                        stack, lane, axis=1)
            return 0

        jax.lax.fori_loop(0, OB // G, body, 0)

    return pl.pallas_call(
        kernel,
        grid=(B // OB,),
        in_specs=[
            pl.BlockSpec((NG, K), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((NG, K * 8), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((OB, K), lambda t: (t, 0),
                         memory_space=pltpu.SMEM),
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
    )


def make_modes_reg():
    """Value-returning cond keeps the accumulator in registers (no RMW)."""
    def kernel(mode_ref, rows8_ref, src_ref, perm_ref, y2_ref, out_ref):
        g0 = pl.program_id(0) * (OB // G)

        def body(u, _):
            rows = pl.ds(u * G, G)
            acc = jnp.zeros((G, LANES), jnp.float32)
            for s in range(K):
                m = mode_ref[g0 + u, s]
                pr = perm_ref[s, rows, :]

                def direct_path(pr=pr, s=s, u=u):
                    stack = jnp.concatenate(
                        [y2_ref[pl.ds(src_ref[u * G + k, s], 1), :]
                         for k in range(G)], 0)
                    return jnp.take_along_axis(
                        stack, jax.lax.bitwise_and(pr, 127), axis=1)

                def gather8_path(pr=pr, s=s, u=u):
                    stack8 = jnp.concatenate(
                        [y2_ref[pl.ds(rows8_ref[g0 + u, s * 8 + j], 1), :]
                         for j in range(8)], 0)
                    sel = jax.lax.shift_right_logical(pr, 8)
                    lane = jax.lax.bitwise_and(pr, 127)
                    subs = [jnp.take_along_axis(
                                stack8, sel[q * 8:(q + 1) * 8], axis=0)
                            for q in range(G // 8)]
                    return jnp.take_along_axis(
                        jnp.concatenate(subs, 0), lane, axis=1)

                def zero_path():
                    return jnp.zeros((G, LANES), jnp.float32)

                acc = acc + jax.lax.cond(
                    m == 2, direct_path,
                    lambda: jax.lax.cond(m == 1, gather8_path, zero_path))
            out_ref[rows, :] = acc
            return 0

        jax.lax.fori_loop(0, OB // G, body, 0)

    return pl.pallas_call(
        kernel,
        grid=(B // OB,),
        in_specs=[
            pl.BlockSpec((NG, K), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((NG, K * 8), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
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
    )


def make_direct():
    def kernel(src_ref, perm_ref, y2_ref, out_ref):
        def body(u, _):
            rows = pl.ds(u * G, G)
            acc = None
            for s in range(K):
                stack = jnp.concatenate(
                    [y2_ref[pl.ds(src_ref[u * G + k, s], 1), :]
                     for k in range(G)], 0)
                g = jnp.take_along_axis(stack, perm_ref[s, rows, :], axis=1)
                acc = g if acc is None else acc + g
            out_ref[rows, :] = acc
            return 0

        jax.lax.fori_loop(0, OB // G, body, 0)

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
    )


dev = dict(mode=jnp.asarray(mode), rows8=jnp.asarray(rows8),
           sel=jnp.asarray(selpos), src=jnp.asarray(src),
           perm=jnp.asarray(perm), y2=jnp.asarray(y2))

out_m = np.asarray(make_modes()(dev["mode"], dev["rows8"], dev["sel"],
                                dev["src"], dev["perm"], dev["y2"]))
err = np.abs(out_m - golden).max()
print("modes kernel max err:", err, flush=True)
out_d = np.asarray(make_direct()(dev["src"], dev["perm"], dev["y2"]))
print("direct kernel max err:", np.abs(out_d - golden).max(), flush=True)


def timeit(fn, args):
    @jax.jit
    def loop(a):
        def body(_, y2x):
            o = fn(*a[:-1], y2x)
            return y2x + o[0, 0] * jnp.float32(1e-36)
        y2x = jax.lax.fori_loop(0, 1000, body, a[-1])
        return fn(*a[:-1], y2x)

    np.asarray(loop(args)[:1])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(args)[:1])
        best = min(best, time.perf_counter() - t0)
    return max(best - call_overhead(), 0) / 1001


out_r = np.asarray(make_modes_reg()(dev["mode"], dev["rows8"],
                                    dev["src"], dev["perm"], dev["y2"]))
print("modes-reg max err:", np.abs(out_r - golden).max(), flush=True)

tm = timeit(make_modes(), (dev["mode"], dev["rows8"], dev["sel"],
                           dev["src"], dev["perm"], dev["y2"]))
tr = timeit(make_modes_reg(), (dev["mode"], dev["rows8"],
                               dev["src"], dev["perm"], dev["y2"]))
td = timeit(make_direct(), (dev["src"], dev["perm"], dev["y2"]))
print(f"modes(rmw): {tm*1e6:.2f} us/iter", flush=True)
print(f"modes(reg): {tr*1e6:.2f} us/iter", flush=True)
print(f"direct:     {td*1e6:.2f} us/iter", flush=True)
