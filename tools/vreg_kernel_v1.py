"""Prototype: per-vreg windowed gather SpMV kernel.

Each stream vreg (8x128 = 1024 packed slots) is assigned one 1024-element
window of x (8 consecutive rows of x2d).  The kernel loops over vregs:
  xw = x2d[w : w+8]                     (dynamic slice, VMEM)
  g  = sublane_gather(xw, r)           (vreg-local, idx>>7)
  g  = lane_gather(g, lam)             (idx & 127)
  out_partial = colsum(vals * g)       ((1,128) per vreg)
Measures throughput vs the pure-copy roofline.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K_ITERS = 400


def timed(loop, *args, n=3):
    r = loop(*args)
    np.asarray(jax.tree.leaves(r)[0].ravel()[:8])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = loop(*args)
        np.asarray(jax.tree.leaves(r)[0].ravel()[:8])
        ts.append(time.perf_counter() - t0)
    return min(ts) / K_ITERS


def build(S=1024, NV=2560, BV=64):
    """S = x2d rows; NV = total vregs in stream; BV = vregs per grid step."""

    def kernel(win_ref, vals_ref, idx_ref, x_ref, out_ref):
        def body(v, _):
            w = win_ref[v]
            xw = x_ref[pl.ds(w, 8), :]                    # (8,128) window
            idx = idx_ref[pl.ds(v * 8, 8), :]
            vals = vals_ref[pl.ds(v * 8, 8), :]
            r = jax.lax.shift_right_logical(idx, 7)
            lam = jax.lax.bitwise_and(idx, 127)
            g = jnp.take_along_axis(xw, r, axis=0)
            g = jnp.take_along_axis(g, lam, axis=1)
            out_ref[pl.ds(v, 1), :] = jnp.sum(
                vals * g, axis=0, keepdims=True)
            return 0
        jax.lax.fori_loop(0, BV, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,             # window ids in SMEM
        grid=(NV // BV,),
        in_specs=[
            pl.BlockSpec((BV * 8, 128), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BV * 8, 128), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 128), lambda t, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BV, 128), lambda t, *_: (t, 0),
                               memory_space=pltpu.VMEM),
    )

    def op(win, vals, idx, x2d):
        # block-local window ids: kernel sees only its BV entries
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((NV, 128), jnp.float32),
        )(win, vals, idx, x2d)

    return op


def main():
    S, NV, BV = 1024, 2560, 64
    rng = np.random.default_rng(0)
    x2d = jnp.asarray(rng.standard_normal((S, 128)), dtype=jnp.float32)
    vals = jnp.asarray(rng.standard_normal((NV * 8, 128)), dtype=jnp.float32)
    # windows: one per vreg; indices local to the window
    win = jnp.asarray(rng.integers(0, S - 8, NV), dtype=jnp.int32)
    r = rng.integers(0, 8, (NV * 8, 128))
    lam = rng.integers(0, 128, (NV * 8, 128))
    idx = jnp.asarray((r << 7) | lam, dtype=jnp.int32)

    op = build(S, NV, BV)

    @jax.jit
    def loop(win, vals, idx, x2d):
        def body(_, x2d):
            out = op(win, vals, idx, x2d)
            return x2d + out.ravel()[0] * jnp.float32(1e-36)
        return jax.lax.fori_loop(0, K_ITERS, body, x2d)

    # correctness check against numpy (single call)
    out = op(win, vals, idx, x2d)
    v = 7
    xw = np.asarray(x2d)[int(win[v]):int(win[v]) + 8]
    g = xw[np.asarray(r)[v*8:(v+1)*8], np.asarray(lam)[v*8:(v+1)*8]]
    wait = (np.asarray(vals)[v*8:(v+1)*8] * g).sum(0)
    got = np.asarray(out)[v]
    print("kernel correct:", np.allclose(got, wait, rtol=1e-5), flush=True)

    sec = timed(loop, win, vals, idx, x2d)
    m = NV * 1024
    print(f"vreg-window gather+mul+reduce: {sec*1e6:8.1f} us/iter  "
          f"{m/sec/1e9:6.2f} Gelem/s  ({m*8/sec/1e9:6.1f} GB/s in-stream)")


if __name__ == "__main__":
    main()
