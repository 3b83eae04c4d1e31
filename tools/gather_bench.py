"""Microbenchmark: in-kernel gather primitives on the real TPU.

The axon tunnel adds ~30 ms fixed overhead per jitted call, so every
measurement amortizes over an in-jit fori_loop with a data dependency
(perturbing the operand by out.sum()*1e-36 so XLA cannot hoist the body).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K_ITERS = 400


def timed_loop(op, idx, xw, n=3):
    """min seconds per op(idx, xw) amortized over K_ITERS in-jit iters."""

    @jax.jit
    def loop(idx, xw):
        def body(_, xw):
            out = op(idx, xw)
            return xw + out.ravel()[0] * jnp.float32(1e-36)
        return jax.lax.fori_loop(0, K_ITERS, body, xw)

    r = loop(idx, xw)
    np.asarray(r.ravel()[:8])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = loop(idx, xw)
        np.asarray(r.ravel()[:8])
        ts.append(time.perf_counter() - t0)
    return (min(ts) - 0.0) / K_ITERS  # subtract call overhead


def report(name, sec, m):
    print(f"{name:40s}: {sec*1e3:8.3f} ms  {m/sec/1e9:7.2f} Gelem/s  "
          f"({2*m*4/sec/1e9:6.1f} GB/s io)", flush=True)


def pallas_stream_op(kernel_body, B=2048):
    def kernel(idx_ref, xw_ref, out_ref):
        out_ref[:] = kernel_body(idx_ref[:], xw_ref[:])

    def op(idx, xw):
        G = idx.shape[0] // B
        return pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((B, 128), lambda t: (t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, 128), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B, 128), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.float32),
        )(idx, xw)
    return op


def main(which):
    rng = np.random.default_rng(0)
    R = 20480                      # stream rows -> 2.6M elements
    m = R * 128
    xw = jnp.asarray(rng.standard_normal((2048, 128)), dtype=jnp.float32)

    if which in ("all", "copy"):
        idx = jnp.asarray(rng.integers(0, 128, (R, 128)), dtype=jnp.int32)
        op = pallas_stream_op(lambda i, x: (i * 2).astype(jnp.float32))
        report("pallas copy", timed_loop(op, idx, xw), m)

    if which in ("all", "lane"):
        idx = jnp.asarray(rng.integers(0, 128, (R, 128)), dtype=jnp.int32)
        op = pallas_stream_op(
            lambda i, x: jnp.take_along_axis(x, i, axis=1))
        report("pallas lane-gather (128-window)", timed_loop(op, idx, xw), m)

    if which in ("all", "sublane"):
        idx = jnp.asarray(rng.integers(0, 2048, (R, 128)), dtype=jnp.int32)
        op = pallas_stream_op(
            lambda i, x: jnp.take_along_axis(x, i, axis=0))
        report("pallas sublane-gather (2048-tall)",
               timed_loop(op, idx, xw), m)

    if which in ("all", "xla_take"):
        idx = jnp.asarray(rng.integers(0, 2048 * 128, (R, 128)),
                          dtype=jnp.int32)
        op = lambda i, x: jnp.take(x.ravel(), i, mode='clip')
        report("XLA flat take (256k table)", timed_loop(op, idx, xw), m)


if __name__ == "__main__":
    import sys
    main(sys.argv[1] if len(sys.argv) > 1 else "all")
