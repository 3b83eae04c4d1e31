"""Measure XLA per-element take / scatter floors on the real TPU.

These two numbers decide every COO-residue design choice (see
plan_to_arrays' terminal-correction dispatch): jnp.take and scatter-add
have no Pallas path in the terminal correction, so their XLA cost IS the
floor for scattered-singles corrections.

The operand fed to take/scatter is derived from the LOOP CARRY — a first
version gathered from a loop-invariant vector and XLA hoisted the whole
gather out of the while_loop, reading ~0.04 ns/element.  Measured with
the carry-dependence (2026-08-21, v5e via axon): take ~2.6-5 ns/element,
sorted-unique scatter ~9 ns/row.

Usage: python -u tools/take_probe.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

from dasp_tpu.utils import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from dasp_tpu.bench.harness import call_overhead

rng = np.random.default_rng(0)
vec = jax.device_put(jnp.asarray(rng.standard_normal(2_400_000),
                                 jnp.float32))
N = 100
co = call_overhead()


def bench(label, idx, n_norm):
    ix = jax.device_put(jnp.asarray(idx, jnp.int32))

    @jax.jit
    def loop(v, ix, it):
        def body(_, carry):
            # v + carry: the gather operand depends on the carry, so the
            # gather cannot be hoisted out of the loop
            g = jnp.take(v + carry, ix, mode="clip")
            return g.sum() * jnp.float32(1e-30)
        return jax.lax.fori_loop(0, it, body, jnp.float32(0.0))

    np.asarray(loop(vec, ix, jnp.int32(N)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(vec, ix, jnp.int32(N)))
        best = min(best, time.perf_counter() - t0)
    per = max(best - co, 0) / N
    print(f"{label:26s}: {per*1e6:8.1f} us = {per/n_norm*1e9:6.2f} ns/el",
          flush=True)


for n in (179_000, 1_000_000, 5_000_000):
    bench(f"take{n//1000}k_unsorted", rng.integers(0, 2_400_000, size=n), n)
bench("take1M_sorted", np.sort(rng.integers(0, 2_400_000,
                                            size=1_000_000)), 1_000_000)

for n in (30_000, 137_000, 350_000):
    rows = np.sort(rng.choice(2_400_000, size=n, replace=False))
    w = jax.device_put(jnp.asarray(rng.standard_normal(n), jnp.float32))
    rows_d = jax.device_put(jnp.asarray(rows, jnp.int32))

    @jax.jit
    def sloop(v, r, w, it):
        def body(_, carry):
            y = v.at[r].add(w + carry, mode="drop",
                            indices_are_sorted=True, unique_indices=True)
            return y.ravel()[0] * jnp.float32(1e-30)
        return jax.lax.fori_loop(0, it, body, jnp.float32(0.0))

    np.asarray(sloop(vec, rows_d, w, jnp.int32(N)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(sloop(vec, rows_d, w, jnp.int32(N)))
        best = min(best, time.perf_counter() - t0)
    per = max(best - co, 0) / N
    print(f"scatter{n//1000}k_sorted        : {per*1e6:8.1f} us = "
          f"{per/n*1e9:6.2f} ns/row", flush=True)
