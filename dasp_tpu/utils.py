"""Shared runtime utilities."""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> str:
    """Turn on JAX's persistent compilation cache.

    XLA/Mosaic compiles dominate wall time on this runtime (60s-6min per
    jit on the tunneled TPU, ~12s per interpret-mode graph on CPU), and
    the benchmark suite re-runs identical shapes every round — a measured
    2048x2048 matmul jit went 90.5s -> skipped on a second process.  The
    reference has no analog (CUDA kernels are AOT-compiled); this is the
    TPU-runtime equivalent of shipping prebuilt kernels.
    """
    import jax

    path = path or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
