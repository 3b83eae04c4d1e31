"""Benchmark suite: synthetic stand-ins for the paper's SuiteSparse configs.

The reference benchmarks SuiteSparse .mtx inputs (``README.md:21``); this
environment has no network access, so the suite synthesizes matrices with
the same structural archetypes as BASELINE.md's configs:
  * cop20k-like      — FEM, banded medium rows          (config 1/2)
  * scircuit-like    — circuit, short-row dominated     (config 3)
  * webbase-like     — web graph, power-law, many short (config 3)
  * wikitalk-like    — power-law with very long rows    (config 4)
  * uniform-medium   — regular medium rows              (config 2)
Real .mtx files can be swept instead via ``sweep_files``.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from ..sparse import (CSRMatrix, circuit_like, fem_like, powerlaw_like)

# name -> builder(rng) -> CSRMatrix; sized for one v5e chip with room for
# packed streams + baselines.  Graph matrices use degree-rank column
# labeling (col_alpha), matching how SNAP/LAW graph dumps are published;
# `uniform_medium` keeps fully uniform-random columns as the adversarial
# no-locality case.
SUITE: Dict[str, Callable] = {
    "cop20k_like": lambda rng: fem_like(120_000, 24, rng),
    "scircuit_like": lambda rng: circuit_like(170_000, rng),
    "webbase_like": lambda rng: powerlaw_like(400_000, 2.1, 50_000, rng,
                                              col_alpha=2.0),
    "wikitalk_like": lambda rng: powerlaw_like(250_000, 1.7, 100_000, rng,
                                               col_alpha=1.6),
    # 48 nnz/row uniform within a 16k-wide band: regular widths but only
    # partial column locality (stresses the multi-round window path).
    "uniform_medium": lambda rng: _banded_uniform(131_072, 48, 8192, rng),
    # soc-LiveJournal1-class (config 4's large long-heavy graph): ~2x
    # wikitalk's nnz with a wider column space.  Runs LAST in the default
    # sweep (bench.py orders arms cheapest-first and emits the summary
    # incrementally, so its pack+compile minutes can no longer lose data).
    "livejournal_like": lambda rng: powerlaw_like(
        600_000, 1.6, 300_000, rng, col_alpha=1.5),
    # REAL FEM matrix (deterministic P1 Poisson assembly on an
    # unstructured Delaunay mesh, bench/fem.py) — the real-structure
    # validation arm next to the synthetic archetypes.
    "poisson3d_fem": lambda rng: _fem(),
}
DEFAULT_NAMES = ["cop20k_like", "scircuit_like", "webbase_like",
                 "wikitalk_like", "uniform_medium", "poisson3d_fem",
                 "livejournal_like"]


def _fem():
    from .fem import poisson3d_fem
    return poisson3d_fem()


def _banded_uniform(n, k, half_band, rng):
    row_ptr = np.arange(0, (n + 1) * k, k, dtype=np.int64)
    rows = np.repeat(np.arange(n), k)
    offs = rng.integers(-half_band, half_band + 1, size=n * k)
    col_idx = np.clip(rows + offs, 0, n - 1).astype(np.int32)
    order = np.lexsort((col_idx, rows))
    return CSRMatrix(n, n, row_ptr, col_idx[order],
                     rng.standard_normal(n * k))


def build_suite(names: Optional[List[str]] = None, seed: int = 0
                ) -> List[Tuple[str, CSRMatrix]]:
    names = names or DEFAULT_NAMES
    out = []
    for n in names:
        rng = np.random.default_rng(seed + abs(hash(n)) % 1000)
        out.append((n, SUITE[n](rng)))
    return out


def geomean(vals: List[float]) -> float:
    vals = [v for v in vals if v > 0]
    if not vals:
        return 0.0
    return float(math.exp(sum(math.log(v) for v in vals) / len(vals)))
