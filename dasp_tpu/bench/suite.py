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

from ..sparse import CSRMatrix, fem_like, powerlaw_like, random_csr

# name -> builder(rng) -> CSRMatrix; sized for one v5e chip with room for
# packed streams + baselines.
SUITE: Dict[str, Callable] = {
    "cop20k_like": lambda rng: fem_like(120_000, 24, rng),
    "scircuit_like": lambda rng: random_csr(
        170_000, 170_000,
        rng.choice([1, 2, 3, 4, 5, 6, 8, 16],
                   p=[.2, .2, .15, .15, .1, .1, .05, .05],
                   size=170_000), rng),
    "webbase_like": lambda rng: powerlaw_like(400_000, 2.1, 50_000, rng),
    "wikitalk_like": lambda rng: powerlaw_like(250_000, 1.7, 100_000, rng),
    "uniform_medium": lambda rng: random_csr(
        131_072, 131_072, np.full(131_072, 48), rng),
}


def build_suite(names: Optional[List[str]] = None, seed: int = 0
                ) -> List[Tuple[str, CSRMatrix]]:
    names = names or list(SUITE)
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
