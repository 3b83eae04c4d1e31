"""Evaluate first-touch relabel refinements by P-weighted plan cost.

V1 (shipped): hubs by degree desc, tail by first-touch of row-major
    element traversal.
V2: hubs by FIRST-TOUCH (co-accessed hubs cluster) instead of degree.
V6: tail first-touch follows the PACKED traversal order (rows length-
    sorted within each 128-block, as the SELL slices lay them out).
V7[T]: split the hub range at degree T — top hubs (deg >= T) stay
    degree-sorted (they coalesce into the leading broadcast windows);
    MID-TIER hubs (HD <= deg < T) switch to first-touch order so
    co-read mid hubs share windows (the round-2 finding: residual
    P-mass is mid-tier REGION spread, docs/DESIGN.md §7).
V8: mid-tier hubs ordered by (degree octave desc, first-touch within
    the octave) — degree-binned clustering, keeps rough popularity
    order while clustering co-accessed columns inside each bin.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from dasp_tpu.bench.suite import SUITE
from dasp_tpu.config import DaspConfig
from dasp_tpu.relabel import apply_col_perm, apply_sym_perm
from dasp_tpu.sparse import powerlaw_like
from dasp_tpu.wplan import build_wplan, LANES

HD = 4


def perm_v1(csr):
    from dasp_tpu.relabel import first_touch_perm
    return first_touch_perm(csr, HD)


def _assemble(csr, hubs, tail_seq):
    deg = np.bincount(csr.col_idx, minlength=csr.n_cols)
    is_hub = np.zeros(csr.n_cols, dtype=bool)
    is_hub[hubs] = True
    _, first_pos = np.unique(tail_seq, return_index=True)
    tail = tail_seq[np.sort(first_pos)]
    untouched = np.flatnonzero((deg == 0) & ~is_hub)
    newpos = np.empty(csr.n_cols, dtype=np.int64)
    newpos[np.concatenate([hubs, tail, untouched])] = \
        np.arange(csr.n_cols)
    return newpos


def perm_v2(csr):
    deg = np.bincount(csr.col_idx, minlength=csr.n_cols)
    is_hub = deg >= HD
    hub_seq = csr.col_idx[is_hub[csr.col_idx]]
    _, fp = np.unique(hub_seq, return_index=True)
    hubs = hub_seq[np.sort(fp)]
    tail_seq = csr.col_idx[~is_hub[csr.col_idx]]
    return _assemble(csr, hubs, tail_seq)


def perm_v6(csr):
    deg = np.bincount(csr.col_idx, minlength=csr.n_cols)
    hubs = np.flatnonzero(deg >= HD)
    hubs = hubs[np.argsort(-deg[hubs], kind="stable")]
    is_hub = np.zeros(csr.n_cols, dtype=bool)
    is_hub[hubs] = True
    # packed traversal: rows length-desc within each 128-row block
    lens = csr.row_lengths
    blk = np.arange(csr.n_rows) // LANES
    row_order = np.lexsort((-lens, blk))
    idx = np.concatenate([np.arange(csr.row_ptr[r], csr.row_ptr[r + 1])
                          for r in row_order]) if csr.n_rows else \
        np.zeros(0, np.int64)
    seq = csr.col_idx[idx]
    tail_seq = seq[~is_hub[seq]]
    return _assemble(csr, hubs, tail_seq)


def _first_touch_of(csr, cols_mask):
    """First-touch rank of every column (inf for untouched)."""
    first_pos = np.full(csr.n_cols, np.iinfo(np.int64).max, dtype=np.int64)
    first_pos[csr.col_idx[::-1]] = np.arange(csr.nnz - 1, -1, -1,
                                             dtype=np.int64)
    return first_pos


def perm_v7(csr, T):
    deg = np.bincount(csr.col_idx, minlength=csr.n_cols)
    top = np.flatnonzero(deg >= T)
    top = top[np.argsort(-deg[top], kind="stable")]
    fp = _first_touch_of(csr, None)
    mid = np.flatnonzero((deg >= HD) & (deg < T))
    mid = mid[np.argsort(fp[mid], kind="stable")]
    is_hub = np.zeros(csr.n_cols, dtype=bool)
    is_hub[top] = True
    is_hub[mid] = True
    tail = np.flatnonzero((deg > 0) & ~is_hub)
    tail = tail[np.argsort(fp[tail], kind="stable")]
    untouched = np.flatnonzero(deg == 0)
    newpos = np.empty(csr.n_cols, dtype=np.int64)
    newpos[np.concatenate([top, mid, tail, untouched])] = \
        np.arange(csr.n_cols)
    return newpos


def perm_v8(csr, T=4096):
    deg = np.bincount(csr.col_idx, minlength=csr.n_cols)
    top = np.flatnonzero(deg >= T)
    top = top[np.argsort(-deg[top], kind="stable")]
    fp = _first_touch_of(csr, None)
    mid = np.flatnonzero((deg >= HD) & (deg < T))
    octv = np.floor(np.log2(np.maximum(deg[mid], 1))).astype(np.int64)
    mid = mid[np.lexsort((fp[mid], -octv))]
    is_hub = np.zeros(csr.n_cols, dtype=bool)
    is_hub[top] = True
    is_hub[mid] = True
    tail = np.flatnonzero((deg > 0) & ~is_hub)
    tail = tail[np.argsort(fp[tail], kind="stable")]
    untouched = np.flatnonzero(deg == 0)
    newpos = np.empty(csr.n_cols, dtype=np.int64)
    newpos[np.concatenate([top, mid, tail, untouched])] = \
        np.arange(csr.n_cols)
    return newpos


cost = lambda p: sum(s.P * s.n_vregs for s in p.streams)
cases = {
    "wikitalk_like": (lambda rng: SUITE["wikitalk_like"](rng), False),
    "square_pl": (lambda rng: powerlaw_like(120_000, 1.7, 120_000, rng,
                                            col_alpha=1.6), True),
}
VARIANTS = (
    ("v1", perm_v1), ("v2", perm_v2), ("v6", perm_v6),
    ("v7_128", lambda c: perm_v7(c, 128)),
    ("v7_1024", lambda c: perm_v7(c, 1024)),
    ("v7_4096", lambda c: perm_v7(c, 4096)),
    ("v8", perm_v8),
)

if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default=None)
    ap.add_argument("--variants", default=None)
    a = ap.parse_args()
    run_cases = (a.cases.split(",") if a.cases else list(cases))
    run_vars = [(t, f) for t, f in VARIANTS
                if not a.variants or t in a.variants.split(",")]
    cfg_off = DaspConfig(relabel="off")
    for name in run_cases:
        gen, sym = cases[name]
        rng = np.random.default_rng(0 + abs(hash(name)) % 1000)
        csr = gen(rng)
        c0 = cost(build_wplan(csr, cfg_off))
        out = [f"{name}: off={c0}"]
        print(out[0], flush=True)
        for tag, fn in run_vars:
            t0 = time.time()
            perm = fn(csr)
            c2 = (apply_sym_perm(csr, perm) if sym
                  else apply_col_perm(csr, perm))
            c = cost(build_wplan(c2, cfg_off))
            out.append(f"{tag}={c}({c/c0:.3f},{time.time()-t0:.0f}s)")
            print("  " + out[-1], flush=True)
        print("  ".join(out), flush=True)
