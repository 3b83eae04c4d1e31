"""Probe: first-touch relabel with LONG rows scanned first (round 2).

wikitalk's P-mass lives in its long rows: after the shipped first-touch
relabel, a 100k-nnz hub row's tail columns carry labels assigned by
whichever EARLIER row touched them first, so the hub row's column-sorted
vregs span ~40 windows each -> dynamic-round streams -> resident-
ineligible.  Scanning the long rows first (longest first) hands each
long row a CONSECUTIVE run of tail labels; its 1024-element vregs then
span 1-2 windows (static P classes).

This probe packs the graph arms under both scan orders and reports the
dyn-class vreg counts, P-weighted stream cost, and resident eligibility.

    python tools/longfirst_probe.py [arm ...]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def long_first_perm(csr, hub_min_deg: int, block_longest: int):
    """first_touch_perm variant: hubs by degree, then tail columns in
    first-touch order of a traversal that scans LONG rows first
    (longest first), then the remaining rows in row order."""
    deg = np.bincount(csr.col_idx, minlength=csr.n_cols)
    hubs = np.flatnonzero(deg >= hub_min_deg)
    hubs = hubs[np.argsort(-deg[hubs], kind="stable")]
    is_hub = np.zeros(csr.n_cols, dtype=bool)
    is_hub[hubs] = True
    lens = csr.row_lengths
    long_rows = np.flatnonzero(lens >= block_longest)
    long_rows = long_rows[np.argsort(-lens[long_rows], kind="stable")]
    rest = np.flatnonzero(lens < block_longest)
    order_rows = np.concatenate([long_rows, rest])
    # element traversal in that row order
    rpt = csr.row_ptr
    parts = [csr.col_idx[rpt[r]:rpt[r + 1]] for r in long_rows]
    tail_first = (np.concatenate(parts) if parts
                  else np.zeros(0, csr.col_idx.dtype))
    # rest rows in bulk (they are contiguous in element order except the
    # long rows interleaved; just take the whole stream after)
    seq = np.concatenate([tail_first, csr.col_idx])
    tail_seq = seq[~is_hub[seq]]
    _, first_pos = np.unique(tail_seq, return_index=True)
    tail = tail_seq[np.sort(first_pos)]
    untouched = np.flatnonzero((deg == 0) & ~is_hub)
    newpos = np.empty(csr.n_cols, dtype=np.int64)
    order = np.concatenate([hubs, tail, untouched])
    newpos[order] = np.arange(csr.n_cols)
    return newpos


def report(tag, csr, perm):
    from dasp_tpu.relabel import apply_sym_perm
    from dasp_tpu.wplan import build_wplan
    from dasp_tpu.config import DEFAULT_CONFIG
    from dasp_tpu.ops import pallas_backend as pb
    from dasp_tpu.ops import resident as R
    import dataclasses
    m = apply_sym_perm(csr, perm) if perm is not None else csr
    cfg = dataclasses.replace(DEFAULT_CONFIG, relabel="off", row_sort="off")
    t0 = time.perf_counter()
    plan = build_wplan(m, cfg)
    dt = time.perf_counter() - t0
    dyn_v = sum(s.n_vregs for s in plan.streams if s.P > 32)
    pcost = sum(s.P * s.n_vregs for s in plan.streams)
    tot_v = sum(s.n_vregs for s in plan.streams)
    meta, arrays = pb.plan_to_arrays(plan, "f32")
    R.prepare(meta, arrays)
    res = arrays.get("resident") is not None
    print(f"{tag}: pack {dt:5.1f}s vregs {tot_v} dyn {dyn_v} "
          f"Pcost {pcost} fill {plan.stats['rate_fill0']:.3f} "
          f"resident={int(res)} bytes={R.resident_bytes(meta, arrays)/1e6:.0f}MB",
          flush=True)


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from dasp_tpu.bench.suite import build_suite
    from dasp_tpu.relabel import first_touch_perm
    from dasp_tpu.config import DEFAULT_CONFIG as C

    arms = sys.argv[1:] or ["wikitalk_like", "webbase_like"]
    for name in arms:
        (nm, csr), = build_suite([name])
        report(f"{nm} shipped-first-touch",
               csr, first_touch_perm(csr, C.relabel_hub_deg))
        report(f"{nm} long-rows-first   ",
               csr, long_first_perm(csr, C.relabel_hub_deg,
                                    C.block_longest))


if __name__ == "__main__":
    main()
