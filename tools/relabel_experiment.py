"""Measure the effect of column relabeling on wplan round-class (P) mass.

Hypothesis (docs/DESIGN.md §6): no-locality matrices degrade because tail
columns scatter each vreg's reads over many 1024-wide x windows.  Hubs are
already clustered (degree-rank labels); relabeling the low-degree TAIL by
first-touch order in block traversal should collapse P for most vregs.

Host-only: builds plans, prints per-P-class vreg mass and padding stats.
"""
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
from dasp_tpu.sparse import powerlaw_like
from dasp_tpu.wplan import build_wplan, LANES, SUB, VREG
from dasp_tpu.bench.suite import SUITE


def plan_report(tag, csr):
    t0 = time.time()
    plan = build_wplan(csr)
    dt = time.time() - t0
    tot_v = sum(s.n_vregs for s in plan.streams)
    print(f"[{tag}] nnz={csr.nnz} pack={dt:.1f}s vregs={tot_v} "
          f"fill_rate={plan.stats['rate_fill0']:.2f} "
          f"ovf={plan.stats['overflow_frac']:.4f}")
    for s in plan.streams:
        # vector cost model: rounds dominate -> weight vregs by P
        print(f"   P={s.P:3d}: vregs={s.n_vregs:7d} "
              f"({100*s.n_vregs/tot_v:.1f}%) cost~{s.P*s.n_vregs}")
    cost = sum(s.P * s.n_vregs for s in plan.streams)
    print(f"   total vector cost ~ {cost} (P-weighted vregs)")
    return plan, cost


def first_touch_relabel(csr, hub_min_deg=32):
    """Columns with degree >= hub_min_deg keep degree-desc order at the
    front; tail columns are relabeled in first-touch order of a block-major
    element traversal (so a block's tail reads cluster into few windows)."""
    deg = np.bincount(csr.col_idx, minlength=csr.n_cols)
    hubs = np.flatnonzero(deg >= hub_min_deg)
    hubs = hubs[np.argsort(-deg[hubs], kind="stable")]
    is_hub = np.zeros(csr.n_cols, dtype=bool)
    is_hub[hubs] = True
    # first-touch order of tail columns
    tail_seq = csr.col_idx[~is_hub[csr.col_idx]]
    _, first_pos = np.unique(tail_seq, return_index=True)
    tail = tail_seq[np.sort(first_pos)]
    untouched = np.flatnonzero((deg == 0) & ~is_hub)
    newpos = np.empty(csr.n_cols, dtype=np.int64)
    order = np.concatenate([hubs, tail, untouched])
    newpos[order] = np.arange(csr.n_cols)
    out = type(csr)(csr.n_rows, csr.n_cols, csr.row_ptr,
                    newpos[csr.col_idx].astype(np.int32), csr.values)
    # re-sort columns within rows (packer expects typical CSR; not required
    # but keeps parity with the original ordering contract)
    rows = np.repeat(np.arange(csr.n_rows), csr.row_lengths)
    o = np.lexsort((out.col_idx, rows))
    out.col_idx = out.col_idx[o]
    out.values = out.values[o]
    return out, newpos


if __name__ == "__main__":
    rng = np.random.default_rng(0 + abs(hash("wikitalk_like")) % 1000)
    csr = SUITE["wikitalk_like"](rng)
    _, cost0 = plan_report("original", csr)
    for hmd in (32, 8):
        csr2, _ = first_touch_relabel(csr, hub_min_deg=hmd)
        _, cost1 = plan_report(f"relabeled(hub>={hmd})", csr2)
        print(f"  => vector-cost ratio {cost1/cost0:.3f}")
