"""Host-side fill/locality model for row-ordering policies on livejournal.

The SELL ("reg") streams of livejournal_like run at ~19% fill
(fill0_nnz_reg 34.5M slots for 6.7M elements, data/spmv_f32_record.csv):
the symmetric first-touch relabel fixes column locality but leaves row
lengths heterogeneous within each 128-row block, and build_wplan skips
the independent row length-grouping whenever a symmetric relabel is
active (wplan.py:695-698).  Before touching the packer, model what each
candidate row ordering would buy:

  - quantized SELL slot count (the choose_row_sort cost model), and
  - the (block, 1024-window) distinct-pair count (the P-cost proxy that
    relabel decisions already use).

Policies: current (relabeled) order; global length sort; local length
sort within windows of 2^k rows (preserves macro locality).
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from dasp_tpu.bench.suite import build_suite  # noqa: E402
from dasp_tpu.relabel import choose_relabel  # noqa: E402


def quantized_slots(lens_sorted_desc_per_block):
    """choose_row_sort's cost(): per-block max length quantized up to a
    power of two, summed (slots per lane)."""
    v = lens_sorted_desc_per_block
    nb = (v.size // 128) * 128
    if nb == 0:
        return 1.0
    mx = v[:nb].reshape(-1, 128).max(axis=1)
    q = np.exp2(np.ceil(np.log2(np.maximum(mx, 1))))
    return float(q.sum())


def spread(rows, cols, W):
    key = (rows.astype(np.int64) >> 7) * W + (cols.astype(np.int64) >> 10)
    return np.unique(key).size


def main():
    t0 = time.time()
    name = sys.argv[1] if len(sys.argv) > 1 else "livejournal_like"
    [(_nm, csr)] = build_suite([name])
    print(f"built {name}: {csr.n_rows}x{csr.n_cols} nnz={csr.nnz} "
          f"({time.time()-t0:.0f}s)", flush=True)

    # symmetric first-touch relabel (what the auto path applies)
    perm = choose_relabel(csr, symmetric=True)
    if perm is not None:
        from dasp_tpu.relabel import apply_sym_perm
        csr = apply_sym_perm(csr, perm)
        print(f"sym relabel applied ({time.time()-t0:.0f}s)", flush=True)

    lens = np.minimum(csr.row_lengths.astype(np.int64), 255)
    n = csr.n_rows
    W = (csr.n_cols >> 10) + 1

    # sample elements for the spread proxy
    rng = np.random.default_rng(0)
    m = min(csr.nnz, 4_000_000)
    sel = rng.choice(csr.nnz, size=m, replace=False)
    sel.sort()
    rows_all = np.repeat(np.arange(n), csr.row_lengths)
    rows_s = rows_all[sel]
    cols_s = csr.col_idx[sel].astype(np.int64)
    del rows_all

    def report(tag, newpos):
        """newpos: old->new row position (None = identity)."""
        if newpos is None:
            lp, rp = lens, rows_s
        else:
            lp = np.empty_like(lens)
            lp[newpos] = lens
            rp = newpos[rows_s]
        q = quantized_slots(lp)
        sp = spread(rp, cols_s, W)
        print(f"{tag:28s} slots/lane {q/1e6:8.3f}M  "
              f"(block,win) pairs {sp}", flush=True)

    report("relabeled (current)", None)

    order = np.argsort(-lens, kind="stable")
    newpos = np.empty(n, dtype=np.int64)
    newpos[order] = np.arange(n)
    report("global length sort", newpos)

    for k in (10, 12, 14, 16):
        w = 1 << k
        key = (np.arange(n) >> k).astype(np.int64) * 512 - lens
        order = np.argsort(key, kind="stable")
        newpos = np.empty(n, dtype=np.int64)
        newpos[order] = np.arange(n)
        report(f"local sort, window 2^{k}", newpos)


if __name__ == "__main__":
    main()
