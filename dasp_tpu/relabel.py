"""Column relabeling for window locality (runtime x-permutation).

No-locality matrices (power-law graphs) degrade because a vreg's 128
elements read x words scattered over many 1024-aligned windows, inflating
the per-vreg round count P (docs/DESIGN.md §3).  Relabeling columns cannot
change WHICH x words a vreg needs, but it changes WHERE they live: placing
hub columns (high degree) densely at the front and the low-degree tail in
first-touch order of the row-block traversal collapses most vregs' reads
into few windows.  Measured on wikitalk-like: 23% lower P-weighted vector
cost (tools/relabel_experiment.py).

The permutation is applied to x once per operator call on the host
(``prep_x``), outside the kernel hot loop — the same contract as the
reference's row permutation ``order_rid`` (dasp_f64.h:959-976), which
permutes Y and is undone outside the timed kernel (main_f64.cu:3-16).
y is untouched: only columns are relabeled, rows keep original order.
"""

from __future__ import annotations

import numpy as np

from .sparse import CSRMatrix


def first_touch_perm(csr: CSRMatrix, hub_min_deg: int = 8) -> np.ndarray:
    """Return ``newpos`` (old column id -> new column id).

    Columns with degree >= hub_min_deg go first, in descending-degree
    order (popular columns cluster into the leading windows, where the
    router's cell-sharing makes them broadcast for free).  Tail columns
    follow in first-touch order of the element traversal — consecutive
    row blocks touch consecutive tail labels, so a block's tail reads
    land in few windows.  Untouched (degree-0) columns go last.
    """
    deg = np.bincount(csr.col_idx, minlength=csr.n_cols)
    hubs = np.flatnonzero(deg >= hub_min_deg)
    hubs = hubs[np.argsort(-deg[hubs], kind="stable")]
    is_hub = np.zeros(csr.n_cols, dtype=bool)
    is_hub[hubs] = True
    tail_seq = csr.col_idx[~is_hub[csr.col_idx]]
    _, first_pos = np.unique(tail_seq, return_index=True)
    tail = tail_seq[np.sort(first_pos)]
    untouched = np.flatnonzero((deg == 0) & ~is_hub)
    newpos = np.empty(csr.n_cols, dtype=np.int64)
    order = np.concatenate([hubs, tail, untouched])
    newpos[order] = np.arange(csr.n_cols)
    return newpos


def apply_col_perm(csr: CSRMatrix, newpos: np.ndarray) -> CSRMatrix:
    """Relabel columns by ``newpos`` and re-sort columns within each row
    (the packer's usual CSR ordering contract)."""
    new_cid = newpos[csr.col_idx]
    rows = np.repeat(np.arange(csr.n_rows), csr.row_lengths)
    o = np.lexsort((new_cid, rows))
    return CSRMatrix(csr.n_rows, csr.n_cols, csr.row_ptr.copy(),
                     new_cid[o].astype(csr.col_idx.dtype),
                     csr.values[o].copy())


def permute_x(x: np.ndarray, newpos: np.ndarray, out: np.ndarray) -> None:
    """Scatter x into relabeled positions: ``out[newpos[c]] = x[c]``.
    ``out`` may be longer than x (padding stays untouched)."""
    out[newpos] = np.asarray(x)[: newpos.size]
