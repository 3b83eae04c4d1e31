"""Property tests for the analyzer and pack plans: category splits are exact,
the permutation is a bijection over real rows, and unpacking every packed
structure reproduces the CSR nonzeros (pack -> unpack == identity)."""

import numpy as np
import pytest

from dasp_tpu.analyze import categorize
from dasp_tpu.config import DaspConfig
from dasp_tpu.plan import build_plan
from dasp_tpu.sparse import CSRMatrix, mixed_categories, powerlaw_like, random_csr


def _unpack_to_dense(plan, n_rows, n_cols):
    """Reconstruct the dense matrix from the packed plan structures."""
    dense = np.zeros((n_rows, n_cols))
    order = plan.order_rid

    # Long stream: chunks belong to bucket-ordered rows.
    if plan.long is not None:
        # chunk c contributes to the row owning it; recover ownership from
        # the gather tree.
        partial_owner = np.full(plan.long.vals.shape[0] + 1, -1)
        row_pos = 0
        for idx in plan.long.buckets:
            for j in range(idx.shape[0]):
                owner = order[row_pos]
                row_pos += 1
                for c in idx[j]:
                    if c < plan.long.vals.shape[0]:
                        partial_owner[c] = owner
        for c in range(plan.long.vals.shape[0]):
            r = partial_owner[c]
            assert r >= 0, "orphan chunk"
            np.add.at(dense[r], plan.long.cols[c], plan.long.vals[c])

    pos = plan.long.n_rows if plan.long else 0

    for g in plan.sell:
        S, W, C = g.vals.shape
        for s in range(S):
            for lane in range(C):
                r = order[pos + s * C + lane]
                if r >= 0:
                    np.add.at(dense[r], g.cols[s, :, lane], g.vals[s, :, lane])
        pos += S * C

    if plan.pair13 is not None:
        T = plan.pair13.vals.shape[0]
        cap = plan.pair13.pairs_capacity
        for j in range(cap):
            t, grp, lane = j // 256, (j % 256) // 128, j % 128
            r1 = order[pos + j]
            r3 = order[pos + cap + j]
            if r1 >= 0:
                np.add.at(dense[r1], [plan.pair13.cols[t, grp * 4, lane]],
                          [plan.pair13.vals[t, grp * 4, lane]])
            if r3 >= 0:
                for e in (1, 2, 3):
                    np.add.at(dense[r3],
                              [plan.pair13.cols[t, grp * 4 + e, lane]],
                              [plan.pair13.vals[t, grp * 4 + e, lane]])
        pos += 2 * cap

    for s in plan.shorts:
        spt = (8 // s.stride) * 128
        cap = s.rows_capacity
        for j in range(cap):
            r = order[pos + j]
            if r < 0:
                continue
            t, grp, lane = j // spt, (j % spt) // 128, j % 128
            for e in range(s.stride):
                np.add.at(dense[r], [s.cols[t, grp * s.stride + e, lane]],
                          [s.vals[t, grp * s.stride + e, lane]])
        pos += cap

    # Remainder tails scatter-add at out_pos -> original rows via order_rid.
    for g in plan.remainder:
        S, W, C = g.vals.shape
        for s in range(S):
            for lane in range(C):
                p = g.out_pos[s, lane]
                r = order[p]
                if r >= 0:
                    np.add.at(dense[r], g.cols[s, :, lane], g.vals[s, :, lane])
    return dense


def test_categorize_counts(rng):
    csr = mixed_categories(500, rng)
    cats = categorize(csr)
    lens = csr.row_lengths
    assert cats.zero.size == np.sum(lens == 0)
    assert cats.short1.size == np.sum(lens == 1)
    assert cats.short4.size == np.sum(lens == 4)
    assert cats.long.size == np.sum(lens >= 256)
    assert (cats.zero.size + cats.short1.size + cats.short2.size
            + cats.short3.size + cats.short4.size + cats.medium.size
            + cats.long.size) == csr.n_rows
    c = cats.census
    assert c["nnz_short"] + c["nnz_block"] + c["nnz_long"] == csr.nnz


def test_perm_is_bijection(rng):
    csr = mixed_categories(400, rng)
    plan = build_plan(csr)
    real = plan.order_rid[plan.order_rid >= 0]
    lens = csr.row_lengths
    nonzero_rows = np.flatnonzero(lens > 0)
    assert sorted(real.tolist()) == nonzero_rows.tolist()
    # inv_perm round-trips.
    for r in nonzero_rows[:50]:
        assert plan.order_rid[plan.inv_perm[r]] == r
    # zero rows point at the dummy slot.
    for r in np.flatnonzero(lens == 0)[:10]:
        assert plan.inv_perm[r] == plan.n_perm - 1


@pytest.mark.parametrize("maker", ["mixed", "powerlaw", "uniform", "tiny"])
def test_pack_unpack_identity(rng, maker):
    if maker == "mixed":
        csr = mixed_categories(350, rng)
    elif maker == "powerlaw":
        csr = powerlaw_like(300, 2.0, 2000, rng)
    elif maker == "uniform":
        csr = random_csr(200, 150, np.full(200, 7), rng)
    else:
        csr = random_csr(5, 6, np.array([1, 0, 3, 4, 2]), rng)
    plan = build_plan(csr)
    dense = _unpack_to_dense(plan, csr.n_rows, csr.n_cols)
    np.testing.assert_allclose(dense, csr.to_dense(), rtol=0, atol=1e-12)


def test_pair13_used_when_enough(rng):
    lens = np.concatenate([np.full(200, 1), np.full(200, 3)])
    csr = random_csr(400, 400, lens, rng)
    plan = build_plan(csr)
    assert plan.pair13 is not None
    assert plan.pair13.n_pairs == 200
    plan2 = build_plan(csr, DaspConfig(pair_13=False))
    assert plan2.pair13 is None
    d1 = _unpack_to_dense(plan, 400, 400)
    d2 = _unpack_to_dense(plan2, 400, 400)
    np.testing.assert_allclose(d1, d2)


def test_medium_spill(rng):
    # Wildly varying medium lengths force width choice + spill.
    lens = rng.integers(5, 250, size=600)
    csr = random_csr(600, 600, lens, rng)
    plan = build_plan(csr)
    assert plan.sell, "medium rows must produce SELL groups"
    dense = _unpack_to_dense(plan, 600, 600)
    np.testing.assert_allclose(dense, csr.to_dense(), atol=1e-12)


def test_plan_save_load(tmp_path, rng):
    csr = mixed_categories(300, rng)
    plan = build_plan(csr)
    p = tmp_path / "plan.npz"
    plan.save(p)
    from dasp_tpu.plan import DaspPlan
    plan2 = DaspPlan.load(p)
    d1 = _unpack_to_dense(plan, csr.n_rows, csr.n_cols)
    d2 = _unpack_to_dense(plan2, csr.n_rows, csr.n_cols)
    np.testing.assert_allclose(d1, d2)
    assert plan2.census == plan.census
