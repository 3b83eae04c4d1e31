"""Unit tests for the CSR container and golden SpMV."""

import numpy as np

from dasp_tpu.sparse import CSRMatrix, from_coo, mixed_categories, random_csr


def test_from_coo_roundtrip():
    rows = np.array([2, 0, 1, 0, 2])
    cols = np.array([1, 0, 2, 1, 0])
    vals = np.array([5.0, 1.0, 3.0, 2.0, 4.0])
    csr = from_coo(3, 3, rows, cols, vals)
    csr.check()
    dense = csr.to_dense()
    expect = np.zeros((3, 3))
    expect[2, 1], expect[0, 0], expect[1, 2] = 5, 1, 3
    expect[0, 1], expect[2, 0] = 2, 4
    np.testing.assert_array_equal(dense, expect)


def test_from_coo_sum_duplicates():
    rows = np.array([0, 0, 1])
    cols = np.array([1, 1, 0])
    vals = np.array([2.0, 3.0, 7.0])
    csr = from_coo(2, 2, rows, cols, vals, sum_duplicates=True)
    assert csr.nnz == 2
    np.testing.assert_array_equal(csr.to_dense(),
                                  [[0.0, 5.0], [7.0, 0.0]])


def test_golden_spmv_matches_dense(rng):
    csr = mixed_categories(300, rng)
    x = rng.standard_normal(csr.n_cols)
    np.testing.assert_allclose(csr.spmv(x), csr.to_dense() @ x,
                               rtol=1e-12, atol=1e-12)


def test_golden_handles_empty_rows(rng):
    csr = random_csr(10, 10, np.array([0, 3, 0, 1, 0, 0, 2, 0, 0, 0]), rng)
    y = csr.spmv(np.ones(10))
    assert y[0] == 0 and y[2] == 0 and y[-1] == 0
