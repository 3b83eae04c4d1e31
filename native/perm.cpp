// Native CSR permutation kernels for the dasp_tpu packer.
//
// The reference does all its preprocessing in OpenMP C++ (dasp_f16.h:
// 1162-1446); the TPU packer's relabel step (A' = P A P^T for the
// symmetric column relabel, dasp_tpu/relabel.py) was the top pack-time
// hotspot.  Design notes from measurement on the 69 Mnnz
// soc-LiveJournal1 arm (1-vCPU build box):
//   * a two-pass LSD counting sort (stable by new column, then by
//     destination row) is MUCH worse (~5x) despite being O(nnz): its two
//     full random scatters over a 1.1 GB temp are 69M cache+TLB misses
//     each, where the per-row approach touches each row's ~14 elements
//     in 2-3 cache lines;
//   * std::stable_sort allocates its merge buffer PER CALL — ~5M mallocs
//     across the matrix dominated v1.  Sorting composite
//     (col << 32 | source_pos) keys makes every key unique, so plain
//     std::sort (in-place introsort, no allocation) reproduces the
//     stable order bit-for-bit — including for duplicate column entries.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

namespace {

// Rows sort on COMPOSITE keys (new_col << 32) | source_position: unique
// keys make plain std::sort order-deterministic and equal to a stable
// sort by column — required because matrices may carry DUPLICATE column
// entries within a row (the packer tolerates them; SpMV sums them) and
// the native result must be bit-identical to the numpy-lexsort fallback
// (plans must not depend on whether libdasp_host is loaded).
inline void sort_row_keys(int64_t* b, int64_t len) {
    // short rows (the common case: power-law tails, FEM stencils) go
    // through insertion sort — no function-call or partition overhead
    if (len <= 24) {
        for (int64_t i = 1; i < len; ++i) {
            int64_t x = b[i];
            int64_t j = i - 1;
            while (j >= 0 && b[j] > x) { b[j + 1] = b[j]; --j; }
            b[j + 1] = x;
        }
        return;
    }
    std::sort(b, b + len);
}

}  // namespace

// Symmetric permutation of a square CSR: rows and columns relabeled by
// the same map `newpos` (old id -> new id).  Outputs must be
// caller-allocated: out_ptr (n+1 int64), out_col (nnz int32),
// out_val (nnz double).  Column ids within each output row come out
// ascending (the packer's CSR ordering contract).
void dasp_sym_perm(int64_t n, const int64_t* row_ptr, const int32_t* col,
                   const double* val, const int64_t* newpos,
                   int64_t* out_ptr, int32_t* out_col, double* out_val) {
    // oldof = inverse permutation: destination row -> source row
    std::vector<int64_t> oldof(n);
    for (int64_t r = 0; r < n; ++r) oldof[newpos[r]] = r;
    out_ptr[0] = 0;
    for (int64_t nr = 0; nr < n; ++nr) {
        int64_t r = oldof[nr];
        out_ptr[nr + 1] = out_ptr[nr] + (row_ptr[r + 1] - row_ptr[r]);
    }
#ifdef _OPENMP
#pragma omp parallel
#endif
    {
        std::vector<int64_t> buf;
#ifdef _OPENMP
#pragma omp for schedule(dynamic, 512)
#endif
        for (int64_t nr = 0; nr < n; ++nr) {
            int64_t r = oldof[nr];
            int64_t b = row_ptr[r], len = row_ptr[r + 1] - b;
            int64_t o = out_ptr[nr];
            if ((int64_t)buf.size() < len) buf.resize(len);
            for (int64_t k = 0; k < len; ++k)
                buf[k] = (newpos[col[b + k]] << 32) | k;
            sort_row_keys(buf.data(), len);
            for (int64_t k = 0; k < len; ++k) {
                out_col[o + k] = (int32_t)(buf[k] >> 32);
                out_val[o + k] = val[b + (buf[k] & 0xffffffff)];
            }
        }
    }
}

// Column-only relabel: rows keep their order and extents; each row's
// elements get new column ids and are re-sorted ascending.
void dasp_col_perm(int64_t n, const int64_t* row_ptr, const int32_t* col,
                   const double* val, const int64_t* newpos,
                   int32_t* out_col, double* out_val) {
#ifdef _OPENMP
#pragma omp parallel
#endif
    {
        std::vector<int64_t> buf;
#ifdef _OPENMP
#pragma omp for schedule(dynamic, 512)
#endif
        for (int64_t r = 0; r < n; ++r) {
            int64_t b = row_ptr[r], len = row_ptr[r + 1] - b;
            if ((int64_t)buf.size() < len) buf.resize(len);
            for (int64_t k = 0; k < len; ++k)
                buf[k] = (newpos[col[b + k]] << 32) | k;
            sort_row_keys(buf.data(), len);
            for (int64_t k = 0; k < len; ++k) {
                out_col[b + k] = (int32_t)(buf[k] >> 32);
                out_val[b + k] = val[b + (buf[k] & 0xffffffff)];
            }
        }
    }
}

// First-touch column relabel (relabel.first_touch_perm semantics,
// nativized: the O(nnz) traversal + the tail ordering were ~20 s of
// numpy on the 69 Mnnz arm).  newpos[old col] = new col:
//   1. columns with degree >= hub_min_deg first, by DESCENDING degree
//      (ties: ascending old id — numpy's stable argsort of -deg);
//   2. touched tail columns in first-touch order of the element
//      traversal (first occurrence positions are distinct, so the
//      append order IS the sorted order — no sort at all);
//   3. untouched (degree-0) columns last, ascending.
void dasp_first_touch(int64_t n_cols, int64_t nnz, const int32_t* col,
                      int64_t hub_min_deg, int64_t* newpos) {
    std::vector<int64_t> deg(n_cols, 0);
    for (int64_t e = 0; e < nnz; ++e) ++deg[col[e]];
    std::vector<int32_t> hubs;
    for (int64_t c = 0; c < n_cols; ++c)
        if (deg[c] >= hub_min_deg) hubs.push_back((int32_t)c);
    std::stable_sort(hubs.begin(), hubs.end(),
                     [&](int32_t a, int32_t b) { return deg[a] > deg[b]; });
    int64_t pos = 0;
    for (int32_t h : hubs) newpos[h] = pos++;
    // Tail columns in first-touch order: one traversal pass, appending a
    // column the first time it is seen.  Hub columns are marked seen up
    // front so only tails append.
    std::vector<uint8_t> seen(n_cols, 0);
    for (int32_t h : hubs) seen[h] = 1;
    for (int64_t e = 0; e < nnz; ++e) {
        int32_t c = col[e];
        if (!seen[c]) {
            seen[c] = 1;
            newpos[c] = pos++;
        }
    }
    for (int64_t c = 0; c < n_cols; ++c)
        if (deg[c] == 0 && !seen[c]) newpos[c] = pos++;
}

}  // extern "C"
