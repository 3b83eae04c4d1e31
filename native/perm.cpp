// Native CSR permutation kernels for the dasp_tpu packer.
//
// The reference does all its preprocessing in OpenMP C++ (dasp_f16.h:
// 1162-1446); the TPU packer's relabel step (A' = P A P^T for the
// symmetric column relabel, dasp_tpu/relabel.py) was the last numpy
// hotspot — an 18.5 Mnnz argsort + three gathers cost ~12 s single-core.
// Here it is a bucket-by-destination-row copy plus per-row sorts,
// OpenMP-parallel over destination rows: O(nnz log row_len) with small
// constants and sequential writes.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

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
        std::vector<std::pair<int32_t, double>> buf;
#ifdef _OPENMP
#pragma omp for schedule(dynamic, 512)
#endif
        for (int64_t nr = 0; nr < n; ++nr) {
            int64_t r = oldof[nr];
            int64_t b = row_ptr[r], len = row_ptr[r + 1] - b;
            int64_t o = out_ptr[nr];
            buf.resize(len);
            for (int64_t k = 0; k < len; ++k)
                buf[k] = {(int32_t)newpos[col[b + k]], val[b + k]};
            std::stable_sort(buf.begin(), buf.end(),
                      [](const auto& a, const auto& c) {
                          return a.first < c.first;
                      });
            for (int64_t k = 0; k < len; ++k) {
                out_col[o + k] = buf[k].first;
                out_val[o + k] = buf[k].second;
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
        std::vector<std::pair<int32_t, double>> buf;
#ifdef _OPENMP
#pragma omp for schedule(dynamic, 512)
#endif
        for (int64_t r = 0; r < n; ++r) {
            int64_t b = row_ptr[r], len = row_ptr[r + 1] - b;
            buf.resize(len);
            for (int64_t k = 0; k < len; ++k)
                buf[k] = {(int32_t)newpos[col[b + k]], val[b + k]};
            std::stable_sort(buf.begin(), buf.end(),
                      [](const auto& a, const auto& c) {
                          return a.first < c.first;
                      });
            for (int64_t k = 0; k < len; ++k) {
                out_col[b + k] = buf[k].first;
                out_val[b + k] = buf[k].second;
            }
        }
    }
}

}  // extern "C"
