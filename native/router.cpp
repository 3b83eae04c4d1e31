// Native vreg router for dasp_tpu's windowed packer (wplan.py).
//
// Mirrors wplan._route_vreg: place elements (lane, preferred sublane,
// column) into an (8,128) vreg tile subject to
//   * slot (i, lane) holds at most one element,
//   * routing cell (i, lam) shared only by elements reading the same
//     x word (same x2d row and lam),
//   * per-vreg window budget p_cap (keep the most-popular 1024-aligned
//     windows, overflow the rest).
// The per-element greedy with 8 sublane attempts is the packer's hot loop
// (the reference leans on OpenMP for its host packing too,
// dasp_f16.h:1162); this routes batches of vregs in parallel.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr int kSub = 8;
constexpr int kLanes = 128;
constexpr int kVreg = 1024;

struct Scratch {
  int64_t cell_owner[kSub][kLanes];
  bool lane_used[kSub][kLanes];
  // window histogram workspace
  std::vector<int64_t> wins;
  std::vector<int64_t> counts;
};

// stride: sublane attempts stay within the element's stride-group
// [ipref/stride*stride, ...+stride) so a strided slice's levels (8/stride
// rows sharing one lane column) never mix rows across the level boundary
// that the kernel's per-level sublane sum separates.  stride=8 is the
// classic full-vreg behavior.
void RouteOne(const int32_t* lane, const int32_t* ipref, const int64_t* col,
              const double* val, int64_t n, int32_t p_cap, int32_t stride,
              double* vals_tile, int32_t* idx_tile, int32_t* win_out,
              int32_t* win_count, uint8_t* overflow, Scratch* s) {
  memset(vals_tile, 0, sizeof(double) * kVreg);
  memset(idx_tile, 0, sizeof(int32_t) * kVreg);
  memset(s->cell_owner, -1, sizeof(s->cell_owner));
  memset(s->lane_used, 0, sizeof(s->lane_used));
  memset(overflow, 0, n);

  // Window histogram (windows are x2d row offsets, multiples of 8).
  // Columns usually arrive sorted (relabeled/CSR-ordered streams): the
  // histogram is then a run-length pass and the placement loop can track
  // its round with a cursor instead of a per-element binary search.
  bool sorted = true;
  for (int64_t e = 1; e < n; ++e) {
    if (col[e] < col[e - 1]) { sorted = false; break; }
  }
  s->wins.clear();
  s->counts.clear();
  if (sorted) {
    for (int64_t e = 0; e < n; ++e) {
      const int64_t w = (col[e] / kVreg) * kSub;
      if (!s->wins.empty() && s->wins.back() == w) {
        ++s->counts.back();
      } else {
        s->wins.push_back(w);
        s->counts.push_back(1);
      }
    }
  } else {
    for (int64_t e = 0; e < n; ++e) {
      const int64_t w = (col[e] / kVreg) * kSub;
      auto it = std::lower_bound(s->wins.begin(), s->wins.end(), w);
      const size_t pos = it - s->wins.begin();
      if (it != s->wins.end() && *it == w) {
        ++s->counts[pos];
      } else {
        s->wins.insert(it, w);
        s->counts.insert(s->counts.begin() + pos, 1);
      }
    }
  }
  // Keep the p_cap most popular windows.
  std::vector<int64_t> kept(s->wins);
  if (static_cast<int32_t>(s->wins.size()) > p_cap) {
    std::vector<size_t> order(s->wins.size());
    for (size_t i = 0; i < order.size(); ++i) order[i] = i;
    std::stable_sort(order.begin(), order.end(),
                     [&](size_t a, size_t b) {
                       return s->counts[a] > s->counts[b];
                     });
    kept.clear();
    for (int32_t i = 0; i < p_cap; ++i) kept.push_back(s->wins[order[i]]);
    std::sort(kept.begin(), kept.end());
  }
  *win_count = static_cast<int32_t>(kept.size());
  for (size_t i = 0; i < kept.size(); ++i) {
    win_out[i] = static_cast<int32_t>(kept[i]);
  }

  const bool all_kept = kept.size() == s->wins.size();
  size_t cur = 0;            // sorted-input round cursor
  int64_t cur_w = kept.empty() ? -1 : kept[0];
  for (int64_t e = 0; e < n; ++e) {
    const int64_t w = (col[e] / kVreg) * kSub;
    int32_t rnd;
    if (sorted && all_kept) {
      while (cur_w != w) { ++cur; cur_w = kept[cur]; }
      rnd = static_cast<int32_t>(cur);
    } else {
      auto it = std::lower_bound(kept.begin(), kept.end(), w);
      if (it == kept.end() || *it != w) {
        overflow[e] = 1;
        continue;
      }
      rnd = static_cast<int32_t>(it - kept.begin());
    }
    const int32_t lam = static_cast<int32_t>(col[e] % kLanes);
    const int32_t q_rel = static_cast<int32_t>((col[e] / kLanes) % kSub);
    const int64_t src_row = col[e] / kLanes;
    const int32_t ln = lane[e];
    bool placed = false;
    const int base = (ipref[e] / stride) * stride;
    for (int t = 0; t < stride; ++t) {
      const int i = base + (ipref[e] - base + t) % stride;
      if (s->lane_used[i][ln]) continue;
      const int64_t owner = s->cell_owner[i][lam];
      if (owner != -1 && owner != src_row) continue;
      s->lane_used[i][ln] = true;
      s->cell_owner[i][lam] = src_row;
      vals_tile[i * kLanes + ln] = val[e];
      // slot bits: rnd<<10 | lam ; routing bits r at (i, lam): q_rel<<7
      idx_tile[i * kLanes + ln] |= (rnd << 10) | lam;
      idx_tile[i * kLanes + lam] =
          (idx_tile[i * kLanes + lam] & ~(7 << 7)) | (q_rel << 7);
      placed = true;
      break;
    }
    if (!placed) overflow[e] = 1;
  }
}

}  // namespace

extern "C" {

// Route a batch of vregs.  offsets has n_vregs+1 entries delimiting each
// vreg's elements in (lane, ipref, col, val).  strides (may be NULL = all
// 8) gives each vreg's sublane stride.  Outputs are per-vreg tiles and
// window lists (win stride = p_cap).
void dasp_route_vregs(int64_t n_vregs, const int64_t* offsets,
                      const int32_t* lane, const int32_t* ipref,
                      const int64_t* col, const double* val, int32_t p_cap,
                      const int32_t* strides,
                      double* vals_tiles, int32_t* idx_tiles,
                      int32_t* wins, int32_t* win_counts,
                      uint8_t* overflow) {
#ifdef _OPENMP
#pragma omp parallel
#endif
  {
    Scratch s;
#ifdef _OPENMP
#pragma omp for schedule(dynamic, 8)
#endif
    for (int64_t v = 0; v < n_vregs; ++v) {
      const int64_t lo = offsets[v], hi = offsets[v + 1];
      RouteOne(lane + lo, ipref + lo, col + lo, val + lo, hi - lo, p_cap,
               strides ? strides[v] : kSub,
               vals_tiles + v * kVreg, idx_tiles + v * kVreg,
               wins + v * p_cap, win_counts + v, overflow + lo, &s);
    }
  }
}

}  // extern "C"
