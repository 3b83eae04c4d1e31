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
      // slot bits (at (i, ln)): lam only.  CELL bits (at (i, lam)):
      // q_rel<<7 | rnd<<10 — a routing cell maps to a unique x word
      // (windows are 1024-aligned), hence a unique round, so the round
      // tag lives with the cell: the kernel combines the raw windows
      // with one compare+select per round and gathers (sublane, lane)
      // ONCE per vreg instead of twice per round (measured 1.82 ->
      // 0.89 ns/vreg/round on v5e, tools/roundcost_ab.py).
      idx_tile[i * kLanes + ln] |= lam;
      idx_tile[i * kLanes + lam] =
          (idx_tile[i * kLanes + lam] & 127) | (q_rel << 7) | (rnd << 10);
      placed = true;
      break;
    }
    if (!placed) overflow[e] = 1;
  }
}

// ---------------------------------------------------------------------
// Long-row packer: native equivalent of wplan.py's long_elems/long_route
// phases (the pack-time hot path on long-heavy graphs — wikitalk-class
// matrices spend ~80% of pack time there in the numpy orchestration).
// Mirrors the reference's all-OpenMP host packing (dasp_f16.h:1162-1446)
// in spirit: per-row work parallelized on the host.
//
// Per row (columns sorted ascending):
//   1. chunking decision: sequential 1024-chunks when every chunk spans
//      <= win_cap distinct 1024-windows, or when window-group bin-packing
//      would need > dyn_pad_max x the base vreg count;
//   2. otherwise first-fit-decreasing bin-packing of window groups
//      (runs of equal col/1024, pre-chunked to <= 1024 elements) into
//      vregs capped at 1024 slots and win_cap windows;
//   3. route each vreg (RouteOne, stride 8, window budget p_cap);
//   4. rejects re-sort by column and re-chunk into fresh vregs of the
//      same row, twice; third-pass rejects are reported as dregs (the
//      caller's COO fallback).
}  // namespace

struct RowPack {
  std::vector<double> vals;        // n_vregs * 1024
  std::vector<int32_t> idx;        // n_vregs * 1024
  std::vector<int32_t> wins;       // ragged, win_counts[v] entries per vreg
  std::vector<int32_t> win_counts; // n_vregs
  std::vector<int64_t> dregs;      // global element indices (3rd-pass rejects)
};

struct LongPack {
  std::vector<RowPack> rows;
  int64_t n_vregs = 0, n_wins = 0, n_dregs = 0;
};

namespace {

// Route one vreg worth of gathered elements and append results to out.
// Returns the (local) indices of rejected elements.
// position->lane / position->preferred-sublane tables for a full vreg
// (identical for every vreg; shorter vregs use a prefix)
struct PosTables {
  int32_t lane[kVreg];
  int32_t ipref[kVreg];
  PosTables() {
    for (int t = 0; t < kVreg; ++t) {
      lane[t] = t % kLanes;
      ipref[t] = (t / kLanes) % kSub;
    }
  }
};
const PosTables kPos;

void RouteAppend(const int64_t* col, const double* val, const int64_t* gidx,
                 int64_t n, int32_t p_cap, RowPack* out,
                 std::vector<int64_t>* rej_gidx,
                 std::vector<int64_t>* rej_col,
                 std::vector<double>* rej_val, Scratch* s,
                 std::vector<uint8_t>* ovf_buf,
                 std::vector<int32_t>* win_buf) {
  ovf_buf->resize(n);
  win_buf->resize(p_cap);
  const size_t base = out->vals.size();
  out->vals.resize(base + kVreg);
  out->idx.resize(base + kVreg);
  int32_t wc = 0;
  RouteOne(kPos.lane, kPos.ipref, col, val, n, p_cap,
           kSub, out->vals.data() + base, out->idx.data() + base,
           win_buf->data(), &wc, ovf_buf->data(), s);
  out->win_counts.push_back(wc);
  out->wins.insert(out->wins.end(), win_buf->begin(), win_buf->begin() + wc);
  for (int64_t t = 0; t < n; ++t) {
    if ((*ovf_buf)[t]) {
      rej_gidx->push_back(gidx[t]);
      rej_col->push_back(col[t]);
      rej_val->push_back(val[t]);
    }
  }
}

void PackLongRow(const int64_t* col, const double* val, int64_t ln,
                 int64_t gbase, int32_t win_cap, int32_t p_cap,
                 int32_t dyn_pad_max, RowPack* out, Scratch* s) {
  if (ln <= 0) return;
  // window-run starts in the sorted column stream
  std::vector<int64_t> starts;
  starts.push_back(0);
  for (int64_t e = 1; e < ln; ++e) {
    if (col[e] / kVreg != col[e - 1] / kVreg) starts.push_back(e);
  }
  const int64_t n_win = static_cast<int64_t>(starts.size());
  // max distinct windows in any sequential 1024-chunk
  int64_t chunk_w = 0;
  {
    size_t ri = 0;  // first run with start > c0
    for (int64_t c0 = 0; c0 < ln; c0 += kVreg) {
      const int64_t c1 = std::min<int64_t>(c0 + kVreg, ln);
      while (ri < starts.size() && starts[ri] <= c0) ++ri;
      size_t rj = ri;
      while (rj < starts.size() && starts[rj] < c1) ++rj;
      chunk_w = std::max<int64_t>(chunk_w, static_cast<int64_t>(rj - ri) + 1);
    }
  }
  bool sequential = chunk_w <= win_cap;
  const int64_t nv_base = (ln + kVreg - 1) / kVreg;
  if (!sequential) {
    const int64_t nv_need =
        std::max(nv_base, (n_win + win_cap - 1) / win_cap);
    sequential = nv_need > static_cast<int64_t>(dyn_pad_max) * nv_base;
  }

  // emission buffers (gathered per vreg)
  std::vector<int64_t> gcol, ggid;
  std::vector<double> gval;
  std::vector<int64_t> rej_g, rej_c;
  std::vector<double> rej_v;
  std::vector<int32_t> win_buf;
  std::vector<uint8_t> ovf_buf;

  if (sequential) {
    for (int64_t c0 = 0; c0 < ln; c0 += kVreg) {
      const int64_t c1 = std::min<int64_t>(c0 + kVreg, ln);
      ggid.resize(c1 - c0);
      for (int64_t t = c0; t < c1; ++t) ggid[t - c0] = gbase + t;
      RouteAppend(col + c0, val + c0, ggid.data(), c1 - c0, p_cap, out,
                  &rej_g, &rej_c, &rej_v, s, &ovf_buf, &win_buf);
    }
  } else {
    // groups = window runs pre-chunked to <= 1024 elements
    struct G {
      int64_t lo, hi;
    };
    std::vector<G> groups;
    for (int64_t gi = 0; gi < n_win; ++gi) {
      const int64_t lo = starts[gi];
      const int64_t hi = (gi + 1 < n_win) ? starts[gi + 1] : ln;
      for (int64_t c0 = lo; c0 < hi; c0 += kVreg) {
        groups.push_back({c0, std::min<int64_t>(c0 + kVreg, hi)});
      }
    }
    std::stable_sort(groups.begin(), groups.end(),
                     [](const G& a, const G& b) {
                       return (a.hi - a.lo) > (b.hi - b.lo);
                     });
    struct Bin {
      int64_t slots = 0;
      int32_t nwin = 0;
      std::vector<G> gs;
    };
    std::vector<Bin> bins;
    for (const G& g : groups) {
      const int64_t sz = g.hi - g.lo;
      bool placed = false;
      for (Bin& b : bins) {
        if (b.slots + sz <= kVreg && b.nwin < win_cap) {
          b.gs.push_back(g);
          b.slots += sz;
          b.nwin += 1;
          placed = true;
          break;
        }
      }
      if (!placed) bins.push_back(Bin{sz, 1, {g}});
    }
    for (const Bin& b : bins) {
      gcol.clear();
      gval.clear();
      ggid.clear();
      for (const G& g : b.gs) {
        for (int64_t t = g.lo; t < g.hi; ++t) {
          gcol.push_back(col[t]);
          gval.push_back(val[t]);
          ggid.push_back(gbase + t);
        }
      }
      RouteAppend(gcol.data(), gval.data(), ggid.data(),
                  static_cast<int64_t>(gcol.size()), p_cap, out, &rej_g,
                  &rej_c, &rej_v, s, &ovf_buf, &win_buf);
    }
  }

  // reject retries: re-sort by column, re-chunk sequentially breaking at
  // win_cap windows or 1024 slots, route into fresh vregs; depth 3 total.
  for (int depth = 1; depth < 3 && !rej_g.empty(); ++depth) {
    const int64_t n = static_cast<int64_t>(rej_g.size());
    std::vector<int64_t> order(n);
    for (int64_t i = 0; i < n; ++i) order[i] = i;
    std::stable_sort(order.begin(), order.end(),
                     [&](int64_t a, int64_t b) {
                       return rej_c[a] < rej_c[b];
                     });
    std::vector<int64_t> sc(n), sg(n);
    std::vector<double> sv(n);
    for (int64_t i = 0; i < n; ++i) {
      sc[i] = rej_c[order[i]];
      sg[i] = rej_g[order[i]];
      sv[i] = rej_v[order[i]];
    }
    rej_g.clear();
    rej_c.clear();
    rej_v.clear();
    int64_t lo = 0;
    while (lo < n) {
      int32_t w_used = 1;
      int64_t hi = lo + 1;
      while (hi < n && hi < lo + kVreg) {
        if (sc[hi] / kVreg != sc[hi - 1] / kVreg) {
          if (w_used == win_cap) break;
          ++w_used;
        }
        ++hi;
      }
      if (depth < 2) {
        RouteAppend(sc.data() + lo, sv.data() + lo, sg.data() + lo,
                    hi - lo, p_cap, out, &rej_g, &rej_c, &rej_v, s,
                    &ovf_buf, &win_buf);
      } else {
        // final-depth vregs route once; their rejects become dregs
        std::vector<int64_t> rg, rc;
        std::vector<double> rv;
        RouteAppend(sc.data() + lo, sv.data() + lo, sg.data() + lo,
                    hi - lo, p_cap, out, &rg, &rc, &rv, s,
                    &ovf_buf, &win_buf);
        out->dregs.insert(out->dregs.end(), rg.begin(), rg.end());
      }
      lo = hi;
    }
  }
  out->dregs.insert(out->dregs.end(), rej_g.begin(), rej_g.end());
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

// Pack + route all long rows in one call.  Row r's elements live at
// (col, val)[row_start[r] : row_end[r]] (rows need not be contiguous, so
// long rows route zero-copy from the full CSR streams); columns must be
// sorted ascending within each row.  Exported dreg indices are absolute
// positions in the provided base arrays.  Returns an opaque handle; query sizes with
// dasp_pack_long_dims, copy out with dasp_pack_long_export, release with
// dasp_pack_long_free.
void* dasp_pack_long(int64_t n_rows, const int64_t* row_start,
                     const int64_t* row_end, const int64_t* col,
                     const double* val, int32_t win_cap, int32_t p_cap,
                     int32_t dyn_pad_max) {
  auto* lp = new LongPack();
  lp->rows.resize(n_rows);
#ifdef _OPENMP
#pragma omp parallel
#endif
  {
    Scratch s;
#ifdef _OPENMP
#pragma omp for schedule(dynamic, 1)
#endif
    for (int64_t r = 0; r < n_rows; ++r) {
      const int64_t lo = row_start[r], hi = row_end[r];
      PackLongRow(col + lo, val + lo, hi - lo, lo, win_cap, p_cap,
                  dyn_pad_max, &lp->rows[r], &s);
    }
  }
  for (const RowPack& rp : lp->rows) {
    lp->n_vregs += static_cast<int64_t>(rp.win_counts.size());
    lp->n_wins += static_cast<int64_t>(rp.wins.size());
    lp->n_dregs += static_cast<int64_t>(rp.dregs.size());
  }
  return lp;
}

void dasp_pack_long_dims(void* h, int64_t* n_vregs, int64_t* n_wins,
                         int64_t* n_dregs) {
  auto* lp = static_cast<LongPack*>(h);
  *n_vregs = lp->n_vregs;
  *n_wins = lp->n_wins;
  *n_dregs = lp->n_dregs;
}

// vals_tiles: (n_vregs, 1024) f64; idx_tiles: (n_vregs, 1024) i32;
// wins_cat: (n_wins,) i32 with win_off: (n_vregs+1,) i64 delimiters;
// owner: (n_vregs,) i32 row ordinal; dregs: (n_dregs,) i64 global
// element indices.  Vregs are emitted grouped by row, rows in input
// order, and within a row in routing order (initial pass then retries).
void dasp_pack_long_export(void* h, double* vals_tiles, int32_t* idx_tiles,
                           int32_t* wins_cat, int64_t* win_off,
                           int32_t* owner, int64_t* dregs) {
  auto* lp = static_cast<LongPack*>(h);
  int64_t v0 = 0, w0 = 0, d0 = 0;
  win_off[0] = 0;
  for (size_t r = 0; r < lp->rows.size(); ++r) {
    const RowPack& rp = lp->rows[r];
    const int64_t nv = static_cast<int64_t>(rp.win_counts.size());
    if (nv) {
      memcpy(vals_tiles + v0 * kVreg, rp.vals.data(),
             sizeof(double) * nv * kVreg);
      memcpy(idx_tiles + v0 * kVreg, rp.idx.data(),
             sizeof(int32_t) * nv * kVreg);
    }
    if (!rp.wins.empty()) {
      memcpy(wins_cat + w0, rp.wins.data(),
             sizeof(int32_t) * rp.wins.size());
    }
    for (int64_t v = 0; v < nv; ++v) {
      owner[v0 + v] = static_cast<int32_t>(r);
      win_off[v0 + v + 1] = win_off[v0 + v] + rp.win_counts[v];
    }
    if (!rp.dregs.empty()) {
      memcpy(dregs + d0, rp.dregs.data(),
             sizeof(int64_t) * rp.dregs.size());
    }
    v0 += nv;
    w0 += static_cast<int64_t>(rp.wins.size());
    d0 += static_cast<int64_t>(rp.dregs.size());
  }
}

void dasp_pack_long_free(void* h) { delete static_cast<LongPack*>(h); }

// Window-dealing feasibility cascade (wplan._deal_windows waves).
// Exact native replica of the two numpy wave loops: FORWARD (runs of
// equal chunk id ce longer than kSub sublanes shed their tail to the
// next chunk, <= 36 waves) then BACKWARD (runs still overfull at the
// last chunk shed their head downward, <= 36 waves).  Rows are
// independent (the numpy waves' run masks reset at row starts), so the
// cascade parallelizes over rows; the numpy version instead ran every
// wave as a full-array pass (up to 72 passes over 61M elements on
// livejournal = most of its _deal_windows time).
//
// In:  newr[n]  row-start flags, w8[n] per-element chunk count,
//      ce[n]    initial chunk assignment (modified in place).
// Out: ce final chunks, pos[n] final rank-in-run (the caller takes
//      pos % kSub as the sublane preference).
void dasp_deal_cascade(int64_t n, const uint8_t* newr, const int64_t* w8,
                       int64_t* ce, int64_t* pos) {
  if (n <= 0) return;
  std::vector<int64_t> starts;
  starts.reserve(1024);
  for (int64_t i = 0; i < n; ++i)
    if (newr[i]) starts.push_back(i);
  if (starts.empty()) starts.push_back(0);
  const int64_t n_rows = static_cast<int64_t>(starts.size());
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic, 512)
#endif
  for (int64_t r = 0; r < n_rows; ++r) {
    const int64_t s = starts[r];
    const int64_t e = (r + 1 < n_rows) ? starts[r + 1] : n;
    // forward waves: pos computed from the CURRENT ce, then every
    // element with pos >= kSub and room (ce < w8-1) bumps one chunk.
    // On a no-op wave the loop breaks with pos still matching ce (the
    // numpy loop's state on break).
    for (int it = 0; it < 36; ++it) {
      int64_t rs = s;
      for (int64_t i = s; i < e; ++i) {
        if (i > s && ce[i] != ce[i - 1]) rs = i;
        pos[i] = i - rs;
      }
      bool any = false;
      for (int64_t i = s; i < e; ++i)
        if (pos[i] >= kSub && ce[i] < w8[i] - 1) {
          ce[i] += 1;
          any = true;
        }
      if (!any) break;
    }
    // backward waves: run ends derive from the CURRENT pos state (which
    // is stale by one bump if the forward loop exhausted its 36 waves —
    // faithfully matching the numpy order of operations), decrements
    // apply, then runs/pos recompute at the wave's END.
    for (int it = 0; it < 36; ++it) {
      bool any = false;
      int64_t rend = pos[e - 1];
      for (int64_t i = e - 1; i >= s; --i) {
        if (i < e - 1 && pos[i + 1] == 0) rend = pos[i];
        if (rend - pos[i] >= kSub && ce[i] > 0) {
          ce[i] -= 1;
          any = true;
        }
      }
      if (!any) break;
      int64_t rs = s;
      for (int64_t i = s; i < e; ++i) {
        if (i > s && ce[i] != ce[i - 1]) rs = i;
        pos[i] = i - rs;
      }
    }
  }
}

}  // extern "C"
