// Native Matrix Market -> CSR loader for dasp_tpu.
//
// Plays the role of the reference's C parser stack (mmio.h:398-1100 and
// mmio_allinone, mmio_highlevel.h:608-774) but is a fresh implementation:
// mmap-free single-read, branchless-ish manual number parsing, OpenMP
// parallel body parse, symmetric/hermitian/skew expansion, counting-sort
// CSR build.  Exposed through a C ABI consumed by dasp_tpu/io/native.py
// via ctypes.

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct Csr {
  int64_t m = 0, n = 0, nnz = 0;
  std::vector<int64_t> rpt;
  std::vector<int32_t> cid;
  std::vector<double> val;
};

enum class Field { kReal, kInteger, kPattern, kComplex };
enum class Sym { kGeneral, kSymmetric, kSkew, kHermitian };

// Fast forward over spaces/tabs.
inline const char* SkipWs(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
  return p;
}

inline const char* SkipLine(const char* p, const char* end) {
  while (p < end && *p != '\n') ++p;
  return p < end ? p + 1 : end;
}

inline const char* ParseI64(const char* p, const char* end, int64_t* out) {
  p = SkipWs(p, end);
  bool neg = false;
  if (p < end && (*p == '-' || *p == '+')) neg = *p++ == '-';
  int64_t v = 0;
  while (p < end && *p >= '0' && *p <= '9') v = v * 10 + (*p++ - '0');
  *out = neg ? -v : v;
  return p;
}

// Fast double parse for the common fixed/scientific forms; falls back to
// strtod for anything exotic.
inline const char* ParseF64(const char* p, const char* end, double* out) {
  p = SkipWs(p, end);
  const char* start = p;
  bool neg = false;
  if (p < end && (*p == '-' || *p == '+')) neg = *p++ == '-';
  double v = 0;
  bool any = false;
  while (p < end && *p >= '0' && *p <= '9') {
    v = v * 10.0 + (*p++ - '0');
    any = true;
  }
  if (p < end && *p == '.') {
    ++p;
    double scale = 0.1;
    while (p < end && *p >= '0' && *p <= '9') {
      v += (*p++ - '0') * scale;
      scale *= 0.1;
      any = true;
    }
  }
  if (!any) {  // nan/inf or garbage: defer to strtod
    char* q = nullptr;
    *out = strtod(start, &q);
    return q ? q : p;
  }
  if (p < end && (*p == 'e' || *p == 'E' || *p == 'd' || *p == 'D')) {
    ++p;
    int64_t ex = 0;
    p = ParseI64(p, end, &ex);
    v *= std::pow(10.0, static_cast<double>(ex));
  }
  *out = neg ? -v : v;
  return p;
}

bool ParseBanner(const char*& p, const char* end, Field* field, Sym* sym) {
  const char* line_end = p;
  while (line_end < end && *line_end != '\n') ++line_end;
  std::string banner(p, line_end - p);
  for (auto& c : banner) c = static_cast<char>(tolower(c));
  p = line_end < end ? line_end + 1 : end;
  if (banner.rfind("%%matrixmarket", 0) != 0) return false;
  if (banner.find("matrix") == std::string::npos) return false;
  if (banner.find("coordinate") == std::string::npos) return false;  // array
  // unsupported natively; python fallback handles it
  if (banner.find("pattern") != std::string::npos) *field = Field::kPattern;
  else if (banner.find("complex") != std::string::npos) *field = Field::kComplex;
  else if (banner.find("integer") != std::string::npos) *field = Field::kInteger;
  else if (banner.find("real") != std::string::npos) *field = Field::kReal;
  else return false;
  if (banner.find("skew-symmetric") != std::string::npos) *sym = Sym::kSkew;
  else if (banner.find("symmetric") != std::string::npos) *sym = Sym::kSymmetric;
  else if (banner.find("hermitian") != std::string::npos) *sym = Sym::kHermitian;
  else *sym = Sym::kGeneral;
  return true;
}

Csr* ReadMtx(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  fseek(f, 0, SEEK_END);
  const long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> buf(static_cast<size_t>(size));
  if (size > 0 && fread(buf.data(), 1, size, f) != static_cast<size_t>(size)) {
    fclose(f);
    return nullptr;
  }
  fclose(f);

  const char* p = buf.data();
  const char* end = p + buf.size();
  Field field;
  Sym sym;
  if (!ParseBanner(p, end, &field, &sym)) return nullptr;

  // Comments, then the size line.
  while (p < end) {
    p = SkipWs(p, end);
    if (p < end && (*p == '%' || *p == '\n')) {
      p = SkipLine(p, end);
      continue;
    }
    break;
  }
  int64_t m = 0, n = 0, decl = 0;
  p = ParseI64(p, end, &m);
  p = ParseI64(p, end, &n);
  p = ParseI64(p, end, &decl);
  p = SkipLine(p, end);
  if (m <= 0 || n <= 0 || decl < 0) return nullptr;

  // Split the body into per-thread chunks at line boundaries, then parse in
  // parallel (the reference leans on OpenMP for host preprocessing too,
  // dasp_f16.h:1162).
  int nthreads = 1;
#ifdef _OPENMP
  nthreads = omp_get_max_threads();
#endif
  std::vector<const char*> starts(nthreads + 1);
  const size_t body = static_cast<size_t>(end - p);
  for (int t = 0; t <= nthreads; ++t) {
    const char* q = p + body * t / nthreads;
    if (t > 0 && t < nthreads) {
      while (q < end && q[-1] != '\n') ++q;
    }
    starts[t] = t == nthreads ? end : q;
  }

  std::vector<std::vector<int64_t>> rws(nthreads), cls(nthreads);
  std::vector<std::vector<double>> vls(nthreads);
  bool ok = true;
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int t = 0; t < nthreads; ++t) {
    const char* q = starts[t];
    const char* qe = starts[t + 1];
    auto& rw = rws[t];
    auto& cl = cls[t];
    auto& vl = vls[t];
    rw.reserve(decl / nthreads + 16);
    cl.reserve(decl / nthreads + 16);
    vl.reserve(decl / nthreads + 16);
    while (q < qe) {
      q = SkipWs(q, qe);
      if (q >= qe) break;
      if (*q == '\n') { ++q; continue; }
      if (*q == '%') { q = SkipLine(q, qe); continue; }
      int64_t r = 0, c = 0;
      double v = 1.0;
      q = ParseI64(q, qe, &r);
      q = ParseI64(q, qe, &c);
      if (field == Field::kReal || field == Field::kInteger) {
        q = ParseF64(q, qe, &v);
      } else if (field == Field::kComplex) {
        double im;
        q = ParseF64(q, qe, &v);   // keep the real part
        q = ParseF64(q, qe, &im);  // (mmio_highlevel.h:676-678 semantics)
      }
      q = SkipLine(q, qe);
      if (r < 1 || r > m || c < 1 || c > n) { ok = false; break; }
      rw.push_back(r - 1);  // 1-based -> 0-based shift
      cl.push_back(c - 1);
      vl.push_back(v);
    }
  }
  if (!ok) return nullptr;
  int64_t parsed = 0;
  for (auto& rw : rws) parsed += static_cast<int64_t>(rw.size());
  if (parsed != decl) return nullptr;

  // Symmetry expansion of off-diagonals (mmio_highlevel.h:702-746).
  const bool expand = sym != Sym::kGeneral;
  const double mirror_sign = sym == Sym::kSkew ? -1.0 : 1.0;
  int64_t total = parsed;
  if (expand) {
    for (int t = 0; t < nthreads; ++t) {
      for (size_t i = 0; i < rws[t].size(); ++i) {
        if (rws[t][i] != cls[t][i]) ++total;
      }
    }
  }

  auto* csr = new Csr;
  csr->m = m;
  csr->n = n;
  csr->nnz = total;
  csr->rpt.assign(m + 1, 0);
  csr->cid.resize(total);
  csr->val.resize(total);

  // Counting-sort CSR build, stable within input order.
  std::vector<int64_t> cnt(m + 1, 0);
  for (int t = 0; t < nthreads; ++t) {
    for (size_t i = 0; i < rws[t].size(); ++i) {
      ++cnt[rws[t][i] + 1];
      if (expand && rws[t][i] != cls[t][i]) ++cnt[cls[t][i] + 1];
    }
  }
  for (int64_t r = 0; r < m; ++r) cnt[r + 1] += cnt[r];
  csr->rpt.assign(cnt.begin(), cnt.end());
  std::vector<int64_t> cursor(cnt.begin(), cnt.end() - 1);
  for (int t = 0; t < nthreads; ++t) {
    for (size_t i = 0; i < rws[t].size(); ++i) {
      const int64_t r = rws[t][i], c = cls[t][i];
      const double v = vls[t][i];
      int64_t dst = cursor[r]++;
      csr->cid[dst] = static_cast<int32_t>(c);
      csr->val[dst] = v;
      if (expand && r != c) {
        dst = cursor[c]++;
        csr->cid[dst] = static_cast<int32_t>(r);
        csr->val[dst] = mirror_sign * v;
      }
    }
  }
  return csr;
}

}  // namespace

extern "C" {

void* dasp_read_mtx(const char* path) { return ReadMtx(path); }

void dasp_csr_dims(void* h, int64_t* m, int64_t* n, int64_t* nnz) {
  auto* c = static_cast<Csr*>(h);
  *m = c->m;
  *n = c->n;
  *nnz = c->nnz;
}

void dasp_csr_export(void* h, int64_t* rpt, int32_t* cid, double* val) {
  auto* c = static_cast<Csr*>(h);
  memcpy(rpt, c->rpt.data(), sizeof(int64_t) * (c->m + 1));
  memcpy(cid, c->cid.data(), sizeof(int32_t) * c->nnz);
  memcpy(val, c->val.data(), sizeof(double) * c->nnz);
}

void dasp_csr_free(void* h) { delete static_cast<Csr*>(h); }

}  // extern "C"
