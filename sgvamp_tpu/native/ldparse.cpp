// Fast PLINK .ld parser and band assembler for sgvamp_tpu.
//
// The reference parses .ld tables with pandas.read_table and assembles a
// CSR in Python (reference src/main.py:205-257, scripts/plink2np.py:33-49),
// which is minutes-slow and memory-hungry at biobank scale. This native
// path streams the file once, resolves SNP names against the harmonized
// variant index with a single hash map, and can assemble symmetric band
// storage directly - the layout the TPU operators pack from.
//
// C ABI (ctypes-friendly):
//   ldparse_parse(path, variants_blob, n_variants) -> handle (NULL on OOM)
//   ldparse_error(handle)  -> error string or NULL
//   ldparse_count(handle)  -> number of parsed (a, b, r) triplets
//   ldparse_copy(handle, a, b, v) -> copy out triplets (caller allocates)
//   ldparse_free(handle)
//   ldparse_max_bandwidth(n, a, b) -> max |a-b|
//   ldparse_to_band(n, a, b, v, M, bw, band) -> dropped-entry count;
//       band is float32 (M, 2*bw+1), diagonal preset to 1 by this call.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>

namespace {

struct Result {
  std::vector<int64_t> a, b;
  std::vector<double> v;
  std::string err;
};

// Split a line into whitespace-separated tokens (in place, no copies).
inline int tokenize(char* line, char** toks, int max_toks) {
  int n = 0;
  char* p = line;
  while (*p && n < max_toks) {
    while (*p == ' ' || *p == '\t' || *p == '\r' || *p == '\n') ++p;
    if (!*p) break;
    toks[n++] = p;
    while (*p && *p != ' ' && *p != '\t' && *p != '\r' && *p != '\n') ++p;
    if (*p) *p++ = '\0';
  }
  return n;
}

template <typename T>
int64_t to_band_impl(int64_t n, const int64_t* a, const int64_t* b,
                     const double* v, int64_t M, int64_t bw, T* band) {
  const int64_t nd = 2 * bw + 1;
  // unit diagonal (reference csr assembly adds ones(M), src/main.py:255)
  for (int64_t i = 0; i < M; ++i) band[i * nd + bw] = T(1);
  int64_t dropped = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t r0 = a[i], c0 = b[i];
    int64_t d = c0 - r0;
    if (d > bw || d < -bw) {
      ++dropped;
      continue;
    }
    T val = static_cast<T>(v[i]);
    band[r0 * nd + (bw + d)] = val;       // R[r0, c0]
    band[c0 * nd + (bw - d)] = val;       // symmetric mirror
  }
  return dropped;
}

}  // namespace

extern "C" {

void* ldparse_parse(const char* path, const char* variants_blob,
                    int64_t n_variants) {
  auto* res = new (std::nothrow) Result();
  if (!res) return nullptr;

  // Build the variant -> reference-index map over the '\n'-separated blob.
  std::unordered_map<std::string_view, int64_t> index;
  index.reserve(static_cast<size_t>(n_variants) * 2);
  {
    const char* p = variants_blob;
    for (int64_t i = 0; i < n_variants; ++i) {
      const char* q = strchr(p, '\n');
      size_t len = q ? static_cast<size_t>(q - p) : strlen(p);
      index.emplace(std::string_view(p, len), i);
      if (!q) break;
      p = q + 1;
    }
  }

  FILE* f = fopen(path, "rb");
  if (!f) {
    res->err = std::string("cannot open ") + path;
    return res;
  }

  char buf[1 << 16];
  char* toks[64];
  int col_a = -1, col_b = -1, col_r = -1;

  // Header: locate SNP_A, SNP_B, R columns.
  if (fgets(buf, sizeof(buf), f)) {
    int n = tokenize(buf, toks, 64);
    for (int i = 0; i < n; ++i) {
      if (!strcmp(toks[i], "SNP_A")) col_a = i;
      else if (!strcmp(toks[i], "SNP_B")) col_b = i;
      else if (!strcmp(toks[i], "R")) col_r = i;
    }
  }
  if (col_a < 0 || col_b < 0 || col_r < 0) {
    res->err = "missing SNP_A/SNP_B/R columns in .ld header";
    fclose(f);
    return res;
  }
  int need = (col_a > col_b ? col_a : col_b) > col_r
                 ? (col_a > col_b ? col_a : col_b)
                 : col_r;

  int64_t lineno = 1;
  while (fgets(buf, sizeof(buf), f)) {
    ++lineno;
    int n = tokenize(buf, toks, 64);
    if (n == 0) continue;  // blank line
    if (n <= need) {
      res->err = "short line " + std::to_string(lineno);
      break;
    }
    auto ia = index.find(std::string_view(toks[col_a]));
    auto ib = index.find(std::string_view(toks[col_b]));
    if (ia == index.end() || ib == index.end()) {
      res->err = "unknown SNP on line " + std::to_string(lineno);
      break;
    }
    res->a.push_back(ia->second);
    res->b.push_back(ib->second);
    res->v.push_back(strtod(toks[col_r], nullptr));
  }
  fclose(f);
  return res;
}

const char* ldparse_error(void* h) {
  auto* res = static_cast<Result*>(h);
  return res->err.empty() ? nullptr : res->err.c_str();
}

int64_t ldparse_count(void* h) {
  return static_cast<int64_t>(static_cast<Result*>(h)->a.size());
}

void ldparse_copy(void* h, int64_t* a, int64_t* b, double* v) {
  auto* res = static_cast<Result*>(h);
  size_t n = res->a.size();
  memcpy(a, res->a.data(), n * sizeof(int64_t));
  memcpy(b, res->b.data(), n * sizeof(int64_t));
  memcpy(v, res->v.data(), n * sizeof(double));
}

void ldparse_free(void* h) { delete static_cast<Result*>(h); }

int64_t ldparse_max_bandwidth(int64_t n, const int64_t* a, const int64_t* b) {
  int64_t bw = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t d = a[i] > b[i] ? a[i] - b[i] : b[i] - a[i];
    if (d > bw) bw = d;
  }
  return bw;
}

int64_t ldparse_to_band(int64_t n, const int64_t* a, const int64_t* b,
                        const double* v, int64_t M, int64_t bw, float* band) {
  return to_band_impl(n, a, b, v, M, bw, band);
}

int64_t ldparse_to_band_f64(int64_t n, const int64_t* a, const int64_t* b,
                            const double* v, int64_t M, int64_t bw,
                            double* band) {
  return to_band_impl(n, a, b, v, M, bw, band);
}

}  // extern "C"
