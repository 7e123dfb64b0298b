// egnn_native — host-side native runtime for elliptic_gnn_tpu.
//
// The reference's host hot spots are pandas CSV parsing and per-edge Python
// dict lookups (reference src/data/dataset_elliptic.py:111,232-233 — ~234k
// iterations); its device-side native code lives in pip-installed CUDA
// wheels. This library is the TPU build's native substrate for everything
// that stays on the host: mmap'd CSV ingestion of the 166-feature
// transaction table, txId -> row binary-search mapping, counting-sort CSR
// construction, and BFS renumbering for the BSDA chunk clustering
// (kernels/bsda.py). Exposed through a plain C ABI consumed via ctypes
// (elliptic_gnn_tpu/native.py).
//
// Build:  make -C native    (produces native/libegnn_native.so)

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <queue>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// ---------------------------------------------------------------- CSV ----

// First pass over a headerless numeric CSV: count rows and columns.
// Returns 0 on success.
int csv_dims(const char* path, int64_t* n_rows, int64_t* n_cols) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return -2; }
  size_t len = st.st_size;
  const char* buf =
      (const char*)mmap(nullptr, len, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (buf == MAP_FAILED) return -3;

  int64_t rows = 0, cols = 0;
  // columns from the first line
  const char* p = buf;
  const char* end = buf + len;
  const char* nl = (const char*)memchr(p, '\n', len);
  if (!nl) nl = end;
  cols = 1 + std::count(p, nl, ',');
  for (p = buf; p < end;) {
    const char* next = (const char*)memchr(p, '\n', end - p);
    if (!next) { if (end - p > 1) rows++; break; }
    if (next > p) rows++;
    p = next + 1;
  }
  munmap((void*)buf, len);
  *n_rows = rows;
  *n_cols = cols;
  return 0;
}

// Parse a headerless numeric CSV into out[row * n_cols + col] (float64 —
// wide enough for exact txIds up to 15 digits in column 0).
// Fast path: manual float parsing, no locale, no allocations per field.
// STRICT: any content this parser cannot represent exactly makes it bail
// with an error so the caller falls back to a full CSV reader (pandas)
// instead of silently mis-parsing:
//   -4  field count mismatch (ragged rows, embedded separators)
//   -5  integer part wider than 15 digits (f64 would round the id)
//   -6  non-numeric content (quotes, header text, NaN literals)
int csv_parse_f64(const char* path, int64_t n_rows, int64_t n_cols,
                  double* out) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return -2; }
  size_t len = st.st_size;
  const char* buf =
      (const char*)mmap(nullptr, len, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (buf == MAP_FAILED) return -3;
  madvise((void*)buf, len, MADV_SEQUENTIAL);

  const char* p = buf;
  const char* end = buf + len;
  int64_t idx = 0;
  const int64_t total = n_rows * n_cols;
  while (p < end && idx < total) {
    // skip whitespace / separators
    while (p < end && (*p == ',' || *p == '\n' || *p == '\r' || *p == ' '))
      p++;
    if (p >= end) break;
    // manual parse: sign, integer, fraction, exponent
    bool neg = false;
    if (*p == '-') { neg = true; p++; }
    else if (*p == '+') { p++; }
    double v = 0.0;
    int int_digits = 0;
    while (p < end && *p >= '0' && *p <= '9') {
      v = v * 10 + (*p - '0');
      int_digits++;
      p++;
    }
    bool any_digits = int_digits > 0;
    if (p < end && *p == '.') {
      p++;
      double scale = 0.1;
      while (p < end && *p >= '0' && *p <= '9') {
        v += (*p - '0') * scale;
        scale *= 0.1;
        any_digits = true;
        p++;
      }
    }
    if (int_digits > 15) { munmap((void*)buf, len); return -5; }
    if (!any_digits) { munmap((void*)buf, len); return -6; }
    if (p < end && (*p == 'e' || *p == 'E')) {
      p++;
      bool eneg = false;
      if (p < end && (*p == '-' || *p == '+')) { eneg = (*p == '-'); p++; }
      int ev = 0;
      while (p < end && *p >= '0' && *p <= '9') { ev = ev * 10 + (*p - '0'); p++; }
      v *= pow(10.0, eneg ? -ev : ev);
    }
    // the field must end at a separator (or EOF) — anything else means
    // content we did not parse (quotes, text, units): bail to pandas
    if (p < end && *p != ',' && *p != '\n' && *p != '\r' && *p != ' ') {
      munmap((void*)buf, len);
      return -6;
    }
    out[idx++] = neg ? -v : v;
  }
  munmap((void*)buf, len);
  return idx == total ? 0 : -4;
}

// ------------------------------------------------------------- mapping ----

// Map query ids to row indices via binary search over (sorted_ids, order).
// found[i] = 1 if present. O(Q log N).
void map_ids(const int64_t* sorted_ids, const int64_t* order, int64_t n,
             const int64_t* queries, int64_t q, int64_t* out_idx,
             uint8_t* found) {
  for (int64_t i = 0; i < q; i++) {
    const int64_t* lo =
        std::lower_bound(sorted_ids, sorted_ids + n, queries[i]);
    if (lo < sorted_ids + n && *lo == queries[i]) {
      out_idx[i] = order[lo - sorted_ids];
      found[i] = 1;
    } else {
      out_idx[i] = 0;
      found[i] = 0;
    }
  }
}

// ----------------------------------------------------------------- CSR ----

// Counting-sort CSR by destination: indptr [n+1], col [e] (source ids),
// eorder [e] (CSR position -> original edge id).
void build_csr(const int64_t* src, const int64_t* dst, int64_t n, int64_t e,
               int64_t* indptr, int64_t* col, int64_t* eorder) {
  std::vector<int64_t> cnt(n + 1, 0);
  for (int64_t i = 0; i < e; i++) cnt[dst[i] + 1]++;
  for (int64_t i = 0; i < n; i++) cnt[i + 1] += cnt[i];
  std::memcpy(indptr, cnt.data(), (n + 1) * sizeof(int64_t));
  std::vector<int64_t> cursor(cnt.begin(), cnt.end() - 1);
  for (int64_t i = 0; i < e; i++) {
    int64_t pos = cursor[dst[i]]++;
    col[pos] = src[i];
    eorder[pos] = i;
  }
}

// ----------------------------------------------------------------- BFS ----

// BFS renumbering over the undirected graph: rank[old] = new, components
// contiguous, seeds in node order (matches kernels/bsda.py bfs_order).
void bfs_order(const int64_t* src, const int64_t* dst, int64_t n, int64_t e,
               int32_t* rank) {
  // undirected CSR
  std::vector<int64_t> deg(n, 0);
  for (int64_t i = 0; i < e; i++) { deg[src[i]]++; deg[dst[i]]++; }
  std::vector<int64_t> indptr(n + 1, 0);
  for (int64_t i = 0; i < n; i++) indptr[i + 1] = indptr[i] + deg[i];
  std::vector<int64_t> adj(indptr[n]);
  std::vector<int64_t> cursor(indptr.begin(), indptr.end() - 1);
  for (int64_t i = 0; i < e; i++) {
    adj[cursor[src[i]]++] = dst[i];
    adj[cursor[dst[i]]++] = src[i];
  }

  std::vector<uint8_t> visited(n, 0);
  std::vector<int64_t> queue;
  queue.reserve(1024);
  int64_t nxt = 0;
  for (int64_t start = 0; start < n; start++) {
    if (visited[start]) continue;
    visited[start] = 1;
    queue.clear();
    queue.push_back(start);
    size_t head = 0;
    while (head < queue.size()) {
      int64_t u = queue[head++];
      rank[u] = (int32_t)nxt++;
      for (int64_t p = indptr[u]; p < indptr[u + 1]; p++) {
        int64_t v = adj[p];
        if (!visited[v]) {
          visited[v] = 1;
          queue.push_back(v);
        }
      }
    }
  }
}

}  // extern "C"
