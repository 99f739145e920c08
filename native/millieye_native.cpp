// millieye_tpu native runtime kernels (host side).
//
// The reference's de-facto native layer is library code: sklearn's Cython
// DBSCAN (tracking.py:26), scipy's C++ Hungarian (tracking.py:85) and the
// Python-loop TI mmWave UART parser (ReadRadar.py:186-336). This file
// provides the framework's own C++ implementations, bound via ctypes
// (millieye_tpu/native/__init__.py). All matrices are row-major C doubles.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <vector>
#include <limits>
#include <cmath>

extern "C" {

// ---------------------------------------------------------------- DBSCAN
// Euclidean DBSCAN, sklearn semantics: core point = >= min_samples
// neighbors within eps (self included); clusters numbered by first core
// point in index order; noise = -1.
int me_dbscan(const double* pts, long n, long d, double eps,
              long min_samples, long* labels) {
  if (n <= 0) return 0;
  const double eps2 = eps * eps;
  std::vector<uint8_t> adj(static_cast<size_t>(n) * n, 0);
  std::vector<long> degree(n, 0);
  for (long i = 0; i < n; ++i) {
    for (long j = i; j < n; ++j) {
      double s = 0.0;
      for (long k = 0; k < d; ++k) {
        const double diff = pts[i * d + k] - pts[j * d + k];
        s += diff * diff;
      }
      const uint8_t within = s <= eps2 ? 1 : 0;
      adj[i * n + j] = within;
      adj[j * n + i] = within;
    }
  }
  for (long i = 0; i < n; ++i) {
    long deg = 0;
    for (long j = 0; j < n; ++j) deg += adj[i * n + j];
    degree[i] = deg;
  }
  for (long i = 0; i < n; ++i) labels[i] = -1;
  long cluster = 0;
  std::vector<long> stack;
  for (long seed = 0; seed < n; ++seed) {
    if (labels[seed] != -1 || degree[seed] < min_samples) continue;
    labels[seed] = cluster;
    stack.assign(1, seed);
    while (!stack.empty()) {
      const long i = stack.back();
      stack.pop_back();
      if (degree[i] < min_samples) continue;  // border point: no expansion
      for (long j = 0; j < n; ++j) {
        if (adj[i * n + j] && labels[j] == -1) {
          labels[j] = cluster;
          if (degree[j] >= min_samples) stack.push_back(j);
        }
      }
    }
    ++cluster;
  }
  return static_cast<int>(cluster);
}

// ------------------------------------------------------------- Hungarian
// Shortest-augmenting-path assignment with potentials, O(n^2 m).
// Requires rows <= cols; the Python wrapper transposes otherwise.
// Writes the chosen column for each row into col_for_row.
int me_hungarian(const double* cost, long n, long m, long* col_for_row) {
  if (n <= 0 || m <= 0) return 0;
  const double INF = std::numeric_limits<double>::infinity();
  std::vector<double> u(n + 1, 0.0), v(m + 1, 0.0), minv(m + 1);
  std::vector<long> p(m + 1, 0), way(m + 1, 0);
  for (long i = 1; i <= n; ++i) {
    p[0] = i;
    long j0 = 0;
    std::fill(minv.begin(), minv.end(), INF);
    std::vector<uint8_t> used(m + 1, 0);
    do {
      used[j0] = 1;
      const long i0 = p[j0];
      long j1 = -1;
      double delta = INF;
      for (long j = 1; j <= m; ++j) {
        if (used[j]) continue;
        const double cur = cost[(i0 - 1) * m + (j - 1)] - u[i0] - v[j];
        if (cur < minv[j]) { minv[j] = cur; way[j] = j0; }
        if (minv[j] < delta) { delta = minv[j]; j1 = j; }
      }
      for (long j = 0; j <= m; ++j) {
        if (used[j]) { u[p[j]] += delta; v[j] -= delta; }
        else { minv[j] -= delta; }
      }
      j0 = j1;
    } while (p[j0] != 0);
    do { const long j1 = way[j0]; p[j0] = p[j1]; j0 = j1; } while (j0);
  }
  for (long i = 0; i < n; ++i) col_for_row[i] = -1;
  for (long j = 1; j <= m; ++j) {
    if (p[j] > 0) col_for_row[p[j] - 1] = j - 1;
  }
  return static_cast<int>(n);
}

// ------------------------------------------------- TI mmWave UART framing
// Parses one complete demo-protocol frame from a byte stream:
// magic [2,1,4,3,6,5,8,7], 32-byte header (version, totalPacketLen,
// platform, frameNumber, timeCpuCycles, numDetectedObj, numTLVs,
// subFrameNumber), then TLVs; type-1 TLV carries numDetectedObj points of
// (x, y, z, velocity) float32.
//
// Returns 1 when a frame was parsed (points written to xyzv_out, capped at
// cap points; *num_points, *frame_number set), 0 when more bytes are
// needed. *consumed is how many leading bytes the caller should drop from
// its buffer in either case (garbage before the magic word, plus the full
// packet when parsed).
static const uint8_t kMagic[8] = {2, 1, 4, 3, 6, 5, 8, 7};

static inline uint32_t rd_u32(const uint8_t* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) |
         (static_cast<uint32_t>(p[3]) << 24);
}

int me_parse_mmwave_frame(const uint8_t* buf, long len, float* xyzv_out,
                          long cap, long* num_points, long* frame_number,
                          long* consumed) {
  *num_points = 0;
  *frame_number = -1;
  *consumed = 0;
  if (len < 8) return 0;
  long start = -1;
  for (long i = 0; i + 8 <= len; ++i) {
    if (std::memcmp(buf + i, kMagic, 8) == 0) { start = i; break; }
  }
  if (start < 0) {
    *consumed = len - 7;           // keep a possible partial magic tail
    if (*consumed < 0) *consumed = 0;
    return 0;
  }
  *consumed = start;               // drop garbage before the magic word
  const uint8_t* f = buf + start;
  const long avail = len - start;
  if (avail < 40) return 0;        // header incomplete
  const uint32_t total_len = rd_u32(f + 12);
  // a corrupted header with a huge total_len must not stall the stream
  // waiting for bytes that never come: treat it as a false-positive magic,
  // consume past it and rescan
  const uint32_t kMaxFrameLen = 1u << 20;
  if (total_len < 40 || total_len > kMaxFrameLen) {
    *consumed = start + 8;
    return 0;
  }
  if (avail < static_cast<long>(total_len)) return 0;

  const uint32_t frame_no = rd_u32(f + 20);
  const uint32_t num_obj = rd_u32(f + 28);
  const uint32_t num_tlvs = rd_u32(f + 32);

  long idx = 40;
  long written = 0;
  for (uint32_t t = 0; t < num_tlvs && idx + 8 <= total_len; ++t) {
    const uint32_t tlv_type = rd_u32(f + idx);
    const uint32_t tlv_len = rd_u32(f + idx + 4);
    idx += 8;
    if (tlv_type == 1) {  // MMWDEMO_UART_MSG_DETECTED_POINTS
      const long n = static_cast<long>(num_obj);
      for (long o = 0; o < n && idx + 16 <= static_cast<long>(total_len);
           ++o) {
        if (written < cap) {
          std::memcpy(xyzv_out + written * 4, f + idx, 16);
          ++written;
        }
        idx += 16;
      }
    } else {
      idx += tlv_len;
    }
  }
  *num_points = written;
  *frame_number = static_cast<long>(frame_no);
  *consumed = start + static_cast<long>(total_len);
  return 1;
}

}  // extern "C"
