// Host-native library for the TPU segmentation framework.
//
// The reference (/root/reference) is entirely native C++; the irreducibly
// serial / pointer-chasing host stages are rebuilt here as a small C-ABI
// library consumed from Python via ctypes:
//
//   * Suzuki-Abe border following with CHAIN_APPROX_SIMPLE compression,
//     matching cv::findContours(RETR_EXTERNAL, CHAIN_APPROX_SIMPLE)
//     point-for-point (spec: unetseg_tpu/io/contours_py.py, differential-
//     tested against OpenCV),
//   * bit-exact double-precision preprocess (min/max scan + truncating
//     bilinear 512x512 downsample + u8 quantize) reproducing
//     src/preprocess.cpp:65-118 semantics for strict-parity mode,
//   * labelme-style contour JSON bytes identical to nlohmann::json's
//     `std::setw(4)` serialization (alphabetical keys, 4-space indent) as
//     emitted by src/mask2polygon.cpp:68-109, and the compact size JSON of
//     src/preprocess.cpp:126-134.
//
// Build: `make -C csrc` produces libunetseg_host.so.

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "unetseg_host.h"  // public C API — definitions below must match

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// Direction table: index 0..7 = E, NE, N, NW, W, SW, S, SE
// (increasing index = counter-clockwise on screen).
constexpr int DX[8] = {1, 1, 0, -1, -1, -1, 0, 1};
constexpr int DY[8] = {0, -1, -1, -1, 0, 1, 1, 1};

struct Point {
  int x, y;
  bool operator==(const Point& o) const { return x == o.x && y == o.y; }
  bool operator!=(const Point& o) const { return !(*this == o); }
};

// Suzuki-Abe outer-border following from the raster-first pixel (x0, y0)
// of a component, on a zero-padded binary image. Returns the NONE chain.
std::vector<Point> trace_outer(const std::vector<uint8_t>& img, int stride,
                               int x0, int y0) {
  auto at = [&](int x, int y) -> uint8_t { return img[y * stride + x]; };

  // Initial clockwise search from W (index 4) for the trace predecessor.
  int s = 4;
  const int s_end = 4;
  int nx = 0, ny = 0;
  bool found = false;
  do {
    s = (s - 1) & 7;
    nx = x0 + DX[s];
    ny = y0 + DY[s];
    if (at(nx, ny)) {
      found = true;
      break;
    }
  } while (s != s_end);
  if (!found) return {{x0, y0}};  // isolated pixel

  const Point i1{nx, ny};
  Point i2 = i1;
  Point i3{x0, y0};
  std::vector<Point> pts;
  for (;;) {
    pts.push_back(i3);
    // Counter-clockwise search around i3 starting just after i2.
    const int dx = i2.x - i3.x, dy = i2.y - i3.y;
    int sd = 0;
    for (int k = 0; k < 8; ++k) {
      if (DX[k] == dx && DY[k] == dy) {
        sd = k;
        break;
      }
    }
    for (;;) {
      sd = (sd + 1) & 7;
      nx = i3.x + DX[sd];
      ny = i3.y + DY[sd];
      if (at(nx, ny)) break;
    }
    const Point i4{nx, ny};
    if (i4.x == x0 && i4.y == y0 && i3 == i1) break;
    i2 = i3;
    i3 = i4;
  }
  return pts;
}

// CHAIN_APPROX_SIMPLE: keep direction-change vertices of the closed chain.
std::vector<Point> approx_simple(const std::vector<Point>& pts) {
  const size_t n = pts.size();
  if (n <= 2) return pts;
  std::vector<Point> out;
  out.reserve(n);
  for (size_t i = 0; i < n; ++i) {
    const Point& prev = pts[(i + n - 1) % n];
    const Point& cur = pts[i];
    const Point& next = pts[(i + 1) % n];
    const int pdx = cur.x - prev.x, pdy = cur.y - prev.y;
    const int ndx = next.x - cur.x, ndy = next.y - cur.y;
    if (pdx != ndx || pdy != ndy) out.push_back(cur);
  }
  return out;
}

// Union-find over the padded grid.
struct DSU {
  std::vector<int32_t> parent;
  explicit DSU(size_t n) : parent(n) {
    for (size_t i = 0; i < n; ++i) parent[i] = static_cast<int32_t>(i);
  }
  int32_t find(int32_t a) {
    while (parent[a] != a) {
      parent[a] = parent[parent[a]];
      a = parent[a];
    }
    return a;
  }
  void unite(int32_t a, int32_t b) {
    a = find(a);
    b = find(b);
    if (a != b) parent[std::max(a, b)] = std::min(a, b);
  }
};

}  // namespace

extern "C" {

// cv::findContours(mask > 127, RETR_EXTERNAL, CHAIN_APPROX_SIMPLE) parity.
//
// mask: (h, w) uint8, row-major.
// Outputs (malloc'd, caller frees via utpu_free):
//   *out_points  — flattened x,y pairs, contour-concatenated,
//   *out_offsets — n_contours+1 point offsets into out_points,
// Returns the number of contours (>= 0), or -1 on allocation failure.
int utpu_extract_contours(const uint8_t* mask, int h, int w,
                          int32_t** out_points, int32_t** out_offsets,
                          int32_t* out_n_points) {
  const int ph = h + 2, pw = w + 2;
  std::vector<uint8_t> padded(static_cast<size_t>(ph) * pw, 0);
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x)
      padded[(y + 1) * pw + (x + 1)] = mask[y * w + x] > 127 ? 1 : 0;

  // Run-length connected components: union-find over row RUNS instead of
  // pixels (the same ~100x element reduction as utpu_postprocess's RLE CC)
  // — the pixel-DSU version of this function measured ~7 ms/512² mask with
  // the cost entirely in the two full-image DSU passes.
  struct Run {
    int32_t x0, x1;  // half-open [x0, x1)
  };
  std::vector<Run> fg_runs, bg_runs;
  std::vector<int32_t> fg_off(ph + 1, 0), bg_off(ph + 1, 0);
  fg_runs.reserve(1024);
  bg_runs.reserve(1024);
  for (int y = 0; y < ph; ++y) {
    const uint8_t* row = &padded[static_cast<size_t>(y) * pw];
    int x = 0;
    while (x < pw) {
      const uint8_t v = row[x];
      const int x0 = x;
      while (x < pw && row[x] == v) ++x;
      if (v)
        fg_runs.push_back({x0, x});
      else
        bg_runs.push_back({x0, x});
    }
    fg_off[y + 1] = static_cast<int32_t>(fg_runs.size());
    bg_off[y + 1] = static_cast<int32_t>(bg_runs.size());
  }

  DSU fg(fg_runs.size());
  DSU bg(bg_runs.size());
  for (int y = 1; y < ph; ++y) {
    // fg is 8-connected: a run links to prev-row runs overlapping its
    // 1-dilated span [x0-1, x1+1).
    int32_t a = fg_off[y - 1];
    const int32_t a_end = fg_off[y];
    for (int32_t b = fg_off[y]; b < fg_off[y + 1]; ++b) {
      const int32_t lo = fg_runs[b].x0 - 1, hi = fg_runs[b].x1 + 1;
      while (a < a_end && fg_runs[a].x1 <= lo) ++a;
      for (int32_t t = a; t < a_end && fg_runs[t].x0 < hi; ++t)
        fg.unite(b, t);
    }
    // bg is 4-connected: exact span overlap.
    int32_t c = bg_off[y - 1];
    const int32_t c_end = bg_off[y];
    for (int32_t b = bg_off[y]; b < bg_off[y + 1]; ++b) {
      const int32_t lo = bg_runs[b].x0, hi = bg_runs[b].x1;
      while (c < c_end && bg_runs[c].x1 <= lo) ++c;
      for (int32_t t = c; t < c_end && bg_runs[t].x0 < hi; ++t)
        bg.unite(b, t);
    }
  }
  // Padded row 0 is entirely background, so bg run 0 is the outer region.
  const int32_t outer_bg = bg.find(0);

  // Components in raster order (first run = raster-first pixel); external
  // iff the background pixel left of that first pixel is the outer region.
  std::vector<std::vector<Point>> contours;
  std::vector<uint8_t> seen(fg_runs.size(), 0);
  for (int y = 1; y < ph - 1; ++y) {
    for (int32_t b = fg_off[y]; b < fg_off[y + 1]; ++b) {
      const int32_t root = fg.find(b);
      if (seen[root]) continue;
      seen[root] = 1;
      const int x0 = fg_runs[b].x0;  // >= 1: padded col 0 is bg
      // bg run of row y containing x0-1: the last with run.x0 <= x0-1.
      int32_t lo_i = bg_off[y], hi_i = bg_off[y + 1];
      while (hi_i - lo_i > 1) {
        const int32_t mid = lo_i + (hi_i - lo_i) / 2;
        if (bg_runs[mid].x0 <= x0 - 1)
          lo_i = mid;
        else
          hi_i = mid;
      }
      if (bg.find(lo_i) != outer_bg) continue;
      contours.push_back(approx_simple(trace_outer(padded, pw, x0, y)));
    }
  }
  // OpenCV returns reverse discovery order.
  std::reverse(contours.begin(), contours.end());

  int32_t total = 0;
  for (const auto& c : contours) total += static_cast<int32_t>(c.size());
  auto* points =
      static_cast<int32_t*>(std::malloc(sizeof(int32_t) * 2 * std::max(total, 1)));
  auto* offsets = static_cast<int32_t*>(
      std::malloc(sizeof(int32_t) * (contours.size() + 1)));
  if (!points || !offsets) {
    std::free(points);
    std::free(offsets);
    return -1;
  }
  int32_t k = 0;
  offsets[0] = 0;
  for (size_t c = 0; c < contours.size(); ++c) {
    for (const Point& p : contours[c]) {
      points[2 * k] = p.x - 1;  // un-pad
      points[2 * k + 1] = p.y - 1;
      ++k;
    }
    offsets[c + 1] = k;
  }
  *out_points = points;
  *out_offsets = offsets;
  *out_n_points = total;
  return static_cast<int>(contours.size());
}

void utpu_free(void* p) { std::free(p); }

// Bit-exact host preprocess: min/max + truncating bilinear downsample to
// out_size x out_size + u8 quantize; double math exactly as
// src/preprocess.cpp:65-118.
void utpu_preprocess(const uint16_t* raw, int h, int w, int out_size,
                     uint8_t* out) {
  if (out_size <= 0) return;
  if (h <= 0 || w <= 0) {
    // Degenerate input: deterministic zero output instead of the general
    // path's iy1 = min(iy+1, h-1) = -1 wild OOB read (same guard
    // utpu_emit_slice already carries; round-4 review finding).
    std::memset(out, 0, static_cast<size_t>(out_size) * out_size);
    return;
  }
  uint16_t mnu = 65535, mxu = 0;
  const size_t len = static_cast<size_t>(h) * w;
#ifdef _OPENMP
#pragma omp parallel for reduction(min : mnu) reduction(max : mxu)
#endif
  for (long long i = 0; i < static_cast<long long>(len); ++i) {
    const uint16_t v = raw[i];
    mnu = std::min(mnu, v);
    mxu = std::max(mxu, v);
  }
  // Widened to int BEFORE the degenerate bump, matching the float64 oracle
  // (ops/preprocess.py:69-72): a uniformly-65535 image must give mx=65536,
  // not wrap uint16 to 0 (which underflowed the LUT size below and aborted
  // the process; round-4 review finding, reproduced).
  const int mn = mnu;
  int mx = mxu;
  if (mn == mx) mx = mn + 1;
  const double scale8 = 255.0 / (mx - mn);
  if (h == out_size && w == out_size) {
    // Same-size fast path: at scale 1 the truncating bilinear reduces to
    // identity sampling (fx = x, dx = 0 -> v = raw[y][x] exactly, in the
    // same f64 arithmetic), so quantization is a pure per-value function —
    // one 8-bit LUT over [mn, mx] replaces four loads + 8 f64 ops per
    // pixel.  Bit-exact by construction: each LUT entry IS the general
    // path's expression evaluated at that value.  3.0 -> ~0.25 ms per 512²
    // slice on one host core — the study runner's stage-A wall.
    std::vector<uint8_t> lut(static_cast<size_t>(mx) - mn + 1);
    for (size_t v = 0; v < lut.size(); ++v)
      lut[v] = static_cast<uint8_t>(static_cast<double>(v) * scale8 + 0.5);
#ifdef _OPENMP
#pragma omp parallel for
#endif
    for (long long i = 0; i < static_cast<long long>(len); ++i)
      out[i] = lut[raw[i] - mn];
    return;
  }
  const double step_x = static_cast<double>(w) / out_size;
  const double step_y = static_cast<double>(h) / out_size;
#ifdef _OPENMP
#pragma omp parallel for
#endif
  for (int y = 0; y < out_size; ++y) {
    const double fy = y * step_y;
    const int iy = static_cast<int>(fy);
    const int iy1 = std::min(iy + 1, h - 1);
    const double dy = fy - iy;
    for (int x = 0; x < out_size; ++x) {
      const double fx = x * step_x;
      const int ix = static_cast<int>(fx);
      const int ix1 = std::min(ix + 1, w - 1);
      const double dx = fx - ix;
      const double v00 = raw[static_cast<size_t>(iy) * w + ix];
      const double v01 = raw[static_cast<size_t>(iy) * w + ix1];
      const double v10 = raw[static_cast<size_t>(iy1) * w + ix];
      const double v11 = raw[static_cast<size_t>(iy1) * w + ix1];
      const double v = (1 - dx) * (1 - dy) * v00 + dx * (1 - dy) * v01 +
                       (1 - dx) * dy * v10 + dx * dy * v11;
      out[static_cast<size_t>(y) * out_size + x] =
          static_cast<uint8_t>((v - mn) * scale8 + 0.5);
    }
  }
}

namespace {

// Minimal JSON string escaper (nlohmann-compatible for the characters that
// can appear in file names; full control-char escaping included).
void append_json_string(std::string& out, const char* s) {
  out.push_back('"');
  for (const char* p = s; *p; ++p) {
    const unsigned char c = static_cast<unsigned char>(*p);
    switch (c) {
      case '"': out += "\\\""; break;
      case '\\': out += "\\\\"; break;
      case '\b': out += "\\b"; break;
      case '\f': out += "\\f"; break;
      case '\n': out += "\\n"; break;
      case '\r': out += "\\r"; break;
      case '\t': out += "\\t"; break;
      default:
        if (c < 0x20) {
          char buf[8];
          std::snprintf(buf, sizeof buf, "\\u%04x", c);
          out += buf;
        } else {
          out.push_back(static_cast<char>(c));
        }
    }
  }
  out.push_back('"');
}

}  // namespace

// Labelme-style contour JSON, byte-identical to nlohmann `setw(4)` output as
// produced by src/mask2polygon.cpp:68-109 (alphabetical key order), with the
// truncating coordinate scaling of src/mask2polygon.cpp:41-63 applied.
// `labels`/`label_indices` (optional, length n_contours) override the
// reference's constant label 1 / labelIndex 0 — the per-class extension
// (BASELINE config 2).  Returns malloc'd NUL-terminated bytes (length in
// *out_len), caller frees.
static char* contour_json_impl(const int32_t* points, const int32_t* offsets,
                               int n_contours, const char* base_name,
                               int orig_w, int orig_h, double scale_x,
                               double scale_y, const int32_t* labels,
                               const int32_t* label_indices,
                               size_t* out_len) {
  std::string j;
  j.reserve(4096);
  j += "{\n    \"flags\": {},\n    \"imageData\": null,\n    \"imageHeight\": ";
  j += std::to_string(orig_h);
  j += ",\n    \"imagePath\": ";
  append_json_string(j, (std::string(base_name) + ".raw").c_str());
  j += ",\n    \"imageWidth\": ";
  j += std::to_string(orig_w);
  j += ",\n    \"shapes\": ";
  if (n_contours == 0) {
    j += "[]";
  } else {
    j += "[";
    for (int c = 0; c < n_contours; ++c) {
      j += c ? ",\n        {" : "\n        {";
      j += "\n            \"description\": \"\",";
      j += "\n            \"flags\": {},";
      j += "\n            \"group_id\": null,";
      j += "\n            \"label\": ";
      j += std::to_string(labels ? labels[c] : 1);
      j += ",";
      j += "\n            \"labelIndex\": ";
      j += std::to_string(label_indices ? label_indices[c] : 0);
      j += ",";
      j += "\n            \"mask\": null,";
      j += "\n            \"points\": [";
      for (int32_t k = offsets[c]; k < offsets[c + 1]; ++k) {
        const int x = static_cast<int>(points[2 * k] * scale_x);
        const int y = static_cast<int>(points[2 * k + 1] * scale_y);
        j += (k == offsets[c]) ? "\n                [" : ",\n                [";
        j += "\n                    ";
        j += std::to_string(x);
        j += ",\n                    ";
        j += std::to_string(y);
        j += "\n                ]";
      }
      j += "\n            ],";
      j += "\n            \"shape_type\": \"polygon\"";
      j += "\n        }";
    }
    j += "\n    ]";
  }
  j += ",\n    \"version\": \"1.0.2.812\"\n}\n";

  char* buf = static_cast<char*>(std::malloc(j.size() + 1));
  if (!buf) return nullptr;
  std::memcpy(buf, j.data(), j.size() + 1);
  if (out_len) *out_len = j.size();
  return buf;
}

char* utpu_contour_json(const int32_t* points, const int32_t* offsets,
                        int n_contours, const char* base_name, int orig_w,
                        int orig_h, double scale_x, double scale_y,
                        size_t* out_len) {
  return contour_json_impl(points, offsets, n_contours, base_name, orig_w,
                           orig_h, scale_x, scale_y, nullptr, nullptr,
                           out_len);
}

char* utpu_contour_json_labeled(const int32_t* points, const int32_t* offsets,
                                int n_contours, const int32_t* labels,
                                const int32_t* label_indices,
                                const char* base_name, int orig_w, int orig_h,
                                double scale_x, double scale_y,
                                size_t* out_len) {
  return contour_json_impl(points, offsets, n_contours, base_name, orig_w,
                           orig_h, scale_x, scale_y, labels, label_indices,
                           out_len);
}

// Compact size JSON (src/preprocess.cpp:126-134): nlohmann `os << j` bytes.
char* utpu_size_json(const char* filename, int orig_w, int orig_h,
                     int scaled_w, int scaled_h, size_t* out_len) {
  std::string j = "{";
  append_json_string(j, filename);
  j += ":{\"original_height\":";
  j += std::to_string(orig_h);
  j += ",\"original_width\":";
  j += std::to_string(orig_w);
  j += ",\"scaled_height\":";
  j += std::to_string(scaled_h);
  j += ",\"scaled_width\":";
  j += std::to_string(scaled_w);
  j += "}}\n";
  char* buf = static_cast<char*>(std::malloc(j.size() + 1));
  if (!buf) return nullptr;
  std::memcpy(buf, j.data(), j.size() + 1);
  if (out_len) *out_len = j.size();
  return buf;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Host postprocess: exact reimplementation of src/postprocess.cpp
// (hole fill -> 3x3 MORPH_OPEN -> component area filter -> remap {0,2})
// using union-find CC; OpenMP-batched across images.
// ---------------------------------------------------------------------------

namespace {

// Run-length-encoded 8-connected CC: unions happen per *run pair*, not per
// pixel — typical cleaned masks have a few hundred runs vs 262k pixels, so
// labeling + stats cost O(runs) after one O(n) row scan, with no
// image-sized scratch allocations (the round-1 per-pixel union-find spent
// most of its ~12 ms/mask zeroing 5 image-sized stat arrays per CC call).
struct Run {
  int32_t y, x0, x1;  // [x0, x1)
};

struct RLECC {
  std::vector<Run> runs;        // sorted by (y, x0)
  std::vector<int32_t> parent;  // DSU over run indices (min-root)
  std::vector<int32_t> area, minx, miny, maxx, maxy;  // per ROOT run index

  int32_t root_of(int32_t r) const { return parent[r]; }  // post-resolve
};

// Predicate-driven run extraction + union: pred(row_ptr, x) -> bool.
// NOTE: utpu_extract_contours carries its own interleaved fg/bg run-CC
// (one pass, per-row offsets for its externality binary search) rather
// than two rle_cc calls — intentionally separate to keep the contour hot
// path at one image scan.  The overlap conditions are the same and must
// stay in sync: 8-conn = prev-run overlap with the 1-dilated span
// [x0-1, x1+1), 4-conn = exact span overlap.
template <typename Pred>
RLECC rle_cc(const uint8_t* img, int h, int w, Pred pred, bool connect8) {
  RLECC r;
  r.runs.reserve(256);
  r.parent.reserve(256);
  const int k = connect8 ? 1 : 0;
  int prev_begin = 0, prev_end = 0;
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = img + static_cast<size_t>(y) * w;
    const int row_begin = static_cast<int>(r.runs.size());
    int x = 0;
    int j = prev_begin;  // cursor into the previous row's runs
    while (x < w) {
      while (x < w && !pred(row, x)) ++x;
      if (x >= w) break;
      const int x0 = x;
      while (x < w && pred(row, x)) ++x;
      const int32_t idx = static_cast<int32_t>(r.runs.size());
      r.runs.push_back({y, x0, x});
      r.parent.push_back(idx);
      // unite with previous-row runs overlapping [x0-k, x1+k)
      while (j < prev_end && r.runs[j].x1 <= x0 - k) ++j;
      for (int t = j; t < prev_end && r.runs[t].x0 < x + k; ++t) {
        // DSU unite by min root
        int32_t a = idx, b = t;
        while (r.parent[a] != a) a = r.parent[a] = r.parent[r.parent[a]];
        while (r.parent[b] != b) b = r.parent[b] = r.parent[r.parent[b]];
        if (a != b) r.parent[std::max(a, b)] = std::min(a, b);
      }
    }
    prev_begin = row_begin;
    prev_end = static_cast<int>(r.runs.size());
  }
  // Ascending resolve: parent[i] <= i, so one sweep flattens every chain.
  const int32_t nr = static_cast<int32_t>(r.runs.size());
  for (int32_t i = 0; i < nr; ++i) r.parent[i] = r.parent[r.parent[i]];

  r.area.assign(nr, 0);
  r.minx.assign(nr, w);
  r.miny.assign(nr, h);
  r.maxx.assign(nr, -1);
  r.maxy.assign(nr, -1);
  for (int32_t i = 0; i < nr; ++i) {
    const Run& run = r.runs[i];
    const int32_t root = r.parent[i];
    r.area[root] += run.x1 - run.x0;
    if (run.x0 < r.minx[root]) r.minx[root] = run.x0;
    if (run.x1 - 1 > r.maxx[root]) r.maxx[root] = run.x1 - 1;
    if (run.y < r.miny[root]) r.miny[root] = run.y;
    if (run.y > r.maxy[root]) r.maxy[root] = run.y;
  }
  return r;
}

void postprocess_one(const uint8_t* mask, int h, int w, uint8_t* out) {
  const size_t n = static_cast<size_t>(h) * w;
  // min_area = int(w * h * 0.06f) with C++ float arithmetic
  // (postprocess.cpp:30,66).
  const int min_area =
      static_cast<int>(static_cast<float>(w) * h * 0.06f);

  // 1. hole fill: 8-CC of the inverse of (mask == 2); components whose bbox
  //    touches no border AND area < min_area become foreground.
  std::vector<uint8_t> fg_v(n);
  for (size_t i = 0; i < n; ++i) fg_v[i] = mask[i] == 2;
  {
    RLECC cc = rle_cc(
        mask, h, w, [](const uint8_t* row, int x) { return row[x] != 2; },
        /*connect8=*/true);
    for (size_t i = 0; i < cc.runs.size(); ++i) {
      const int32_t root = cc.parent[i];
      if (cc.minx[root] > 0 && cc.miny[root] > 0 && cc.maxx[root] < w - 1 &&
          cc.maxy[root] < h - 1 && cc.area[root] < min_area) {
        const Run& run = cc.runs[i];
        std::fill(fg_v.begin() + static_cast<size_t>(run.y) * w + run.x0,
                  fg_v.begin() + static_cast<size_t>(run.y) * w + run.x1,
                  uint8_t{1});
      }
    }
  }

  // 2. 3x3 MORPH_OPEN, separable (3x1 then 1x3): erode pads with fg,
  //    dilate pads with bg — OpenCV default border semantics.
  std::vector<uint8_t> tmp(n), op(n);
  auto row_of = [&](std::vector<uint8_t>& v, int y) {
    return v.data() + static_cast<size_t>(y) * w;
  };
  // vertical erode
  for (int y = 0; y < h; ++y) {
    const uint8_t* up = y > 0 ? row_of(fg_v, y - 1) : nullptr;
    const uint8_t* mid = row_of(fg_v, y);
    const uint8_t* dn = y + 1 < h ? row_of(fg_v, y + 1) : nullptr;
    uint8_t* out_row = row_of(tmp, y);
    for (int x = 0; x < w; ++x)
      out_row[x] = mid[x] & (up ? up[x] : 1) & (dn ? dn[x] : 1);
  }
  // horizontal erode (in place into fg_v, reused as scratch)
  for (int y = 0; y < h; ++y) {
    const uint8_t* r = row_of(tmp, y);
    uint8_t* o = row_of(fg_v, y);
    for (int x = 0; x < w; ++x) {
      uint8_t v = r[x];
      if (x > 0) v &= r[x - 1];
      if (x + 1 < w) v &= r[x + 1];
      o[x] = v;
    }
  }
  // vertical dilate
  for (int y = 0; y < h; ++y) {
    const uint8_t* up = y > 0 ? row_of(fg_v, y - 1) : nullptr;
    const uint8_t* mid = row_of(fg_v, y);
    const uint8_t* dn = y + 1 < h ? row_of(fg_v, y + 1) : nullptr;
    uint8_t* out_row = row_of(tmp, y);
    for (int x = 0; x < w; ++x)
      out_row[x] = mid[x] | (up ? up[x] : 0) | (dn ? dn[x] : 0);
  }
  // horizontal dilate
  for (int y = 0; y < h; ++y) {
    const uint8_t* r = row_of(tmp, y);
    uint8_t* o = row_of(op, y);
    for (int x = 0; x < w; ++x) {
      uint8_t v = r[x];
      if (x > 0) v |= r[x - 1];
      if (x + 1 < w) v |= r[x + 1];
      o[x] = v;
    }
  }

  // 3. component area filter + remap {0,2}: emit per run.
  std::memset(out, 0, n);
  RLECC cc = rle_cc(
      op.data(), h, w, [](const uint8_t* row, int x) { return row[x] != 0; },
      /*connect8=*/true);
  for (size_t i = 0; i < cc.runs.size(); ++i) {
    if (cc.area[cc.parent[i]] >= min_area) {
      const Run& run = cc.runs[i];
      std::memset(out + static_cast<size_t>(run.y) * w + run.x0, 2,
                  run.x1 - run.x0);
    }
  }
}

}  // namespace

extern "C" {

// Batched mask cleanup; masks/out are (n, h, w) uint8.
void utpu_postprocess_batch(const uint8_t* masks, int n, int h, int w,
                            uint8_t* out) {
  const size_t stride = static_cast<size_t>(h) * w;
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
  for (int k = 0; k < n; ++k)
    postprocess_one(masks + k * stride, h, w, out + k * stride);
}

// Same, from 2-bit-packed class masks (n, h, w/4) — the study pipeline's
// D2H format (parallel/pipeline.py:_pack_mask2).  Unpacking fuses into the
// cleanup call so the host never materializes the unpacked batch twice.
void utpu_postprocess_packed_batch(const uint8_t* packed, int n, int h, int w,
                                   uint8_t* out) {
  const size_t pstride = static_cast<size_t>(h) * (w / 4);
  const size_t stride = static_cast<size_t>(h) * w;
#ifdef _OPENMP
#pragma omp parallel
#endif
  {
    std::vector<uint8_t> buf(stride);
#ifdef _OPENMP
#pragma omp for schedule(dynamic)
#endif
    for (int k = 0; k < n; ++k) {
      const uint8_t* src = packed + k * pstride;
      for (size_t i = 0; i < pstride; ++i) {
        const uint8_t b = src[i];
        buf[4 * i] = b & 3;
        buf[4 * i + 1] = (b >> 2) & 3;
        buf[4 * i + 2] = (b >> 4) & 3;
        buf[4 * i + 3] = (b >> 6) & 3;
      }
      postprocess_one(buf.data(), h, w, out + k * stride);
    }
  }
}

}  // extern "C"
