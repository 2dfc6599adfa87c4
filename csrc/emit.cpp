// Batched artifact emission for the study runner (VERDICT r3 item 2).
//
// The reference emits per-image artifacts through OpenCV's imwrite + nlohmann
// (src/preprocess.cpp:121-134, src/process.cpp:234-239, src/mask2polygon.cpp)
// — measured at 7.6-19.7 ms per PNG through cv2 on a 1-core host, which walls
// the end-to-end study pipeline at ~1% of the chip's device-side rate.  This
// file makes the whole per-slice emit path ONE C call:
//
//   mask LUT -> contour trace -> size JSON -> mask/normalized PNGs ->
//   contour overlay -> scaled contour JSON
//
// with a from-scratch stored-deflate PNG encoder (compression level 0 — the
// reference's own choice, src/preprocess.cpp:122 — so encoding is just
// framing + CRC32/adler32, done here with slicing-by-8 at ~3 GB/s) and an
// 8-connected Bresenham contour overlay.  `utpu_emit_batch` fans the slices
// over OpenMP for multi-core hosts; artifact *tiers* let throughput-oriented
// callers pay only for what they keep.
//
// PNG bytes are valid, deterministic, and decode to the exact pixels the
// cv2-based engine path writes (tests decode-compare them); they are not
// byte-identical to libpng output — byte parity is contracted for the JSON
// artifacts (golden-tested), pixel parity for the images.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "unetseg_host.h"  // cross-TU prototypes, compiler-checked

namespace {

// ---------------------------------------------------------------------------
// Checksums
// ---------------------------------------------------------------------------

struct Crc8Tables {
  uint32_t t[8][256];
  Crc8Tables() {
    for (uint32_t i = 0; i < 256; ++i) {
      uint32_t c = i;
      for (int k = 0; k < 8; ++k) c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
      t[0][i] = c;
    }
    for (uint32_t i = 0; i < 256; ++i)
      for (int j = 1; j < 8; ++j)
        t[j][i] = (t[j - 1][i] >> 8) ^ t[0][t[j - 1][i] & 0xFF];
  }
};

uint32_t crc32_update(uint32_t crc, const uint8_t* p, size_t n) {
  static const Crc8Tables T;  // C++11 magic static: thread-safe init
  crc = ~crc;
  while (n >= 8) {
    const uint32_t lo = crc ^ (static_cast<uint32_t>(p[0]) |
                               static_cast<uint32_t>(p[1]) << 8 |
                               static_cast<uint32_t>(p[2]) << 16 |
                               static_cast<uint32_t>(p[3]) << 24);
    crc = T.t[7][lo & 0xFF] ^ T.t[6][(lo >> 8) & 0xFF] ^
          T.t[5][(lo >> 16) & 0xFF] ^ T.t[4][lo >> 24] ^
          T.t[3][p[4]] ^ T.t[2][p[5]] ^ T.t[1][p[6]] ^ T.t[0][p[7]];
    p += 8;
    n -= 8;
  }
  while (n--) crc = T.t[0][(crc ^ *p++) & 0xFF] ^ (crc >> 8);
  return ~crc;
}

uint32_t adler32(const uint8_t* p, size_t n) {
  uint32_t a = 1, b = 0;
  while (n) {
    size_t chunk = std::min<size_t>(n, 5552);  // zlib NMAX: defer the mods
    n -= chunk;
    while (chunk--) {
      a += *p++;
      b += a;
    }
    a %= 65521;
    b %= 65521;
  }
  return (b << 16) | a;
}

// ---------------------------------------------------------------------------
// PNG encoder (stored-deflate, the compression-0 contract)
// ---------------------------------------------------------------------------

void put_be32(std::string& s, uint32_t v) {
  s.push_back(static_cast<char>(v >> 24));
  s.push_back(static_cast<char>(v >> 16));
  s.push_back(static_cast<char>(v >> 8));
  s.push_back(static_cast<char>(v));
}

void put_chunk(std::string& out, const char type[4], const std::string& data) {
  put_be32(out, static_cast<uint32_t>(data.size()));
  const size_t start = out.size();
  out.append(type, 4);
  out += data;
  const uint32_t crc = crc32_update(
      0, reinterpret_cast<const uint8_t*>(out.data() + start),
      out.size() - start);
  put_be32(out, crc);
}

// img: row-major, `channels` = 1 (gray) or 3; `bgr` swaps ch 0/2 into the
// RGB order PNG mandates (cv2 images are BGR — parity with the engine path).
void png_encode(std::string& out, const uint8_t* img, int h, int w,
                int channels, bool bgr) {
  const size_t rowbytes = static_cast<size_t>(w) * channels;
  std::vector<uint8_t> raw(static_cast<size_t>(h) * (rowbytes + 1));
  for (int y = 0; y < h; ++y) {
    uint8_t* dst = raw.data() + static_cast<size_t>(y) * (rowbytes + 1);
    *dst++ = 0;  // filter: None
    const uint8_t* src = img + static_cast<size_t>(y) * rowbytes;
    if (channels == 3 && bgr) {
      for (int x = 0; x < w; ++x) {
        dst[3 * x] = src[3 * x + 2];
        dst[3 * x + 1] = src[3 * x + 1];
        dst[3 * x + 2] = src[3 * x];
      }
    } else {
      std::memcpy(dst, src, rowbytes);
    }
  }

  out.clear();
  out.reserve(raw.size() + raw.size() / 65535 * 5 + 128);
  out.append("\x89PNG\r\n\x1a\n", 8);

  std::string ihdr;
  put_be32(ihdr, static_cast<uint32_t>(w));
  put_be32(ihdr, static_cast<uint32_t>(h));
  ihdr.push_back(8);                          // bit depth
  ihdr.push_back(channels == 1 ? 0 : 2);      // color type: gray / truecolor
  ihdr.push_back(0);                          // compression
  ihdr.push_back(0);                          // filter method
  ihdr.push_back(0);                          // interlace
  put_chunk(out, "IHDR", ihdr);

  std::string idat;
  idat.reserve(raw.size() + raw.size() / 65535 * 5 + 16);
  idat.push_back('\x78');  // zlib CMF: deflate, 32K window
  idat.push_back('\x01');  // FLG: check bits, no dict, fastest
  size_t off = 0;
  do {  // do-while: zero-area input still gets its final (empty) stored
        // block — a bare zlib header with no BFINAL block is invalid
    const size_t len = std::min<size_t>(raw.size() - off, 65535);
    const bool last = off + len == raw.size();
    idat.push_back(last ? 1 : 0);  // BFINAL, BTYPE=00 (stored)
    idat.push_back(static_cast<char>(len & 0xFF));
    idat.push_back(static_cast<char>(len >> 8));
    idat.push_back(static_cast<char>(~len & 0xFF));
    idat.push_back(static_cast<char>((~len >> 8) & 0xFF));
    idat.append(reinterpret_cast<const char*>(raw.data()) + off, len);
    off += len;
  } while (off < raw.size());
  put_be32(idat, adler32(raw.data(), raw.size()));
  put_chunk(out, "IDAT", idat);
  put_chunk(out, "IEND", "");
}

bool write_file(const char* path, const void* data, size_t n) {
  std::FILE* f = std::fopen(path, "wb");
  if (!f) return false;
  const bool ok = std::fwrite(data, 1, n, f) == n;
  return std::fclose(f) == 0 && ok;
}

// ---------------------------------------------------------------------------
// Overlay: red 8-connected Bresenham polylines on the normalized image
// (parity with create_overlay_image, src/mask2polygon.cpp:114-129: BGR
// (0,0,255), thickness 1, unscaled 512-space coords, closed polygons)
// ---------------------------------------------------------------------------

void draw_line(uint8_t* bgr, int h, int w, int x0, int y0, int x1, int y1) {
  const int dx = std::abs(x1 - x0), dy = -std::abs(y1 - y0);
  const int sx = x0 < x1 ? 1 : -1, sy = y0 < y1 ? 1 : -1;
  int err = dx + dy;
  for (;;) {
    if (x0 >= 0 && x0 < w && y0 >= 0 && y0 < h) {
      uint8_t* p = bgr + (static_cast<size_t>(y0) * w + x0) * 3;
      p[0] = 0;
      p[1] = 0;
      p[2] = 255;
    }
    if (x0 == x1 && y0 == y1) break;
    const int e2 = 2 * err;
    if (e2 >= dy) {
      err += dy;
      x0 += sx;
    }
    if (e2 <= dx) {
      err += dx;
      y0 += sy;
    }
  }
}

std::string path_join(const char* dir, const char* base, const char* suffix) {
  std::string p(dir);
  if (!p.empty() && p.back() != '/') p.push_back('/');
  p += base;
  p += suffix;
  return p;
}

}  // namespace

extern "C" {

// UTPU_EMIT_* tier bits live in unetseg_host.h (single definition; the
// Python mirror is unetseg_tpu/io/native.py TIER_*).

// Write one slice's artifacts.  `clean_mask` holds class ids {0,1,2} (the
// cleaned mask); the 0/128/255 visualization LUT (src/process.cpp:178-185)
// is applied here.  Returns the contour count, or -1 on I/O failure.
// Reference parity: when no contours are found, the overlay and contour
// JSON are skipped (src/mask2polygon.cpp:183-188) but size JSON and PNGs
// are still written.
int utpu_emit_slice(const uint8_t* norm_u8, const uint8_t* clean_mask, int h,
                    int w, const char* out_dir, const char* base_name,
                    const char* src_filename, int orig_w, int orig_h,
                    int tier) {
  if (h <= 0 || w <= 0) return -1;  // zero-area PNGs are invalid per spec
  std::vector<uint8_t> vis(static_cast<size_t>(h) * w);
  static const uint8_t LUT[3] = {0, 128, 255};
  for (size_t i = 0; i < vis.size(); ++i)
    vis[i] = clean_mask[i] <= 2 ? LUT[clean_mask[i]] : 255;

  // The count is part of the return contract, so it is computed for EVERY
  // tier — a mask-only tier previously reported a fabricated 0 because
  // extraction was skipped (round-4 review finding).
  int32_t* points = nullptr;
  int32_t* offsets = nullptr;
  int32_t n_points = 0;
  int n_contours =
      utpu_extract_contours(vis.data(), h, w, &points, &offsets, &n_points);
  if (n_contours < 0) return -1;

  bool ok = true;
  std::string buf;

  if (tier & UTPU_EMIT_SIZE_JSON) {
    size_t len = 0;
    char* j = utpu_size_json(src_filename, orig_w, orig_h, w, h, &len);
    if (!j) ok = false;
    if (j) {
      ok = write_file(
               path_join(out_dir, base_name, "_original_sizes.json").c_str(),
               j, len) &&
           ok;
      utpu_free(j);
    }
  }

  if (ok && (tier & UTPU_EMIT_NORM_PNG)) {
    png_encode(buf, norm_u8, h, w, 1, false);
    ok = write_file(path_join(out_dir, base_name, "_normalized.png").c_str(),
                    buf.data(), buf.size());
  }

  if (ok && (tier & UTPU_EMIT_MASK_PNG)) {
    png_encode(buf, vis.data(), h, w, 1, false);
    ok = write_file(path_join(out_dir, base_name, "_mask.png").c_str(),
                    buf.data(), buf.size());
  }

  if (ok && (tier & UTPU_EMIT_OVERLAY_PNG) && n_contours > 0) {
    std::vector<uint8_t> bgr(static_cast<size_t>(h) * w * 3);
    for (size_t i = 0; i < static_cast<size_t>(h) * w; ++i) {
      bgr[3 * i] = norm_u8[i];
      bgr[3 * i + 1] = norm_u8[i];
      bgr[3 * i + 2] = norm_u8[i];
    }
    for (int c = 0; c < n_contours; ++c) {
      const int32_t b = offsets[c], e = offsets[c + 1];
      for (int32_t k = b; k < e; ++k) {
        const int32_t nk = (k + 1 < e) ? k + 1 : b;  // close the polygon
        draw_line(bgr.data(), h, w, points[2 * k], points[2 * k + 1],
                  points[2 * nk], points[2 * nk + 1]);
      }
    }
    png_encode(buf, bgr.data(), h, w, 3, true);
    ok = write_file(
        path_join(out_dir, base_name, "_contour_overlay.png").c_str(),
        buf.data(), buf.size());
  }

  if (ok && (tier & UTPU_EMIT_CONTOUR_JSON) && n_contours > 0) {
    size_t len = 0;
    char* j = utpu_contour_json(points, offsets, n_contours, base_name, orig_w,
                                orig_h, static_cast<double>(orig_w) / w,
                                static_cast<double>(orig_h) / h, &len);
    if (!j) ok = false;
    if (j) {
      ok = write_file(path_join(out_dir, base_name, ".json").c_str(), j,
                      len) &&
           ok;
      utpu_free(j);
    }
  }

  utpu_free(points);
  utpu_free(offsets);
  return ok ? n_contours : -1;
}

// Batched emit: slices (n, h, w); per-slice output dirs / base names / source
// filenames as NULL-terminated string arrays.  OpenMP fans slices over host
// cores.  out_n_contours (optional, length n) receives each slice's contour
// count (-1 on that slice's failure).  Returns the number of failed slices.
int utpu_emit_batch(const uint8_t* norm_u8, const uint8_t* clean_masks, int n,
                    int h, int w, const char* const* out_dirs,
                    const char* const* base_names,
                    const char* const* src_filenames, int orig_w, int orig_h,
                    int tier, int32_t* out_n_contours) {
  const size_t stride = static_cast<size_t>(h) * w;
  int failures = 0;
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic) reduction(+ : failures)
#endif
  for (int k = 0; k < n; ++k) {
    const int rc =
        utpu_emit_slice(norm_u8 + k * stride, clean_masks + k * stride, h, w,
                        out_dirs[k], base_names[k], src_filenames[k], orig_w,
                        orig_h, tier);
    if (out_n_contours) out_n_contours[k] = rc;
    if (rc < 0) ++failures;
  }
  return failures;
}

}  // extern "C"
