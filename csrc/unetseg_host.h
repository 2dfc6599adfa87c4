// Shared C API of libunetseg_host.so.
//
// Both translation units (contour.cpp, emit.cpp) include this header so the
// compiler checks every cross-TU signature: C linkage performs no type
// checking at link time, and emit.cpp previously hand-duplicated the
// contour.cpp prototypes — a silent-UB trap if a signature ever drifted
// (round-4 review finding).  Python binds these via ctypes
// (unetseg_tpu/io/native.py), which keeps its own argtypes in sync with
// THIS file.

#ifndef UNETSEG_HOST_H_
#define UNETSEG_HOST_H_

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

// ---- contour.cpp ----------------------------------------------------------

// cv::findContours(mask > 127, RETR_EXTERNAL, CHAIN_APPROX_SIMPLE) parity.
// Outputs are malloc'd; caller frees via utpu_free.  Returns the number of
// contours (>= 0) or -1 on allocation failure.
int utpu_extract_contours(const uint8_t* mask, int h, int w,
                          int32_t** out_points, int32_t** out_offsets,
                          int32_t* out_n_points);

void utpu_free(void* p);

// Bit-exact host preprocess (src/preprocess.cpp:96-118 double semantics).
void utpu_preprocess(const uint16_t* raw, int h, int w, int out_size,
                     uint8_t* out);

// labelme-style contour JSON, nlohmann byte parity
// (src/mask2polygon.cpp:68-109).
char* utpu_contour_json(const int32_t* points, const int32_t* offsets,
                        int n_contours, const char* base_name, int orig_w,
                        int orig_h, double scale_x, double scale_y,
                        size_t* out_len);

// Same with per-shape label / labelIndex fields (per-class artifact).
char* utpu_contour_json_labeled(const int32_t* points, const int32_t* offsets,
                                int n_contours, const int32_t* labels,
                                const int32_t* label_indices,
                                const char* base_name, int orig_w, int orig_h,
                                double scale_x, double scale_y,
                                size_t* out_len);

// Compact size JSON (src/preprocess.cpp:126-134 byte parity).
char* utpu_size_json(const char* filename, int orig_w, int orig_h,
                     int scaled_w, int scaled_h, size_t* out_len);

// Batched mask cleanup (src/postprocess.cpp:47-79 semantics); masks/out are
// (n, h, w) uint8.
void utpu_postprocess_batch(const uint8_t* masks, int n, int h, int w,
                            uint8_t* out);

// Same, from 2-bit-packed class masks (n, h, w/4).
void utpu_postprocess_packed_batch(const uint8_t* packed, int n, int h, int w,
                                   uint8_t* out);

// ---- emit.cpp -------------------------------------------------------------

// Artifact-selection bits for utpu_emit_slice / utpu_emit_batch; a tier is
// an OR of these (31 = the reference's full five-artifact set).  Python
// mirror: unetseg_tpu/io/native.py TIER_*.
enum {
  UTPU_EMIT_SIZE_JSON = 1,
  UTPU_EMIT_CONTOUR_JSON = 2,
  UTPU_EMIT_MASK_PNG = 4,
  UTPU_EMIT_NORM_PNG = 8,
  UTPU_EMIT_OVERLAY_PNG = 16,
  UTPU_EMIT_FULL = 31,
};

// Whole per-slice artifact set in one call; tier = OR of UTPU_EMIT_* bits.
// Returns the slice's contour count (>= 0; computed for every tier) on
// success, -1 on failure.  Reference parity: with zero contours the
// contour JSON and overlay are skipped (src/mask2polygon.cpp:183-188)
// while size JSON and PNGs are still written.
int utpu_emit_slice(const uint8_t* norm_u8, const uint8_t* clean_mask, int h,
                    int w, const char* out_dir, const char* base_name,
                    const char* src_filename, int orig_w, int orig_h,
                    int tier);

// Batched over OpenMP; returns the number of failed slices and fills
// out_n_contours with each slice's utpu_emit_slice result.
int utpu_emit_batch(const uint8_t* norm_u8, const uint8_t* clean_masks, int n,
                    int h, int w, const char* const* out_dirs,
                    const char* const* base_names,
                    const char* const* src_filenames, int orig_w, int orig_h,
                    int tier, int32_t* out_n_contours);

#ifdef __cplusplus
}  // extern "C"
#endif

#endif  // UNETSEG_HOST_H_
