// Native host-side data pipeline for vfidkr_tpu.
//
// The reference feeds its GPU from Python (scipy imread + numpy slicing in
// datasets/listdatasets.py:8-49, parallelised only by DataLoader workers).
// At TPU inference/training rates the Python per-sample work (crop, flips,
// uint8->f32/255 normalisation, NHWC batch assembly) becomes the bottleneck;
// this library implements that hot loop in C++ with OpenMP across the batch.
//
// Exported C ABI (used via ctypes from vfidkr_tpu.data.native):
//   vfidkr_augment_triplet_batch(...)  — reference-equivalent augmentation:
//     optional temporal swap (im1<->im3), crop at given offsets, horizontal /
//     vertical flips, normalise to [0,1] f32, write NHWC batches x0/x1/y.
//     Augmentation decisions are taken by the caller (Python RNG) so the
//     sampling distribution exactly matches the reference; this library does
//     the data movement.
//   vfidkr_u8_to_f32_batch(...)        — plain normalise/copy.

#include <cstdint>
#include <cstring>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct Aug {
  int32_t swap;      // temporal swap im1 <-> im3
  int32_t oy, ox;    // crop offset
  int32_t fliplr;
  int32_t flipud;
};

// Copy one HxWx3 uint8 crop into a float32 NHWC slot applying flips + /255.
inline void crop_norm(const uint8_t* src, int src_h, int src_w, int oy, int ox,
                      int ch, int cw, int fliplr, int flipud, float* dst) {
  (void)src_h;
  const float k = 255.0f;
  for (int y = 0; y < ch; ++y) {
    const int sy = flipud ? (oy + ch - 1 - y) : (oy + y);
    const uint8_t* row = src + (static_cast<int64_t>(sy) * src_w + ox) * 3;
    float* out_row = dst + static_cast<int64_t>(y) * cw * 3;
    if (!fliplr) {
      const int64_t n = static_cast<int64_t>(cw) * 3;
      for (int64_t i = 0; i < n; ++i) out_row[i] = row[i] / k;
    } else {
      for (int x = 0; x < cw; ++x) {
        const uint8_t* px = row + static_cast<int64_t>(cw - 1 - x) * 3;
        float* q = out_row + static_cast<int64_t>(x) * 3;
        q[0] = px[0] / k;
        q[1] = px[1] / k;
        q[2] = px[2] / k;
      }
    }
  }
}

}  // namespace

extern "C" {

// im1/im2/im3: n contiguous HxWx3 uint8 frames (first/mid/last).
// aug: n records of {swap, oy, ox, fliplr, flipud} (int32 x5).
// x0/x1/y: n * crop_h * crop_w * 3 float32 NHWC outputs
//          (x0 = first, x1 = last, y = mid — train.py's (X0, X1, y)).
void vfidkr_augment_triplet_batch(const uint8_t* im1, const uint8_t* im2,
                                  const uint8_t* im3, int32_t n, int32_t h,
                                  int32_t w, int32_t crop_h, int32_t crop_w,
                                  const int32_t* aug, float* x0, float* x1,
                                  float* y) {
  const int64_t in_stride = static_cast<int64_t>(h) * w * 3;
  const int64_t out_stride = static_cast<int64_t>(crop_h) * crop_w * 3;
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int32_t i = 0; i < n; ++i) {
    const Aug a = *reinterpret_cast<const Aug*>(aug + i * 5);
    const uint8_t* first = (a.swap ? im3 : im1) + i * in_stride;
    const uint8_t* last = (a.swap ? im1 : im3) + i * in_stride;
    const uint8_t* mid = im2 + i * in_stride;
    crop_norm(first, h, w, a.oy, a.ox, crop_h, crop_w, a.fliplr, a.flipud,
              x0 + i * out_stride);
    crop_norm(last, h, w, a.oy, a.ox, crop_h, crop_w, a.fliplr, a.flipud,
              x1 + i * out_stride);
    crop_norm(mid, h, w, a.oy, a.ox, crop_h, crop_w, a.fliplr, a.flipud,
              y + i * out_stride);
  }
}

void vfidkr_u8_to_f32_batch(const uint8_t* src, int64_t count, float* dst) {
  const float k = 255.0f;
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int64_t i = 0; i < count; ++i) dst[i] = src[i] / k;
}

int32_t vfidkr_native_version() { return 1; }

}  // extern "C"
