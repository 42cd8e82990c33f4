// Native batch assembly for the hot dataset path (ImageNet 32/64 pickles).
//
// The reference gets its data-plane parallelism from the torch DataLoader's
// C++ worker pool (dataset/imagenet_pickle.py consumed via
// pl_datamodule/dm.py); the TPU rebuild's equivalent is this module: the
// per-sample Python work (CHW->HWC transpose + uint8->f32 [-1,1] normalize
// + batch collate) becomes one C++ call per batch, OpenMP-parallel over
// samples, called from the loader's producer thread (ctypes releases the
// GIL for the duration, so batch assembly genuinely overlaps the train
// step's Python dispatch).
//
// Semantics are BITWISE identical to the Python path
// (data/imagenet_pickle.py __getitem__): out_f32 = (v/255)*2-1 evaluated
// in f32 in the same operation order.

#include <cstdint>
#include <cstring>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// data: [N, 3*S*S] uint8, C-order CHW per row (the Chrabaszcz pickle
// layout).  idx: [B] int64 row ids.  out_f32: [B,S,S,3] float32 [-1,1];
// out_u8: [B,S,S,3] uint8 (the img4unsup copy) or nullptr.
void gather_chw_to_nhwc(const uint8_t* data, const int64_t* idx,
                        int64_t b, int64_t s,
                        float* out_f32, uint8_t* out_u8) {
  const int64_t plane = s * s;
  const int64_t row = 3 * plane;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < b; ++i) {
    const uint8_t* src = data + idx[i] * row;
    float* dst_f = out_f32 + i * row;
    uint8_t* dst_u = out_u8 ? out_u8 + i * row : nullptr;
    for (int64_t p = 0; p < plane; ++p) {
      const uint8_t r = src[p];
      const uint8_t g = src[plane + p];
      const uint8_t bch = src[2 * plane + p];
      float* f = dst_f + 3 * p;
      f[0] = ((float)r / 255.0f) * 2.0f - 1.0f;
      f[1] = ((float)g / 255.0f) * 2.0f - 1.0f;
      f[2] = ((float)bch / 255.0f) * 2.0f - 1.0f;
      if (dst_u) {
        uint8_t* u = dst_u + 3 * p;
        u[0] = r; u[1] = g; u[2] = bch;
      }
    }
  }
}

// Same gather for rows that are ALREADY HWC uint8 (h5-packed in64):
// data [N, S*S*3] -> out_f32 [B,S,S,3] (+ optional raw copy).
void gather_hwc_to_nhwc(const uint8_t* data, const int64_t* idx,
                        int64_t b, int64_t s,
                        float* out_f32, uint8_t* out_u8) {
  const int64_t row = 3 * s * s;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < b; ++i) {
    const uint8_t* src = data + idx[i] * row;
    float* dst_f = out_f32 + i * row;
    for (int64_t p = 0; p < row; ++p)
      dst_f[p] = ((float)src[p] / 255.0f) * 2.0f - 1.0f;
    if (out_u8) std::memcpy(out_u8 + i * row, src, (size_t)row);
  }
}

// Generic f32 row gather (condition vectors, features): rows [N, D].
void gather_rows_f32(const float* rows, const int64_t* idx,
                     int64_t b, int64_t d, float* out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < b; ++i)
    std::memcpy(out + i * d, rows + idx[i] * d, sizeof(float) * (size_t)d);
}

// int64 value gather (labels / cluster ids): vals [N] -> out [B].
void gather_vals_i64(const int64_t* vals, const int64_t* idx,
                     int64_t b, int64_t* out) {
  for (int64_t i = 0; i < b; ++i) out[i] = vals[idx[i]];
}

}  // extern "C"
