// Native data-path kernels for the uni_encoder_tpu runtime.
//
// Role: the host-side hot loops around the TPU compute path — fused image
// normalize+pad, torch-semantics bilinear resize, panoptic id decoding and
// confusion-matrix accumulation — implemented in C++ with a thread pool.
// (The reference's native layer is its CUDA MSDeformAttn op + torch's C++
// dataloader machinery; the TPU equivalents are the Pallas/XLA kernels for
// compute and this library for the runtime IO path.)
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread
// Exposed via ctypes (uni_encoder_tpu/native/__init__.py).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// simple static-partition parallel-for over rows
template <typename F>
void parallel_rows(int64_t n, F&& fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int64_t n_threads = std::max<int64_t>(1, std::min<int64_t>(hw ? hw : 4, n));
  if (n_threads == 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int64_t t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back([=, &fn]() { fn(lo, hi); });
  }
  for (auto& th : threads) th.join();
}

inline float src_coord(int64_t dst, double scale, bool align, int64_t in, int64_t out) {
  if (align) return out == 1 ? 0.f : float(dst * double(in - 1) / double(out - 1));
  double s = (double(dst) + 0.5) * scale - 0.5;
  return float(std::max(0.0, s));
}

}  // namespace

extern "C" {

// torch-semantics bilinear resize, uint8 HWC -> uint8 HWC
void resize_bilinear_u8(const uint8_t* src, int64_t h, int64_t w, int64_t c,
                        uint8_t* dst, int64_t oh, int64_t ow, int align_corners) {
  double sy = double(h) / double(oh), sx = double(w) / double(ow);
  std::vector<int64_t> x0(ow), x1(ow);
  std::vector<float> wx(ow);
  for (int64_t j = 0; j < ow; ++j) {
    float fx = src_coord(j, sx, align_corners, w, ow);
    int64_t xi = int64_t(std::floor(fx));
    x0[j] = std::clamp<int64_t>(xi, 0, w - 1);
    x1[j] = std::min<int64_t>(x0[j] + 1, w - 1);
    wx[j] = fx - float(x0[j]);
  }
  parallel_rows(oh, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      float fy = src_coord(i, sy, align_corners, h, oh);
      int64_t y0 = std::clamp<int64_t>(int64_t(std::floor(fy)), 0, h - 1);
      int64_t y1 = std::min<int64_t>(y0 + 1, h - 1);
      float dy = fy - float(y0);
      const uint8_t* r0 = src + y0 * w * c;
      const uint8_t* r1 = src + y1 * w * c;
      uint8_t* out = dst + i * ow * c;
      for (int64_t j = 0; j < ow; ++j) {
        float dx = wx[j];
        const uint8_t* p00 = r0 + x0[j] * c;
        const uint8_t* p01 = r0 + x1[j] * c;
        const uint8_t* p10 = r1 + x0[j] * c;
        const uint8_t* p11 = r1 + x1[j] * c;
        for (int64_t k = 0; k < c; ++k) {
          float v = (1 - dy) * ((1 - dx) * p00[k] + dx * p01[k]) +
                    dy * ((1 - dx) * p10[k] + dx * p11[k]);
          out[j * c + k] = uint8_t(std::lround(std::clamp(v, 0.f, 255.f)));
        }
      }
    }
  });
}

// fused (x - mean) / std normalize + zero-pad to (ph, pw), uint8 HWC -> f32
void normalize_pad_f32(const uint8_t* src, int64_t h, int64_t w,
                       const float* mean, const float* stdv,
                       float* dst, int64_t ph, int64_t pw) {
  float inv[3] = {1.f / stdv[0], 1.f / stdv[1], 1.f / stdv[2]};
  parallel_rows(ph, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      float* out = dst + i * pw * 3;
      if (i >= h) {
        std::memset(out, 0, sizeof(float) * pw * 3);
        continue;
      }
      const uint8_t* in = src + i * w * 3;
      for (int64_t j = 0; j < w; ++j)
        for (int64_t k = 0; k < 3; ++k)
          out[j * 3 + k] = (float(in[j * 3 + k]) - mean[k]) * inv[k];
      if (w < pw) std::memset(out + w * 3, 0, sizeof(float) * (pw - w) * 3);
    }
  });
}

// panoptic PNG RGB -> int32 ids (R + 256 G + 65536 B)
void decode_panoptic_ids(const uint8_t* rgb, int64_t n, int32_t* ids) {
  parallel_rows(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i)
      ids[i] = int32_t(rgb[i * 3]) + 256 * int32_t(rgb[i * 3 + 1]) +
               65536 * int32_t(rgb[i * 3 + 2]);
  });
}

// confusion-matrix accumulation for mIoU: mat[gt * k + pred] += 1
void accumulate_confusion(const uint8_t* gt, const uint8_t* pred, int64_t n,
                          int64_t num_classes, int64_t ignore_label, int64_t* mat) {
  unsigned hw = std::thread::hardware_concurrency();
  int64_t n_threads = std::max<int64_t>(1, std::min<int64_t>(hw ? hw : 4, 8));
  std::vector<std::vector<int64_t>> partial(n_threads,
                                            std::vector<int64_t>(num_classes * num_classes, 0));
  std::vector<std::thread> threads;
  int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int64_t t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back([&, t, lo, hi]() {
      auto& m = partial[t];
      for (int64_t i = lo; i < hi; ++i) {
        int64_t g = gt[i];
        if (g == ignore_label || g >= num_classes) continue;
        int64_t p = std::min<int64_t>(pred[i], num_classes - 1);
        m[g * num_classes + p]++;
      }
    });
  }
  for (auto& th : threads) th.join();
  for (auto& m : partial)
    for (int64_t i = 0; i < num_classes * num_classes; ++i) mat[i] += m[i];
}

}  // extern "C"
