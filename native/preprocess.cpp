// Native host-side image preprocessing for the data pipeline.
//
// The reference decodes and preprocesses word images one at a time in
// Python/cv2 inside dataloader workers (GAN_word/load_data.py:141-167) —
// the CPU-side bottleneck that starves the accelerator.  This library
// implements the hot host ops in C++ (OpenMP across a batch):
//
//   * preprocess_words: resize-to-height (bilinear, ceil width like the
//     reference's int(w*rate)+1), invert, crop-or-zero-pad width,
//     (x-0.5)/0.5 normalize — the exact load_data.py recipe;
//   * elastic_warp: gaussian-smoothed random displacement fields (the
//     marcal augmentor's dominant cost);
//   * affine_warp: rotation+shear resampling.
//
// Compiled via `python -m affganwriting_tpu.utils.native build` (setuptools-
// free: one g++ invocation) and loaded through ctypes; every entry point
// has a pure-numpy fallback so the pipeline never hard-depends on it.
//
// Exported C ABI only — no pybind11 (not in this image).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

extern "C" {

// Bilinear sample with clamp-to-edge, single channel float32.
static inline float sample(const float* img, int h, int w, float y, float x) {
  int y0 = (int)std::floor(y), x0 = (int)std::floor(x);
  float wy = y - y0, wx = x - x0;
  int y1 = y0 + 1, x1 = x0 + 1;
  y0 = std::max(0, std::min(h - 1, y0));
  y1 = std::max(0, std::min(h - 1, y1));
  x0 = std::max(0, std::min(w - 1, x0));
  x1 = std::max(0, std::min(w - 1, x1));
  float a = img[y0 * w + x0], b = img[y0 * w + x1];
  float c = img[y1 * w + x0], d = img[y1 * w + x1];
  return a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx +
         c * wy * (1 - wx) + d * wy * wx;
}

// Bilinear sample where out-of-bounds taps contribute `fill` (matches the
// numpy _sample_bilinear in data/augment.py, used by the warps).
static inline float sample_fill(const float* img, int h, int w, float y,
                                float x, float fill) {
  int y0 = (int)std::floor(y), x0 = (int)std::floor(x);
  float wy = y - y0, wx = x - x0;
  float acc = 0.0f;
  for (int dy = 0; dy < 2; ++dy)
    for (int dxi = 0; dxi < 2; ++dxi) {
      int yy = y0 + dy, xx = x0 + dxi;
      float wgt = (dy ? wy : 1 - wy) * (dxi ? wx : 1 - wx);
      bool valid = yy >= 0 && yy < h && xx >= 0 && xx < w;
      acc += wgt * (valid ? img[yy * w + xx] : fill);
    }
  return acc;
}

// One word image: (in_h, in_w) uint8 -> (out_h, out_w) float32 in [-1, 1].
// Resize to out_h preserving aspect (new_w = in_w*out_h/in_h + 1), invert,
// crop/zero-pad width, normalize.  Matches preprocess_word_image
// (affganwriting_tpu/data/words.py) == load_data.py:141-167.
void preprocess_word(const uint8_t* in, int in_h, int in_w,
                     float* out, int out_h, int out_w) {
  int new_w = (int)((float)in_w * out_h / in_h) + 1;
  std::vector<float> gray(in_h * in_w);
  for (int i = 0; i < in_h * in_w; ++i) gray[i] = in[i] / 255.0f;
  int cw = std::min(new_w, out_w);
  for (int y = 0; y < out_h; ++y) {
    float sy = (y + 0.5f) * in_h / out_h - 0.5f;
    for (int x = 0; x < out_w; ++x) {
      float v = 0.0f;  // zero background (already "inverted": 0 = no ink)
      if (x < cw) {
        float sx = (x + 0.5f) * in_w / new_w - 0.5f;
        v = 1.0f - sample(gray.data(), in_h, in_w, sy, sx);
      }
      out[y * out_w + x] = (v - 0.5f) / 0.5f;
    }
  }
}

// Batch variant over images with a shared input geometry.
void preprocess_words(const uint8_t* in, int n, int in_h, int in_w,
                      float* out, int out_h, int out_w) {
#pragma omp parallel for
  for (int i = 0; i < n; ++i) {
    preprocess_word(in + (size_t)i * in_h * in_w, in_h, in_w,
                    out + (size_t)i * out_h * out_w, out_h, out_w);
  }
}

// Separable gaussian blur, in place via temp buffer.
static void gaussian_blur(float* img, int h, int w, float sigma) {
  if (sigma <= 0) return;
  int radius = std::max(1, (int)(3 * sigma));
  std::vector<float> k(2 * radius + 1);
  float sum = 0;
  for (int i = -radius; i <= radius; ++i) {
    k[i + radius] = std::exp(-(float)(i * i) / (2 * sigma * sigma));
    sum += k[i + radius];
  }
  for (auto& v : k) v /= sum;
  std::vector<float> tmp(h * w);
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x) {
      float acc = 0;
      for (int i = -radius; i <= radius; ++i) {
        int xx = std::max(0, std::min(w - 1, x + i));
        acc += k[i + radius] * img[y * w + xx];
      }
      tmp[y * w + x] = acc;
    }
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x) {
      float acc = 0;
      for (int i = -radius; i <= radius; ++i) {
        int yy = std::max(0, std::min(h - 1, y + i));
        acc += k[i + radius] * tmp[yy * w + x];
      }
      img[y * w + x] = acc;
    }
}

// Elastic warp: displacement fields dx, dy are caller-provided uniform
// noise in [-1, 1] (so randomness stays keyed by the Python pipeline);
// this routine smooths them (sigma) and resamples with amplitude alpha.
void elastic_warp(const float* in, float* out, int h, int w,
                  float* dx, float* dy, float alpha, float sigma,
                  float fill) {
  gaussian_blur(dx, h, w, sigma);
  gaussian_blur(dy, h, w, sigma);
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x) {
      float sy = y + dy[y * w + x] * alpha;
      float sx = x + dx[y * w + x] * alpha;
      out[y * w + x] = sample_fill(in, h, w, sy, sx, fill);
    }
}

// Rotation (degrees) + shear about the image center.
void affine_warp(const float* in, float* out, int h, int w,
                 float degrees, float shear, float fill) {
  float th = degrees * 3.14159265358979f / 180.0f;
  float cy = h / 2.0f, cx = w / 2.0f;
  float c = std::cos(th), s = std::sin(th);
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x) {
      float ry = y - cy, rx = x - cx;
      float sy = c * ry - s * rx + cy;
      float sx = s * ry + c * rx + cx - shear * ry;
      out[y * w + x] = sample_fill(in, h, w, sy, sx, fill);
    }
}

}  // extern "C"
