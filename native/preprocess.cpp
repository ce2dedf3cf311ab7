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

// ---------------------------------------------------------------------------
// Line-pipeline host ops (round 2): Otsu foreground masks + mesh grid warp.
// Counterparts of line_generation's author_hw_dataset.py:200-229 fg-mask
// precompute and utils/grid_distortion.py warp, vectorized in C++ because
// the harness host has a single core (scipy versions dominate batch prep).
// ---------------------------------------------------------------------------

extern "C" {

// Otsu threshold + invert + 9x9 ellipse dilation.  img: [0,1] page
// (ink dark), out_mask: {0,1} float32, ink==1.
void otsu_fg_mask(const float* img, int h, int w, float* out_mask) {
  // 256-bin histogram
  double hist[256] = {0};
  const int n = h * w;
  for (int i = 0; i < n; ++i) {
    int b = (int)(img[i] * 255.0f + 0.5f);
    b = std::max(0, std::min(255, b));
    hist[b] += 1.0;
  }
  double total = n, sum_all = 0.0;
  for (int b = 0; b < 256; ++b) sum_all += hist[b] * ((b + 0.5) / 256.0);
  double w0 = 0.0, sum0 = 0.0, best = -1.0;
  int best_bin = 127;
  for (int b = 0; b < 256; ++b) {
    w0 += hist[b];
    sum0 += hist[b] * ((b + 0.5) / 256.0);
    double w1 = total - w0;
    if (w0 <= 0 || w1 <= 0) continue;
    double mu0 = sum0 / w0, mu1 = (sum_all - sum0) / w1;
    double between = w0 * w1 * (mu0 - mu1) * (mu0 - mu1);
    if (between > best) { best = between; best_bin = b; }
  }
  const float th = (best_bin + 1) / 256.0f;  // upper bin edge

  // binarize (ink = below threshold)
  std::vector<uint8_t> ink(n);
  for (int i = 0; i < n; ++i) ink[i] = img[i] < th ? 1 : 0;

  // 9x9 ellipse dilation via precomputed offsets
  static const int R = 4;
  int offs[128][2];
  int n_off = 0;
  for (int dy = -R; dy <= R; ++dy)
    for (int dx = -R; dx <= R; ++dx)
      if (dy * dy + dx * dx <= (R + 0.5) * (R + 0.5)) {
        offs[n_off][0] = dy; offs[n_off][1] = dx; ++n_off;
      }
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x) {
      float v = 0.0f;
      for (int k = 0; k < n_off; ++k) {
        int yy = y + offs[k][0], xx = x + offs[k][1];
        if (yy >= 0 && yy < h && xx >= 0 && xx < w && ink[yy * w + xx]) {
          v = 1.0f; break;
        }
      }
      out_mask[y * w + x] = v;
    }
}

// Batched variant, OpenMP over the batch.
void otsu_fg_mask_batch(const float* imgs, int b, int h, int w,
                        float* out_masks) {
#pragma omp parallel for schedule(dynamic)
  for (int i = 0; i < b; ++i)
    otsu_fg_mask(imgs + (size_t)i * h * w, h, w,
                 out_masks + (size_t)i * h * w);
}

// Mesh grid warp (grid_distortion.py semantics): per-node offsets (gh, gw)
// bilinearly upsampled to (h, w); out(y, x) = img(y + dy, x + dx) bilinear,
// cval outside.
void grid_warp(const float* img, int h, int w,
               const float* dy_nodes, const float* dx_nodes,
               int gh, int gw, float cval, float* out) {
  const float sy = (gh > 1) ? (float)(gh - 1) / (h - 1) : 0.0f;
  const float sx = (gw > 1) ? (float)(gw - 1) / (w - 1) : 0.0f;
  for (int y = 0; y < h; ++y) {
    float gy = y * sy;
    int g0 = (int)gy; int g1 = std::min(gh - 1, g0 + 1);
    float fy = gy - g0;
    for (int x = 0; x < w; ++x) {
      float gx = x * sx;
      int j0 = (int)gx; int j1 = std::min(gw - 1, j0 + 1);
      float fx = gx - j0;
      float dy = dy_nodes[g0 * gw + j0] * (1 - fy) * (1 - fx)
               + dy_nodes[g0 * gw + j1] * (1 - fy) * fx
               + dy_nodes[g1 * gw + j0] * fy * (1 - fx)
               + dy_nodes[g1 * gw + j1] * fy * fx;
      float dx = dx_nodes[g0 * gw + j0] * (1 - fy) * (1 - fx)
               + dx_nodes[g0 * gw + j1] * (1 - fy) * fx
               + dx_nodes[g1 * gw + j0] * fy * (1 - fx)
               + dx_nodes[g1 * gw + j1] * fy * fx;
      float ys = y + dy, xs = x + dx;
      if (ys < 0 || ys > h - 1 || xs < 0 || xs > w - 1) {
        out[y * w + x] = cval;
      } else {
        out[y * w + x] = sample(img, h, w, ys, xs);
      }
    }
  }
}

void grid_warp_batch(const float* imgs, int b, int h, int w,
                     const float* dy_nodes, const float* dx_nodes,
                     int gh, int gw, float cval, float* out) {
#pragma omp parallel for schedule(dynamic)
  for (int i = 0; i < b; ++i)
    grid_warp(imgs + (size_t)i * h * w, h, w,
              dy_nodes + (size_t)i * gh * gw, dx_nodes + (size_t)i * gh * gw,
              gh, gw, cval, out + (size_t)i * h * w);
}

}  // extern "C" (line ops)
