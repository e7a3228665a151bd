// lpi_native: host-side native runtime pieces for the TPU framework.
//
// The reference keeps its native code in CUDA detection kernels
// (grounding/maskrcnn_benchmark/csrc); on TPU those live as XLA/Pallas
// programs (lpi_tpu/ops). What remains genuinely host-side — and hot — is
// the input pipeline and small CPU post-processing, implemented here and
// bound via ctypes (lpi_tpu/native.py):
//
//   * bilinear resize + crop + ImageNet normalization (uint8 HWC ->
//     float32 HWC), the per-sample decode-path cost of every train step;
//   * greedy NMS / class-aware NMS / soft-NMS on host (golden reference
//     for the XLA kernels and fast small-batch post-processing);
//   * ROIAlign forward (golden reference).
//
// All entry points are plain C, operate on caller-owned buffers, and hold
// no global state, so Python threads can run them concurrently (ctypes
// releases the GIL).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Image preprocessing
// ---------------------------------------------------------------------------

// Bilinear-resize src (uint8, HWC, sh x sw x 3) into dst (float32, HWC,
// dh x dw x 3), then normalize with per-channel mean/std (0..1 scale).
void resize_bilinear_normalize(const uint8_t* src, int sh, int sw,
                               float* dst, int dh, int dw,
                               const float* mean, const float* std_) {
  const float scale_y = static_cast<float>(sh) / dh;
  const float scale_x = static_cast<float>(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * scale_y - 0.5f;
    int y0 = static_cast<int>(std::floor(fy));
    float ly = fy - y0;
    int y1 = std::min(y0 + 1, sh - 1);
    y0 = std::max(y0, 0);
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * scale_x - 0.5f;
      int x0 = static_cast<int>(std::floor(fx));
      float lx = fx - x0;
      int x1 = std::min(x0 + 1, sw - 1);
      x0 = std::max(x0, 0);
      for (int c = 0; c < 3; ++c) {
        float v00 = src[(y0 * sw + x0) * 3 + c];
        float v01 = src[(y0 * sw + x1) * 3 + c];
        float v10 = src[(y1 * sw + x0) * 3 + c];
        float v11 = src[(y1 * sw + x1) * 3 + c];
        float top = v00 * (1 - lx) + v01 * lx;
        float bot = v10 * (1 - lx) + v11 * lx;
        float v = (top * (1 - ly) + bot * ly) / 255.0f;
        dst[(y * dw + x) * 3 + c] = (v - mean[c]) / std_[c];
      }
    }
  }
}

// Center-crop (float32 HWC) from (sh, sw) to (ch, cw).
void center_crop(const float* src, int sh, int sw, float* dst, int ch, int cw) {
  int oy = (sh - ch) / 2;
  int ox = (sw - cw) / 2;
  for (int y = 0; y < ch; ++y) {
    std::memcpy(dst + y * cw * 3, src + ((y + oy) * sw + ox) * 3,
                sizeof(float) * cw * 3);
  }
}

// ---------------------------------------------------------------------------
// NMS family (boxes: [n, 4] xyxy; scores: [n])
// ---------------------------------------------------------------------------

static inline float iou(const float* a, const float* b) {
  float ix = std::max(0.0f, std::min(a[2], b[2]) - std::max(a[0], b[0]));
  float iy = std::max(0.0f, std::min(a[3], b[3]) - std::max(a[1], b[1]));
  float inter = ix * iy;
  float area_a = std::max(0.0f, a[2] - a[0]) * std::max(0.0f, a[3] - a[1]);
  float area_b = std::max(0.0f, b[2] - b[0]) * std::max(0.0f, b[3] - b[1]);
  float uni = area_a + area_b - inter;
  return uni > 0 ? inter / uni : 0.0f;
}

// Greedy NMS; writes kept indices (score-descending) into keep_out and
// returns the number kept.
int nms(const float* boxes, const float* scores, int n, float iou_threshold,
        int* keep_out) {
  std::vector<int> order(n);
  for (int i = 0; i < n; ++i) order[i] = i;
  std::sort(order.begin(), order.end(),
            [&](int a, int b) { return scores[a] > scores[b]; });
  std::vector<char> suppressed(n, 0);
  int kept = 0;
  for (int oi = 0; oi < n; ++oi) {
    int i = order[oi];
    if (suppressed[i] || !std::isfinite(scores[i])) continue;
    keep_out[kept++] = i;
    for (int oj = oi + 1; oj < n; ++oj) {
      int j = order[oj];
      if (!suppressed[j] && iou(boxes + 4 * i, boxes + 4 * j) > iou_threshold)
        suppressed[j] = 1;
    }
  }
  return kept;
}

// Class-aware NMS (suppression only within equal labels).
int ml_nms(const float* boxes, const float* scores, const int* labels, int n,
           float iou_threshold, int* keep_out) {
  std::vector<int> order(n);
  for (int i = 0; i < n; ++i) order[i] = i;
  std::sort(order.begin(), order.end(),
            [&](int a, int b) { return scores[a] > scores[b]; });
  std::vector<char> suppressed(n, 0);
  int kept = 0;
  for (int oi = 0; oi < n; ++oi) {
    int i = order[oi];
    if (suppressed[i] || !std::isfinite(scores[i])) continue;
    keep_out[kept++] = i;
    for (int oj = oi + 1; oj < n; ++oj) {
      int j = order[oj];
      if (!suppressed[j] && labels[i] == labels[j] &&
          iou(boxes + 4 * i, boxes + 4 * j) > iou_threshold)
        suppressed[j] = 1;
    }
  }
  return kept;
}

// Soft-NMS (gaussian decay); updates scores in-place, returns count above
// score_threshold.
int soft_nms(const float* boxes, float* scores, int n, float sigma,
             float score_threshold) {
  std::vector<char> done(n, 0);
  int kept = 0;
  for (int it = 0; it < n; ++it) {
    int best = -1;
    float best_s = score_threshold;
    for (int i = 0; i < n; ++i)
      if (!done[i] && scores[i] > best_s) { best = i; best_s = scores[i]; }
    if (best < 0) break;
    done[best] = 1;
    ++kept;
    for (int j = 0; j < n; ++j) {
      if (done[j]) continue;
      float v = iou(boxes + 4 * best, boxes + 4 * j);
      scores[j] *= std::exp(-(v * v) / sigma);
    }
  }
  return kept;
}

// ---------------------------------------------------------------------------
// ROIAlign forward (golden reference; features float32 HWC)
// ---------------------------------------------------------------------------

void roi_align_forward(const float* features, int h, int w, int c,
                       const float* roi /* x1,y1,x2,y2 */, float spatial_scale,
                       int out_size, int sampling_ratio, float* out) {
  float x1 = roi[0] * spatial_scale, y1 = roi[1] * spatial_scale;
  float x2 = roi[2] * spatial_scale, y2 = roi[3] * spatial_scale;
  float rw = std::max(x2 - x1, 1.0f), rh = std::max(y2 - y1, 1.0f);
  float bin_h = rh / out_size, bin_w = rw / out_size;
  int s = sampling_ratio;
  for (int py = 0; py < out_size; ++py) {
    for (int px = 0; px < out_size; ++px) {
      for (int ch = 0; ch < c; ++ch) out[(py * out_size + px) * c + ch] = 0.0f;
      for (int iy = 0; iy < s; ++iy) {
        float yy = y1 + py * bin_h + (iy + 0.5f) * bin_h / s;
        for (int ix = 0; ix < s; ++ix) {
          float xx = x1 + px * bin_w + (ix + 0.5f) * bin_w / s;
          if (yy <= -1.0f || yy >= h || xx <= -1.0f || xx >= w) continue;
          float cy = std::min(std::max(yy, 0.0f), h - 1.0f);
          float cx = std::min(std::max(xx, 0.0f), w - 1.0f);
          int y0 = static_cast<int>(cy), x0 = static_cast<int>(cx);
          int y1i = std::min(y0 + 1, h - 1), x1i = std::min(x0 + 1, w - 1);
          float ly = cy - y0, lx = cx - x0;
          for (int ch = 0; ch < c; ++ch) {
            float v00 = features[(y0 * w + x0) * c + ch];
            float v01 = features[(y0 * w + x1i) * c + ch];
            float v10 = features[(y1i * w + x0) * c + ch];
            float v11 = features[(y1i * w + x1i) * c + ch];
            float v = v00 * (1 - ly) * (1 - lx) + v01 * (1 - ly) * lx +
                      v10 * ly * (1 - lx) + v11 * ly * lx;
            out[(py * out_size + px) * c + ch] += v / (s * s);
          }
        }
      }
    }
  }
}

}  // extern "C"
