// Native host-side image preprocessing for the data loader.
//
// The reference's input pipeline runs through cv2 (C++) inside torch
// DataLoader workers (mmdet/datasets/pipelines/transforms.py Resize/
// Normalize/Pad).  This library provides the TPU build's native equivalent:
// one fused pass producing the padded float32 canvas the jitted model
// consumes — bilinear resize (pixel-center aligned, cv2 INTER_LINEAR
// convention), optional horizontal flip, BGR->RGB, mean/std normalisation,
// zero padding.  Fusing avoids three intermediate HxWx3 buffers per image,
// which matters on the 1-core hosts feeding the chips.
//
// Build: g++ -O3 -march=native -shared -fPIC preprocess.cc -o libpreprocess.so
// ABI: plain C, consumed via ctypes (no pybind11 in the image).

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// src: uint8 HxWx3 (BGR).  dst: float32 canvas_h x canvas_w x 3, zeroed by
// the callee outside the resized region.  Resized content is (new_h, new_w)
// placed at the top-left.  mean/std are per-channel in RGB order when
// to_rgb, else BGR.
void preprocess_image(
    const uint8_t* src, int src_h, int src_w,
    float* dst, int canvas_h, int canvas_w,
    int new_h, int new_w,
    const float* mean, const float* std_,
    int to_rgb, int flip) {
  const float scale_x = static_cast<float>(src_w) / new_w;
  const float scale_y = static_cast<float>(src_h) / new_h;
  float inv_std[3] = {1.f / std_[0], 1.f / std_[1], 1.f / std_[2]};

  // Zero the whole canvas first (padding).
  std::memset(dst, 0, sizeof(float) * canvas_h * canvas_w * 3);

  // Precompute x coordinates (shared across rows).
  int* x0s = new int[new_w];
  int* x1s = new int[new_w];
  float* lxs = new float[new_w];
  for (int ox = 0; ox < new_w; ++ox) {
    int sx = flip ? (new_w - 1 - ox) : ox;
    float fx = (sx + 0.5f) * scale_x - 0.5f;
    fx = std::max(0.f, std::min(fx, static_cast<float>(src_w - 1)));
    int x0 = static_cast<int>(fx);
    x0s[ox] = x0;
    x1s[ox] = std::min(x0 + 1, src_w - 1);
    lxs[ox] = fx - x0;
  }

  for (int oy = 0; oy < new_h; ++oy) {
    float fy = (oy + 0.5f) * scale_y - 0.5f;
    fy = std::max(0.f, std::min(fy, static_cast<float>(src_h - 1)));
    int y0 = static_cast<int>(fy);
    int y1 = std::min(y0 + 1, src_h - 1);
    float ly = fy - y0;
    const uint8_t* row0 = src + static_cast<int64_t>(y0) * src_w * 3;
    const uint8_t* row1 = src + static_cast<int64_t>(y1) * src_w * 3;
    float* out = dst + (static_cast<int64_t>(oy) * canvas_w) * 3;
    for (int ox = 0; ox < new_w; ++ox) {
      int x0 = x0s[ox] * 3, x1 = x1s[ox] * 3;
      float lx = lxs[ox];
      float w00 = (1 - ly) * (1 - lx), w01 = (1 - ly) * lx;
      float w10 = ly * (1 - lx), w11 = ly * lx;
      for (int c = 0; c < 3; ++c) {
        float v = w00 * row0[x0 + c] + w01 * row0[x1 + c] +
                  w10 * row1[x0 + c] + w11 * row1[x1 + c];
        // BGR source; write RGB when to_rgb.
        int oc = to_rgb ? (2 - c) : c;
        out[ox * 3 + oc] = (v - mean[oc]) * inv_std[oc];
      }
    }
  }
  delete[] x0s;
  delete[] x1s;
  delete[] lxs;
}

// Batched box transform: scale + optional hflip + clip, in place.
void transform_boxes(
    float* boxes, int n, float w_scale, float h_scale,
    int flip, int new_w, float clip_w, float clip_h) {
  for (int i = 0; i < n; ++i) {
    float x1 = boxes[i * 4 + 0] * w_scale;
    float y1 = boxes[i * 4 + 1] * h_scale;
    float x2 = boxes[i * 4 + 2] * w_scale;
    float y2 = boxes[i * 4 + 3] * h_scale;
    if (flip) {
      float nx1 = new_w - x2;
      float nx2 = new_w - x1;
      x1 = nx1;
      x2 = nx2;
    }
    boxes[i * 4 + 0] = std::max(0.f, std::min(x1, clip_w));
    boxes[i * 4 + 1] = std::max(0.f, std::min(y1, clip_h));
    boxes[i * 4 + 2] = std::max(0.f, std::min(x2, clip_w));
    boxes[i * 4 + 3] = std::max(0.f, std::min(y2, clip_h));
  }
}

}  // extern "C"
