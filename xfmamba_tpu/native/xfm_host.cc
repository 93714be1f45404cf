// Native host-side data-path kernels for the xfmamba-tpu input pipeline.
//
// The reference delegates its host hot loop to torch DataLoader workers +
// PIL; here the per-batch inner ops (uint8 -> float32 normalize/pack and
// bilinear resize) are plain C++ compiled with -O3 -march=native, released
// from the GIL via ctypes so the loader's thread pool scales across cores.
//
// Build: g++ -O3 -march=native -shared -fPIC -o xfm_host.so xfm_host.cc -lpthread
// (done automatically on first import by xfmamba_tpu.native)

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>
#include <algorithm>

extern "C" {

// dst = (src/255 - mean) / std, elementwise over n values.
void normalize_u8_f32(const uint8_t* src, float* dst, int64_t n,
                      float mean, float stdv) {
  const float scale = 1.0f / (255.0f * stdv);
  const float shift = -mean / stdv;
  int64_t i = 0;
  for (; i + 8 <= n; i += 8) {  // let the autovectorizer work on blocks
    for (int j = 0; j < 8; ++j)
      dst[i + j] = (float)src[i + j] * scale + shift;
  }
  for (; i < n; ++i) dst[i] = (float)src[i] * scale + shift;
}

// Multi-threaded batch variant: `bs` images of `n` elements each, laid out
// contiguously; splits images across `threads` workers.
void normalize_u8_f32_batch(const uint8_t* src, float* dst, int64_t bs,
                            int64_t n, float mean, float stdv,
                            int threads) {
  threads = std::max(1, std::min<int>(threads, (int)bs));
  std::vector<std::thread> pool;
  int64_t per = (bs + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    int64_t lo = t * per, hi = std::min<int64_t>(bs, lo + per);
    if (lo >= hi) break;
    pool.emplace_back([=]() {
      for (int64_t b = lo; b < hi; ++b)
        normalize_u8_f32(src + b * n, dst + b * n, n, mean, stdv);
    });
  }
  for (auto& th : pool) th.join();
}

// Bilinear resize float32 (H, W) -> (OH, OW), align_corners=false
// (cv2.INTER_LINEAR semantics).
void resize_bilinear_f32(const float* src, int h, int w, float* dst,
                         int oh, int ow) {
  const float sy = (float)h / (float)oh;
  const float sx = (float)w / (float)ow;
  for (int oy = 0; oy < oh; ++oy) {
    float fy = ((float)oy + 0.5f) * sy - 0.5f;
    int y0 = (int)fy;
    if (fy < 0) { fy = 0; y0 = 0; }
    int y1 = std::min(y0 + 1, h - 1);
    float wy = fy - (float)y0;
    const float* r0 = src + (int64_t)y0 * w;
    const float* r1 = src + (int64_t)y1 * w;
    float* out = dst + (int64_t)oy * ow;
    for (int ox = 0; ox < ow; ++ox) {
      float fx = ((float)ox + 0.5f) * sx - 0.5f;
      int x0 = (int)fx;
      if (fx < 0) { fx = 0; x0 = 0; }
      int x1 = std::min(x0 + 1, w - 1);
      float wx = fx - (float)x0;
      float top = r0[x0] * (1.0f - wx) + r0[x1] * wx;
      float bot = r1[x0] * (1.0f - wx) + r1[x1] * wx;
      out[ox] = top * (1.0f - wy) + bot * wy;
    }
  }
}

}  // extern "C"
