// Host-side data-path runtime for mirror_nerf_tpu.
//
// The reference keeps its native layer in CUDA extensions
// (models/gridencoder, models/shencoder); on TPU the device compute moved to
// XLA/Pallas, so the native layer lives where native code still pays off:
// the host data pipeline that builds and feeds the flat ray buffers
// (the torch version does this in Python per frame, datasets/blender.py:159).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in the image).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libmnerf_native.so raygen.cpp -lpthread

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

int clamp_threads(int n) {
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  if (hw <= 0) hw = 4;
  if (n <= 0 || n > hw) n = hw;
  return n;
}

// Run fn(start, end) over [0, total) split across threads.
template <typename F>
void parallel_for(int64_t total, int n_threads, F fn) {
  n_threads = clamp_threads(n_threads);
  if (total < 4096 || n_threads == 1) {
    fn(0, total);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (total + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t s = t * chunk;
    int64_t e = std::min<int64_t>(s + chunk, total);
    if (s >= e) break;
    threads.emplace_back([=] { fn(s, e); });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Generate the (H*W, 8) = [o, d, near, far] ray buffer for one pinhole view.
// Camera convention matches the renderer: x right, y up, looking down -z,
// no half-pixel offset. c2w is row-major (3, 4).
void mn_generate_rays(const float* c2w, int H, int W, float focal, float near,
                      float far, float* out, int n_threads) {
  const float r00 = c2w[0], r01 = c2w[1], r02 = c2w[2], tx = c2w[3];
  const float r10 = c2w[4], r11 = c2w[5], r12 = c2w[6], ty = c2w[7];
  const float r20 = c2w[8], r21 = c2w[9], r22 = c2w[10], tz = c2w[11];
  const float inv_f = 1.0f / focal;
  const float half_w = W * 0.5f, half_h = H * 0.5f;

  parallel_for(static_cast<int64_t>(H) * W, n_threads,
               [&](int64_t s, int64_t e) {
    for (int64_t p = s; p < e; ++p) {
      const int j = static_cast<int>(p / W);
      const int i = static_cast<int>(p % W);
      const float cx = (i - half_w) * inv_f;
      const float cy = -(j - half_h) * inv_f;
      const float cz = -1.0f;
      float dx = cx * r00 + cy * r01 + cz * r02;
      float dy = cx * r10 + cy * r11 + cz * r12;
      float dz = cx * r20 + cy * r21 + cz * r22;
      const float inv_n = 1.0f / std::sqrt(dx * dx + dy * dy + dz * dz);
      float* row = out + p * 8;
      row[0] = tx;
      row[1] = ty;
      row[2] = tz;
      row[3] = dx * inv_n;
      row[4] = dy * inv_n;
      row[5] = dz * inv_n;
      row[6] = near;
      row[7] = far;
    }
  });
}

// Gather a training batch (rays 8ch, rgbs 3ch, masks 1ch) by index.
void mn_gather_batch(const float* rays, const float* rgbs, const float* masks,
                     const int64_t* idx, int64_t k, float* out_rays,
                     float* out_rgbs, float* out_masks, int n_threads) {
  parallel_for(k, n_threads, [&](int64_t s, int64_t e) {
    for (int64_t p = s; p < e; ++p) {
      const int64_t src = idx[p];
      std::memcpy(out_rays + p * 8, rays + src * 8, 8 * sizeof(float));
      std::memcpy(out_rgbs + p * 3, rgbs + src * 3, 3 * sizeof(float));
      out_masks[p] = masks[src];
    }
  });
}

// White-blend (n, 4) uint8 RGBA into (n, 3) float rgb in [0,1] + valid mask.
void mn_blend_rgba(const uint8_t* img, int64_t n, float* rgb, uint8_t* valid,
                   int n_threads) {
  constexpr float kInv = 1.0f / 255.0f;
  parallel_for(n, n_threads, [&](int64_t s, int64_t e) {
    for (int64_t p = s; p < e; ++p) {
      const uint8_t* px = img + p * 4;
      const float a = px[3] * kInv;
      rgb[p * 3 + 0] = px[0] * kInv * a + (1.0f - a);
      rgb[p * 3 + 1] = px[1] * kInv * a + (1.0f - a);
      rgb[p * 3 + 2] = px[2] * kInv * a + (1.0f - a);
      valid[p] = px[3] > 0 ? 1 : 0;
    }
  });
}

// Fisher-Yates shuffle of an int64 index array (xorshift128+ RNG).
void mn_shuffle_indices(int64_t* idx, int64_t n, uint64_t seed) {
  uint64_t s0 = seed ^ 0x9E3779B97F4A7C15ULL;
  uint64_t s1 = (seed << 1) | 1;
  auto next = [&]() {
    uint64_t x = s0, y = s1;
    s0 = y;
    x ^= x << 23;
    s1 = x ^ y ^ (x >> 17) ^ (y >> 26);
    return s1 + y;
  };
  for (int64_t i = n - 1; i > 0; --i) {
    int64_t j = static_cast<int64_t>(next() % static_cast<uint64_t>(i + 1));
    int64_t tmp = idx[i];
    idx[i] = idx[j];
    idx[j] = tmp;
  }
}

}  // extern "C"
