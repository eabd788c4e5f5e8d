// Exact anisotropic Euclidean distance transform (squared), 3D.
//
// Felzenszwalb & Huttenlocher separable lower-envelope algorithm with
// per-axis spacing weights; distance of each foreground voxel to the
// nearest background voxel (volume boundary counts as background, the
// same convention kimimaro uses for its DBF).

#include <algorithm>
#include <cstdint>
#include <limits>
#include <vector>

#include "common.hpp"

namespace {

constexpr float kInf = std::numeric_limits<float>::max() / 4;

// 1D squared-distance transform with spacing w: out[i] =
// min_j (f[j] + w^2 (i-j)^2). In-place over a strided row.
void dt1d(float* f, int64_t n, int64_t stride, float w,
          std::vector<float>& z, std::vector<int64_t>& v,
          std::vector<float>& scratch) {
  const float w2 = w * w;
  v.assign(n, 0);
  z.assign(n + 1, 0.0f);
  scratch.resize(n);
  for (int64_t i = 0; i < n; ++i) scratch[i] = f[i * stride];

  int64_t k = 0;
  v[0] = 0;
  z[0] = -kInf;
  z[1] = kInf;
  for (int64_t q = 1; q < n; ++q) {
    float s;
    while (true) {
      const int64_t p = v[k];
      s = (scratch[q] + w2 * q * q - (scratch[p] + w2 * p * p)) /
          (2 * w2 * (q - p));
      if (s > z[k]) break;
      --k;
    }
    ++k;
    v[k] = q;
    z[k] = s;
    z[k + 1] = kInf;
  }
  k = 0;
  for (int64_t q = 0; q < n; ++q) {
    while (z[k + 1] < q) ++k;
    const int64_t p = v[k];
    f[q * stride] = w2 * (q - p) * (q - p) + scratch[p];
  }
}

}  // namespace

namespace exa {

// mask: 1 = foreground. out: squared physical distance to nearest
// background voxel center (border treated as background at distance of
// one spacing unit beyond the edge).
void edt_sq(const uint8_t* mask, int64_t D, int64_t H, int64_t W,
            float wz, float wy, float wx, float* out) {
  const int64_t N = D * H * W;
  // Initialize: 0 at background, +inf at foreground; border handled by
  // seeding a virtual background plane one step outside (realized by
  // clamping after the axis passes).
  for (int64_t i = 0; i < N; ++i) out[i] = mask[i] ? kInf : 0.0f;

  std::vector<float> z;
  std::vector<int64_t> v;
  std::vector<float> scratch;

  // Pass along x (stride 1), then y, then z.
  for (int64_t zi = 0; zi < D; ++zi)
    for (int64_t yi = 0; yi < H; ++yi)
      dt1d(out + (zi * H + yi) * W, W, 1, wx, z, v, scratch);
  for (int64_t zi = 0; zi < D; ++zi)
    for (int64_t xi = 0; xi < W; ++xi)
      dt1d(out + zi * H * W + xi, H, W, wy, z, v, scratch);
  for (int64_t yi = 0; yi < H; ++yi)
    for (int64_t xi = 0; xi < W; ++xi)
      dt1d(out + yi * W + xi, D, H * W, wz, z, v, scratch);

  // Border-as-background: cap by distance to the volume faces.
  for (int64_t zi = 0; zi < D; ++zi) {
    for (int64_t yi = 0; yi < H; ++yi) {
      for (int64_t xi = 0; xi < W; ++xi) {
        const int64_t i = (zi * H + yi) * W + xi;
        if (!mask[i]) continue;
        float b = std::min({
            wz * (zi + 1), wz * (D - zi),
            wy * (yi + 1), wy * (H - yi),
            wx * (xi + 1), wx * (W - xi),
        });
        out[i] = std::min(out[i], b * b);
      }
    }
  }
}

}  // namespace exa

EXA_API void exa_edt_sq(const uint8_t* mask, int64_t D, int64_t H,
                        int64_t W, float wz, float wy, float wx,
                        float* out) {
  exa::edt_sq(mask, D, H, W, wz, wy, wx, out);
}
