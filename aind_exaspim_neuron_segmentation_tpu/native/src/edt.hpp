#pragma once
#include <cstdint>

namespace exa {
void edt_sq(const uint8_t* mask, int64_t D, int64_t H, int64_t W,
            float wz, float wy, float wx, float* out);
}  // namespace exa
