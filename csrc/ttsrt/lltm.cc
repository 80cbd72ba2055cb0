// C++ reference implementation of the fused gated cell (LLTM).
// Role parity with /root/reference/src/lltm-extension/lltm.cpp (a libtorch
// pybind11 extension): here a dependency-free C++ forward/backward exposed
// through the C API, used as the native parity oracle for the Pallas kernel
// in torch_tts_tpu/kernels/gated_cell.py.

#include <cmath>
#include <cstdint>
#include <vector>

namespace ttsrt {

namespace {
inline float Sigmoid(float z) { return 1.f / (1.f + std::exp(-z)); }
inline float DSigmoid(float z) {
  float s = Sigmoid(z);
  return s * (1 - s);
}
inline float Elu(float z) { return z > 0 ? z : std::exp(z) - 1.f; }
inline float DElu(float z) { return z > 0 ? 1.f : std::exp(z); }
inline float DTanh(float z) {
  float t = std::tanh(z);
  return 1 - t * t;
}
}  // namespace

// x [B,I], w [3H, H+I], b [3H], old_h/old_c [B,H].
// Outputs: new_h, new_c [B,H]; gates [B,3H] (residual for backward).
void LltmForward(const float* x, const float* w, const float* b,
                 const float* old_h, const float* old_c, int B, int I, int H,
                 float* new_h, float* new_c, float* gates) {
#pragma omp parallel for schedule(static)
  for (int i = 0; i < B; ++i) {
    for (int g = 0; g < 3 * H; ++g) {
      double acc = b[g];
      const float* wr = w + size_t(g) * (H + I);
      for (int k = 0; k < H; ++k) acc += wr[k] * old_h[size_t(i) * H + k];
      for (int k = 0; k < I; ++k) acc += wr[H + k] * x[size_t(i) * I + k];
      gates[size_t(i) * 3 * H + g] = float(acc);
    }
    for (int hx = 0; hx < H; ++hx) {
      const float* gr = gates + size_t(i) * 3 * H;
      float ig = Sigmoid(gr[hx]);
      float og = Sigmoid(gr[H + hx]);
      float cand = Elu(gr[2 * H + hx]);
      float nc = old_c[size_t(i) * H + hx] + cand * ig;
      new_c[size_t(i) * H + hx] = nc;
      new_h[size_t(i) * H + hx] = std::tanh(nc) * og;
    }
  }
}

// Analytic backward mirroring lltm.cpp:52-87.
void LltmBackward(const float* grad_h, const float* grad_c,
                  const float* new_c, const float* gates, const float* w,
                  const float* x, const float* old_h, int B, int I, int H,
                  float* d_x, float* d_w, float* d_b, float* d_old_h,
                  float* d_old_c) {
  std::vector<float> d_gates(size_t(B) * 3 * H);
#pragma omp parallel for schedule(static)
  for (int i = 0; i < B; ++i) {
    for (int hx = 0; hx < H; ++hx) {
      const float* gr = gates + size_t(i) * 3 * H;
      float ig = Sigmoid(gr[hx]);
      float og = Sigmoid(gr[H + hx]);
      float cand = Elu(gr[2 * H + hx]);
      float gh = grad_h[size_t(i) * H + hx];
      float nc = new_c[size_t(i) * H + hx];

      float d_og = std::tanh(nc) * gh;
      float d_tanh_nc = og * gh;
      float d_nc = DTanh(nc) * d_tanh_nc + grad_c[size_t(i) * H + hx];

      d_old_c[size_t(i) * H + hx] = d_nc;
      float d_cand = ig * d_nc;
      float d_ig = cand * d_nc;

      d_gates[size_t(i) * 3 * H + hx] = d_ig * DSigmoid(gr[hx]);
      d_gates[size_t(i) * 3 * H + H + hx] = d_og * DSigmoid(gr[H + hx]);
      d_gates[size_t(i) * 3 * H + 2 * H + hx] = d_cand * DElu(gr[2 * H + hx]);
    }
  }
  // d_w = d_gates^T @ X ; d_b = sum(d_gates); d_X = d_gates @ w
  for (int g = 0; g < 3 * H; ++g) {
    double db = 0;
    for (int i = 0; i < B; ++i) db += d_gates[size_t(i) * 3 * H + g];
    d_b[g] = float(db);
  }
#pragma omp parallel for schedule(static)
  for (int g = 0; g < 3 * H; ++g) {
    float* wr = d_w + size_t(g) * (H + I);
    for (int k = 0; k < H + I; ++k) {
      double acc = 0;
      for (int i = 0; i < B; ++i) {
        float xk = k < H ? old_h[size_t(i) * H + k] : x[size_t(i) * I + (k - H)];
        acc += d_gates[size_t(i) * 3 * H + g] * xk;
      }
      wr[k] = float(acc);
    }
  }
#pragma omp parallel for schedule(static)
  for (int i = 0; i < B; ++i) {
    for (int k = 0; k < H + I; ++k) {
      double acc = 0;
      for (int g = 0; g < 3 * H; ++g)
        acc += d_gates[size_t(i) * 3 * H + g] * w[size_t(g) * (H + I) + k];
      if (k < H)
        d_old_h[size_t(i) * H + k] = float(acc);
      else
        d_x[size_t(i) * I + (k - H)] = float(acc);
    }
  }
}

}  // namespace ttsrt
