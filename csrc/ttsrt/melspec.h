// Host-side mel-spectrogram extraction (OpenMP-parallel over frames).
// Numerically matches the Python frontends
// (torch_tts_tpu/audio/mel.py == vits2/mel_processing.py semantics):
// reflect pad (n_fft-hop)/2, periodic hann, real DFT, sqrt(power + 1e-6),
// slaney mel filterbank, log-clamp(1e-5).
#pragma once

#include <cstdint>
#include <vector>

namespace ttsrt {

struct MelConfig {
  int sample_rate = 22050;
  int n_fft = 1024;
  int hop = 256;
  int n_mels = 80;
  float fmin = 0.f;
  float fmax = 0.f;  // 0 => sr/2
};

class MelExtractor {
 public:
  explicit MelExtractor(const MelConfig& cfg);

  int NumFrames(int64_t n_samples) const { return int(n_samples / cfg_.hop); }

  // wav: [n] in [-1,1], trimmed to a hop multiple internally.
  // out: [NumFrames, n_mels] row-major log-mels.
  void Extract(const float* wav, int64_t n, float* out) const;

  const MelConfig& config() const { return cfg_; }

 private:
  MelConfig cfg_;
  std::vector<float> window_;          // [n_fft]
  std::vector<float> cos_, sin_;       // [n_fft * n_freqs]
  std::vector<float> mel_;             // [n_mels * n_freqs]
  int n_freqs_;
};

}  // namespace ttsrt
