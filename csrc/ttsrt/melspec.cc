#include "melspec.h"

#include <cmath>
#include <cstring>

namespace ttsrt {

namespace {

double HzToMel(double f) {
  const double f_sp = 200.0 / 3.0;
  const double min_log_hz = 1000.0, min_log_mel = min_log_hz / f_sp;
  const double logstep = std::log(6.4) / 27.0;
  if (f >= min_log_hz) return min_log_mel + std::log(f / min_log_hz) / logstep;
  return f / f_sp;
}

double MelToHz(double m) {
  const double f_sp = 200.0 / 3.0;
  const double min_log_hz = 1000.0, min_log_mel = min_log_hz / f_sp;
  const double logstep = std::log(6.4) / 27.0;
  if (m >= min_log_mel) return min_log_hz * std::exp(logstep * (m - min_log_mel));
  return m * f_sp;
}

}  // namespace

MelExtractor::MelExtractor(const MelConfig& cfg) : cfg_(cfg) {
  const int n = cfg_.n_fft;
  n_freqs_ = n / 2 + 1;
  window_.resize(n);
  for (int i = 0; i < n; ++i)
    window_[i] = 0.5f - 0.5f * std::cos(2.0 * M_PI * i / n);

  cos_.resize(size_t(n) * n_freqs_);
  sin_.resize(size_t(n) * n_freqs_);
  for (int i = 0; i < n; ++i) {
    for (int k = 0; k < n_freqs_; ++k) {
      double ang = -2.0 * M_PI * double(i) * k / n;
      cos_[size_t(i) * n_freqs_ + k] = float(std::cos(ang));
      sin_[size_t(i) * n_freqs_ + k] = float(std::sin(ang));
    }
  }

  // slaney filterbank with slaney norm (matches audio/mel.py mel_filterbank)
  const double fmax = cfg_.fmax > 0 ? cfg_.fmax : cfg_.sample_rate / 2.0;
  const int M = cfg_.n_mels;
  std::vector<double> pts(M + 2);
  const double mlo = HzToMel(cfg_.fmin), mhi = HzToMel(fmax);
  for (int i = 0; i < M + 2; ++i)
    pts[i] = MelToHz(mlo + (mhi - mlo) * i / (M + 1));
  mel_.assign(size_t(M) * n_freqs_, 0.f);
  for (int m = 0; m < M; ++m) {
    const double fl = pts[m], fc = pts[m + 1], fr = pts[m + 2];
    const double enorm = 2.0 / (fr - fl);
    for (int k = 0; k < n_freqs_; ++k) {
      const double f = cfg_.sample_rate / 2.0 * k / (n_freqs_ - 1);
      double w = 0.0;
      const double lower = (f - fl) / (fc - fl);
      const double upper = (fr - f) / (fr - fc);
      w = std::min(lower, upper);
      if (w < 0) w = 0;
      mel_[size_t(m) * n_freqs_ + k] = float(w * enorm);
    }
  }
}

void MelExtractor::Extract(const float* wav, int64_t n, float* out) const {
  const int hop = cfg_.hop, nfft = cfg_.n_fft, M = cfg_.n_mels;
  const int64_t n_trim = (n / hop) * hop;
  const int pad = (nfft - hop) / 2;
  const int frames = int(n_trim / hop);

  // reflect-padded sample fetch
  auto sample = [&](int64_t i) -> float {
    int64_t j = i - pad;
    if (j < 0) j = -j;
    if (j >= n_trim) j = 2 * (n_trim - 1) - j;
    if (j < 0) j = 0;
    return wav[j];
  };

#pragma omp parallel for schedule(static)
  for (int t = 0; t < frames; ++t) {
    std::vector<float> frame(nfft);
    for (int i = 0; i < nfft; ++i)
      frame[i] = sample(int64_t(t) * hop + i) * window_[i];
    std::vector<float> mag(n_freqs_);
    for (int k = 0; k < n_freqs_; ++k) {
      double re = 0, im = 0;
      for (int i = 0; i < nfft; ++i) {
        re += frame[i] * cos_[size_t(i) * n_freqs_ + k];
        im += frame[i] * sin_[size_t(i) * n_freqs_ + k];
      }
      mag[k] = float(std::sqrt(re * re + im * im + 1e-6));
    }
    for (int m = 0; m < M; ++m) {
      double acc = 0;
      const float* w = &mel_[size_t(m) * n_freqs_];
      for (int k = 0; k < n_freqs_; ++k) acc += w[k] * mag[k];
      if (acc < 1e-5) acc = 1e-5;
      out[size_t(t) * M + m] = float(std::log(acc));
    }
  }
}

}  // namespace ttsrt
