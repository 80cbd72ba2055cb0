// C API surface for ctypes binding (torch_tts_tpu/data/native.py).
// pybind11 is not available in this image, so the Python<->C++ boundary is a
// plain extern "C" interface over flat buffers.

#include <cstdint>
#include <cstring>
#include <string>

#include "batcher.h"
#include "melspec.h"
#include "wav.h"

using ttsrt::Batch;
using ttsrt::Batcher;
using ttsrt::BatchSpec;
using ttsrt::MelConfig;
using ttsrt::MelExtractor;

namespace ttsrt {
void LltmForward(const float*, const float*, const float*, const float*,
                 const float*, int, int, int, float*, float*, float*);
void LltmBackward(const float*, const float*, const float*, const float*,
                  const float*, const float*, const float*, int, int, int,
                  float*, float*, float*, float*, float*);
}  // namespace ttsrt

extern "C" {

// ---- wav ----
int ttsrt_read_wav_info(const char* path, int* sample_rate, int64_t* n) {
  ttsrt::Wav w;
  if (!ttsrt::ReadWav(path, &w)) return -1;
  *sample_rate = w.sample_rate;
  *n = int64_t(w.samples.size());
  return 0;
}

int ttsrt_read_wav(const char* path, float* out, int64_t cap) {
  ttsrt::Wav w;
  if (!ttsrt::ReadWav(path, &w)) return -1;
  int64_t n = int64_t(w.samples.size());
  if (n > cap) n = cap;
  memcpy(out, w.samples.data(), sizeof(float) * n);
  return int(n);
}

int ttsrt_write_wav16(const char* path, const float* samples, int64_t n,
                      int sample_rate) {
  return ttsrt::WriteWav16(path, samples, n, sample_rate) ? 0 : -1;
}

// ---- mel ----
void* ttsrt_mel_create(int sample_rate, int n_fft, int hop, int n_mels,
                       float fmin, float fmax) {
  MelConfig cfg;
  cfg.sample_rate = sample_rate;
  cfg.n_fft = n_fft;
  cfg.hop = hop;
  cfg.n_mels = n_mels;
  cfg.fmin = fmin;
  cfg.fmax = fmax;
  return new MelExtractor(cfg);
}

void ttsrt_mel_destroy(void* h) { delete static_cast<MelExtractor*>(h); }

int ttsrt_mel_num_frames(void* h, int64_t n) {
  return static_cast<MelExtractor*>(h)->NumFrames(n);
}

void ttsrt_mel_extract(void* h, const float* wav, int64_t n, float* out) {
  static_cast<MelExtractor*>(h)->Extract(wav, n, out);
}

// ---- batcher ----
void* ttsrt_batcher_create(int sample_rate, int n_fft, int hop, int n_mels,
                           float fmin, float fmax, int batch_size,
                           int pad_frames, int pad_text, int num_workers) {
  MelConfig mc;
  mc.sample_rate = sample_rate;
  mc.n_fft = n_fft;
  mc.hop = hop;
  mc.n_mels = n_mels;
  mc.fmin = fmin;
  mc.fmax = fmax;
  BatchSpec bs;
  bs.batch_size = batch_size;
  bs.pad_frames = pad_frames;
  bs.pad_text = pad_text;
  return new Batcher(mc, bs, num_workers);
}

void ttsrt_batcher_destroy(void* h) { delete static_cast<Batcher*>(h); }

void ttsrt_batcher_add_item(void* h, const char* wav_path, const int32_t* ids,
                            int n_ids) {
  static_cast<Batcher*>(h)->AddItem(wav_path, ids, n_ids);
}

void ttsrt_batcher_submit(void* h, const int32_t* indices, int n) {
  static_cast<Batcher*>(h)->SubmitBatch(indices, n);
}

// Copies the next ready batch into caller buffers. Returns 0 on success, -1
// when the batcher is stopped and drained.
int ttsrt_batcher_next(void* h, int32_t* text, int32_t* text_len, float* mel,
                       int32_t* mel_len, float* wav, int32_t* wav_len) {
  Batch b;
  if (!static_cast<Batcher*>(h)->NextBatch(&b)) return -1;
  memcpy(text, b.text.data(), b.text.size() * sizeof(int32_t));
  memcpy(text_len, b.text_len.data(), b.text_len.size() * sizeof(int32_t));
  memcpy(mel, b.mel.data(), b.mel.size() * sizeof(float));
  memcpy(mel_len, b.mel_len.data(), b.mel_len.size() * sizeof(int32_t));
  memcpy(wav, b.wav.data(), b.wav.size() * sizeof(float));
  memcpy(wav_len, b.wav_len.data(), b.wav_len.size() * sizeof(int32_t));
  return 0;
}

void ttsrt_batcher_stop(void* h) { static_cast<Batcher*>(h)->Stop(); }

// ---- lltm ----
void ttsrt_lltm_forward(const float* x, const float* w, const float* b,
                        const float* old_h, const float* old_c, int B, int I,
                        int H, float* new_h, float* new_c, float* gates) {
  ttsrt::LltmForward(x, w, b, old_h, old_c, B, I, H, new_h, new_c, gates);
}

void ttsrt_lltm_backward(const float* grad_h, const float* grad_c,
                         const float* new_c, const float* gates,
                         const float* w, const float* x, const float* old_h,
                         int B, int I, int H, float* d_x, float* d_w,
                         float* d_b, float* d_old_h, float* d_old_c) {
  ttsrt::LltmBackward(grad_h, grad_c, new_c, gates, w, x, old_h, B, I, H, d_x,
                      d_w, d_b, d_old_h, d_old_c);
}

}  // extern "C"
