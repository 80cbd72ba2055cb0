// PCM WAV reading/writing for the native data loader.
// Role parity: the reference loads audio with soundfile/torchaudio
// (/root/reference/vits2/utils.py:171, tacotron/data/dataset.py:48); data
// workers here stay JAX-free and use this instead.
#pragma once

#include <cstdint>
#include <string>
#include <vector>

namespace ttsrt {

struct Wav {
  int sample_rate = 0;
  std::vector<float> samples;  // mono, [-1, 1]
};

// Reads 8/16/32-bit PCM or float32 WAV; multi-channel is mixed to mono.
// Returns false on parse failure.
bool ReadWav(const std::string& path, Wav* out);

bool WriteWav16(const std::string& path, const float* samples, int64_t n,
                int sample_rate);

}  // namespace ttsrt
