// Multi-threaded prefetching batcher: decodes wavs + extracts features on a
// worker pool and hands padded batches to the training loop through a bounded
// queue. The native replacement for the reference's torch DataLoader
// (num_workers=8, /root/reference/vits2/train.py:97-103) — the host-side CPU
// work stays in C++ while the TPU consumes batches.
#pragma once

#include <condition_variable>
#include <cstdint>
#include <memory>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include "melspec.h"

namespace ttsrt {

struct BatchSpec {
  int batch_size = 8;
  int pad_frames = 400;   // static padded frame count (bucket max)
  int pad_text = 192;     // static padded text length
};

struct Item {
  std::string wav_path;
  std::vector<int32_t> text_ids;
};

// One padded batch, all row-major:
//   text   [B, pad_text] int32       text_len [B] int32
//   mel    [B, pad_frames, n_mels]   mel_len  [B] int32
//   wav    [B, pad_frames*hop]       wav_len  [B] int32
struct Batch {
  std::vector<int32_t> text, text_len, mel_len, wav_len;
  std::vector<float> mel, wav;
};

class Batcher {
 public:
  Batcher(const MelConfig& mel_cfg, const BatchSpec& spec, int num_workers);
  ~Batcher();

  void AddItem(const std::string& wav_path, const int32_t* ids, int n_ids);
  // Enqueue one batch worth of item indices for background assembly.
  void SubmitBatch(const int32_t* indices, int n);
  // Blocks until a batch is ready; returns false when Stop() was called and
  // the queue drained.
  bool NextBatch(Batch* out);
  void Stop();

  int64_t items() const { return int64_t(items_.size()); }

 private:
  void Worker();
  Batch Assemble(const std::vector<int32_t>& idx);

  MelExtractor mel_;
  BatchSpec spec_;
  std::vector<Item> items_;

  std::mutex mu_;
  std::condition_variable cv_in_, cv_out_;
  std::queue<std::vector<int32_t>> pending_;
  std::queue<Batch> ready_;
  bool stop_ = false;
  size_t max_ready_ = 4;
  std::vector<std::thread> workers_;
};

}  // namespace ttsrt
