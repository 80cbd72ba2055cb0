#include "batcher.h"

#include <algorithm>
#include <cstring>

#include "wav.h"

namespace ttsrt {

Batcher::Batcher(const MelConfig& mel_cfg, const BatchSpec& spec, int num_workers)
    : mel_(mel_cfg), spec_(spec) {
  for (int i = 0; i < num_workers; ++i)
    workers_.emplace_back([this] { Worker(); });
}

Batcher::~Batcher() {
  Stop();
  for (auto& t : workers_)
    if (t.joinable()) t.join();
}

void Batcher::AddItem(const std::string& wav_path, const int32_t* ids, int n_ids) {
  Item it;
  it.wav_path = wav_path;
  it.text_ids.assign(ids, ids + n_ids);
  std::lock_guard<std::mutex> l(mu_);
  items_.push_back(std::move(it));
}

void Batcher::SubmitBatch(const int32_t* indices, int n) {
  std::vector<int32_t> idx(indices, indices + n);
  {
    std::lock_guard<std::mutex> l(mu_);
    pending_.push(std::move(idx));
  }
  cv_in_.notify_one();
}

bool Batcher::NextBatch(Batch* out) {
  std::unique_lock<std::mutex> l(mu_);
  cv_out_.wait(l, [this] {
    return !ready_.empty() || (stop_ && pending_.empty());
  });
  if (ready_.empty()) return false;
  *out = std::move(ready_.front());
  ready_.pop();
  cv_in_.notify_all();
  return true;
}

void Batcher::Stop() {
  {
    std::lock_guard<std::mutex> l(mu_);
    stop_ = true;
  }
  cv_in_.notify_all();
  cv_out_.notify_all();
}

void Batcher::Worker() {
  while (true) {
    std::vector<int32_t> idx;
    {
      std::unique_lock<std::mutex> l(mu_);
      cv_in_.wait(l, [this] {
        return stop_ || (!pending_.empty() && ready_.size() < max_ready_);
      });
      if (pending_.empty()) {
        if (stop_) return;
        continue;
      }
      idx = std::move(pending_.front());
      pending_.pop();
    }
    Batch b = Assemble(idx);
    {
      std::unique_lock<std::mutex> l(mu_);
      ready_.push(std::move(b));
    }
    cv_out_.notify_one();
  }
}

Batch Batcher::Assemble(const std::vector<int32_t>& idx) {
  const int B = int(idx.size());
  const auto& cfg = mel_.config();
  const int M = cfg.n_mels, hop = cfg.hop;
  const int PF = spec_.pad_frames, PT = spec_.pad_text;
  Batch b;
  b.text.assign(size_t(B) * PT, 0);
  b.text_len.assign(B, 0);
  b.mel.assign(size_t(B) * PF * M, 0.f);
  b.mel_len.assign(B, 0);
  b.wav.assign(size_t(B) * PF * hop, 0.f);
  b.wav_len.assign(B, 0);

  for (int i = 0; i < B; ++i) {
    const Item& it = items_[idx[i]];
    const int lt = std::min<int>(int(it.text_ids.size()), PT);
    std::memcpy(&b.text[size_t(i) * PT], it.text_ids.data(),
                sizeof(int32_t) * lt);
    b.text_len[i] = lt;

    Wav w;
    if (!ReadWav(it.wav_path, &w)) continue;
    int frames = mel_.NumFrames(int64_t(w.samples.size()));
    frames = std::min(frames, PF);
    const int64_t n = int64_t(frames) * hop;
    std::vector<float> mel(size_t(frames) * M);
    mel_.Extract(w.samples.data(), n, mel.data());
    std::memcpy(&b.mel[size_t(i) * PF * M], mel.data(),
                sizeof(float) * mel.size());
    b.mel_len[i] = frames;
    std::memcpy(&b.wav[size_t(i) * PF * hop], w.samples.data(),
                sizeof(float) * n);
    b.wav_len[i] = int(n);
  }
  return b;
}

}  // namespace ttsrt
