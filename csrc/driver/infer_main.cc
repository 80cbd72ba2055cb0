// Native inference server: text -> WAV over the PJRT C API — the serving
// counterpart of train_main.cc, with no Python anywhere in the loop.
//
// Python exports the jitted SynthesizerTrn.infer as StableHLO plus weights,
// symbol table, and audio metadata (scripts/export_infer_artifacts.py); this
// binary compiles the program once, keeps the weights device-resident,
// encodes text natively (basic_cleaners semantics: ASCII lowercase +
// whitespace collapse + per-codepoint symbol-id lookup + blank
// interspersal, mirroring torch_tts_tpu/text/frontend.py — itself the
// rebuild of /root/reference/vits2/text/__init__.py:11-59), executes, and
// writes 16-bit PCM WAV via the native wav writer (csrc/ttsrt/wav.cc).
//
// Usage:
//   ttsrt_infer <artifact_dir> --text "..." [-o out.wav] [--plugin p.so]
//       [--seed N] [--noise 0.667] [--length 1.0] [--noise-w 0.8]
//       [--bench N] [--encode-only]
//
// --encode-only prints the encoded id sequence and exits without touching
// PJRT (used by tests to pin the native text frontend against the Python
// one). plugin defaults to $PJRT_PLUGIN or /opt/axon/libaxon_pjrt.so.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <ctime>
#include <fstream>
#include <map>
#include <sstream>
#include <string>
#include <vector>

#include "../ttsrt/wav.h"
#include "pjrt_runner.h"

using ttsrt::HostTensor;
using ttsrt::PjrtRunner;

namespace {

std::string ReadFile(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    fprintf(stderr, "cannot open %s\n", path.c_str());
    exit(1);
  }
  std::stringstream ss;
  ss << f.rdbuf();
  return ss.str();
}

std::map<std::string, std::string> ReadMeta(const std::string& path) {
  std::map<std::string, std::string> meta;
  std::ifstream f(path);
  std::string line;
  while (std::getline(f, line)) {
    size_t eq = line.find('=');
    if (eq != std::string::npos)
      meta[line.substr(0, eq)] = line.substr(eq + 1);
  }
  return meta;
}

// basic_cleaners: ASCII lowercase + collapse any whitespace run to one ' '
// (text/cleaners.py basic_cleaners — regex \s+ -> " ", .lower()).
std::string CleanBasic(const std::string& text) {
  std::string out;
  out.reserve(text.size());
  bool in_ws = false;
  for (unsigned char c : text) {
    bool ws = c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' ||
              c == '\v';
    if (ws) {
      in_ws = true;
      continue;
    }
    if (in_ws) out.push_back(' ');  // a run collapses to ONE ' ', kept even
    in_ws = false;                  // at the start (python \s+ -> " ")
    out.push_back(c >= 'A' && c <= 'Z' ? char(c - 'A' + 'a') : char(c));
  }
  if (in_ws) out.push_back(' ');  // trailing run likewise
  return out;
}

// Iterate UTF-8 codepoints of `s`, looking each up in the symbol map;
// unknown symbols are skipped (frontend.py cleaned_text_to_sequence).
std::vector<int32_t> EncodeSymbols(
    const std::string& s, const std::map<std::string, int32_t>& sym) {
  std::vector<int32_t> ids;
  size_t i = 0;
  while (i < s.size()) {
    unsigned char b = s[i];
    size_t len = b < 0x80 ? 1 : (b >> 5) == 0x6 ? 2 : (b >> 4) == 0xE ? 3 : 4;
    if (i + len > s.size()) len = 1;
    auto it = sym.find(s.substr(i, len));
    if (it != sym.end()) ids.push_back(it->second);
    i += len;
  }
  return ids;
}

HostTensor MakeI32(std::vector<int64_t> dims, const std::vector<int32_t>& v) {
  HostTensor t;
  t.dtype = 1;
  t.dims = std::move(dims);
  t.data.resize(v.size() * 4);
  memcpy(t.data.data(), v.data(), t.data.size());
  return t;
}

HostTensor MakeF32(std::vector<int64_t> dims, const std::vector<float>& v) {
  HostTensor t;
  t.dtype = 0;
  t.dims = std::move(dims);
  t.data.resize(v.size() * 4);
  memcpy(t.data.data(), v.data(), t.data.size());
  return t;
}

double NowMs() {
  struct timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return ts.tv_sec * 1e3 + ts.tv_nsec / 1e6;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr,
            "usage: %s <artifact_dir> --text \"...\" [-o out.wav] "
            "[--plugin p.so] [--seed N] [--noise F] [--length F] "
            "[--noise-w F] [--bench N] [--encode-only]\n",
            argv[0]);
    return 1;
  }
  const std::string dir = argv[1];
  std::string text = "speech synthesis on tensor processing units";
  std::string out_path = "out.wav";
  const char* env_plugin = getenv("PJRT_PLUGIN");
  std::string plugin = env_plugin ? env_plugin : "/opt/axon/libaxon_pjrt.so";
  int seed = 1234, bench = 0;
  float noise = 0.667f, length = 1.0f, noise_w = 0.8f;
  bool encode_only = false;
  for (int i = 2; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() -> const char* {
      if (i + 1 >= argc) {
        fprintf(stderr, "missing value for %s\n", a.c_str());
        exit(1);
      }
      return argv[++i];
    };
    if (a == "--text") text = next();
    else if (a == "-o" || a == "--output") out_path = next();
    else if (a == "--plugin") plugin = next();
    else if (a == "--seed") seed = atoi(next());
    else if (a == "--noise") noise = float(atof(next()));
    else if (a == "--length") length = float(atof(next()));
    else if (a == "--noise-w") noise_w = float(atof(next()));
    else if (a == "--bench") bench = atoi(next());
    else if (a == "--encode-only") encode_only = true;
    else {
      fprintf(stderr, "unknown flag %s\n", a.c_str());
      return 1;
    }
  }

  auto meta = ReadMeta(dir + "/meta.txt");
  if (meta.empty()) {
    fprintf(stderr, "failed to read %s/meta.txt\n", dir.c_str());
    return 1;
  }
  const int64_t pad_text = atoll(meta["pad_text"].c_str());
  const int64_t hop = atoll(meta["hop_length"].c_str());
  const int sr = atoi(meta["sampling_rate"].c_str());
  const bool add_blank = meta["add_blank"] == "1";
  const size_t n_params = size_t(atoll(meta["n_params"].c_str()));
  if (!meta["cleaners"].empty() && meta["cleaners"] != "basic_cleaners")
    fprintf(stderr,
            "warning: model was exported with cleaners=%s but this binary "
            "implements basic_cleaners only — phoneme ids may differ\n",
            meta["cleaners"].c_str());

  // symbol table: line index = id (export writes "\n".join(symbols))
  std::map<std::string, int32_t> sym;
  {
    std::ifstream f(dir + "/symbols.txt");
    std::string line;
    int32_t id = 0;
    while (std::getline(f, line)) sym[line] = id++;
    if (sym.empty()) {
      fprintf(stderr, "failed to read %s/symbols.txt\n", dir.c_str());
      return 1;
    }
  }

  std::vector<int32_t> ids = EncodeSymbols(CleanBasic(text), sym);
  if (add_blank) {
    std::vector<int32_t> inter(ids.size() * 2 + 1, 0);
    for (size_t i = 0; i < ids.size(); ++i) inter[2 * i + 1] = ids[i];
    ids = std::move(inter);
  }
  if (encode_only) {
    for (size_t i = 0; i < ids.size(); ++i)
      printf("%s%d", i ? " " : "", ids[i]);
    printf("\n");
    return 0;
  }
  if (int64_t(ids.size()) > pad_text) {
    fprintf(stderr, "text too long: %zu tokens > pad_text %lld\n", ids.size(),
            (long long)pad_text);
    return 1;
  }
  const int32_t n_real = int32_t(ids.size());
  ids.resize(size_t(pad_text), 0);

  PjrtRunner runner;
  std::string err;
  if (!runner.Init(plugin, &err, ttsrt::DefaultCreateOptions(plugin))) {
    fprintf(stderr, "PJRT init failed (%s): %s\n", plugin.c_str(), err.c_str());
    return 2;
  }
  printf("platform: %s, devices: %d\n", runner.platform_name().c_str(),
         runner.device_count());

  double t0 = NowMs();
  auto* exe = runner.Compile(ReadFile(dir + "/infer.mlir"),
                             ReadFile(dir + "/infer.copts"), &err);
  if (!exe) {
    fprintf(stderr, "compile failed: %s\n", err.c_str());
    return 3;
  }
  printf("compile: %.1f s\n", (NowMs() - t0) / 1e3);

  std::vector<HostTensor> params;
  if (!ttsrt::ReadTTSB(dir + "/params.ttsb", &params) ||
      params.size() != n_params) {
    fprintf(stderr, "failed to read %s/params.ttsb (want %zu tensors)\n",
            dir.c_str(), n_params);
    return 4;
  }

  // weights stay device-resident across every synthesis call
  std::vector<PJRT_Buffer*> args;
  for (const auto& p : params) {
    PJRT_Buffer* b = runner.ToDevice(p, &err);
    if (!b) {
      fprintf(stderr, "param transfer failed: %s\n", err.c_str());
      return 5;
    }
    args.push_back(b);
  }
  args.push_back(runner.ToDevice(MakeI32({1, pad_text}, ids), &err));
  args.push_back(runner.ToDevice(MakeI32({1}, {n_real}), &err));
  args.push_back(
      runner.ToDevice(MakeF32({3}, {noise, length, noise_w}), &err));
  args.push_back(runner.ToDevice(MakeI32({1}, {seed}), &err));
  for (auto* b : args)
    if (!b) {
      fprintf(stderr, "input transfer failed: %s\n", err.c_str());
      return 5;
    }
  PJRT_Buffer** seed_slot = &args.back();

  auto run_once = [&](HostTensor* audio, HostTensor* y_len) -> bool {
    std::vector<PJRT_Buffer*> outs;
    if (!runner.Execute(exe, args, 2, &outs, &err)) {
      fprintf(stderr, "execute failed: %s\n", err.c_str());
      return false;
    }
    bool ok = runner.ToHost(outs[1], y_len, &err);
    if (ok && audio) ok = runner.ToHost(outs[0], audio, &err);
    for (auto* b : outs) runner.DestroyBuffer(b);
    if (!ok) fprintf(stderr, "fetch failed: %s\n", err.c_str());
    return ok;
  };

  HostTensor audio, y_len;
  t0 = NowMs();
  if (!run_once(&audio, &y_len)) return 6;
  double first_ms = NowMs() - t0;
  int64_t n = int64_t(y_len.i32()[0]) * hop;
  int64_t have = audio.elems();
  if (n > have) n = have;
  printf("first call: %.1f ms -> %.2f s audio\n", first_ms, double(n) / sr);

  if (!ttsrt::WriteWav16(out_path, audio.f32(), n, sr)) {
    fprintf(stderr, "failed to write %s\n", out_path.c_str());
    return 7;
  }
  printf("wrote %s (%.2f s @ %d Hz)\n", out_path.c_str(), double(n) / sr, sr);

  if (bench > 0) {
    // per-call synchronous latency: each call fetches y_lengths (a scalar
    // data dependency on the duration path) — matches bench.py's "per-call
    // (exec + 1 tunnel RTT)" methodology, conservative by one round trip
    double t_start = NowMs();
    for (int i = 0; i < bench; ++i) {
      runner.DestroyBuffer(*seed_slot);
      *seed_slot = runner.ToDevice(MakeI32({1}, {seed + 1 + i}), &err);
      HostTensor yl;
      if (!run_once(nullptr, &yl)) return 6;
    }
    double ms = (NowMs() - t_start) / bench;
    double audio_s = double(atoll(meta["max_frames"].c_str())) * hop / sr;
    printf("bench: %.1f ms/call sync for %.2f s audio -> %.0fx real-time\n",
           ms, audio_s, audio_s * 1e3 / ms);
  }

  for (auto* b : args) runner.DestroyBuffer(b);
  runner.DestroyExecutable(exe);
  return 0;
}
