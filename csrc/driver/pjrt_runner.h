// Minimal C++ PJRT runtime wrapper: plugin loading, client creation,
// StableHLO compilation, buffer transfer, execution with device-resident
// state. This is the native execution layer under the training driver
// (train_main.cc) — the TPU-world counterpart of the reference's LibTorch
// C++ app (/root/reference/src/example-app.cpp), with XLA/PJRT in place of
// ATen.
#pragma once

#include <cstdint>
#include <memory>
#include <string>
#include <vector>

struct PJRT_Api;
struct PJRT_Client;
struct PJRT_Buffer;
struct PJRT_Device;
struct PJRT_LoadedExecutable;

namespace ttsrt {

struct HostTensor {
  int dtype = 0;  // 0 = f32, 1 = i32 (TTSB codes)
  std::vector<int64_t> dims;
  std::vector<uint8_t> data;

  int64_t elems() const {
    int64_t n = 1;
    for (auto d : dims) n *= d;
    return n;
  }
  float* f32() { return reinterpret_cast<float*>(data.data()); }
  const float* f32() const { return reinterpret_cast<const float*>(data.data()); }
  int32_t* i32() { return reinterpret_cast<int32_t*>(data.data()); }
};

// TTSB tensor-list file IO (see torch_tts_tpu/infer/artifacts.py).
bool ReadTTSB(const std::string& path, std::vector<HostTensor>* out);
bool WriteTTSB(const std::string& path, const std::vector<HostTensor>& tensors);

// Client create option: integer or string named value.
struct CreateOption {
  std::string key;
  std::string str_value;
  int64_t int_value = 0;
  bool is_int = false;
};

// Create options a plugin needs. The axon TPU-tunnel plugin requires the
// option set its Python register() builds (topology/session/remote-compile
// NamedValues — see CLAUDE.md environment notes); other plugins (libtpu,
// CPU) need none. Topology override via $PJRT_TOPOLOGY, generation via
// $PALLAS_AXON_TPU_GEN.
std::vector<CreateOption> DefaultCreateOptions(const std::string& plugin_path);

class PjrtRunner {
 public:
  ~PjrtRunner();

  // Loads the PJRT plugin (dlopen) and creates a client. `options` are
  // plugin-specific PJRT_NamedValue create options.
  bool Init(const std::string& plugin_path, std::string* error,
            const std::vector<CreateOption>& options = {});

  int device_count() const { return int(devices_.size()); }
  std::string platform_name() const { return platform_; }

  // Compiles StableHLO bytecode with serialized CompileOptions.
  PJRT_LoadedExecutable* Compile(const std::string& mlir_bytes,
                                 const std::string& compile_options,
                                 std::string* error);

  // Host -> device (dense, major-to-minor).
  PJRT_Buffer* ToDevice(const HostTensor& t, std::string* error);
  // Device -> host.
  bool ToHost(PJRT_Buffer* buf, HostTensor* out, std::string* error);

  // Executes with the given argument buffers; returns output buffers
  // (caller owns; destroy with DestroyBuffer). Single-device.
  bool Execute(PJRT_LoadedExecutable* exe,
               const std::vector<PJRT_Buffer*>& args, size_t num_outputs,
               std::vector<PJRT_Buffer*>* outputs, std::string* error);

  void DestroyBuffer(PJRT_Buffer* b);
  void DestroyExecutable(PJRT_LoadedExecutable* e);

 private:
  void* dl_ = nullptr;
  const PJRT_Api* api_ = nullptr;
  PJRT_Client* client_ = nullptr;
  std::vector<PJRT_Device*> devices_;
  std::string platform_;
};

}  // namespace ttsrt
