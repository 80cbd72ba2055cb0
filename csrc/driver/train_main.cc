// Native training driver: the TPU-world equivalent of the reference's
// LibTorch MNIST executable (/root/reference/src/example-app.cpp:8-67).
//
// Python exports the model/optimizer as StableHLO step functions plus TTSB
// tensor files (scripts/export_classifier_artifacts.py); this binary loads a
// PJRT plugin, compiles the steps, and runs the same train/eval/checkpoint
// loop natively:
//   - SGD training with parameters resident on device across steps
//   - loss printed every 100 batches, params checkpointed to net.ttsb
//     (the torch::save(net, "net.pt") analogue, example-app.cpp:54)
//   - per-epoch evaluation on the test set
//
// Usage:
//   ttsrt_train <artifact_dir> [plugin.so] [epochs] [batch]
// plugin defaults to $PJRT_PLUGIN or /opt/axon/libaxon_pjrt.so.

#include <algorithm>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <ctime>
#include <unistd.h>
#include <fstream>
#include <numeric>
#include <random>
#include <sstream>
#include <string>
#include <vector>

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

HostTensor SliceBatch(const HostTensor& all, const std::vector<int>& idx,
                      int64_t start, int64_t batch) {
  HostTensor out;
  out.dtype = all.dtype;
  out.dims = all.dims;
  out.dims[0] = batch;
  int64_t row = 1;
  for (size_t d = 1; d < all.dims.size(); ++d) row *= all.dims[d];
  out.data.resize(size_t(batch) * row * 4);
  for (int64_t i = 0; i < batch; ++i) {
    int64_t src = idx[size_t(start + i) % idx.size()];
    memcpy(out.data.data() + size_t(i) * row * 4,
           all.data.data() + size_t(src) * row * 4, size_t(row) * 4);
  }
  return out;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s <artifact_dir> [plugin.so] [epochs] [batch]\n",
            argv[0]);
    return 1;
  }
  const std::string dir = argv[1];
  const char* env_plugin = getenv("PJRT_PLUGIN");
  const std::string plugin =
      argc > 2 ? argv[2]
               : (env_plugin ? env_plugin : "/opt/axon/libaxon_pjrt.so");
  const int epochs = argc > 3 ? atoi(argv[3]) : 3;
  const int64_t batch = argc > 4 ? atoi(argv[4]) : 64;

  PjrtRunner runner;
  std::string err;
  if (!runner.Init(plugin, &err, ttsrt::DefaultCreateOptions(plugin))) {
    fprintf(stderr, "PJRT init failed (%s): %s\n", plugin.c_str(), err.c_str());
    return 2;
  }
  printf("platform: %s, devices: %d\n", runner.platform_name().c_str(),
         runner.device_count());

  auto* train_exe = runner.Compile(ReadFile(dir + "/train_step.mlir"),
                                   ReadFile(dir + "/train_step.copts"), &err);
  if (!train_exe) {
    fprintf(stderr, "compile train_step failed: %s\n", err.c_str());
    return 3;
  }
  auto* eval_exe = runner.Compile(ReadFile(dir + "/eval_step.mlir"),
                                  ReadFile(dir + "/eval_step.copts"), &err);
  if (!eval_exe) {
    fprintf(stderr, "compile eval_step failed: %s\n", err.c_str());
    return 3;
  }

  std::vector<HostTensor> params, train_data, test_data;
  if (!ttsrt::ReadTTSB(dir + "/init_params.ttsb", &params) ||
      !ttsrt::ReadTTSB(dir + "/train_data.ttsb", &train_data) ||
      !ttsrt::ReadTTSB(dir + "/test_data.ttsb", &test_data)) {
    fprintf(stderr, "failed to read TTSB artifacts from %s\n", dir.c_str());
    return 4;
  }
  const size_t n_params = params.size();
  const int64_t n_train = train_data[0].dims[0];
  const int64_t n_test = test_data[0].dims[0];
  printf("params: %zu tensors, train: %lld, test: %lld\n", n_params,
         (long long)n_train, (long long)n_test);

  // parameters live on device; training steps feed them back in
  std::vector<PJRT_Buffer*> param_bufs;
  for (const auto& p : params) {
    PJRT_Buffer* b = runner.ToDevice(p, &err);
    if (!b) {
      fprintf(stderr, "transfer failed: %s\n", err.c_str());
      return 5;
    }
    param_bufs.push_back(b);
  }

  std::mt19937 rng(0);
  std::vector<int> order((size_t)n_train);
  std::iota(order.begin(), order.end(), 0);

  const int64_t steps_per_epoch = n_train / batch;
  for (int epoch = 1; epoch <= epochs; ++epoch) {
    std::shuffle(order.begin(), order.end(), rng);
    for (int64_t s = 0; s < steps_per_epoch; ++s) {
      HostTensor xb = SliceBatch(train_data[0], order, s * batch, batch);
      HostTensor yb = SliceBatch(train_data[1], order, s * batch, batch);
      std::vector<PJRT_Buffer*> args = param_bufs;
      PJRT_Buffer* xbuf = runner.ToDevice(xb, &err);
      PJRT_Buffer* ybuf = runner.ToDevice(yb, &err);
      args.push_back(xbuf);
      args.push_back(ybuf);

      std::vector<PJRT_Buffer*> outs;
      if (!runner.Execute(train_exe, args, n_params + 1, &outs, &err)) {
        fprintf(stderr, "execute failed: %s\n", err.c_str());
        return 6;
      }
      runner.DestroyBuffer(xbuf);
      runner.DestroyBuffer(ybuf);
      for (auto* b : param_bufs) runner.DestroyBuffer(b);
      param_bufs.assign(outs.begin(), outs.begin() + n_params);

      if ((s + 1) % 100 == 0 || s + 1 == steps_per_epoch) {
        HostTensor loss;
        runner.ToHost(outs[n_params], &loss, &err);
        printf("Epoch: %d | Batch: %lld | Loss: %.4f\n", epoch,
               (long long)(s + 1), loss.f32()[0]);
        // checkpoint like torch::save(net, "net.pt")
        std::vector<HostTensor> host_params(n_params);
        for (size_t i = 0; i < n_params; ++i)
          runner.ToHost(param_bufs[i], &host_params[i], &err);
        ttsrt::WriteTTSB(dir + "/net.ttsb", host_params);
      }
      runner.DestroyBuffer(outs[n_params]);
    }

    // per-epoch eval over the test set
    double loss_sum = 0, acc_sum = 0;
    int64_t eval_steps = n_test / batch;
    std::vector<int> tidx((size_t)n_test);
    std::iota(tidx.begin(), tidx.end(), 0);
    for (int64_t s = 0; s < eval_steps; ++s) {
      HostTensor xb = SliceBatch(test_data[0], tidx, s * batch, batch);
      HostTensor yb = SliceBatch(test_data[1], tidx, s * batch, batch);
      std::vector<PJRT_Buffer*> args = param_bufs;
      PJRT_Buffer* xbuf = runner.ToDevice(xb, &err);
      PJRT_Buffer* ybuf = runner.ToDevice(yb, &err);
      args.push_back(xbuf);
      args.push_back(ybuf);
      std::vector<PJRT_Buffer*> outs;
      if (!runner.Execute(eval_exe, args, 2, &outs, &err)) {
        fprintf(stderr, "eval failed: %s\n", err.c_str());
        return 7;
      }
      HostTensor l, a;
      runner.ToHost(outs[0], &l, &err);
      runner.ToHost(outs[1], &a, &err);
      loss_sum += l.f32()[0];
      acc_sum += a.f32()[0];
      for (auto* b : outs) runner.DestroyBuffer(b);
      runner.DestroyBuffer(xbuf);
      runner.DestroyBuffer(ybuf);
    }
    printf("Epoch: %d | Test loss: %.4f | Test acc: %.4f\n", epoch,
           loss_sum / eval_steps, acc_sum / eval_steps);
  }

  for (auto* b : param_bufs) runner.DestroyBuffer(b);
  runner.DestroyExecutable(train_exe);
  runner.DestroyExecutable(eval_exe);
  printf("done.\n");
  return 0;
}
