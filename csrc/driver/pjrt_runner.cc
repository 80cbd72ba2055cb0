#include "pjrt_runner.h"

#include <dlfcn.h>
#include <unistd.h>

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <ctime>

#include "xla/pjrt/c/pjrt_c_api.h"

namespace ttsrt {

namespace {

std::string ErrString(const PJRT_Api* api, PJRT_Error* err) {
  if (!err) return "";
  PJRT_Error_Message_Args margs;
  memset(&margs, 0, sizeof(margs));
  margs.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  margs.error = err;
  api->PJRT_Error_Message(&margs);
  std::string msg(margs.message, margs.message_size);
  PJRT_Error_Destroy_Args dargs;
  memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  dargs.error = err;
  api->PJRT_Error_Destroy(&dargs);
  return msg;
}

#define RETURN_IF_ERR(expr)                       \
  do {                                            \
    PJRT_Error* _err = (expr);                    \
    if (_err) {                                   \
      if (error) *error = ErrString(api_, _err);  \
      return false;                               \
    }                                             \
  } while (0)

}  // namespace

bool ReadTTSB(const std::string& path, std::vector<HostTensor>* out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  char magic[4];
  if (fread(magic, 1, 4, f) != 4 || memcmp(magic, "TTSB", 4) != 0) {
    fclose(f);
    return false;
  }
  uint32_t n;
  if (fread(&n, 4, 1, f) != 1) { fclose(f); return false; }
  out->resize(n);
  for (uint32_t i = 0; i < n; ++i) {
    uint32_t dtype, rank;
    if (fread(&dtype, 4, 1, f) != 1 || fread(&rank, 4, 1, f) != 1) {
      fclose(f);
      return false;
    }
    HostTensor& t = (*out)[i];
    t.dtype = int(dtype);
    t.dims.resize(rank);
    for (uint32_t d = 0; d < rank; ++d) {
      uint64_t v;
      if (fread(&v, 8, 1, f) != 1) { fclose(f); return false; }
      t.dims[d] = int64_t(v);
    }
    size_t bytes = size_t(t.elems()) * 4;
    t.data.resize(bytes);
    if (bytes && fread(t.data.data(), 1, bytes, f) != bytes) {
      fclose(f);
      return false;
    }
  }
  fclose(f);
  return true;
}

bool WriteTTSB(const std::string& path, const std::vector<HostTensor>& tensors) {
  FILE* f = fopen(path.c_str(), "wb");
  if (!f) return false;
  fwrite("TTSB", 1, 4, f);
  uint32_t n = uint32_t(tensors.size());
  fwrite(&n, 4, 1, f);
  for (const auto& t : tensors) {
    uint32_t dtype = uint32_t(t.dtype), rank = uint32_t(t.dims.size());
    fwrite(&dtype, 4, 1, f);
    fwrite(&rank, 4, 1, f);
    for (auto d : t.dims) {
      uint64_t v = uint64_t(d);
      fwrite(&v, 8, 1, f);
    }
    fwrite(t.data.data(), 1, t.data.size(), f);
  }
  fclose(f);
  return true;
}

std::vector<CreateOption> DefaultCreateOptions(const std::string& plugin_path) {
  std::vector<CreateOption> opts;
  if (plugin_path.find("axon") == std::string::npos) return opts;
  const char* gen = getenv("PALLAS_AXON_TPU_GEN");
  const char* topo_env = getenv("PJRT_TOPOLOGY");
  std::string topo =
      topo_env ? topo_env : std::string(gen ? gen : "v5e") + ":1x1x1";
  auto add_int = [&](const char* k, int64_t v) {
    CreateOption o;
    o.key = k;
    o.int_value = v;
    o.is_int = true;
    opts.push_back(o);
  };
  auto add_str = [&](const char* k, const std::string& v) {
    CreateOption o;
    o.key = k;
    o.str_value = v;
    opts.push_back(o);
  };
  add_int("remote_compile", 1);
  add_int("local_only", 0);
  add_int("priority", 0);
  add_str("topology", topo);
  add_int("n_slices", 1);
  add_int("rank", 0xFFFFFFFFll);
  char session[64];
  snprintf(session, sizeof(session), "ttsrt-%d-%ld", getpid(),
           (long)time(nullptr));
  add_str("session_id", session);
  return opts;
}

PjrtRunner::~PjrtRunner() {
  if (client_ && api_) {
    PJRT_Client_Destroy_Args args;
    memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_Destroy_Args_STRUCT_SIZE;
    args.client = client_;
    api_->PJRT_Client_Destroy(&args);
  }
  if (dl_) dlclose(dl_);
}

bool PjrtRunner::Init(const std::string& plugin_path, std::string* error,
                      const std::vector<CreateOption>& options) {
  dl_ = dlopen(plugin_path.c_str(), RTLD_NOW | RTLD_LOCAL);
  if (!dl_) {
    if (error) *error = std::string("dlopen failed: ") + dlerror();
    return false;
  }
  using GetApiFn = const PJRT_Api* (*)();
  auto get_api = reinterpret_cast<GetApiFn>(dlsym(dl_, "GetPjrtApi"));
  if (!get_api) {
    if (error) *error = "GetPjrtApi symbol not found";
    return false;
  }
  api_ = get_api();
  if (!api_) {
    if (error) *error = "GetPjrtApi returned null";
    return false;
  }

  PJRT_Plugin_Initialize_Args init_args;
  memset(&init_args, 0, sizeof(init_args));
  init_args.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
  RETURN_IF_ERR(api_->PJRT_Plugin_Initialize(&init_args));

  std::vector<PJRT_NamedValue> nvs(options.size());
  for (size_t i = 0; i < options.size(); ++i) {
    const CreateOption& o = options[i];
    PJRT_NamedValue& nv = nvs[i];
    memset(&nv, 0, sizeof(nv));
    nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    nv.name = o.key.c_str();
    nv.name_size = o.key.size();
    if (o.is_int) {
      nv.type = PJRT_NamedValue_kInt64;
      nv.int64_value = o.int_value;
      nv.value_size = 1;
    } else {
      nv.type = PJRT_NamedValue_kString;
      nv.string_value = o.str_value.c_str();
      nv.value_size = o.str_value.size();
    }
  }

  PJRT_Client_Create_Args cargs;
  memset(&cargs, 0, sizeof(cargs));
  cargs.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  cargs.create_options = nvs.data();
  cargs.num_options = nvs.size();
  RETURN_IF_ERR(api_->PJRT_Client_Create(&cargs));
  client_ = cargs.client;

  PJRT_Client_PlatformName_Args pargs;
  memset(&pargs, 0, sizeof(pargs));
  pargs.struct_size = PJRT_Client_PlatformName_Args_STRUCT_SIZE;
  pargs.client = client_;
  RETURN_IF_ERR(api_->PJRT_Client_PlatformName(&pargs));
  platform_.assign(pargs.platform_name, pargs.platform_name_size);

  PJRT_Client_AddressableDevices_Args dargs;
  memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  dargs.client = client_;
  RETURN_IF_ERR(api_->PJRT_Client_AddressableDevices(&dargs));
  devices_.assign(dargs.addressable_devices,
                  dargs.addressable_devices + dargs.num_addressable_devices);
  return true;
}

PJRT_LoadedExecutable* PjrtRunner::Compile(const std::string& mlir_bytes,
                                           const std::string& compile_options,
                                           std::string* error) {
  PJRT_Program program;
  memset(&program, 0, sizeof(program));
  program.struct_size = PJRT_Program_STRUCT_SIZE;
  program.code = const_cast<char*>(mlir_bytes.data());
  program.code_size = mlir_bytes.size();
  static const char kFormat[] = "mlir";
  program.format = kFormat;
  program.format_size = 4;

  PJRT_Client_Compile_Args args;
  memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  args.client = client_;
  args.program = &program;
  args.compile_options = compile_options.data();
  args.compile_options_size = compile_options.size();
  PJRT_Error* err = api_->PJRT_Client_Compile(&args);
  if (err) {
    if (error) *error = ErrString(api_, err);
    return nullptr;
  }
  return args.executable;
}

PJRT_Buffer* PjrtRunner::ToDevice(const HostTensor& t, std::string* error) {
  PJRT_Client_BufferFromHostBuffer_Args args;
  memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
  args.client = client_;
  args.data = t.data.data();
  args.type = t.dtype == 0 ? PJRT_Buffer_Type_F32 : PJRT_Buffer_Type_S32;
  args.dims = t.dims.data();
  args.num_dims = t.dims.size();
  args.host_buffer_semantics = PJRT_HostBufferSemantics_kImmutableOnlyDuringCall;
  args.device = devices_.empty() ? nullptr : devices_[0];
  PJRT_Error* err = api_->PJRT_Client_BufferFromHostBuffer(&args);
  if (err) {
    if (error) *error = ErrString(api_, err);
    return nullptr;
  }
  // wait for the copy to complete so t's memory can be reused
  PJRT_Event_Await_Args eargs;
  memset(&eargs, 0, sizeof(eargs));
  eargs.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  eargs.event = args.done_with_host_buffer;
  PJRT_Error* werr = api_->PJRT_Event_Await(&eargs);
  if (werr) {
    if (error) *error = ErrString(api_, werr);
  }
  PJRT_Event_Destroy_Args evd;
  memset(&evd, 0, sizeof(evd));
  evd.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  evd.event = args.done_with_host_buffer;
  api_->PJRT_Event_Destroy(&evd);
  return args.buffer;
}

bool PjrtRunner::ToHost(PJRT_Buffer* buf, HostTensor* out, std::string* error) {
  // dims + element type
  PJRT_Buffer_Dimensions_Args dargs;
  memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Buffer_Dimensions_Args_STRUCT_SIZE;
  dargs.buffer = buf;
  RETURN_IF_ERR(api_->PJRT_Buffer_Dimensions(&dargs));
  out->dims.assign(dargs.dims, dargs.dims + dargs.num_dims);

  PJRT_Buffer_ElementType_Args targs;
  memset(&targs, 0, sizeof(targs));
  targs.struct_size = PJRT_Buffer_ElementType_Args_STRUCT_SIZE;
  targs.buffer = buf;
  RETURN_IF_ERR(api_->PJRT_Buffer_ElementType(&targs));
  out->dtype = targs.type == PJRT_Buffer_Type_S32 ? 1 : 0;

  PJRT_Buffer_ToHostBuffer_Args args;
  memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
  args.src = buf;
  args.dst = nullptr;
  RETURN_IF_ERR(api_->PJRT_Buffer_ToHostBuffer(&args));
  out->data.resize(args.dst_size);
  args.dst = out->data.data();
  RETURN_IF_ERR(api_->PJRT_Buffer_ToHostBuffer(&args));

  PJRT_Event_Await_Args eargs;
  memset(&eargs, 0, sizeof(eargs));
  eargs.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  eargs.event = args.event;
  RETURN_IF_ERR(api_->PJRT_Event_Await(&eargs));
  PJRT_Event_Destroy_Args evd;
  memset(&evd, 0, sizeof(evd));
  evd.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  evd.event = args.event;
  api_->PJRT_Event_Destroy(&evd);
  return true;
}

bool PjrtRunner::Execute(PJRT_LoadedExecutable* exe,
                         const std::vector<PJRT_Buffer*>& args_in,
                         size_t num_outputs,
                         std::vector<PJRT_Buffer*>* outputs,
                         std::string* error) {
  PJRT_ExecuteOptions opts;
  memset(&opts, 0, sizeof(opts));
  opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

  PJRT_Buffer* const* arg_list = args_in.data();
  outputs->assign(num_outputs, nullptr);
  PJRT_Buffer** out_list = outputs->data();

  PJRT_LoadedExecutable_Execute_Args args;
  memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
  args.executable = exe;
  args.options = &opts;
  args.argument_lists = &arg_list;
  args.num_devices = 1;
  args.num_args = args_in.size();
  args.output_lists = &out_list;
  PJRT_Event* done = nullptr;
  args.device_complete_events = &done;
  RETURN_IF_ERR(api_->PJRT_LoadedExecutable_Execute(&args));
  if (done) {
    PJRT_Event_Await_Args eargs;
    memset(&eargs, 0, sizeof(eargs));
    eargs.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
    eargs.event = done;
    RETURN_IF_ERR(api_->PJRT_Event_Await(&eargs));
    PJRT_Event_Destroy_Args evd;
    memset(&evd, 0, sizeof(evd));
    evd.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
    evd.event = done;
    api_->PJRT_Event_Destroy(&evd);
  }
  return true;
}

void PjrtRunner::DestroyBuffer(PJRT_Buffer* b) {
  if (!b) return;
  PJRT_Buffer_Destroy_Args args;
  memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
  args.buffer = b;
  api_->PJRT_Buffer_Destroy(&args);
}

void PjrtRunner::DestroyExecutable(PJRT_LoadedExecutable* e) {
  if (!e) return;
  PJRT_LoadedExecutable_Destroy_Args args;
  memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_LoadedExecutable_Destroy_Args_STRUCT_SIZE;
  args.executable = e;
  api_->PJRT_LoadedExecutable_Destroy(&args);
}

}  // namespace ttsrt
