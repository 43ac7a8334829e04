// Native inference engine over the PJRT C API.
//
// Capability parity with the reference's GGML engine lifecycle
// (/root/reference/project/ggml/include/ggml_engine.h:91-159):
//   GGMLNetwork::start_engine / load_weight / engine_forward / stop_engine
// becomes
//   engine_create(plugin)  -> dlopen a PJRT plugin (libtpu.so, CPU plugin,
//                             or any other), create a client
//   engine_compile(mlir)   -> compile a StableHLO module exported from
//                             vstnet_tpu (jax.export) — the TPU-native
//                             analogue of the GGML compute graph; weights
//                             can be baked into the module or passed as
//                             leading arguments (loaded via the GGUF codec)
//   engine_execute(...)    -> run with f32 host buffers in/out
//   engine_destroy
//
// This replaces per-call graph rebuilding (ggml_engine.h:473-520) with
// ahead-of-time compiled executables (shape-bucketed at the export layer).
//
// C ABI for ctypes (vstnet_tpu/runtime/native.py).

#include <dlfcn.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

namespace {

struct Engine {
  void* dl = nullptr;
  const PJRT_Api* api = nullptr;
  PJRT_Client* client = nullptr;
  PJRT_LoadedExecutable* exec = nullptr;
  std::string last_error;
};

std::string take_error(const PJRT_Api* api, PJRT_Error* err) {
  if (!err) return {};
  PJRT_Error_Message_Args margs;
  std::memset(&margs, 0, sizeof(margs));
  margs.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  margs.error = err;
  api->PJRT_Error_Message(&margs);
  std::string msg(margs.message, margs.message_size);
  PJRT_Error_Destroy_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  dargs.error = err;
  api->PJRT_Error_Destroy(&dargs);
  return msg;
}

#define CHECK_PJRT(eng, expr)                           \
  do {                                                  \
    PJRT_Error* _err = (expr);                          \
    if (_err) {                                         \
      (eng)->last_error = take_error((eng)->api, _err); \
      return -1;                                        \
    }                                                   \
  } while (0)

// Minimal serialized xla.CompileOptionsProto:
//   executable_build_options(3) { num_replicas(4)=1, num_partitions(5)=1 }
const uint8_t kCompileOptions[] = {0x1A, 0x04, 0x20, 0x01, 0x28, 0x01};

}  // namespace

extern "C" {

const char* engine_last_error(void* h) {
  return static_cast<Engine*>(h)->last_error.c_str();
}

void* engine_create(const char* plugin_path) {
  auto* eng = new Engine();
  eng->dl = dlopen(plugin_path, RTLD_NOW | RTLD_LOCAL);
  if (!eng->dl) {
    eng->last_error = dlerror() ? dlerror() : "dlopen failed";
    return eng;  // caller checks engine_ok
  }
  using GetApiFn = const PJRT_Api* (*)();
  auto get_api = reinterpret_cast<GetApiFn>(dlsym(eng->dl, "GetPjrtApi"));
  if (!get_api) {
    eng->last_error = "GetPjrtApi symbol not found";
    return eng;
  }
  eng->api = get_api();

  PJRT_Plugin_Initialize_Args init;
  std::memset(&init, 0, sizeof(init));
  init.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
  PJRT_Error* err = eng->api->PJRT_Plugin_Initialize(&init);
  if (err) {
    eng->last_error = take_error(eng->api, err);
    return eng;
  }

  PJRT_Client_Create_Args cargs;
  std::memset(&cargs, 0, sizeof(cargs));
  cargs.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  err = eng->api->PJRT_Client_Create(&cargs);
  if (err) {
    eng->last_error = take_error(eng->api, err);
    return eng;
  }
  eng->client = cargs.client;
  return eng;
}

int32_t engine_ok(void* h) {
  auto* eng = static_cast<Engine*>(h);
  return eng->client != nullptr ? 1 : 0;
}

int32_t engine_compile(void* h, const char* code, int64_t code_size,
                       const char* format) {
  auto* eng = static_cast<Engine*>(h);
  if (!eng->client) return -1;

  PJRT_Program program;
  std::memset(&program, 0, sizeof(program));
  program.struct_size = PJRT_Program_STRUCT_SIZE;
  program.code = const_cast<char*>(code);
  program.code_size = (size_t)code_size;
  program.format = format;
  program.format_size = std::strlen(format);

  PJRT_Client_Compile_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  args.client = eng->client;
  args.program = &program;
  args.compile_options = reinterpret_cast<const char*>(kCompileOptions);
  args.compile_options_size = sizeof(kCompileOptions);
  CHECK_PJRT(eng, eng->api->PJRT_Client_Compile(&args));
  eng->exec = args.executable;
  return 0;
}

// Execute with n f32 inputs -> n_out f32 outputs (dense, row-major).
// dims_flat/ndims describe the inputs; outputs are copied into out_bufs
// whose sizes the caller derives from the exported signature.
int32_t engine_execute(void* h, int64_t n_in, const float** in_data,
                       const int32_t* ndims, const int64_t* dims_flat,
                       int64_t n_out, float** out_bufs,
                       const int64_t* out_sizes) {
  auto* eng = static_cast<Engine*>(h);
  if (!eng->exec) return -1;

  // device 0
  PJRT_Client_AddressableDevices_Args dev_args;
  std::memset(&dev_args, 0, sizeof(dev_args));
  dev_args.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  dev_args.client = eng->client;
  CHECK_PJRT(eng, eng->api->PJRT_Client_AddressableDevices(&dev_args));
  if (dev_args.num_addressable_devices == 0) {
    eng->last_error = "no addressable devices";
    return -1;
  }
  PJRT_Device* device = dev_args.addressable_devices[0];

  // host -> device
  std::vector<PJRT_Buffer*> inputs;
  const int64_t* dp = dims_flat;
  for (int64_t i = 0; i < n_in; i++) {
    PJRT_Client_BufferFromHostBuffer_Args bargs;
    std::memset(&bargs, 0, sizeof(bargs));
    bargs.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
    bargs.client = eng->client;
    bargs.data = in_data[i];
    bargs.type = PJRT_Buffer_Type_F32;
    bargs.dims = dp;
    bargs.num_dims = (size_t)ndims[i];
    bargs.host_buffer_semantics =
        PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
    bargs.device = device;
    CHECK_PJRT(eng, eng->api->PJRT_Client_BufferFromHostBuffer(&bargs));
    // wait for the copy
    PJRT_Event_Await_Args eargs;
    std::memset(&eargs, 0, sizeof(eargs));
    eargs.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
    eargs.event = bargs.done_with_host_buffer;
    CHECK_PJRT(eng, eng->api->PJRT_Event_Await(&eargs));
    PJRT_Event_Destroy_Args edargs;
    std::memset(&edargs, 0, sizeof(edargs));
    edargs.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
    edargs.event = bargs.done_with_host_buffer;
    eng->api->PJRT_Event_Destroy(&edargs);
    inputs.push_back(bargs.buffer);
    dp += ndims[i];
  }

  // execute
  PJRT_ExecuteOptions opts;
  std::memset(&opts, 0, sizeof(opts));
  opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

  std::vector<PJRT_Buffer*> outputs(n_out, nullptr);
  PJRT_Buffer** input_list = inputs.data();
  PJRT_Buffer** output_list = outputs.data();

  PJRT_LoadedExecutable_Execute_Args xargs;
  std::memset(&xargs, 0, sizeof(xargs));
  xargs.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
  xargs.executable = eng->exec;
  xargs.options = &opts;
  xargs.argument_lists = &input_list;
  xargs.num_devices = 1;
  xargs.num_args = (size_t)n_in;
  xargs.output_lists = &output_list;
  xargs.execute_device = device;
  CHECK_PJRT(eng, eng->api->PJRT_LoadedExecutable_Execute(&xargs));

  // device -> host
  for (int64_t i = 0; i < n_out; i++) {
    PJRT_Buffer_ToHostBuffer_Args targs;
    std::memset(&targs, 0, sizeof(targs));
    targs.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    targs.src = outputs[i];
    targs.dst = out_bufs[i];
    targs.dst_size = (size_t)out_sizes[i] * sizeof(float);
    CHECK_PJRT(eng, eng->api->PJRT_Buffer_ToHostBuffer(&targs));
    PJRT_Event_Await_Args eargs;
    std::memset(&eargs, 0, sizeof(eargs));
    eargs.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
    eargs.event = targs.event;
    CHECK_PJRT(eng, eng->api->PJRT_Event_Await(&eargs));
    PJRT_Event_Destroy_Args edargs;
    std::memset(&edargs, 0, sizeof(edargs));
    edargs.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
    edargs.event = targs.event;
    eng->api->PJRT_Event_Destroy(&edargs);
  }

  for (auto* b : inputs) {
    PJRT_Buffer_Destroy_Args dargs;
    std::memset(&dargs, 0, sizeof(dargs));
    dargs.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
    dargs.buffer = b;
    eng->api->PJRT_Buffer_Destroy(&dargs);
  }
  for (auto* b : outputs) {
    if (!b) continue;
    PJRT_Buffer_Destroy_Args dargs;
    std::memset(&dargs, 0, sizeof(dargs));
    dargs.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
    dargs.buffer = b;
    eng->api->PJRT_Buffer_Destroy(&dargs);
  }
  return 0;
}

void engine_destroy(void* h) {
  auto* eng = static_cast<Engine*>(h);
  if (eng->exec) {
    PJRT_LoadedExecutable_Destroy_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_LoadedExecutable_Destroy_Args_STRUCT_SIZE;
    args.executable = eng->exec;
    eng->api->PJRT_LoadedExecutable_Destroy(&args);
  }
  if (eng->client) {
    PJRT_Client_Destroy_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_Destroy_Args_STRUCT_SIZE;
    args.client = eng->client;
    eng->api->PJRT_Client_Destroy(&args);
  }
  if (eng->dl) dlclose(eng->dl);
  delete eng;
}

}  // extern "C"
