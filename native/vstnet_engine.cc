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
#include <cstdlib>
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
  // Per-output device layout of the last execute: minor-to-major logical
  // dim indices. TPU executables place outputs in compiler-chosen layouts
  // (e.g. channels in sublanes), and ToHostBuffer on some plugins writes
  // the elements in that physical order; the host side un-permutes.
  std::vector<std::vector<int64_t>> out_mtm;
};

void trace(const char* msg) {
  if (std::getenv("VSTNET_ENGINE_DEBUG")) {
    std::fprintf(stderr, "[vstnet_engine] %s\n", msg);
    std::fflush(stderr);
  }
}

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

// options: '\n'-separated "i:key=123" (int64) / "s:key=text" (string)
// entries passed to PJRT_Client_Create as NamedValues. Plugins such as the
// relay TPU plugin require client options (topology, session id); plain
// plugins (libtpu on a local host, CPU) take none.
void* engine_create(const char* plugin_path, const char* options) {
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

  // Parse create options. Backing strings must outlive the Create call.
  std::vector<std::string> keys, svals;
  std::vector<int64_t> ivals;
  std::vector<char> kinds;
  if (options && options[0]) {
    std::string all(options);
    size_t pos = 0;
    while (pos < all.size()) {
      size_t end = all.find('\n', pos);
      if (end == std::string::npos) end = all.size();
      std::string line = all.substr(pos, end - pos);
      pos = end + 1;
      if (line.size() < 4 || line[1] != ':') continue;
      size_t eq = line.find('=', 2);
      if (eq == std::string::npos) continue;
      kinds.push_back(line[0]);
      keys.push_back(line.substr(2, eq - 2));
      std::string v = line.substr(eq + 1);
      if (line[0] == 'i') {
        ivals.push_back((int64_t)std::strtoll(v.c_str(), nullptr, 10));
        svals.push_back("");
      } else {
        svals.push_back(v);
        ivals.push_back(0);
      }
    }
  }
  std::vector<PJRT_NamedValue> nvs(keys.size());
  for (size_t i = 0; i < keys.size(); i++) {
    std::memset(&nvs[i], 0, sizeof(PJRT_NamedValue));
    nvs[i].struct_size = PJRT_NamedValue_STRUCT_SIZE;
    nvs[i].name = keys[i].c_str();
    nvs[i].name_size = keys[i].size();
    if (kinds[i] == 'i') {
      nvs[i].type = PJRT_NamedValue_kInt64;
      nvs[i].int64_value = ivals[i];
      nvs[i].value_size = 1;
    } else {
      nvs[i].type = PJRT_NamedValue_kString;
      nvs[i].string_value = svals[i].c_str();
      nvs[i].value_size = svals[i].size();
    }
  }

  PJRT_Client_Create_Args cargs;
  std::memset(&cargs, 0, sizeof(cargs));
  cargs.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  cargs.create_options = nvs.empty() ? nullptr : nvs.data();
  cargs.num_options = nvs.size();
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
  trace("execute: begin");

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
  trace("got device");

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
    // wait for the copy (plugins may return no event when the copy
    // completed synchronously)
    if (bargs.done_with_host_buffer) {
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
    }
    trace("input buffer ready");
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
  trace("executing");
  CHECK_PJRT(eng, eng->api->PJRT_LoadedExecutable_Execute(&xargs));
  trace("executed");

  // record output layouts (minor-to-major), then device -> host
  eng->out_mtm.assign((size_t)n_out, {});
  for (int64_t i = 0; i < n_out; i++) {
    PJRT_Buffer_GetMemoryLayout_Args largs;
    std::memset(&largs, 0, sizeof(largs));
    largs.struct_size = PJRT_Buffer_GetMemoryLayout_Args_STRUCT_SIZE;
    largs.buffer = outputs[i];
    PJRT_Error* lerr = eng->api->PJRT_Buffer_GetMemoryLayout
                           ? eng->api->PJRT_Buffer_GetMemoryLayout(&largs)
                           : nullptr;
    if (!lerr && eng->api->PJRT_Buffer_GetMemoryLayout &&
        largs.layout.type == PJRT_Buffer_MemoryLayout_Type_Tiled) {
      const auto& t = largs.layout.tiled;
      eng->out_mtm[i].assign(t.minor_to_major,
                             t.minor_to_major + t.minor_to_major_size);
    } else if (lerr) {
      take_error(eng->api, lerr);  // non-fatal: assume default layout
    }
  }
  for (int64_t i = 0; i < n_out; i++) {
    PJRT_Buffer_ToHostBuffer_Args targs;
    std::memset(&targs, 0, sizeof(targs));
    targs.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    targs.src = outputs[i];
    targs.dst = out_bufs[i];
    targs.dst_size = (size_t)out_sizes[i] * sizeof(float);
    trace("tohost");
    CHECK_PJRT(eng, eng->api->PJRT_Buffer_ToHostBuffer(&targs));
    trace("tohost issued");
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

// Layout of output i from the last execute: writes up to max_n
// minor-to-major entries, returns the count (0 = default/unknown layout).
int32_t engine_output_mtm(void* h, int64_t i, int64_t* mtm, int32_t max_n) {
  auto* eng = static_cast<Engine*>(h);
  if (i < 0 || (size_t)i >= eng->out_mtm.size()) return 0;
  const auto& v = eng->out_mtm[(size_t)i];
  int32_t n = (int32_t)v.size();
  if (n > max_n) return 0;
  for (int32_t k = 0; k < n; k++) mtm[k] = v[(size_t)k];
  return n;
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
