// vstnet-native — standalone native inference driver.
//
// The reference native tier ships a runnable binary
// (/root/reference/project/ggml/main.cpp:35-107: getopt CLI, model preload,
// per-image predict). This is its TPU-native counterpart: load an
// AOT-exported StableHLO stylize artifact (runtime/export.py:export_stylize,
// weights baked), compile it through any PJRT plugin (relay TPU plugin,
// local libtpu, or a CPU plugin), and stylize images — no JAX, no Python
// in the execute path.
//
//   vstnet-native --artifact stylize.mlir --style s.png -o out/ c1.png c2.png
//
// Input shapes come from the artifact's @main signature; images are
// bilinear-resized to fit. Output: out/<content>_<style>.png.

#include <getopt.h>
#include <unistd.h>

#include <cctype>
#include <cstdint>
#include <ctime>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <numeric>
#include <string>
#include <vector>

#include "image_io.h"

// C ABI of native/vstnet_engine.cc (linked in).
extern "C" {
void* engine_create(const char* plugin_path, const char* options);
int32_t engine_ok(void* h);
const char* engine_last_error(void* h);
int32_t engine_compile(void* h, const char* code, int64_t code_size,
                       const char* format);
int32_t engine_execute(void* h, int64_t n_in, const float** in_data,
                       const int32_t* ndims, const int64_t* dims_flat,
                       int64_t n_out, float** out_bufs,
                       const int64_t* out_sizes);
int32_t engine_output_mtm(void* h, int64_t i, int64_t* mtm, int32_t max_n);
void engine_destroy(void* h);
}

namespace {

bool read_file(const std::string& path, std::string* out) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out->resize((size_t)n);
  size_t got = n > 0 ? std::fread(&(*out)[0], 1, (size_t)n, f) : 0;
  std::fclose(f);
  return got == (size_t)n;
}

// Parse `tensor<AxBxCxDxf32>` shapes out of the artifact's
// `func.func public @main(...) -> ...` signature: the first two are the
// (content, style) inputs, the first one after "->" is the output.
bool parse_signature(const std::string& mlir,
                     std::vector<std::vector<int64_t>>* inputs,
                     std::vector<int64_t>* output) {
  size_t main_pos = mlir.find("@main(");
  if (main_pos == std::string::npos) return false;
  size_t arrow = mlir.find("->", main_pos);
  if (arrow == std::string::npos) return false;
  size_t body = mlir.find('{', arrow);
  if (body == std::string::npos) body = mlir.size();

  auto parse_at = [&](size_t from, size_t to, size_t* next,
                      std::vector<int64_t>* dims) -> bool {
    size_t t = mlir.find("tensor<", from);
    if (t == std::string::npos || t >= to) return false;
    size_t p = t + 7;
    dims->clear();
    while (p < mlir.size() && (std::isdigit(mlir[p]))) {
      int64_t v = 0;
      while (p < mlir.size() && std::isdigit(mlir[p]))
        v = v * 10 + (mlir[p++] - '0');
      dims->push_back(v);
      if (mlir[p] == 'x') p++;
    }
    *next = p;
    // element type must be f32
    return mlir.compare(p, 3, "f32") == 0;
  };

  size_t pos = main_pos;
  while (pos < arrow) {
    std::vector<int64_t> dims;
    size_t next;
    if (!parse_at(pos, arrow, &next, &dims)) break;
    inputs->push_back(dims);
    pos = next;
  }
  size_t next;
  if (!parse_at(arrow, body, &next, output)) return false;
  return inputs->size() >= 1;
}

// Client create options for the relay TPU plugin (mirrors
// vstnet_tpu/runtime/native.py:_plugin_options); other plugins take none.
std::string plugin_options(const std::string& path) {
  std::string base = path.substr(path.find_last_of('/') + 1);
  if (base.find("axon") == std::string::npos) return "";
  const char* gen = std::getenv("PALLAS_AXON_TPU_GEN");
  const char* remote = std::getenv("PALLAS_AXON_REMOTE_COMPILE");
  char session[64];
  std::srand((unsigned)time(nullptr) ^ (unsigned)getpid());
  std::snprintf(session, sizeof(session), "%08x-%04x-%04x-%04x-%012lx",
                (unsigned)std::rand(), (unsigned)std::rand() & 0xFFFF,
                (unsigned)std::rand() & 0xFFFF,
                (unsigned)std::rand() & 0xFFFF,
                ((unsigned long)std::rand() << 16) ^ (unsigned long)std::rand());
  std::string opts;
  opts += std::string("s:topology=") + (gen ? gen : "v5e") + ":1x1x1\n";
  opts += std::string("s:session_id=") + session + "\n";
  opts += std::string("i:remote_compile=") +
          ((remote && !std::strcmp(remote, "1")) ? "1" : "0") + "\n";
  opts += "i:local_only=0\ni:priority=0\ni:n_slices=1\ni:rank=4294967295";
  return opts;
}

const char* kDefaultPlugins[] = {
    "/opt/axon/libaxon_pjrt.so",
    "/opt/venv/lib/python3.12/site-packages/libtpu/libtpu.so",
};

// Un-permute a raw output buffer from the device layout (minor-to-major
// dims) to logical row-major (port of runtime/native.py:_fix_layout).
void fix_layout(void* eng, int out_idx, const std::vector<int64_t>& shape,
                std::vector<float>* data) {
  int nd = (int)shape.size();
  std::vector<int64_t> mtm(nd);
  if (engine_output_mtm(eng, out_idx, mtm.data(), nd) != nd) return;
  bool row_major = true;
  for (int i = 0; i < nd; i++)
    if (mtm[i] != nd - 1 - i) row_major = false;
  if (row_major) return;

  std::vector<int> phys(nd);  // major->minor logical dim order
  for (int i = 0; i < nd; i++) phys[i] = (int)mtm[nd - 1 - i];
  std::vector<int64_t> pshape(nd), pstride(nd);
  for (int i = 0; i < nd; i++) pshape[i] = shape[phys[i]];
  // strides of the physical buffer, then scatter into logical order
  std::vector<int64_t> stride_in_phys(nd);
  int64_t acc = 1;
  for (int i = nd - 1; i >= 0; i--) {
    stride_in_phys[i] = acc;
    acc *= pshape[i];
  }
  std::vector<int64_t> lstride(nd);  // stride of logical dim d in raw buffer
  for (int i = 0; i < nd; i++) lstride[phys[i]] = stride_in_phys[i];

  std::vector<float> out(data->size());
  std::vector<int64_t> idx(nd, 0);
  int64_t total = (int64_t)data->size();
  for (int64_t k = 0; k < total; k++) {
    int64_t src = 0;
    for (int d = 0; d < nd; d++) src += idx[d] * lstride[d];
    out[k] = (*data)[src];
    for (int d = nd - 1; d >= 0; d--) {
      if (++idx[d] < shape[d]) break;
      idx[d] = 0;
    }
  }
  data->swap(out);
}

void usage() {
  std::fprintf(stderr,
               "vstnet-native: run an AOT StableHLO artifact on images "
               "(no Python/JAX at runtime)\n\n"
               "usage: vstnet-native --artifact F [--style S] [-o DIR] "
               "[--plugin P.so] image.png [image2.png ...]\n"
               "  -a, --artifact  StableHLO module (weights baked): a\n"
               "                  2-input stylize program (export_stylize,\n"
               "                  needs --style) or a 1-input program such\n"
               "                  as the segment-render artifact\n"
               "                  (export_segment_render) — the mode is\n"
               "                  read from the artifact's @main signature\n"
               "  -s, --style     style image (PNG or P6 PPM); 2-input only\n"
               "  -o, --out_dir   output directory (default: output)\n"
               "  -p, --plugin    PJRT plugin .so (default: relay TPU "
               "plugin, then libtpu)\n");
}

}  // namespace

int main(int argc, char** argv) {
  std::string artifact, style_path, out_dir = "output", plugin;
  static option longopts[] = {
      {"artifact", required_argument, nullptr, 'a'},
      {"style", required_argument, nullptr, 's'},
      {"out_dir", required_argument, nullptr, 'o'},
      {"plugin", required_argument, nullptr, 'p'},
      {"help", no_argument, nullptr, 'h'},
      {nullptr, 0, nullptr, 0},
  };
  int c;
  while ((c = getopt_long(argc, argv, "a:s:o:p:h", longopts, nullptr)) != -1) {
    switch (c) {
      case 'a': artifact = optarg; break;
      case 's': style_path = optarg; break;
      case 'o': out_dir = optarg; break;
      case 'p': plugin = optarg; break;
      default: usage(); return c == 'h' ? 0 : 2;
    }
  }
  if (artifact.empty() || optind >= argc) {
    usage();
    return 2;
  }

  std::string mlir;
  if (!read_file(artifact, &mlir)) {
    std::fprintf(stderr, "error: cannot read artifact %s\n", artifact.c_str());
    return 1;
  }
  std::vector<std::vector<int64_t>> in_shapes;
  std::vector<int64_t> out_shape;
  if (!parse_signature(mlir, &in_shapes, &out_shape) ||
      in_shapes[0].size() != 4 ||
      (in_shapes.size() > 1 && in_shapes[1].size() != 4)) {
    std::fprintf(stderr,
                 "error: artifact @main signature not recognized (expect "
                 "one or two NHWC f32 image inputs)\n");
    return 1;
  }
  int n_in = (int)in_shapes.size() >= 2 ? 2 : 1;
  if (n_in == 2 && style_path.empty()) {
    std::fprintf(stderr,
                 "error: 2-input (stylize) artifact needs --style\n");
    return 2;
  }
  if (n_in == 1 && !style_path.empty()) {
    std::fprintf(stderr,
                 "error: --style given but the artifact takes ONE input "
                 "(segment-render mode) — it would be silently ignored\n");
    return 2;
  }
  int64_t b = in_shapes[0][0], H = in_shapes[0][1], W = in_shapes[0][2];
  if (b != 1) {
    std::fprintf(stderr, "error: driver expects a batch-1 artifact\n");
    return 1;
  }
  std::printf("artifact: %s  input %ldx%ld  output %ldx%ld\n",
              artifact.c_str(), (long)H, (long)W, (long)out_shape[1],
              (long)out_shape[2]);

  if (plugin.empty()) {
    for (const char* p : kDefaultPlugins) {
      FILE* f = std::fopen(p, "rb");
      if (f) { std::fclose(f); plugin = p; break; }
    }
  }
  if (plugin.empty()) {
    std::fprintf(stderr, "error: no PJRT plugin found (use --plugin)\n");
    return 1;
  }
  std::printf("plugin: %s\n", plugin.c_str());

  void* eng = engine_create(plugin.c_str(), plugin_options(plugin).c_str());
  if (!engine_ok(eng)) {
    std::fprintf(stderr, "error: PJRT client: %s\n", engine_last_error(eng));
    engine_destroy(eng);
    return 1;
  }
  if (engine_compile(eng, mlir.data(), (int64_t)mlir.size(), "mlir") != 0) {
    std::fprintf(stderr, "error: compile: %s\n", engine_last_error(eng));
    engine_destroy(eng);
    return 1;
  }
  std::printf("compiled\n");

  std::string err;
  vstimg::Image style_r;
  if (n_in == 2) {
    vstimg::Image style;
    if (!vstimg::load_image(style_path, &style, &err)) {
      std::fprintf(stderr, "error: style: %s\n", err.c_str());
      engine_destroy(eng);
      return 1;
    }
    style_r = vstimg::resize_bilinear(style, (int)H, (int)W);
  }

  std::string mkdir_cmd = "mkdir -p '" + out_dir + "'";
  if (std::system(mkdir_cmd.c_str()) != 0) {
    std::fprintf(stderr, "error: cannot create %s\n", out_dir.c_str());
    engine_destroy(eng);
    return 1;
  }
  auto stem = [](const std::string& p) {
    size_t s = p.find_last_of('/');
    std::string base = s == std::string::npos ? p : p.substr(s + 1);
    size_t d = base.find_last_of('.');
    return d == std::string::npos ? base : base.substr(0, d);
  };
  std::string sstem = n_in == 2 ? stem(style_path) : "seg";

  int failures = 0;
  for (int i = optind; i < argc; i++) {
    vstimg::Image content;
    if (!vstimg::load_image(argv[i], &content, &err)) {
      std::fprintf(stderr, "error: %s: %s\n", argv[i], err.c_str());
      failures++;
      continue;
    }
    vstimg::Image content_r =
        vstimg::resize_bilinear(content, (int)H, (int)W);

    const float* ins[2] = {content_r.rgb.data(),
                           n_in == 2 ? style_r.rgb.data() : nullptr};
    int32_t ndims[2] = {4, 4};
    int64_t dims[8] = {1, H, W, 3, 1, H, W, 3};
    int64_t out_n = 1;
    for (int64_t d : out_shape) out_n *= d;
    std::vector<float> out((size_t)out_n);
    float* outs[1] = {out.data()};
    int64_t out_sizes[1] = {out_n};
    if (engine_execute(eng, n_in, ins, ndims, dims, 1, outs,
                       out_sizes) != 0) {
      std::fprintf(stderr, "error: execute: %s\n", engine_last_error(eng));
      failures++;
      continue;
    }
    fix_layout(eng, 0, out_shape, &out);

    vstimg::Image result;
    result.h = (int)out_shape[1];
    result.w = (int)out_shape[2];
    result.rgb.assign(out.begin(), out.end());
    // research-CLI semantics: raw decoder output clamped at save
    // (/root/reference/image_transfer.py:218)
    vstimg::Image final_img =
        vstimg::resize_bilinear(result, content.h, content.w);
    std::string dst =
        out_dir + "/" + stem(argv[i]) + "_" + sstem + ".png";
    if (!vstimg::save_png(dst, final_img, &err)) {
      std::fprintf(stderr, "error: save: %s\n", err.c_str());
      failures++;
      continue;
    }
    std::printf("wrote %s\n", dst.c_str());
  }
  engine_destroy(eng);
  return failures ? 1 : 0;
}
