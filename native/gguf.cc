// GGUF v3 tensor-file codec (read + write), C ABI.
//
// Capability parity with the reference's native weight path: its GGML
// engine streams f16/f32 GGUF checkpoints by tensor name with shape checks
// and dtype casts (/root/reference/project/ggml/include/ggml_engine.h:372-471,
// 877-941). This library gives vstnet_tpu the same interop surface —
// reading the reference's converted .gguf weights and writing our own —
// without depending on ggml. Exposed through ctypes
// (vstnet_tpu/runtime/native.py), with a pure-Python fallback.
//
// Format (GGUF v3, little-endian):
//   u32 magic 'GGUF' | u32 version | u64 n_tensors | u64 n_kv
//   kv pairs:   str key | u32 type | value
//   tensor infos: str name | u32 n_dims | u64 ne[n_dims] | u32 ggml_type |
//                 u64 offset (from aligned data start)
//   data: aligned to general.alignment (default 32)
// ne[0] is the fastest-varying dimension (ggml convention — reversed from
// numpy/C order).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <string>
#include <vector>

namespace {

constexpr uint32_t kMagic = 0x46554747;  // 'GGUF'
constexpr uint32_t kVersion = 3;
constexpr uint64_t kDefaultAlign = 32;

// ggml dtype ids we support (Q8_0: 32-element blocks of f16 scale + 32
// int8 quants — the common quantized interop format beyond f16)
enum GgmlType : uint32_t {
  GGML_F32 = 0,
  GGML_F16 = 1,
  GGML_Q4_0 = 2,
  GGML_Q8_0 = 8,
};

// gguf metadata value types
enum GgufKvType : uint32_t {
  KV_U8 = 0, KV_I8, KV_U16, KV_I16, KV_U32, KV_I32, KV_F32, KV_BOOL,
  KV_STRING, KV_ARRAY, KV_U64, KV_I64, KV_F64
};

size_t kv_scalar_size(uint32_t t) {
  switch (t) {
    case KV_U8: case KV_I8: case KV_BOOL: return 1;
    case KV_U16: case KV_I16: return 2;
    case KV_U32: case KV_I32: case KV_F32: return 4;
    case KV_U64: case KV_I64: case KV_F64: return 8;
    default: return 0;
  }
}

float f16_to_f32(uint16_t h) {
  uint32_t sign = (h >> 15) & 1, exp = (h >> 10) & 0x1f, man = h & 0x3ff;
  uint32_t f;
  if (exp == 0) {
    if (man == 0) {
      f = sign << 31;
    } else {  // subnormal
      exp = 127 - 15 + 1;
      while ((man & 0x400) == 0) { man <<= 1; exp--; }
      man &= 0x3ff;
      f = (sign << 31) | (exp << 23) | (man << 13);
    }
  } else if (exp == 0x1f) {
    f = (sign << 31) | (0xff << 23) | (man << 13);
  } else {
    f = (sign << 31) | ((exp - 15 + 127) << 23) | (man << 13);
  }
  float out;
  std::memcpy(&out, &f, 4);
  return out;
}

uint16_t f32_to_f16(float x) {
  // round-to-nearest-even (matches numpy/IEEE)
  uint32_t f;
  std::memcpy(&f, &x, 4);
  uint16_t sign = (uint16_t)((f >> 16) & 0x8000);
  uint32_t exp = (f >> 23) & 0xff;
  uint32_t man = f & 0x7fffff;
  if (exp == 0xff) return sign | 0x7c00 | (man ? 0x200 : 0);  // inf/nan
  int32_t e16 = (int32_t)exp - 127 + 15;
  if (e16 >= 0x1f) return sign | 0x7c00;  // overflow -> inf
  if (e16 <= 0) {
    if (e16 < -10) return sign;  // underflow -> signed zero
    man |= 0x800000;             // implicit bit for subnormal result
    uint32_t shift = (uint32_t)(14 - e16);
    uint32_t half = 1u << (shift - 1);
    uint32_t rem = man & ((1u << shift) - 1);
    uint32_t out = man >> shift;
    if (rem > half || (rem == half && (out & 1))) out++;
    return sign | (uint16_t)out;
  }
  uint32_t rounded = man + 0xFFF + ((man >> 13) & 1);
  if (rounded & 0x800000) {
    rounded = 0;
    if (++e16 >= 0x1f) return sign | 0x7c00;
  }
  return sign | (uint16_t)((e16 << 10) | (rounded >> 13));
}

struct TensorInfo {
  std::string name;
  std::vector<uint64_t> ne;  // ggml order (ne[0] fastest)
  uint32_t type;
  uint64_t offset;
  uint64_t n_elems() const {
    uint64_t n = 1;
    for (auto d : ne) n *= d;
    return n;
  }
};

struct GgufFile {
  std::vector<TensorInfo> tensors;
  std::vector<uint8_t> data;  // the aligned data section
  uint64_t alignment = kDefaultAlign;
};

struct Reader {
  const uint8_t* p;
  size_t n;
  size_t pos = 0;
  bool ok = true;

  template <typename T>
  T get() {
    if (pos + sizeof(T) > n) { ok = false; return T{}; }
    T v;
    std::memcpy(&v, p + pos, sizeof(T));
    pos += sizeof(T);
    return v;
  }
  std::string get_str() {
    uint64_t len = get<uint64_t>();
    if (!ok || pos + len > n) { ok = false; return {}; }
    std::string s(reinterpret_cast<const char*>(p + pos), len);
    pos += len;
    return s;
  }
  void skip(size_t k) {
    if (pos + k > n) ok = false; else pos += k;
  }
};

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// Reading
// ---------------------------------------------------------------------------

void* gguf_open(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  std::fseek(f, 0, SEEK_END);
  long sz = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(sz);
  if (std::fread(buf.data(), 1, sz, f) != (size_t)sz) { std::fclose(f); return nullptr; }
  std::fclose(f);

  Reader r{buf.data(), buf.size()};
  if (r.get<uint32_t>() != kMagic) return nullptr;
  uint32_t version = r.get<uint32_t>();
  if (version < 2 || version > 3) return nullptr;
  uint64_t n_tensors = r.get<uint64_t>();
  uint64_t n_kv = r.get<uint64_t>();

  auto* gf = new GgufFile();
  for (uint64_t i = 0; i < n_kv && r.ok; i++) {
    std::string key = r.get_str();
    uint32_t t = r.get<uint32_t>();
    if (t == KV_STRING) {
      (void)r.get_str();
    } else if (t == KV_ARRAY) {
      uint32_t at = r.get<uint32_t>();
      uint64_t alen = r.get<uint64_t>();
      if (at == KV_STRING) {
        for (uint64_t j = 0; j < alen && r.ok; j++) (void)r.get_str();
      } else {
        r.skip(alen * kv_scalar_size(at));
      }
    } else {
      if (key == "general.alignment" && t == KV_U32) {
        gf->alignment = r.get<uint32_t>();
      } else {
        r.skip(kv_scalar_size(t));
      }
    }
  }
  for (uint64_t i = 0; i < n_tensors && r.ok; i++) {
    TensorInfo ti;
    ti.name = r.get_str();
    uint32_t nd = r.get<uint32_t>();
    if (nd > 8) { r.ok = false; break; }
    for (uint32_t d = 0; d < nd; d++) ti.ne.push_back(r.get<uint64_t>());
    ti.type = r.get<uint32_t>();
    ti.offset = r.get<uint64_t>();
    gf->tensors.push_back(std::move(ti));
  }
  if (!r.ok) { delete gf; return nullptr; }
  size_t data_start = (r.pos + gf->alignment - 1) / gf->alignment * gf->alignment;
  gf->data.assign(buf.begin() + data_start, buf.end());
  return gf;
}

int64_t gguf_n_tensors(void* h) {
  return static_cast<GgufFile*>(h)->tensors.size();
}

const char* gguf_tensor_name(void* h, int64_t i) {
  return static_cast<GgufFile*>(h)->tensors[i].name.c_str();
}

int32_t gguf_tensor_ndims(void* h, int64_t i) {
  return (int32_t)static_cast<GgufFile*>(h)->tensors[i].ne.size();
}

void gguf_tensor_dims(void* h, int64_t i, int64_t* out) {
  auto& ne = static_cast<GgufFile*>(h)->tensors[i].ne;
  for (size_t d = 0; d < ne.size(); d++) out[d] = (int64_t)ne[d];
}

int32_t gguf_tensor_type(void* h, int64_t i) {
  return (int32_t)static_cast<GgufFile*>(h)->tensors[i].type;
}

// Copy tensor i as f32 into out (caller allocates n_elems floats).
// Returns 0 on success, -1 on unsupported dtype.
int32_t gguf_tensor_f32(void* h, int64_t i, float* out) {
  auto* gf = static_cast<GgufFile*>(h);
  auto& ti = gf->tensors[i];
  const uint8_t* src = gf->data.data() + ti.offset;
  uint64_t n = ti.n_elems();
  if (ti.type == GGML_F32) {
    std::memcpy(out, src, n * 4);
    return 0;
  }
  if (ti.type == GGML_F16) {
    const uint16_t* s = reinterpret_cast<const uint16_t*>(src);
    for (uint64_t k = 0; k < n; k++) out[k] = f16_to_f32(s[k]);
    return 0;
  }
  if (ti.type == GGML_Q8_0) {
    // block = f16 scale + 32 int8; x = d * q
    if (n % 32 != 0) return -1;
    for (uint64_t blk = 0; blk < n / 32; blk++) {
      const uint8_t* b = src + blk * 34;
      uint16_t dh;
      std::memcpy(&dh, b, 2);
      float d = f16_to_f32(dh);
      const int8_t* q = reinterpret_cast<const int8_t*>(b + 2);
      for (int k = 0; k < 32; k++) out[blk * 32 + k] = d * (float)q[k];
    }
    return 0;
  }
  if (ti.type == GGML_Q4_0) {
    // block = f16 scale + 16 nibble bytes; element j is the low nibble of
    // qs[j], element j+16 the high nibble; x = d * (q - 8)
    if (n % 32 != 0) return -1;
    for (uint64_t blk = 0; blk < n / 32; blk++) {
      const uint8_t* b = src + blk * 18;
      uint16_t dh;
      std::memcpy(&dh, b, 2);
      float d = f16_to_f32(dh);
      const uint8_t* q = b + 2;
      for (int j = 0; j < 16; j++) {
        out[blk * 32 + j] = d * (float)((int)(q[j] & 0x0F) - 8);
        out[blk * 32 + 16 + j] = d * (float)((int)(q[j] >> 4) - 8);
      }
    }
    return 0;
  }
  return -1;
}

void gguf_close(void* h) { delete static_cast<GgufFile*>(h); }

// ---------------------------------------------------------------------------
// Writing
// ---------------------------------------------------------------------------

// names: array of n C-strings; ndims/dims flattened (dims in ggml order);
// dtypes: 0=f32 store f32, 1=store f16 (converted from the f32 input data).
int32_t gguf_write(const char* path, int64_t n, const char** names,
                   const int32_t* ndims, const int64_t* dims_flat,
                   const int32_t* dtypes, const float** data) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;

  auto put = [&](const void* p, size_t k) { std::fwrite(p, 1, k, f); };
  auto put_u32 = [&](uint32_t v) { put(&v, 4); };
  auto put_u64 = [&](uint64_t v) { put(&v, 8); };
  auto put_str = [&](const char* s) {
    uint64_t len = std::strlen(s);
    put_u64(len);
    put(s, len);
  };

  put_u32(kMagic);
  put_u32(kVersion);
  put_u64((uint64_t)n);
  put_u64(1);  // n_kv
  put_str("general.alignment");
  put_u32(KV_U32);
  put_u32((uint32_t)kDefaultAlign);

  // tensor infos with running aligned offsets
  std::vector<uint64_t> offsets(n);
  uint64_t off = 0;
  const int64_t* dp = dims_flat;
  for (int64_t i = 0; i < n; i++) {
    uint64_t ne = 1;
    for (int32_t d = 0; d < ndims[i]; d++) ne *= (uint64_t)dp[d];
    uint64_t bytes = ne * (dtypes[i] == GGML_F16 ? 2 : 4);
    offsets[i] = off;
    off = (off + bytes + kDefaultAlign - 1) / kDefaultAlign * kDefaultAlign;

    put_str(names[i]);
    put_u32((uint32_t)ndims[i]);
    for (int32_t d = 0; d < ndims[i]; d++) put_u64((uint64_t)dp[d]);
    put_u32((uint32_t)dtypes[i]);
    put_u64(offsets[i]);
    dp += ndims[i];
  }

  // pad header to alignment
  long hdr_end = std::ftell(f);
  size_t pad = (kDefaultAlign - (size_t)hdr_end % kDefaultAlign) % kDefaultAlign;
  std::vector<uint8_t> zeros(kDefaultAlign, 0);
  put(zeros.data(), pad);

  // data section
  dp = dims_flat;
  for (int64_t i = 0; i < n; i++) {
    uint64_t ne = 1;
    for (int32_t d = 0; d < ndims[i]; d++) ne *= (uint64_t)dp[d];
    if (dtypes[i] == GGML_F16) {
      std::vector<uint16_t> h(ne);
      for (uint64_t k = 0; k < ne; k++) h[k] = f32_to_f16(data[i][k]);
      put(h.data(), ne * 2);
    } else {
      put(data[i], ne * 4);
    }
    long cur = std::ftell(f);
    size_t p2 = (kDefaultAlign - (size_t)cur % kDefaultAlign) % kDefaultAlign;
    put(zeros.data(), p2);
    dp += ndims[i];
  }
  std::fclose(f);
  return 0;
}

}  // extern "C"
