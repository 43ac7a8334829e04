"""GGUF weight interop (read/write), matching the reference's native weight
format (its GGML engine streams f16 GGUF checkpoints —
/root/reference/project/ggml/include/ggml_engine.h:877-941).

Uses the native C++ codec (native/gguf.cc via ctypes) when built; otherwise
a pure-Python implementation of the same GGUF v3 subset. Dim order follows
the ggml convention: ne[0] is the fastest-varying axis (reversed numpy
shape), which is what the reference's name-mapped loader expects.
"""

from __future__ import annotations

import ctypes
import os
import struct
from typing import Dict

import numpy as np

_NATIVE = None
_NATIVE_PATH = os.path.join(
    os.path.dirname(__file__), "..", "..", "native", "build",
    "libvstnet_gguf.so",
)

GGML_F32, GGML_F16, GGML_Q4_0, GGML_Q8_0 = 0, 1, 2, 8
_MAGIC = 0x46554747
_ALIGN = 32


def _native():
    global _NATIVE
    if _NATIVE is None and os.path.exists(_NATIVE_PATH):
        lib = ctypes.CDLL(_NATIVE_PATH)
        lib.gguf_open.restype = ctypes.c_void_p
        lib.gguf_open.argtypes = [ctypes.c_char_p]
        lib.gguf_n_tensors.restype = ctypes.c_int64
        lib.gguf_n_tensors.argtypes = [ctypes.c_void_p]
        lib.gguf_tensor_name.restype = ctypes.c_char_p
        lib.gguf_tensor_name.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.gguf_tensor_ndims.restype = ctypes.c_int32
        lib.gguf_tensor_ndims.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.gguf_tensor_dims.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64)]
        lib.gguf_tensor_f32.restype = ctypes.c_int32
        lib.gguf_tensor_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float)]
        lib.gguf_close.argtypes = [ctypes.c_void_p]
        lib.gguf_write.restype = ctypes.c_int32
        _NATIVE = lib
    return _NATIVE


# ---------------------------------------------------------------------------
# Read
# ---------------------------------------------------------------------------

def read_gguf(path: str) -> Dict[str, np.ndarray]:
    """-> {name: f32 numpy array in numpy (C-order) shape}."""
    lib = _native()
    if lib is not None:
        return _read_native(lib, path)
    return _read_python(path)


def _read_native(lib, path: str) -> Dict[str, np.ndarray]:
    h = lib.gguf_open(path.encode())
    if not h:
        raise ValueError(f"cannot open GGUF file: {path}")
    try:
        out = {}
        for i in range(lib.gguf_n_tensors(h)):
            name = lib.gguf_tensor_name(h, i).decode()
            nd = lib.gguf_tensor_ndims(h, i)
            dims = (ctypes.c_int64 * nd)()
            lib.gguf_tensor_dims(h, i, dims)
            ne = list(dims)  # ggml order
            shape = tuple(reversed(ne))
            arr = np.empty(int(np.prod(shape)), np.float32)
            rc = lib.gguf_tensor_f32(
                h, i, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
            if rc != 0:
                raise ValueError(f"unsupported dtype for tensor {name}")
            out[name] = arr.reshape(shape)
        return out
    finally:
        lib.gguf_close(h)


def _read_python(path: str) -> Dict[str, np.ndarray]:
    with open(path, "rb") as f:
        buf = f.read()
    pos = 0

    def u32():
        nonlocal pos
        v = struct.unpack_from("<I", buf, pos)[0]
        pos += 4
        return v

    def u64():
        nonlocal pos
        v = struct.unpack_from("<Q", buf, pos)[0]
        pos += 8
        return v

    def s():
        nonlocal pos
        n = u64()
        v = buf[pos:pos + n].decode()
        pos += n
        return v

    if u32() != _MAGIC:
        raise ValueError(f"{path}: not a GGUF file")
    version = u32()
    if version not in (2, 3):
        raise ValueError(f"unsupported GGUF version {version}")
    n_tensors, n_kv = u64(), u64()

    align = _ALIGN
    _scalar = {0: 1, 1: 1, 2: 2, 3: 2, 4: 4, 5: 4, 6: 4, 7: 1, 10: 8,
               11: 8, 12: 8}
    for _ in range(n_kv):
        key = s()
        t = u32()
        if t == 8:
            s()
        elif t == 9:
            at, alen = u32(), u64()
            if at == 8:
                for _ in range(alen):
                    s()
            else:
                pos += alen * _scalar[at]
        else:
            if key == "general.alignment" and t == 4:
                align = u32()
            else:
                pos += _scalar[t]

    infos = []
    for _ in range(n_tensors):
        name = s()
        nd = u32()
        ne = [u64() for _ in range(nd)]
        ttype = u32()
        off = u64()
        infos.append((name, ne, ttype, off))

    data_start = (pos + align - 1) // align * align
    out = {}
    for name, ne, ttype, off in infos:
        shape = tuple(reversed(ne))
        n = int(np.prod(shape)) if shape else 1
        if ttype == GGML_F32:
            arr = np.frombuffer(buf, np.float32, n, data_start + off).copy()
        elif ttype == GGML_F16:
            arr = np.frombuffer(buf, np.float16, n, data_start + off)
            arr = arr.astype(np.float32)
        elif ttype == GGML_Q8_0:
            # block = f16 scale + 32 int8 quants; x = d * q
            if n % 32:
                raise ValueError(f"tensor {name}: Q8_0 needs n % 32 == 0")
            raw = np.frombuffer(buf, np.uint8, (n // 32) * 34,
                                data_start + off).reshape(n // 32, 34)
            d = raw[:, :2].copy().view(np.float16).astype(np.float32)
            q = raw[:, 2:].copy().view(np.int8).astype(np.float32)
            arr = (d * q).reshape(-1)
        elif ttype == GGML_Q4_0:
            # block = f16 scale + 16 nibble bytes; element j is the low
            # nibble of qs[j], element j+16 the high nibble; x = d*(q-8)
            if n % 32:
                raise ValueError(f"tensor {name}: Q4_0 needs n % 32 == 0")
            raw = np.frombuffer(buf, np.uint8, (n // 32) * 18,
                                data_start + off).reshape(n // 32, 18)
            d = raw[:, :2].copy().view(np.float16).astype(np.float32)
            qs = raw[:, 2:]
            lo = (qs & 0x0F).astype(np.float32) - 8.0
            hi = (qs >> 4).astype(np.float32) - 8.0
            arr = (d * np.concatenate([lo, hi], axis=1)).reshape(-1)
        else:
            raise ValueError(
                f"tensor {name}: unsupported ggml type {ttype} "
                "(supported: F32, F16, Q4_0, Q8_0 — the reference "
                "loader's own scope is f16 models, "
                "project/ggml/main.cpp:80)")
        out[name] = arr.reshape(shape)
    return out


# ---------------------------------------------------------------------------
# Write
# ---------------------------------------------------------------------------

def write_gguf(path: str, tensors: Dict[str, np.ndarray],
               dtype: str = "f16"):
    """Write {name: numpy array} (any float dtype in) as GGUF
    f16/f32/q8_0/q4_0."""
    if dtype in ("q8_0", "q4_0"):
        items = [(k, np.ascontiguousarray(v, np.float32))
                 for k, v in tensors.items()]
        return _write_python(
            path, items, GGML_Q8_0 if dtype == "q8_0" else GGML_Q4_0)
    lib = _native()
    ttype = GGML_F16 if dtype == "f16" else GGML_F32
    items = [(k, np.ascontiguousarray(v, np.float32))
             for k, v in tensors.items()]
    if lib is not None:
        names = (ctypes.c_char_p * len(items))(
            *[k.encode() for k, _ in items])
        ndims = (ctypes.c_int32 * len(items))(
            *[v.ndim for _, v in items])
        dims_flat = []
        for _, v in items:
            dims_flat.extend(reversed(v.shape))  # ggml order
        dims = (ctypes.c_int64 * len(dims_flat))(*dims_flat)
        dtypes = (ctypes.c_int32 * len(items))(*([ttype] * len(items)))
        ptrs = (ctypes.POINTER(ctypes.c_float) * len(items))(
            *[v.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
              for _, v in items])
        rc = lib.gguf_write(path.encode(), len(items), names, ndims, dims,
                            dtypes, ptrs)
        if rc != 0:
            raise IOError(f"gguf_write failed: {path}")
        return path
    return _write_python(path, items, ttype)


def _write_python(path, items, ttype):
    import io as _io

    hdr = _io.BytesIO()
    hdr.write(struct.pack("<II", _MAGIC, 3))
    hdr.write(struct.pack("<QQ", len(items), 1))

    def ws(b, text):
        b.write(struct.pack("<Q", len(text)))
        b.write(text.encode())

    ws(hdr, "general.alignment")
    hdr.write(struct.pack("<I", 4))
    hdr.write(struct.pack("<I", _ALIGN))

    off = 0
    blobs = []
    for name, v in items:
        if ttype == GGML_Q8_0:
            data = _q8_0_quantize(v)
        elif ttype == GGML_Q4_0:
            data = _q4_0_quantize(v)
        else:
            data = (v.astype(np.float16) if ttype == GGML_F16 else
                    v).tobytes()
        ws(hdr, name)
        hdr.write(struct.pack("<I", v.ndim))
        for d in reversed(v.shape):
            hdr.write(struct.pack("<Q", d))
        hdr.write(struct.pack("<IQ", ttype, off))
        blobs.append(data)
        off = (off + len(data) + _ALIGN - 1) // _ALIGN * _ALIGN

    out = hdr.getvalue()
    pad = (_ALIGN - len(out) % _ALIGN) % _ALIGN
    with open(path, "wb") as f:
        f.write(out + b"\x00" * pad)
        for data in blobs:
            f.write(data)
            p2 = (_ALIGN - len(data) % _ALIGN) % _ALIGN
            f.write(b"\x00" * p2)
    return path


def _q4_0_quantize(v: np.ndarray) -> bytes:
    """f32 -> Q4_0 blocks (ggml block_q4_0: f16 scale d + 32 4-bit quants
    packed two per byte; d = signed_max/-8 per block, q = round(x/d)+8 in
    [0, 15], element j in the low nibble of byte j, j+16 in the high)."""
    flat = v.reshape(-1)
    if flat.size % 32:
        raise ValueError("Q4_0 requires element count % 32 == 0 "
                         f"(got {flat.size})")
    blocks = flat.reshape(-1, 32)
    idx = np.abs(blocks).argmax(axis=1)
    maxv = blocks[np.arange(len(blocks)), idx]  # signed extreme
    d = (maxv / -8.0).astype(np.float32)
    inv = np.where(d != 0, 1.0 / np.where(d != 0, d, 1.0), 0.0)
    q = np.clip(np.round(blocks * inv[:, None]) + 8.0, 0, 15).astype(np.uint8)
    out = np.empty((blocks.shape[0], 18), np.uint8)
    out[:, :2] = d.astype(np.float16)[:, None].view(np.uint8)
    out[:, 2:] = q[:, :16] | (q[:, 16:] << 4)
    return out.tobytes()


def _q8_0_quantize(v: np.ndarray) -> bytes:
    """f32 -> Q8_0 blocks (ggml block_q8_0: f16 scale d + 32 int8 quants;
    d = max|x|/127 per block, q = round(x/d))."""
    flat = v.reshape(-1)
    if flat.size % 32:
        raise ValueError("Q8_0 requires element count % 32 == 0 "
                         f"(got {flat.size})")
    blocks = flat.reshape(-1, 32)
    amax = np.abs(blocks).max(axis=1)
    d = (amax / 127.0).astype(np.float32)
    inv = np.where(d > 0, 1.0 / np.where(d > 0, d, 1.0), 0.0)
    q = np.round(blocks * inv[:, None]).astype(np.int8)
    out = np.empty((blocks.shape[0], 34), np.uint8)
    out[:, :2] = d.astype(np.float16)[:, None].view(np.uint8)
    out[:, 2:] = q.view(np.uint8)
    return out.tobytes()


# ---------------------------------------------------------------------------
# Checkpoint conversion
# ---------------------------------------------------------------------------

def revresnet_to_gguf(params, path: str, dtype: str = "f16"):
    """params pytree -> GGUF with the reference's torch key names (the GGML
    loader's name map, project/ggml/src/vstmodel.h:477-504, resolves these)."""
    from vstnet_tpu.io.checkpoint import revresnet_to_torch

    sd = revresnet_to_torch(params)
    return write_gguf(path, sd, dtype)


def revresnet_from_gguf(path: str, dtype=None, strict: bool = True,
                        cfg=None, seed: int = 0):
    """strict=False: skip-with-warning on missing/mismatched tensors
    against a cfg-sized expected tree (the reference GGUF loader's own
    behavior, ggml_engine.h:400-423)."""
    from vstnet_tpu.io.checkpoint import revresnet_from_torch
    import jax.numpy as jnp

    sd = read_gguf(path)
    if not strict:
        if cfg is None:
            raise ValueError("strict=False needs cfg= to size the "
                             "expected weight tree")
        import jax

        from vstnet_tpu.io.checkpoint import (
            revresnet_to_torch,
            tolerant_state_dict,
        )
        from vstnet_tpu.models.revresnet import init_revresnet

        expected = revresnet_to_torch(
            init_revresnet(jax.random.PRNGKey(seed), cfg))
        sd = tolerant_state_dict(sd, expected, label=path)
    return revresnet_from_torch(sd, dtype or jnp.float32)
