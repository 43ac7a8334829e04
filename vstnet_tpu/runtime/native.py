"""ctypes bindings for the native tier (native/*.cc).

NativeEngine replicates the reference GGML engine lifecycle
(ggml_engine.h:91-159) over any PJRT plugin: create(plugin) ->
compile(StableHLO from export_stylize) -> execute -> destroy.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Sequence

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native", "build")
ENGINE_LIB = os.path.join(_DIR, "libvstnet_engine.so")

def _find_plugins():
    cands = [os.environ.get("VSTNET_PJRT_PLUGIN", "")]
    try:
        import libtpu

        cands.append(os.path.join(os.path.dirname(libtpu.__file__),
                                  "libtpu.so"))
    except ImportError:
        pass
    cands.append("/opt/venv/lib/python3.12/site-packages/libtpu/libtpu.so")
    return [c for c in cands if c and os.path.exists(c)]


# Known PJRT plugin locations (first hit wins).
PLUGIN_CANDIDATES = _find_plugins()


def _load():
    lib = ctypes.CDLL(ENGINE_LIB)
    lib.engine_create.restype = ctypes.c_void_p
    lib.engine_create.argtypes = [ctypes.c_char_p]
    lib.engine_ok.restype = ctypes.c_int32
    lib.engine_ok.argtypes = [ctypes.c_void_p]
    lib.engine_last_error.restype = ctypes.c_char_p
    lib.engine_last_error.argtypes = [ctypes.c_void_p]
    lib.engine_compile.restype = ctypes.c_int32
    lib.engine_compile.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p]
    lib.engine_execute.restype = ctypes.c_int32
    lib.engine_destroy.argtypes = [ctypes.c_void_p]
    return lib


class NativeEngine:
    def __init__(self, plugin_path: str | None = None):
        if not os.path.exists(ENGINE_LIB):
            raise FileNotFoundError(
                f"{ENGINE_LIB} not built — run `make engine` in native/")
        self._lib = _load()
        path = plugin_path or next(
            (p for p in PLUGIN_CANDIDATES if p and os.path.exists(p)), None)
        if path is None:
            raise FileNotFoundError("no PJRT plugin found")
        self._h = self._lib.engine_create(path.encode())
        if not self._lib.engine_ok(self._h):
            err = self._lib.engine_last_error(self._h).decode()
            self._lib.engine_destroy(self._h)
            self._h = None
            raise RuntimeError(f"PJRT client creation failed: {err}")

    def compile(self, stablehlo: bytes, fmt: str = "mlir"):
        rc = self._lib.engine_compile(
            self._h, stablehlo, len(stablehlo), fmt.encode())
        if rc != 0:
            raise RuntimeError(
                f"compile failed: {self._lib.engine_last_error(self._h).decode()}")

    def execute(self, inputs: Sequence[np.ndarray],
                out_shapes: Sequence[tuple]) -> List[np.ndarray]:
        ins = [np.ascontiguousarray(x, np.float32) for x in inputs]
        in_ptrs = (ctypes.POINTER(ctypes.c_float) * len(ins))(
            *[x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for x in ins])
        ndims = (ctypes.c_int32 * len(ins))(*[x.ndim for x in ins])
        dims_flat: List[int] = []
        for x in ins:
            dims_flat.extend(x.shape)
        dims = (ctypes.c_int64 * len(dims_flat))(*dims_flat)

        outs = [np.empty(s, np.float32) for s in out_shapes]
        out_ptrs = (ctypes.POINTER(ctypes.c_float) * len(outs))(
            *[x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for x in outs])
        out_sizes = (ctypes.c_int64 * len(outs))(*[x.size for x in outs])

        rc = self._lib.engine_execute(
            self._h, len(ins), in_ptrs, ndims, dims,
            len(outs), out_ptrs, out_sizes)
        if rc != 0:
            raise RuntimeError(
                f"execute failed: {self._lib.engine_last_error(self._h).decode()}")
        return outs

    def close(self):
        if self._h:
            self._lib.engine_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
