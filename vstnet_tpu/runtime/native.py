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

AXON_PLUGIN = "/opt/axon/libaxon_pjrt.so"


def _find_plugins():
    cands = [os.environ.get("VSTNET_PJRT_PLUGIN", "")]
    # The relay plugin reaches the real TPU chip from this image and is
    # preferred; bare libtpu only works with a locally attached chip.
    cands.append(AXON_PLUGIN)
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


def _plugin_options(path: str) -> str:
    """Client create-options for a plugin, encoded as the engine's
    '\\n'-separated "i:key=int" / "s:key=str" lines. The relay TPU plugin
    requires the claim parameters jax passes it at registration (topology,
    fresh session id, remote compile); other plugins take none."""
    if os.path.basename(path) != os.path.basename(AXON_PLUGIN):
        return ""
    import uuid

    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    remote = 1 if os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1" else 0
    opts = [
        f"s:topology={gen}:1x1x1",
        f"s:session_id={uuid.uuid4()}",
        f"i:remote_compile={remote}",
        "i:local_only=0",
        "i:priority=0",
        "i:n_slices=1",
        f"i:rank={0xFFFF_FFFF}",
    ]
    return "\n".join(opts)


def _load():
    lib = ctypes.CDLL(ENGINE_LIB)
    lib.engine_create.restype = ctypes.c_void_p
    lib.engine_create.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.engine_ok.restype = ctypes.c_int32
    lib.engine_ok.argtypes = [ctypes.c_void_p]
    lib.engine_last_error.restype = ctypes.c_char_p
    lib.engine_last_error.argtypes = [ctypes.c_void_p]
    lib.engine_compile.restype = ctypes.c_int32
    lib.engine_compile.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p]
    lib.engine_execute.restype = ctypes.c_int32
    lib.engine_execute.argtypes = [
        ctypes.c_void_p,                           # engine handle
        ctypes.c_int64,                            # n_in
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int32),            # ndims
        ctypes.POINTER(ctypes.c_int64),            # dims_flat
        ctypes.c_int64,                            # n_out
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),            # out_sizes
    ]
    lib.engine_output_mtm.restype = ctypes.c_int32
    lib.engine_output_mtm.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int32]
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
        self._h = self._lib.engine_create(
            path.encode(), _plugin_options(path).encode())
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
        return [self._fix_layout(i, o) for i, o in enumerate(outs)]

    def _fix_layout(self, i: int, out: np.ndarray) -> np.ndarray:
        """TPU executables emit outputs in compiler-chosen layouts and the
        plugin's device->host copy preserves that element order; un-permute
        to logical row-major using the layout the engine recorded."""
        mtm_buf = (ctypes.c_int64 * out.ndim)()
        n = self._lib.engine_output_mtm(self._h, i, mtm_buf, out.ndim)
        if n != out.ndim:
            return out  # default/unknown layout
        mtm = list(mtm_buf[:n])
        if mtm == list(range(out.ndim - 1, -1, -1)):
            return out  # already row-major
        # physical (major->minor) dim order; raw buffer is dense in it
        phys = mtm[::-1]
        raw = out.reshape([out.shape[d] for d in phys])
        return np.ascontiguousarray(raw.transpose(np.argsort(phys)))

    def close(self):
        if self._h:
            self._lib.engine_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
