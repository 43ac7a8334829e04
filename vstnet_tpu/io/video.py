"""Video I/O.

Three sources/sinks, in order of preference:
  * a pure-Python RIFF/AVI parser+writer for MJPEG (each frame is a JPEG,
    decoded/encoded by PIL) — owns the .avi path: the reference's own
    sample video (data/content/04.avi) is MJPG, the reference writes its
    seg debug videos as MJPG (video_transfer.py:99-106), and keeping the
    codec in-repo makes .avi round trips deterministic and dependency-free;
  * cv2 (when importable) for every other container — notably .mp4 with
    the reference's mp4v fourcc (video_transfer.py:94-96), read and write;
  * frame-directory mode (sorted images), which the reference also supports
    (video_transfer.py:68-70).
"""

from __future__ import annotations

import io
import os
import struct
from typing import Iterator, List, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# MJPEG AVI reader
# ---------------------------------------------------------------------------

def _walk_chunks(buf: memoryview, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        fourcc = bytes(buf[pos:pos + 4])
        size = struct.unpack("<I", buf[pos + 4:pos + 8])[0]
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


def _index_avi(data: memoryview, path: str):
    """One cheap structural pass: (frame (offset, size) list, fps).

    No JPEG decode happens here — decode cost and memory are paid per
    frame by the caller, so a long video never has to fit in RAM decoded."""
    if bytes(data[:4]) != b"RIFF" or bytes(data[8:12]) != b"AVI ":
        raise ValueError(f"{path}: not an AVI file")

    fps = 25.0
    index: List[Tuple[int, int]] = []

    def scan_list(start, end):
        nonlocal fps
        for fourcc, off, size in _walk_chunks(data, start, end):
            if fourcc == b"LIST":
                list_type = bytes(data[off:off + 4])
                if list_type == b"movi":
                    for cc, o2, s2 in _walk_chunks(data, off + 4, off + size):
                        if cc[2:4] in (b"dc", b"db") and s2 > 0:
                            index.append((o2, s2))
                else:
                    scan_list(off + 4, off + size)
            elif fourcc == b"avih":
                usec_per_frame = struct.unpack("<I", data[off:off + 4])[0]
                if usec_per_frame > 0:
                    fps = 1e6 / usec_per_frame

    scan_list(12, len(data))
    if not index:
        raise ValueError(f"{path}: no MJPEG frames found (codec unsupported?)")
    return index, fps


def _decode_indexed(data: memoryview, index) -> Iterator[np.ndarray]:
    from PIL import Image

    for off, size in index:
        img = Image.open(io.BytesIO(bytes(data[off:off + size])))
        yield np.asarray(img.convert("RGB"))


def read_avi(path: str) -> Tuple[List[np.ndarray], float]:
    """Read an MJPEG AVI -> (frames [HWC uint8 RGB], fps). Eager; for long
    videos prefer read_frames(), which decodes lazily."""
    with open(path, "rb") as f:
        data = memoryview(f.read())
    index, fps = _index_avi(data, path)
    return list(_decode_indexed(data, index)), fps


# ---------------------------------------------------------------------------
# MJPEG AVI writer
# ---------------------------------------------------------------------------

class AviWriter:
    """Streaming MJPEG AVI writer (RIFF + avih/strh/strf + movi + idx1)."""

    def __init__(self, path: str, fps: float = 25.0, quality: int = 92):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.path = path
        self.fps = fps
        self.quality = quality
        self._jpegs: List[bytes] = []
        self._size: Optional[Tuple[int, int]] = None

    def write(self, frame: np.ndarray):
        """frame: HWC uint8 RGB (or float [0,1])."""
        from PIL import Image

        if frame.dtype != np.uint8:
            frame = np.clip(np.asarray(frame) * 255.0, 0, 255).astype(np.uint8)
        if self._size is None:
            self._size = (frame.shape[1], frame.shape[0])
        buf = io.BytesIO()
        Image.fromarray(frame).save(buf, "JPEG", quality=self.quality)
        self._jpegs.append(buf.getvalue())

    def close(self):
        if self._size is None:
            raise ValueError("no frames written")
        w, h = self._size
        n = len(self._jpegs)

        def chunk(fourcc: bytes, payload: bytes) -> bytes:
            pad = b"\x00" if len(payload) & 1 else b""
            return fourcc + struct.pack("<I", len(payload)) + payload + pad

        def lst(list_type: bytes, payload: bytes) -> bytes:
            return chunk(b"LIST", list_type + payload)

        usec = int(1e6 / max(self.fps, 1e-6))
        max_bytes = max(len(j) for j in self._jpegs)
        avih = struct.pack(
            "<IIIIIIIIIIIIII",
            usec, max_bytes * int(self.fps), 0, 0x10,  # HASINDEX
            n, 0, 1, max_bytes, w, h, 0, 0, 0, 0,
        )
        strh = struct.pack(
            "<4s4sIHHIIIIIIIIhhhh",
            b"vids", b"MJPG", 0, 0, 0, 0, 1, int(round(self.fps)),
            0, n, max_bytes, 0xFFFFFFFF, 0, 0, 0, w, h,
        )
        strf = struct.pack(
            "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
        )
        hdrl = lst(
            b"hdrl",
            chunk(b"avih", avih)
            + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
        )

        movi_payload = b"".join(chunk(b"00dc", j) for j in self._jpegs)
        movi = lst(b"movi", movi_payload)

        idx_entries = []
        off = 4  # offsets are relative to the 'movi' list-type fourcc
        for j in self._jpegs:
            idx_entries.append(
                struct.pack("<4sIII", b"00dc", 0x10, off, len(j)))
            off += 8 + len(j) + (len(j) & 1)
        idx1 = chunk(b"idx1", b"".join(idx_entries))

        body = b"AVI " + hdrl + movi + idx1
        with open(self.path, "wb") as f:
            f.write(b"RIFF" + struct.pack("<I", len(body)) + body)
        return self.path

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# ---------------------------------------------------------------------------
# cv2-backed container support (.mp4 and friends)
# ---------------------------------------------------------------------------

def _cv2():
    try:
        import cv2

        return cv2
    except Exception:
        return None


def have_cv2() -> bool:
    return _cv2() is not None


class Cv2Writer:
    """cv2.VideoWriter wrapper (RGB frames in; the reference's mp4v
    fourcc for .mp4, video_transfer.py:94-96)."""

    def __init__(self, path: str, fps: float = 25.0, fourcc: str = "mp4v"):
        cv2 = _cv2()
        if cv2 is None:
            raise RuntimeError("cv2 not available; use AviWriter")
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.path = path
        self.fps = fps
        self._cv2 = cv2
        # cv2.VideoWriter.fourcc is the stable spelling (the module-level
        # VideoWriter_fourcc is an alias generated at import).
        self._fourcc = cv2.VideoWriter.fourcc(*fourcc)
        self._w = None

    def write(self, frame: np.ndarray):
        """frame: HWC uint8 RGB (or float [0,1])."""
        if frame.dtype != np.uint8:
            frame = np.clip(np.asarray(frame) * 255.0, 0, 255).astype(np.uint8)
        if self._w is None:
            h, w = frame.shape[:2]
            self._w = self._cv2.VideoWriter(
                self.path, self._fourcc, self.fps, (w, h))
            if not self._w.isOpened():
                raise IOError(f"cv2.VideoWriter failed to open {self.path}")
        self._w.write(np.ascontiguousarray(frame[:, :, ::-1]))  # RGB->BGR

    def close(self):
        if self._w is None:
            raise ValueError("no frames written")
        self._w.release()
        return self.path

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def make_video_writer(path: str, fps: float = 25.0):
    """Writer for `path` by extension: .avi -> the in-repo MJPEG writer
    (deterministic, dependency-free); anything else -> cv2 (mp4v for
    .mp4). Raises if a non-avi container is requested without cv2."""
    if path.lower().endswith(".avi") or _cv2() is None:
        if not path.lower().endswith(".avi"):
            raise RuntimeError(
                f"{path}: only .avi can be written without cv2")
        return AviWriter(path, fps)
    return Cv2Writer(path, fps)


# ---------------------------------------------------------------------------
# Unified frame sources / sinks
# ---------------------------------------------------------------------------

def read_frames(path: str) -> Tuple[Iterator[np.ndarray], int, float]:
    """Video file or frame directory -> (frame iterator, count, fps).

    Frames decode LAZILY (per pull): only the raw container bytes are
    resident, never the decoded video. .avi routes through the in-repo
    MJPEG parser; other containers (.mp4, ...) decode via cv2. Wrap the
    iterator in prefetch_frames() to overlap decode with device compute."""
    from PIL import Image

    if os.path.isdir(path):
        from vstnet_tpu.train.data import make_dataset

        files = make_dataset(path)

        def gen():
            for fp in files:
                yield np.asarray(Image.open(fp).convert("RGB"))

        return gen(), len(files), 25.0
    if not path.lower().endswith(".avi"):
        cv2 = _cv2()
        if cv2 is None:
            raise ValueError(
                f"{path}: only .avi readable without cv2 (not installed)")
        cap = cv2.VideoCapture(path)
        if not cap.isOpened():
            raise ValueError(f"{path}: cv2 cannot open this video")
        n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        fps = float(cap.get(cv2.CAP_PROP_FPS)) or 25.0
        if n <= 0:
            raise ValueError(f"{path}: container reports no frames")

        def gen():
            try:
                while True:
                    ok, f = cap.read()
                    if not ok:
                        return
                    yield np.ascontiguousarray(f[:, :, ::-1])  # BGR->RGB
            finally:
                cap.release()

        return gen(), n, fps
    with open(path, "rb") as f:
        data = memoryview(f.read())
    index, fps = _index_avi(data, path)
    return _decode_indexed(data, index), len(index), fps


# ---------------------------------------------------------------------------
# Async host-side decode/encode (SURVEY §7 hard-part 5: the device should
# never wait on JPEG work; a 1000-fps device loop dies the moment decode
# or encode runs synchronously in the dispatch thread)
# ---------------------------------------------------------------------------

_SENTINEL = object()


def prefetch_frames(frames: Iterator[np.ndarray],
                    depth: int = 64) -> Iterator[np.ndarray]:
    """Decode-ahead iterator: a daemon thread pulls `frames` into a
    bounded queue so JPEG decode overlaps device compute. Exceptions in
    the worker re-raise at the consumer's next pull."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))

    def work():
        try:
            for f in frames:
                q.put(f)
            q.put(_SENTINEL)
        except BaseException as e:  # re-raise on the consumer side
            q.put(e)

    threading.Thread(target=work, daemon=True).start()

    def gen():
        while True:
            item = q.get()
            if item is _SENTINEL:
                return
            if isinstance(item, BaseException):
                raise item
            yield item

    return gen()


class AsyncWriter:
    """Threaded wrapper over a frame writer: write() enqueues, a worker
    thread runs the (CPU-bound JPEG encode) inner write, close() drains
    and closes. Worker exceptions re-raise on the caller's next
    write()/close()."""

    def __init__(self, inner, depth: int = 64):
        import queue
        import threading

        self._inner = inner
        self._q: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._work, daemon=True)
        self._thread.start()

    def _work(self):
        while True:
            item = self._q.get()
            if item is _SENTINEL:
                return
            if self._err is None:
                try:
                    self._inner.write(item)
                except BaseException as e:
                    self._err = e  # surface on next write()/close()

    def _check(self):
        if self._err is not None:
            raise self._err  # sticky: a failed stream stays failed

    def write(self, frame: np.ndarray):
        self._check()
        self._q.put(frame)

    def close(self):
        self._q.put(_SENTINEL)
        self._thread.join()
        try:
            self._inner.close()  # always finalize the container
        finally:
            self._check()  # then surface any worker failure

    @property
    def path(self):
        return getattr(self._inner, "path", None)

