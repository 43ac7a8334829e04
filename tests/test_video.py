"""Video I/O (pure-Python MJPEG AVI) round trips + reading the reference's
sample video."""

import numpy as np
import pytest

from vstnet_tpu.io.video import AviWriter, read_avi, read_frames


def test_avi_write_read_roundtrip(tmp_path, rng):
    # smooth gradients (JPEG round-trips noise poorly)
    yy, xx = np.mgrid[0:48, 0:64]
    frames = [
        np.stack([(yy * 4 + k * 10) % 256, (xx * 3) % 256,
                  ((yy + xx) * 2) % 256], -1).astype(np.uint8)
        for k in range(5)
    ]
    path = str(tmp_path / "out.avi")
    with AviWriter(path, fps=10, quality=95) as w:
        for f in frames:
            w.write(f)

    back, fps = read_avi(path)
    assert len(back) == 5
    assert fps == pytest.approx(10, rel=0.01)
    assert back[0].shape == (48, 64, 3)
    # JPEG is lossy; just check closeness
    err = np.abs(back[0].astype(int) - frames[0].astype(int)).mean()
    assert err < 16, f"mean abs err {err}"


def test_read_reference_sample_avi():
    frames, fps = read_avi("/root/reference/data/content/04.avi")
    assert len(frames) > 10
    h, w, c = frames[0].shape
    assert c == 3 and h > 0 and w > 0
    assert fps > 0


def test_read_frames_directory(tmp_path, rng):
    from PIL import Image

    for i in range(3):
        Image.fromarray(
            (rng.uniform(size=(16, 16, 3)) * 255).astype(np.uint8)
        ).save(tmp_path / f"{i}.png")
    it, n, fps = read_frames(str(tmp_path))
    assert n == 3
    frames = list(it)
    assert len(frames) == 3 and frames[0].shape == (16, 16, 3)


def _grad_frames(n, h=24, w=32):
    yy, xx = np.mgrid[0:h, 0:w]
    return [
        np.stack([(yy * 5 + k * 16) % 256, (xx * 7) % 256,
                  ((yy + xx) * 3) % 256], -1).astype(np.uint8)
        for k in range(n)
    ]


def test_read_frames_avi_lazy_matches_eager(tmp_path):
    """read_frames decodes per pull (index-only upfront) and must yield
    exactly what the eager read_avi materializes."""
    frames = _grad_frames(6)
    path = str(tmp_path / "lazy.avi")
    with AviWriter(path, fps=12, quality=95) as w:
        for f in frames:
            w.write(f)

    eager, _ = read_avi(path)
    it, n, fps = read_frames(path)
    assert n == 6 and fps == pytest.approx(12, rel=0.01)
    lazy = list(it)
    assert len(lazy) == 6
    for a, b in zip(eager, lazy):
        np.testing.assert_array_equal(a, b)


def test_prefetch_frames_order_and_errors():
    from vstnet_tpu.io.video import prefetch_frames

    frames = _grad_frames(9)
    out = list(prefetch_frames(iter(frames), depth=2))
    assert len(out) == 9
    for a, b in zip(frames, out):
        np.testing.assert_array_equal(a, b)

    def boom():
        yield frames[0]
        raise ValueError("decode failed")

    it = prefetch_frames(boom(), depth=2)
    np.testing.assert_array_equal(next(it), frames[0])
    with pytest.raises(ValueError, match="decode failed"):
        next(it)


def test_async_writer_matches_sync(tmp_path):
    from vstnet_tpu.io.video import AsyncWriter

    frames = _grad_frames(7)
    p_sync = str(tmp_path / "sync.avi")
    p_async = str(tmp_path / "async.avi")

    w = AviWriter(p_sync, fps=10, quality=95)
    for f in frames:
        w.write(f)
    w.close()

    aw = AsyncWriter(AviWriter(p_async, fps=10, quality=95))
    assert aw.path == p_async
    for f in frames:
        aw.write(f)
    aw.close()

    with open(p_sync, "rb") as fa, open(p_async, "rb") as fb:
        assert fa.read() == fb.read()


def test_async_writer_pool_matches_sync(tmp_path):
    """Encode pool (4 workers) must byte-match the serial writer: encoding
    is parallel but the appender restores sequence order."""
    from vstnet_tpu.io.video import AsyncWriter

    frames = _grad_frames(23)
    p_sync = str(tmp_path / "sync.avi")
    p_pool = str(tmp_path / "pool.avi")

    w = AviWriter(p_sync, fps=10, quality=95)
    for f in frames:
        w.write(f)
    w.close()

    aw = AsyncWriter(AviWriter(p_pool, fps=10, quality=95),
                     depth=4, workers=4)
    assert aw._pooled and len(aw._threads) == 4
    for f in frames:
        aw.write(f)
    aw.close()

    with open(p_sync, "rb") as fa, open(p_pool, "rb") as fb:
        assert fa.read() == fb.read()


def test_avi_writer_streams_to_disk(tmp_path):
    """The writer must not buffer JPEGs in RAM: bytes hit the file as
    frames are written, and the only per-frame host state is the 16-byte
    idx1 entry."""
    frames = _grad_frames(8)
    p = str(tmp_path / "stream.avi")
    w = AviWriter(p, fps=10, quality=95)
    import os as _os

    w.write(frames[0])
    w._f.flush()
    size_after_1 = _os.path.getsize(p)
    assert size_after_1 > 200  # header + first frame chunk on disk already
    for f in frames[1:]:
        w.write(f)
    w._f.flush()
    assert _os.path.getsize(p) > size_after_1
    assert not hasattr(w, "_jpegs")  # no in-RAM JPEG accumulation
    assert len(w._idx) == 8
    w.close()

    back, _ = read_avi(p)
    assert len(back) == 8


def test_async_writer_pool_propagates_errors(tmp_path):
    """A write_payload failure in the appender thread surfaces at close()
    even when encoding itself succeeds."""
    from vstnet_tpu.io.video import AsyncWriter

    class FailingAppend(AviWriter):
        def write_payload(self, payload):
            raise RuntimeError("disk full")

    aw = AsyncWriter(FailingAppend(str(tmp_path / "f.avi"), fps=10),
                     workers=2)
    for f in _grad_frames(3):
        aw.write(f)
    with pytest.raises((RuntimeError, ValueError)):
        aw.close()


def test_async_writer_propagates_errors(tmp_path):
    from vstnet_tpu.io.video import AsyncWriter

    class FailingWriter:
        def write(self, frame):
            raise RuntimeError("disk full")

        def close(self):
            pass

    aw = AsyncWriter(FailingWriter())
    aw.write(_grad_frames(1)[0])
    with pytest.raises(RuntimeError, match="disk full"):
        aw.close()


def test_mp4_write_read_roundtrip(tmp_path):
    """cv2-backed .mp4 (the reference's output container, mp4v fourcc):
    make_video_writer routes by extension, read_frames decodes it back."""
    from vstnet_tpu.io.video import have_cv2, make_video_writer, read_frames

    if not have_cv2():
        pytest.skip("cv2 not installed")
    frames = _grad_frames(6, h=48, w=64)
    p = str(tmp_path / "out.mp4")
    w = make_video_writer(p, fps=10)
    assert type(w).__name__ == "Cv2Writer"
    for f in frames:
        w.write(f)
    w.close()

    it, n, fps = read_frames(p)
    back = list(it)
    assert n == 6 and len(back) == 6
    assert fps == pytest.approx(10, rel=0.01)
    assert back[0].shape == (48, 64, 3)
    err = np.abs(back[0].astype(int) - frames[0].astype(int)).mean()
    assert err < 16, f"mean abs err {err}"


def test_make_video_writer_avi_is_pure_python(tmp_path):
    from vstnet_tpu.io.video import make_video_writer

    w = make_video_writer(str(tmp_path / "x.avi"), fps=10)
    assert type(w).__name__ == "AviWriter"
