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
