"""End-to-end video CLI on the 8-device virtual mesh (tiny model): the
multi-device default path (frames sharded over 'data') and the in-graph
auto-seg path (segment -> remap -> masked cWCT in one async program)."""

import jax
import numpy as np
import pytest

from vstnet_tpu.config import RevResNetConfig

SMALL = RevResNetConfig(n_blocks=(1, 1, 1), hidden_dim=16, sp_steps=2)


@pytest.fixture
def tiny_video(tmp_path, rng):
    from PIL import Image

    vdir = tmp_path / "frames"
    vdir.mkdir()
    yy, xx = np.mgrid[0:32, 0:32]
    for i in range(6):
        img = np.stack([(yy * 6 + i * 20) % 256, (xx * 5) % 256,
                        ((xx + yy) * 3) % 256], -1).astype(np.uint8)
        Image.fromarray(img).save(vdir / f"{i:03d}.png")
    style = (rng.uniform(size=(32, 32, 3)) * 255).astype(np.uint8)
    spath = tmp_path / "style.png"
    Image.fromarray(style).save(spath)
    return str(vdir), str(spath)


@pytest.fixture
def small_model(monkeypatch):
    import vstnet_tpu.models.pipeline as pl

    monkeypatch.setattr(pl, "PHOTO_CONFIG", SMALL)
    return SMALL


def test_video_cli_multidevice_global(tiny_video, small_model, tmp_path):
    """Default path: frames sharded over all 8 virtual devices through
    parallel_stylize_factored; output video has every input frame."""
    from vstnet_tpu.cli.video_transfer import main
    from vstnet_tpu.io.video import read_avi, read_frames

    vdir, spath = tiny_video
    out = main(["--video", vdir, "--style", spath,
                "--out_dir", str(tmp_path / "out"),
                "--batch", "1", "--precision", "f32", "--max_size", "32"])
    frames_it, _n, fps = read_frames(out)
    frames = list(frames_it)
    assert len(frames) == 6
    assert frames[0].shape == (32, 32, 3)


def test_video_cli_autoseg_async(tiny_video, small_model, tmp_path,
                                 monkeypatch):
    """Auto-seg path: one jitted segment+remap+masked-stylize program —
    also writes the seg label/color debug videos."""
    import vstnet_tpu.models.segformer as sf
    from vstnet_tpu.cli.video_transfer import main
    from vstnet_tpu.io.video import read_avi, read_frames

    orig_load = sf.Segmenter.load

    def load_tiny(checkpoint=None, **kw):
        kw.setdefault("depths", (1, 1, 1, 1))
        return orig_load(checkpoint, **kw)

    monkeypatch.setattr(sf.Segmenter, "load", load_tiny)

    vdir, spath = tiny_video
    odir = tmp_path / "out_seg"
    out = main(["--video", vdir, "--style", spath, "--out_dir", str(odir),
                "--batch", "1", "--precision", "f32", "--max_size", "32",
                "--auto_seg"])
    frames_it, _n, _ = read_frames(out)
    frames = list(frames_it)
    assert len(frames) == 6
    lbl, _ = read_avi(str(odir / "segmentation" / "content_seg_label.avi"))
    col, _ = read_avi(str(odir / "segmentation" / "content_seg_color.avi"))
    assert len(lbl) == 6 and len(col) == 6
