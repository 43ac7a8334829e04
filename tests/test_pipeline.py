"""End-to-end pipeline and CLI tests (random weights, small config via the
real configs — kept tiny so CPU tests stay fast)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from vstnet_tpu.config import RevResNetConfig
from vstnet_tpu.models.pipeline import StyleModel, photo_forward
from vstnet_tpu.models.revresnet import init_revresnet

import jax

SMALL = RevResNetConfig(n_blocks=(2, 2, 2), hidden_dim=16, sp_steps=2)


@pytest.fixture
def small_model():
    return StyleModel(
        cfg=SMALL, params=init_revresnet(jax.random.PRNGKey(0), SMALL)
    )


def test_stylize_global(small_model, rng):
    c = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    out = small_model.stylize(c, s)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_stylize_masked(small_model, rng):
    c = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    cm = jnp.asarray(np.repeat(np.arange(2), 512).reshape(1, 32, 32))
    sm = cm
    out = small_model.stylize(c, s, cm, sm)
    assert out.shape == (1, 32, 32, 3)


def test_stylize_alpha_c(small_model, rng):
    c = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    out = small_model.stylize(c, s, alpha_c=0.5)
    assert out.shape == (1, 32, 32, 3)
    # alpha_c=1.0 reproduces the content (up to cholesky noise)
    out1 = small_model.stylize(c, s, alpha_c=1.0)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(c), atol=1e-2)


def test_photo_pipeline_unpadded_input(small_model, rng):
    """Non-/4 input: pipeline pads, stylizes, resizes back to original."""
    c = jnp.asarray(rng.uniform(size=(1, 30, 34, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(size=(1, 26, 30, 3)), jnp.float32)
    out = small_model.photo_pipeline(c, s)
    assert out.shape == (1, 30, 34, 3)
    a = np.asarray(out)
    assert np.isfinite(a).all() and a.min() >= 0.0 and a.max() <= 1.0


def test_photo_forward_luminance_preserved(small_model, rng):
    """The Lab blend keeps the content's L channel exactly."""
    from vstnet_tpu.ops.color import rgb2lab

    c = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    dummy = jnp.zeros((1, 32, 32), jnp.int32)
    out = photo_forward(
        small_model.params, c, s, dummy, dummy, SMALL, use_masks=False
    )
    l_in = np.asarray(rgb2lab(c))[..., 0]
    l_out = np.asarray(rgb2lab(out))[..., 0]
    # L survives the lab->rgb->lab round trip up to gamut clipping
    np.testing.assert_allclose(l_out, l_in, atol=5e-2)


def test_cli_image_transfer(tmp_path, monkeypatch):
    """Run the CLI end-to-end on the bundled reference sample images
    (read-only inputs) with random weights."""
    from vstnet_tpu.cli.image_transfer import main

    out = main([
        "--content", "/root/reference/data/content/05.jpg",
        "--style", "/root/reference/data/style/05.jpg",
        "--out_dir", str(tmp_path),
        "--max_size", "64",
    ])
    assert os.path.exists(out)
    from PIL import Image

    img = Image.open(out)
    assert img.size[0] > 0


def test_cli_checkpoint_roundtrip(tmp_path):
    """CLI loads a reference-format checkpoint written by our converter."""
    from vstnet_tpu.cli.image_transfer import main
    from vstnet_tpu.io.checkpoint import save_torch_checkpoint

    params = init_revresnet(jax.random.PRNGKey(1), SMALL)
    # full-size config checkpoint so the CLI default config matches
    from vstnet_tpu.config import PHOTO_CONFIG

    params = init_revresnet(jax.random.PRNGKey(1), PHOTO_CONFIG)
    ck = str(tmp_path / "photo.pt")
    save_torch_checkpoint(params, ck)

    out = main([
        "--ckpoint", ck,
        "--content", "/root/reference/data/content/05.jpg",
        "--style", "/root/reference/data/style/05.jpg",
        "--out_dir", str(tmp_path),
        "--max_size", "32",
    ])
    assert os.path.exists(out)


def test_package_factory_surface(rng):
    """The reference package's five factories (image_style/__init__.py:
    24-127) all exist and the enc/dec pair round-trips: decoder(encoder(x))
    recovers x (clamped), on random weights."""
    import vstnet_tpu as v

    enc, dev = v.get_vstnet_encoder_model(mode="photorealistic")
    dec, _ = v.get_vstnet_decoder_model(mode="photorealistic")
    seg_fn, _ = v.get_segment_model()
    assert dev is not None

    x = jnp.asarray(rng.uniform(0.1, 0.9, size=(1, 32, 32, 3)), jnp.float32)
    z = enc(x)
    y = dec(z)
    assert y.shape == x.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                               rtol=1e-3, atol=1e-3)
    m = seg_fn(x)
    assert m.shape == (1, 32, 32) and m.dtype == jnp.int32


def test_photo_pipeline_autoseg_batched(small_model, rng):
    """Auto-seg inside photo_pipeline: same-shape content/style route
    through ONE batched segmenter pass + one batched encode; outputs
    stay per-image (no cross-talk with the mismatched-shape route)."""
    from vstnet_tpu.models.segformer import Segmenter, DEPTHS

    seg = Segmenter.load(None, depths=(1, 1, 1, 1))
    m = StyleModel(cfg=small_model.cfg, params=small_model.params,
                   segmenter=seg)
    c = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    out = m.photo_pipeline(c, s)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()

    # mismatched shapes take the two-pass branch; same contract
    s2 = jnp.asarray(rng.uniform(size=(1, 48, 32, 3)), jnp.float32)
    out2 = m.photo_pipeline(c, s2)
    assert out2.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out2)).all()


def test_stylize_interp_alpha_traced_no_recompile(small_model, rng):
    """alpha_c is a traced scalar: an interpolation sweep reuses ONE
    compiled program (the reference teaser sweeps alpha, README.md:108-120;
    a static alpha_c would recompile per value)."""
    from vstnet_tpu.models.pipeline import stylize_interp

    c = jnp.asarray(rng.uniform(size=(1, 16, 16, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(size=(1, 1, 16, 16, 3)), jnp.float32)
    alpha_s = jnp.asarray([1.0])

    with jax.log_compiles(False):
        outs = []
        n0 = stylize_interp._cache_size()
        for a in (0.0, 0.25, 0.5, 1.0):
            outs.append(np.asarray(stylize_interp(
                small_model.params, c, s, alpha_s, small_model.cfg,
                alpha_c=a)))
        assert stylize_interp._cache_size() == n0 + 1
    # alpha actually changes the output
    assert not np.allclose(outs[0], outs[-1])


def test_cli_ultra_regional_and_interp(tmp_path, monkeypatch):
    """Ultra-res CLI modes above --ultra_threshold: regional (manual segs)
    and alpha_c interpolation both route through the streaming tiler
    (the round-2 hard error is gone)."""
    import vstnet_tpu.models.pipeline as pl
    from PIL import Image

    from vstnet_tpu.cli.image_transfer import main

    monkeypatch.setattr(pl, "PHOTO_CONFIG", SMALL)
    rng = np.random.default_rng(3)
    Image.fromarray((rng.uniform(size=(96, 96, 3)) * 255).astype(np.uint8)
                    ).save(tmp_path / "c.png")
    Image.fromarray((rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8)
                    ).save(tmp_path / "s.png")
    # two-tone manual segmentation images (grayscale labels)
    cm = np.zeros((96, 96), np.uint8)
    cm[:, 48:] = 1
    sm = np.zeros((64, 64), np.uint8)
    sm[:, 32:] = 1
    Image.fromarray(cm).save(tmp_path / "cseg.png")
    Image.fromarray(sm).save(tmp_path / "sseg.png")

    out = main([
        "--content", str(tmp_path / "c.png"),
        "--style", str(tmp_path / "s.png"),
        "--content_seg", str(tmp_path / "cseg.png"),
        "--style_seg", str(tmp_path / "sseg.png"),
        "--out_dir", str(tmp_path / "o1"),
        "--max_size", "96", "--ultra_threshold", "64",
        "--tile", "64", "--overlap", "16",
    ])
    assert os.path.exists(out)
    assert Image.open(out).size == (96, 96)

    out2 = main([
        "--content", str(tmp_path / "c.png"),
        "--style", str(tmp_path / "s.png"),
        "--alpha_c", "0.5",
        "--out_dir", str(tmp_path / "o2"),
        "--max_size", "96", "--ultra_threshold", "64",
        "--tile", "64", "--overlap", "16",
    ])
    assert os.path.exists(out2)


def test_image_photo_predict_glob(tmp_path, monkeypatch):
    """image_photo_predict accepts a glob pattern string — the reference
    demo.py calling convention (project/demo.py:3)."""
    import vstnet_tpu.models.pipeline as pl
    from PIL import Image

    monkeypatch.setattr(pl, "PHOTO_CONFIG", SMALL)
    rng = np.random.default_rng(4)
    for i in range(2):
        Image.fromarray(
            (rng.uniform(size=(32, 32, 3)) * 255).astype(np.uint8)
        ).save(tmp_path / f"c{i}.jpg")
    Image.fromarray(
        (rng.uniform(size=(32, 32, 3)) * 255).astype(np.uint8)
    ).save(tmp_path / "s.jpg")

    from vstnet_tpu.models.pipeline import image_photo_predict

    outs = image_photo_predict(str(tmp_path / "c*.jpg"),
                               str(tmp_path / "s.jpg"),
                               str(tmp_path / "out"))
    assert len(outs) == 2 and all(os.path.exists(p) for p in outs)
    # triptych: [content | style | output]
    img = Image.open(outs[0])
    assert img.size == (96, 32)

    with pytest.raises(FileNotFoundError):
        image_photo_predict(str(tmp_path / "zzz*.jpg"),
                            str(tmp_path / "s.jpg"), str(tmp_path / "out"))


def test_stylize_multi_interpolation(rng):
    """Multi-style alpha_s mixing (reference cWCT.interpolation semantics):
    S=1 w=[1] degenerates to plain transfer; the fused bf16 path agrees
    with the f32 path; asymmetric weights move the output toward the
    heavier style."""
    from vstnet_tpu.models.pipeline import StyleModel, stylize

    model = StyleModel(cfg=SMALL,
                       params=init_revresnet(jax.random.PRNGKey(3), SMALL))
    c = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    s1 = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    s2 = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)) * 0.3, jnp.float32)

    def psnr(a, b):
        mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
        return 10 * np.log10(1.0 / mse) if mse > 0 else float("inf")

    # S=1, w=[1], alpha_c=0 == plain global transfer
    one = model.stylize_multi(c, s1, [1.0])
    ref = stylize(model.params, c, s1, SMALL)
    assert psnr(one, ref) >= 55.0

    # (the fused-path agreement check lives in test_fast_path.py, which
    # carries the CPU interpret-mode fixture for Pallas kernels)
    styles = jnp.concatenate([s1, s2], axis=0)  # (2, 32, 32, 3)

    # weights steer the result: w favoring s1 lands closer to the pure-s1
    # transfer than w favoring s2 does
    near1 = model.stylize_multi(c, styles, [0.9, 0.1])
    near2 = model.stylize_multi(c, styles, [0.1, 0.9])
    pure1 = np.asarray(stylize(model.params, c, s1, SMALL))
    d1 = float(np.mean((np.asarray(near1) - pure1) ** 2))
    d2 = float(np.mean((np.asarray(near2) - pure1) ** 2))
    assert d1 < d2


def test_cli_multi_style(tmp_path):
    """--styles A B --alpha_s w1 w2: multi-style interpolation end-to-end,
    output named after both styles."""
    from vstnet_tpu.cli.image_transfer import main

    out = main([
        "--content", "/root/reference/data/content/05.jpg",
        "--styles", "/root/reference/data/style/05.jpg",
        "/root/reference/data/style/06.png",
        "--alpha_s", "1", "3",
        "--out_dir", str(tmp_path),
        "--max_size", "64",
    ])
    assert os.path.exists(out)
    assert "05+06" in os.path.basename(out)

    # flag validation
    import pytest

    with pytest.raises(SystemExit):
        main(["--styles", "a.jpg", "b.jpg", "--alpha_s", "1",
              "--out_dir", str(tmp_path)])
    with pytest.raises(SystemExit):
        main(["--alpha_s", "1", "--out_dir", str(tmp_path)])
