"""Standalone native driver (native/build/vstnet-native): artifact + PNG in,
PNG out, no Python/JAX in the execute path — the counterpart of the
reference's runnable binary (/root/reference/project/ggml/main.cpp:35-107).
Gated at the reference's cross-backend tolerance (rtol=atol=0.01,
project/smoke.py:145) plus uint8 save quantization."""

import os
import subprocess

import numpy as np
import pytest

DRIVER = os.path.join(os.path.dirname(__file__), "..", "native", "build",
                      "vstnet-native")

# One relay outage should cost the suite ONE probe timeout, not one per
# driver test: the first test that times out flips this and the rest skip
# immediately.
_BACKEND_DOWN = [False]


def _run_driver(cmd, timeout=540):
    if _BACKEND_DOWN[0]:
        pytest.skip("device backend unreachable (memoized this session)")
    try:
        return subprocess.run(cmd, capture_output=True, text=True,
                              timeout=timeout)
    except subprocess.TimeoutExpired:
        _BACKEND_DOWN[0] = True
        pytest.skip("device backend unreachable (driver timed out)")


@pytest.mark.skipif(not os.path.exists(DRIVER),
                    reason="vstnet-native not built (make main)")
def test_native_driver_stylize_png(tmp_path, rng):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from vstnet_tpu.config import RevResNetConfig
    from vstnet_tpu.models import cwct
    from vstnet_tpu.models.revresnet import decode, encode, init_revresnet
    from vstnet_tpu.runtime.export import export_stylize
    from vstnet_tpu.runtime.native import PLUGIN_CANDIDATES

    plugin = next((p for p in PLUGIN_CANDIDATES if os.path.exists(p)), None)
    if plugin is None:
        pytest.skip("no PJRT plugin on this machine")
    platform = ("tpu" if ("tpu" in os.path.basename(plugin)
                          or "axon" in os.path.basename(plugin)) else "cpu")

    cfg = RevResNetConfig(n_blocks=(1, 1, 1))
    params = init_revresnet(jax.random.PRNGKey(0), cfg)
    mlir, _ = export_stylize(params, cfg, 32, 32, platforms=(platform,))
    art = tmp_path / "stylize.mlir"
    art.write_bytes(mlir)

    c8 = (rng.uniform(size=(32, 32, 3)) * 255).astype(np.uint8)
    s8 = (rng.uniform(size=(32, 32, 3)) * 255).astype(np.uint8)
    Image.fromarray(c8).save(tmp_path / "content.png")
    Image.fromarray(s8).save(tmp_path / "style.png")

    # a dead/wedged relay makes PJRT client init hang, not fail —
    # device unavailability is an environment condition, not a bug
    r = _run_driver(
        [DRIVER, "--artifact", str(art),
         "--style", str(tmp_path / "style.png"),
         "-o", str(tmp_path / "out"), str(tmp_path / "content.png")])
    if r.returncode != 0 and any(
            m in r.stderr for m in ("PJRT client", "UNAVAILABLE",
                                    "Unavailable", "connect")):
        pytest.skip(f"plugin unusable here: {r.stderr[-200:]}")
    assert r.returncode == 0, f"driver failed:\n{r.stdout}\n{r.stderr}"

    out = np.asarray(Image.open(tmp_path / "out" / "content_style.png"),
                     np.float32) / 255.0
    c = jnp.asarray(c8[None].astype(np.float32) / 255.0)
    s = jnp.asarray(s8[None].astype(np.float32) / 255.0)
    ref = np.clip(np.asarray(decode(
        params, cwct.transfer(encode(params, c, cfg), encode(params, s, cfg)),
        cfg))[0], 0.0, 1.0)
    np.testing.assert_allclose(out, ref, atol=0.015)


def test_native_image_io_png_roundtrip(tmp_path, rng):
    """The driver's PNG codec reads PIL-written PNGs and writes PNGs PIL
    can read (via a tiny identity run is overkill — test the codec through
    the binary's failure modes instead): a truncated file errors cleanly."""
    if not os.path.exists(DRIVER):
        pytest.skip("vstnet-native not built")
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"\x89PNG\r\n\x1a\nnot-really")
    r = subprocess.run(
        [DRIVER, "--artifact", str(bad), "--style", str(bad), "-o",
         str(tmp_path), str(bad)],
        capture_output=True, text=True, timeout=60)
    assert r.returncode != 0
    assert "error" in r.stderr.lower()


@pytest.mark.skipif(not os.path.exists(DRIVER),
                    reason="vstnet-native not built (make main)")
def test_native_driver_segment_render_png(tmp_path, rng):
    """1-input mode: the segment-render artifact (the reference native
    binary's actual function, main.cpp:75-98 — segment + palette blend)
    runs through the same driver with no --style; mode is read from the
    artifact's @main signature."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from vstnet_tpu.models.remapping import (
        ade20k_palette,
        load_label_mapping,
        self_remapping,
    )
    from vstnet_tpu.models.segformer import init_segformer, segment_mask
    from vstnet_tpu.runtime.export import export_segment_render
    from vstnet_tpu.runtime.native import PLUGIN_CANDIDATES

    plugin = next((p for p in PLUGIN_CANDIDATES if os.path.exists(p)), None)
    if plugin is None:
        pytest.skip("no PJRT plugin on this machine")
    platform = ("tpu" if ("tpu" in os.path.basename(plugin)
                          or "axon" in os.path.basename(plugin)) else "cpu")

    seg_params = init_segformer(jax.random.PRNGKey(4), depths=(1, 1, 1, 1))
    mlir, _ = export_segment_render(seg_params, 32, 32,
                                    platforms=(platform,))
    art = tmp_path / "segrender.mlir"
    art.write_bytes(mlir)

    c8 = (rng.uniform(size=(32, 32, 3)) * 255).astype(np.uint8)
    Image.fromarray(c8).save(tmp_path / "scene.png")

    r = _run_driver(
        [DRIVER, "--artifact", str(art),
         "-o", str(tmp_path / "out"), str(tmp_path / "scene.png")])
    if r.returncode != 0 and any(
            m in r.stderr for m in ("PJRT client", "UNAVAILABLE",
                                    "Unavailable", "connect")):
        pytest.skip(f"plugin unusable here: {r.stderr[-200:]}")
    assert r.returncode == 0, f"driver failed:\n{r.stdout}\n{r.stderr}"

    out = np.asarray(Image.open(tmp_path / "out" / "scene_seg.png"),
                     np.float32) / 255.0
    x = jnp.asarray(c8[None].astype(np.float32) / 255.0)
    m = self_remapping(segment_mask(seg_params, x), load_label_mapping(),
                       0.02)
    pal = np.asarray(ade20k_palette(), np.float32) / 255.0

    # Random-init logits have near-tied argmax pixels, and a single
    # cross-backend flip cascades through self_remapping's area
    # thresholds into whole-region relabels — so gate mask-aware
    # instead of pixelwise-exact: every output pixel must be a valid
    # 50/50 palette blend of the input (the actual driver-correctness
    # check), and the recovered mask must broadly agree with the JAX
    # reference mask (tie cascades cost a few %; a wrong input/weights
    # bug scores near zero).
    xs = np.asarray(x)[0]
    cand = 0.5 * pal[None, None, :, :] + 0.5 * xs[:, :, None, :]
    err = np.abs(np.clip(cand, 0.0, 1.0) - out[:, :, None, :]).max(-1)
    rec = err.argmin(-1)
    assert err.min(-1).max() < 0.015, (
        f"pixels that are no palette blend at all: worst {err.min(-1).max()}")
    ref_m = np.asarray(m)[0]
    # compare rendered colors (argmin can land on a duplicate palette row)
    agree = (pal[rec] == pal[np.clip(ref_m, 0, len(pal) - 1)]).all(-1).mean()
    assert agree >= 0.95, f"mask agreement {agree:.3f} < 0.95"


@pytest.mark.skipif(not os.path.exists(DRIVER),
                    reason="vstnet-native not built (make main)")
def test_native_driver_stylize_requires_style(tmp_path):
    """A 2-input artifact without --style is a clean CLI error, not a
    crash (checked before any device/plugin work, so it runs everywhere)."""
    art = tmp_path / "fake2.mlir"
    art.write_text(
        "func.func public @main(%a: tensor<1x8x8x3xf32>, "
        "%b: tensor<1x8x8x3xf32>) -> (tensor<1x8x8x3xf32>) {\n"
        "  return %a : tensor<1x8x8x3xf32>\n}\n")
    img = tmp_path / "x.png"
    from PIL import Image

    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(img)
    r = subprocess.run(
        [DRIVER, "--artifact", str(art), "-o", str(tmp_path), str(img)],
        capture_output=True, text=True, timeout=60)
    assert r.returncode == 2
    assert "needs --style" in r.stderr


@pytest.mark.skipif(not os.path.exists(DRIVER),
                    reason="vstnet-native not built (make main)")
def test_native_driver_segment_rejects_style(tmp_path):
    """--style with a 1-input artifact is a clean error (it would be
    silently ignored otherwise); checked before any device/plugin work."""
    art = tmp_path / "fake1.mlir"
    art.write_text(
        "func.func public @main(%a: tensor<1x8x8x3xf32>) "
        "-> (tensor<1x8x8x3xf32>) {\n"
        "  return %a : tensor<1x8x8x3xf32>\n}\n")
    img = tmp_path / "x.png"
    from PIL import Image

    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(img)
    r = subprocess.run(
        [DRIVER, "--artifact", str(art), "--style", str(img),
         "-o", str(tmp_path), str(img)],
        capture_output=True, text=True, timeout=60)
    assert r.returncode == 2
    assert "ONE input" in r.stderr
