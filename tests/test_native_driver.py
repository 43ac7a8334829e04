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

    try:
        r = subprocess.run(
            [DRIVER, "--artifact", str(art),
             "--style", str(tmp_path / "style.png"),
             "-o", str(tmp_path / "out"), str(tmp_path / "content.png")],
            capture_output=True, text=True, timeout=540)
    except subprocess.TimeoutExpired:
        # a dead/wedged relay makes PJRT client init hang, not fail —
        # device unavailability is an environment condition, not a bug
        pytest.skip("device backend unreachable (driver timed out)")
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
