"""Lab color conversion and resize parity vs the reference torch code."""

import jax.numpy as jnp
import numpy as np
import torch

from vstnet_tpu.ops.color import lab2rgb, rgb2lab
from vstnet_tpu.ops.resize import pad_to_multiple, resize_bilinear


def test_rgb2lab_parity_reference(rng):
    # Import just the color module file (its package __init__ pulls in the
    # full model stack, so load the module directly).
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_color", "/root/reference/project/image_style/color.py"
    )
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    x = rng.uniform(size=(1, 16, 16, 3)).astype(np.float32)
    ours = np.asarray(rgb2lab(jnp.asarray(x)))
    theirs = ref.rgb2lab(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    theirs = theirs.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, atol=2e-5)

    back_ours = np.asarray(lab2rgb(jnp.asarray(ours)))
    back_theirs = ref.lab2rgb(torch.from_numpy(theirs.transpose(0, 3, 1, 2)))
    back_theirs = back_theirs.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(back_ours, back_theirs, atol=2e-5)
    # and the round trip approximately recovers the input
    np.testing.assert_allclose(back_ours, x, atol=2e-3)


def test_resize_bilinear_matches_torch(rng):
    x = rng.uniform(size=(1, 13, 17, 3)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), 32, 24))
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        size=(32, 24),
        mode="bilinear",
        align_corners=False,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_pad_to_multiple():
    x = jnp.ones((1, 13, 18, 3))
    y = pad_to_multiple(x, 4)
    assert y.shape == (1, 16, 20, 3)
    # replicate semantics: padded rows repeat the edge
    np.testing.assert_array_equal(np.asarray(y)[:, 13:, :, :], 1.0)
    assert pad_to_multiple(jnp.ones((1, 16, 20, 3)), 4).shape == (1, 16, 20, 3)


def test_uint8_image_boundary_roundtrip(tmp_path, rng):
    """device_put_image (uint8 upload, on-device normalize) and
    save_image (on-device uint8 pack) agree with the f32 host path."""
    import jax.numpy as jnp
    from PIL import Image
    from vstnet_tpu.io.image import device_put_image, load_image, save_image

    src = (rng.uniform(size=(24, 32, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "x.png")
    Image.fromarray(src).save(p)

    f32 = load_image(p)
    u8 = load_image(p, as_uint8=True)
    assert u8.dtype == np.uint8
    dev = device_put_image(u8)
    np.testing.assert_allclose(np.asarray(dev), f32, atol=1e-6)

    # save a device array: must byte-match the host-side f32 save
    q1 = str(tmp_path / "dev.png")
    q2 = str(tmp_path / "host.png")
    save_image(jnp.asarray(f32), q1)
    save_image(f32, q2)
    np.testing.assert_array_equal(
        np.asarray(Image.open(q1)), np.asarray(Image.open(q2)))
