"""Unit tests for the reversible coupling primitives."""

import jax.numpy as jnp
import numpy as np

from vstnet_tpu.ops.coupling import (
    channel_merge,
    channel_split,
    injective_pad,
    injective_unpad,
    pixel_shuffle,
    pixel_unshuffle,
)


def test_split_merge_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 32)), jnp.float32)
    x1, x2 = channel_split(x)
    assert x1.shape == (2, 8, 8, 16)
    np.testing.assert_array_equal(channel_merge(x1, x2), x)


def test_injective_pad_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 3)), jnp.float32)
    y = injective_pad(x, 29)
    assert y.shape == (1, 4, 4, 32)
    np.testing.assert_array_equal(np.asarray(y)[..., 3:], 0.0)
    np.testing.assert_array_equal(injective_unpad(y, 29), x)


def test_pixel_shuffle_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 6, 10, 16)), jnp.float32)
    d = pixel_unshuffle(x)
    assert d.shape == (2, 3, 5, 64)
    np.testing.assert_array_equal(pixel_shuffle(d), x)


def test_pixel_unshuffle_matches_torch_channel_order(rng):
    """Bit-exact parity with torch pixel_unshuffle channel grouping
    (/root/reference/models/RevResNet.py:34-37): out channel = s1*s*C + s2*C + c."""
    import torch

    x = rng.standard_normal((1, 4, 6, 5)).astype(np.float32)  # NHWC
    ours = np.asarray(pixel_unshuffle(jnp.asarray(x)))

    t = torch.from_numpy(x.transpose(0, 3, 1, 2))  # NCHW
    b, c, h, w = t.shape
    size = 2
    ref = (
        t.reshape(b, c, h // size, size, w // size, size)
        .permute(0, 3, 5, 1, 2, 4)
        .reshape(b, c * size * size, h // size, w // size)
    )
    ref = ref.numpy().transpose(0, 2, 3, 1)  # back to NHWC
    np.testing.assert_array_equal(ours, ref)


def test_pixel_shuffle_matches_torch_channel_order(rng):
    import torch

    x = rng.standard_normal((1, 3, 5, 20)).astype(np.float32)  # NHWC, C=20
    ours = np.asarray(pixel_shuffle(jnp.asarray(x)))

    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    b, c, h, w = t.shape
    size = 2
    nc = c // (size * size)
    ref = (
        t.reshape(b, size, size, nc, h, w)
        .permute(0, 3, 4, 1, 5, 2)
        .reshape(b, nc, h * size, w * size)
    )
    ref = ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(ours, ref)
