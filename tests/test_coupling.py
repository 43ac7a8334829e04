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


def test_invconv_exact_inverse(rng):
    import jax

    from vstnet_tpu.ops.invconv import (
        init_invconv,
        invconv_forward,
        invconv_inverse,
    )

    p = init_invconv(jax.random.PRNGKey(0), 16)
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 16)), jnp.float32)
    y = invconv_forward(p, x)
    np.testing.assert_allclose(
        np.asarray(invconv_inverse(p, y)), np.asarray(x),
        rtol=1e-5, atol=1e-5)


def test_invconv_parity_reference(rng):
    """Forward/inverse parity vs the reference InvConv2d
    (/root/reference/models/RevResNet.py:46-65) with shared weights."""
    import sys
    import types

    import torch

    from vstnet_tpu.ops.invconv import invconv_forward, invconv_inverse

    todos = types.ModuleType("todos")
    todos.debug = types.SimpleNamespace(output_var=lambda *a, **k: None)
    sys.modules.setdefault("todos", todos)
    sys.path.insert(0, "/root/reference")
    try:
        from models.RevResNet import InvConv2d  # type: ignore
    finally:
        sys.path.remove("/root/reference")

    c = 12
    ref = InvConv2d(c)
    p = {
        "w": jnp.asarray(ref.weight.detach().numpy()[:, :, 0, 0]),
        "b": jnp.asarray(ref.bias.detach().numpy()[0, :, 0, 0]),
    }
    x = rng.standard_normal((2, 5, 7, c)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        yt = ref(xt).numpy().transpose(0, 2, 3, 1)
        it = ref.inverse(torch.from_numpy(yt.transpose(0, 3, 1, 2)))
        it = it.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(
        np.asarray(invconv_forward(p, jnp.asarray(x))), yt,
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(invconv_inverse(p, jnp.asarray(yt))), it,
        rtol=1e-3, atol=1e-4)
