"""Reversible-coupling primitives, NHWC layout.

These are the exactly-invertible building blocks of the reversible
stylization network: channel split/merge, injective zero-channel padding,
and space-to-depth pixel (un)shuffles.

Channel-ordering note: the reference operates in NCHW and its pixel
(un)shuffle uses the (s1, s2, C) channel grouping
(/root/reference/models/RevResNet.py:34-43,
 /root/reference/project/image_style/vstnet.py:27-39).
We keep the *same logical channel order* on the last (lane) axis so that
converted PyTorch checkpoints produce bit-identical math: for unshuffle,
output channel index = s1 * (size * C) + s2 * C + c, where s1/s2 are the
row/column sub-pixel offsets.

All functions are shape-polymorphic pure functions, safe under jit/vmap.
"""

from __future__ import annotations

import jax.numpy as jnp


def channel_split(x):
    """Split NHWC tensor into two halves along channels."""
    n = x.shape[-1] // 2
    return x[..., :n], x[..., n:]


def channel_merge(x1, x2):
    """Concatenate two NHWC tensors along channels."""
    return jnp.concatenate([x1, x2], axis=-1)


def injective_pad(x, pad: int):
    """Append `pad` zero channels (reference injective_pad.forward,
    /root/reference/models/RevResNet.py:19-28)."""
    if pad == 0:
        return x
    widths = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
    return jnp.pad(x, widths)

def injective_unpad(x, pad: int):
    """Drop the last `pad` channels (inverse of injective_pad)."""
    if pad == 0:
        return x
    return x[..., : x.shape[-1] - pad]


def pixel_unshuffle(x, size: int = 2):
    """Space-to-depth: (B, H, W, C) -> (B, H/s, W/s, s*s*C).

    Output channel order is (s1, s2, c) — matching the reference
    squeeze/vstnet_pixel_unshuffle channel grouping so converted
    checkpoints stay bit-faithful.
    """
    b, h, w, c = x.shape
    nh, nw = h // size, w // size
    x = x.reshape(b, nh, size, nw, size, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # b, nh, nw, s1, s2, c
    return x.reshape(b, nh, nw, size * size * c)


def pixel_shuffle(x, size: int = 2):
    """Depth-to-space: (B, H, W, s*s*C) -> (B, H*s, W*s, C).

    Exact inverse of pixel_unshuffle (same (s1, s2, c) channel grouping).
    """
    b, h, w, c = x.shape
    nc = c // (size * size)
    x = x.reshape(b, h, w, size, size, nc)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # b, h, s1, w, s2, c
    return x.reshape(b, h * size, w * size, nc)


def nchw_to_nhwc(x):
    return jnp.transpose(x, (0, 2, 3, 1))


def nhwc_to_nchw(x):
    return jnp.transpose(x, (0, 3, 1, 2))


# ---------------------------------------------------------------------------
# NCHW twins — used by the f32 training/parity path (models/revresnet.py)
# and the fast path's XLA stages (models/revresnet_fast.py). On TPU, XLA
# tiles the two minor dims (H on sublanes, W on lanes), so NCHW costs no
# lane padding for the 4-64ch streams; NHWC pads C to 128 lanes (up to
# 32x on saved autodiff residuals — see PERF.md).
# ---------------------------------------------------------------------------

def channel_split_nchw(x):
    n = x.shape[1] // 2
    return x[:, :n], x[:, n:]


def channel_merge_nchw(x1, x2):
    return jnp.concatenate([x1, x2], axis=1)


def injective_pad_nchw(x, pad: int):
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))


def injective_unpad_nchw(x, pad: int):
    if pad == 0:
        return x
    return x[:, : x.shape[1] - pad]


def pixel_unshuffle_nchw(x, size: int = 2):
    """(B, C, H, W) -> (B, s*s*C, H/s, W/s), torch (s1, s2, c) order."""
    b, c, h, w = x.shape
    nh, nw = h // size, w // size
    x = x.reshape(b, c, nh, size, nw, size)
    x = x.transpose(0, 3, 5, 1, 2, 4)
    return x.reshape(b, size * size * c, nh, nw)


def pixel_shuffle_nchw(x, size: int = 2):
    b, c, h, w = x.shape
    nc = c // (size * size)
    x = x.reshape(b, size, size, nc, h, w)
    x = x.transpose(0, 3, 4, 1, 5, 2)
    return x.reshape(b, nc, h * size, w * size)
