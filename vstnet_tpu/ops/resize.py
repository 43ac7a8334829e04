"""In-graph image resizing (NHWC).

jax.image.resize with "linear" uses half-pixel sampling — the same
convention as torch F.interpolate(mode="bilinear", align_corners=False)
that the reference pipeline uses (project/image_style/vstnet.py:210,
segment.py:522). Verified by test_resize parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(x, h: int, w: int):
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, h, w, c), method="linear")


def resize_nearest(x, h: int, w: int):
    b = x.shape[0]
    tail = x.shape[3:]
    return jax.image.resize(x, (b, h, w, *tail), method="nearest")


def pad_to_multiple(x, multiple: int = 4, mode: str = "edge"):
    """Replicate-pad H/W up to the next multiple (reference pad_tensor,
    /root/reference/project/image_style/vstnet.py:180-187 uses
    F.pad(mode='replicate') on the right/bottom edges)."""
    h, w = x.shape[1], x.shape[2]
    bp = (multiple - h % multiple) % multiple
    rp = (multiple - w % multiple) % multiple
    if bp == 0 and rp == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, bp), (0, rp), (0, 0)), mode=mode)
