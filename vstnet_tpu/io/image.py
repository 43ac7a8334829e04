"""Host-side image I/O (PIL), matching the reference CLI conventions."""

from __future__ import annotations

import os

import numpy as np


def load_image(path: str, max_size: int | None = None,
               down_scale: int | None = None, as_uint8: bool = False):
    """Load RGB image -> float32 NHWC [0,1] with optional resize.

    Resize semantics follow utils.img_resize
    (/root/reference/utils/utils.py:90-101): cap the longest side at
    max_size (BICUBIC), then floor H/W to multiples of down_scale.

    as_uint8=True returns the raw uint8 array instead — upload that and
    normalize on-device (4x less host->device traffic; see
    device_put_image).
    """
    from PIL import Image

    img = Image.open(path).convert("RGB")
    img = resize_pil(img, max_size, down_scale)
    arr = np.asarray(img, dtype=np.uint8)
    if as_uint8:
        return arr[None]
    return (arr.astype(np.float32) / 255.0)[None]  # (1, H, W, 3)


def device_put_image(arr):
    """uint8 NHWC host array -> f32 [0,1] device array, normalizing on
    device so the host link moves 1 byte/channel."""
    import jax.numpy as jnp

    x = jnp.asarray(arr)
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    return x


def resize_pil(img, max_size=None, down_scale=None):
    from PIL import Image

    w, h = img.size
    if max_size is not None and max(w, h) > max_size:
        scale = max_size / max(w, h)
        w, h = int(w * scale), int(h * scale)
        img = img.resize((w, h), Image.BICUBIC)
    if down_scale is not None:
        w2, h2 = w // down_scale * down_scale, h // down_scale * down_scale
        if (w2, h2) != (w, h):
            img = img.resize((w2, h2), Image.BICUBIC)
    return img


def save_image(arr, path: str):
    """Save float NHWC/HWC [0,1]-ish array as PNG (clamped, like the
    reference save path image_transfer.py:217-221)."""
    from PIL import Image

    if not isinstance(arr, np.ndarray) and hasattr(arr, "dtype"):
        # device array: clamp + uint8-pack on device so the host link
        # moves 1 byte/channel instead of 4 (matters on slow transports)
        import jax.numpy as jnp

        arr = np.asarray(
            jnp.round(jnp.clip(arr * 255.0, 0, 255)).astype(jnp.uint8))
    a = np.asarray(arr)
    if a.ndim == 4:
        a = a[0]
    if a.dtype != np.uint8:
        a = np.clip(a * 255.0, 0, 255).astype(np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(a).save(path)
    return path


def load_segment_image(path: str, size_hw=None):
    """Manual segmentation maps: either paletted label PNGs or the 9-color
    RGB convention of utils.load_segment
    (/root/reference/utils/utils.py:104-153). Returns (1, H, W) int32."""
    from PIL import Image

    img = Image.open(path)
    if size_hw is not None:
        img = img.resize((size_hw[1], size_hw[0]), Image.NEAREST)
    arr = np.asarray(img)
    if arr.ndim == 2:
        return arr.astype(np.int32)[None]
    # RGB color-coded: map to the closest of the 9 reference colors.
    colors = np.array(
        [
            (0, 0, 0),        # 0 black
            (255, 255, 255),  # 1 white
            (0, 255, 0),      # 2 green
            (0, 0, 255),      # 3 blue
            (255, 0, 0),      # 4 red
            (255, 255, 0),    # 5 yellow
            (128, 128, 128),  # 6 grey
            (0, 255, 255),    # 7 lightblue
            (255, 0, 255),    # 8 purple
        ],
        dtype=np.int32,
    )
    rgb = arr[..., :3].astype(np.int32)
    dist = np.abs(rgb[:, :, None, :] - colors[None, None, :, :]).sum(-1)
    return dist.argmin(-1).astype(np.int32)[None]
