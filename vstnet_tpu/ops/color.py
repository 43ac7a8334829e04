"""sRGB <-> CIE Lab conversions (NHWC), used for the luminance-preserving
blend of the photo pipeline.

Same math as the reference color module
(/root/reference/project/image_style/color.py:19-113): sRGB gamma with the
0.04045/0.0031308 knees, D65 white point, L scaled to [-1,1] and ab by 110.
Implemented channels-last with fused selects (jnp.where) instead of
mask-multiply arithmetic.
"""

from __future__ import annotations

import jax.numpy as jnp

_RGB2XYZ = jnp.array(
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ],
    dtype=jnp.float32,
)

_XYZ2RGB = jnp.array(
    [
        [3.24048134, -1.53715152, -0.49853633],
        [-0.96925495, 1.87599, 0.04155593],
        [0.05564664, -0.20404134, 1.05731107],
    ],
    dtype=jnp.float32,
)

_WHITE = jnp.array([0.95047, 1.0, 1.08883], dtype=jnp.float32)


def rgb2xyz(rgb):
    lin = jnp.where(
        rgb > 0.04045, ((rgb + 0.055) / 1.055) ** 2.4, rgb / 12.92
    )
    return lin @ _RGB2XYZ.T


def xyz2rgb(xyz):
    rgb = xyz @ _XYZ2RGB.T
    rgb = jnp.maximum(rgb, 0.0)  # avoid NaN in the fractional power
    return jnp.where(
        rgb > 0.0031308, 1.055 * rgb ** (1.0 / 2.4) - 0.055, 12.92 * rgb
    )


def xyz2lab(xyz):
    xyz_scale = xyz / _WHITE
    f = jnp.where(
        xyz_scale > 0.008856,
        jnp.maximum(xyz_scale, 1e-8) ** (1.0 / 3.0),
        7.787 * xyz_scale + 16.0 / 116.0,
    )
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    l = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    return jnp.stack([l, a, b], axis=-1)


def lab2xyz(lab):
    y_int = (lab[..., 0] + 16.0) / 116.0
    x_int = lab[..., 1] / 500.0 + y_int
    z_int = jnp.maximum(y_int - lab[..., 2] / 200.0, 0.0)
    f = jnp.stack([x_int, y_int, z_int], axis=-1)
    out = jnp.where(f > 0.2068966, f ** 3.0, (f - 16.0 / 116.0) / 7.787)
    return out * _WHITE


def rgb2lab(rgb):
    """rgb in [0,1] NHWC -> normalized Lab: L in [-1,1], ab scaled by 110."""
    lab = xyz2lab(rgb2xyz(rgb))
    l_rs = (lab[..., 0:1] - 50.0) / 50.0
    ab_rs = lab[..., 1:3] / 110.0
    return jnp.clip(jnp.concatenate([l_rs, ab_rs], axis=-1), -1.0, 1.0)


def lab2rgb(lab_rs):
    l = lab_rs[..., 0:1] * 50.0 + 50.0
    ab = lab_rs[..., 1:3] * 110.0
    lab = jnp.concatenate([l, ab], axis=-1)
    return jnp.clip(xyz2rgb(lab2xyz(lab)), 0.0, 1.0)
