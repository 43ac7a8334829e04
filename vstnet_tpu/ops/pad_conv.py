"""Reflection-padded convolution — the hot primitive of the conv stack.

The reference's residual branch is ReflectionPad2d(1) + Conv2d(3x3) [+ ReLU]
three times (/root/reference/models/RevResNet.py:79-88). Here it is one
fused call: explicit reflect pad (XLA fuses the gather) + VALID conv in
NHWC/HWIO layout, f32 accumulation regardless of compute dtype so bf16
activations keep MXU-native precision.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def reflect_pad_2d(x, pad: int):
    """Reflection-pad H and W of an NHWC tensor (torch ReflectionPad2d)."""
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def conv2d_nhwc(x, w, b=None, stride: int = 1, padding="VALID"):
    """NHWC x HWIO convolution with f32 accumulation.

    `w` has HWIO layout (transposed from torch OIHW at checkpoint load).

    Precision: TPU default precision computes f32 convs via single-pass
    bf16 MXU multiplies (~4e-3 error — measured). When activations are f32
    we request HIGHEST so f32 in means f32 math (the >=40 dB PSNR parity
    gate depends on it); bf16 activations use the native MXU path.
    """
    precision = (
        lax.Precision.HIGHEST if x.dtype == jnp.float32 else lax.Precision.DEFAULT
    )
    out = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


def reflect_conv(x, w, b=None, stride: int = 1, relu: bool = False):
    """ReflectionPad(k//2) + Conv(kxk, VALID, stride) [+ ReLU]."""
    pad = (w.shape[0] - 1) // 2
    x = reflect_pad_2d(x, pad)
    out = conv2d_nhwc(x, w, b, stride=stride)
    if relu:
        out = jax.nn.relu(out)
    return out


def residual_branch(x, params, stride: int = 1):
    """The 3-conv bottleneck F(.) of the additive coupling
    (reference residual_block.conv, /root/reference/models/RevResNet.py:79-88).

    params = {conv1: {w, b}, conv2: {w, b}, conv3: {w, b}}, HWIO weights.
    Left un-jitted so the caller's top-level jit fuses across blocks.
    """
    c = params
    h = reflect_conv(x, c["conv1"]["w"], c["conv1"]["b"], stride=stride, relu=True)
    h = reflect_conv(h, c["conv2"]["w"], c["conv2"]["b"], stride=1, relu=True)
    h = reflect_conv(h, c["conv3"]["w"], c["conv3"]["b"], stride=1, relu=False)
    return h
