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
    # bf16 inputs keep a bf16 output dtype: the MXU accumulates f32
    # internally either way, and an f32 preferred_element_type would make
    # the conv's AD transpose pair an f32 cotangent with bf16 weights
    pet = jnp.float32 if x.dtype == jnp.float32 else x.dtype
    out = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pet,
        precision=precision,
    )
    if b is not None:
        out = out + b.astype(pet)
    return out.astype(x.dtype)


def reflect_conv(x, w, b=None, stride: int = 1, relu: bool = False):
    """ReflectionPad(k//2) + Conv(kxk, VALID, stride) [+ ReLU]."""
    pad = (w.shape[0] - 1) // 2
    x = reflect_pad_2d(x, pad)
    out = conv2d_nhwc(x, w, b, stride=stride)
    if relu:
        out = jax.nn.relu(out)
    return out


def reflect_pad_2d_nchw(x, pad: int):
    """Reflection-pad H and W of an NCHW tensor."""
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)),
                   mode="reflect")


def conv2d_nchw(x, w, b=None, stride: int = 1, padding="VALID"):
    """NCHW x HWIO convolution, same precision policy as conv2d_nhwc.

    NCHW is the right layout for the small-channel (4/16/64ch) f32
    stages on TPU: XLA tiles the two minor dims (H sublanes, W lanes),
    so channel counts far below 128 cost no lane padding. The NHWC
    layout measured 8-32x memory expansion on the training step's saved
    residuals (f32[2,258,258,4] padded to 128 lanes) — see PERF.md.
    """
    precision = (
        lax.Precision.HIGHEST if x.dtype == jnp.float32 else lax.Precision.DEFAULT
    )
    pet = jnp.float32 if x.dtype == jnp.float32 else x.dtype  # see conv2d_nhwc
    out = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        preferred_element_type=pet,
        precision=precision,
    )
    if b is not None:
        out = out + b.astype(pet)[None, :, None, None]
    return out.astype(x.dtype)


# Below this stream channel count the conv runs as shift+einsum dots
# instead of lax.conv: XLA lowers small-C convolutions (and especially
# their dgrad/wgrad) through channels-minor layouts that pad C to the
# 128-lane tile (8-32x memory expansion) — measured ~7 s for one
# backward through the 30-block stack at 256^2/b2 vs ~0.3 s forward
# (PERF.md). A (Cin,Cout) einsum with H,W on the tiled dims keeps both
# directions of AD in natural layouts.
DOT_CONV_MAX_CHANNELS = 64


def conv2d_nchw_dot(x, w, b=None, stride: int = 1):
    """3x3 (or kxk) VALID conv as k*k shifted (Cin,Cout) einsums.

    x: (B, Cin, H+2p, W+2p) already padded; w: HWIO. The channel
    contraction runs on the MXU with H,W untouched on the sublane/lane
    dims, so neither the forward nor its transposes (dgrad: same shape
    einsums; wgrad: contraction over B,H,W producing (Cin,Cout)) ever
    materialize a channels-minor tile. XLA fuses the k*k partial sums.
    """
    kh, kw, cin, cout = w.shape
    bsz, _, hp, wp = x.shape
    ho = (hp - kh) // stride + 1
    wo = (wp - kw) // stride + 1
    precision = (
        lax.Precision.HIGHEST if x.dtype == jnp.float32 else lax.Precision.DEFAULT
    )
    wf = w.astype(x.dtype)
    pet = jnp.float32 if x.dtype == jnp.float32 else x.dtype  # see conv2d_nhwc
    out = None
    for r in range(kh):
        for c in range(kw):
            tap = lax.slice(
                x, (0, 0, r, c),
                (bsz, cin, r + (ho - 1) * stride + 1, c + (wo - 1) * stride + 1),
                (1, 1, stride, stride))
            part = jnp.einsum("bchw,co->bohw", tap, wf[r, c],
                              precision=precision,
                              preferred_element_type=pet)
            out = part if out is None else out + part
    if b is not None:
        out = out + b.astype(pet)[None, :, None, None]
    return out.astype(x.dtype)


def reflect_conv_nchw(x, w, b=None, stride: int = 1, relu: bool = False):
    pad = (w.shape[0] - 1) // 2
    x = reflect_pad_2d_nchw(x, pad)
    if w.shape[3] <= DOT_CONV_MAX_CHANNELS and w.shape[2] <= DOT_CONV_MAX_CHANNELS:
        out = conv2d_nchw_dot(x, w, b, stride=stride)
    else:
        out = conv2d_nchw(x, w, b, stride=stride)
    if relu:
        out = jax.nn.relu(out)
    return out


def residual_branch_nchw(x, params, stride: int = 1):
    """NCHW twin of residual_branch (same math, same HWIO weights)."""
    c = params
    h = reflect_conv_nchw(x, c["conv1"]["w"], c["conv1"]["b"],
                          stride=stride, relu=True)
    h = reflect_conv_nchw(h, c["conv2"]["w"], c["conv2"]["b"],
                          stride=1, relu=True)
    return reflect_conv_nchw(h, c["conv3"]["w"], c["conv3"]["b"],
                             stride=1, relu=False)


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
