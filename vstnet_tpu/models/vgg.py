"""VGG19 loss encoder (vgg_normalised layout), JAX/NHWC.

Capability parity with the reference VGG19 loss network
(/root/reference/models/VGG.py:16-138): the custom `vgg_normalised`
Sequential — a 1x1 RGB conv first, reflection-padded 3x3 convs, ceil-mode
max pools — producing relu1_1..relu5_1 features; AdaIN-style style loss
(MSE of per-layer channel mean/std) and content loss at relu4_1.

The torch checkpoint (`vgg_normalised.pth`, bare Sequential state_dict with
integer keys) converts via vgg_from_torch.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from vstnet_tpu.ops.pad_conv import reflect_conv

# Sequential indices of conv layers in the vgg_normalised layout
# (/root/reference/models/VGG.py:16-72), grouped by the slice boundaries the
# reference uses (enc_1..enc_5 ending at relu{1..5}_1).
_CONV_IDX = [0, 2, 5, 9, 12, 16, 19, 22, 25, 29, 32, 35, 38, 42]
# pools sit immediately before convs 9(relu2_1's block), 16, 29, 42
_POOL_BEFORE = {5: False, 9: True, 16: True, 29: True, 42: True}
# capture points: conv index -> feature name
_CAPTURE = {2: "relu1_1", 9: "relu2_1", 16: "relu3_1", 29: "relu4_1", 42: "relu5_1"}


def _max_pool_ceil(x):
    """2x2/2 max pool with ceil_mode=True (torch MaxPool2d(ceil_mode=True)):
    odd H/W get one extra bottom/right cell fed by -inf padding."""
    h, w = x.shape[1], x.shape[2]
    pads = [(0, 0), (0, h % 2), (0, w % 2), (0, 0)]
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), pads
    )


def vgg_features(params: List[Dict], x, n_layer: int = 4):
    """x NHWC in [0,1] -> [relu1_1, ..., relu{n_layer}_1]."""
    feats = []
    # conv 0: 1x1, no pad, no relu. bf16 inputs keep bf16 output dtype
    # (an f32 preferred_element_type breaks the conv AD transpose against
    # bf16 weights — see ops/pad_conv.py)
    pet = jnp.float32 if x.dtype == jnp.float32 else x.dtype
    x = lax.conv_general_dilated(
        x, params[0]["w"].astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pet,
        precision=(lax.Precision.HIGHEST if x.dtype == jnp.float32
                   else lax.Precision.DEFAULT),
    ).astype(x.dtype) + params[0]["b"].astype(x.dtype)

    for p, idx in zip(params[1:], _CONV_IDX[1:]):
        if _POOL_BEFORE.get(idx):
            x = _max_pool_ceil(x)
        x = reflect_conv(x, p["w"], p["b"], relu=True)
        name = _CAPTURE.get(idx)
        if name:
            feats.append(x)
            if len(feats) >= n_layer:
                break
    return feats


def calc_mean_std(feat, eps: float = 1e-5):
    """Per-sample, per-channel spatial mean/std (VGG.py:5-13).

    f32 statistics regardless of feature dtype (bf16 variance cancels
    catastrophically; the cast's AD converts cotangents cleanly)."""
    feat = feat.astype(jnp.float32)
    mean = jnp.mean(feat, axis=(1, 2))
    # unbiased variance (ddof=1) — torch .var() default (VGG.py:10)
    var = jnp.var(feat, axis=(1, 2), ddof=1) + eps
    return mean, jnp.sqrt(var)


def style_loss(stylized_feats, style_feats):
    loss = 0.0
    for sf, tf in zip(stylized_feats, style_feats):
        sm, ss = calc_mean_std(sf)
        tm, ts = calc_mean_std(tf)
        loss = loss + jnp.mean((sm - tm) ** 2) + jnp.mean((ss - ts) ** 2)
    return loss


def content_loss(stylized_feat, content_feat):
    return jnp.mean((stylized_feat.astype(jnp.float32)
                     - content_feat.astype(jnp.float32)) ** 2)


def vgg_losses(params, content, style, stylized, n_layer: int = 4,
               content_weight: float = 0.0):
    """(loss_c, loss_s) — the reference VGG19.forward contract
    (VGG.py:120-138)."""
    style_feats = vgg_features(params, style, n_layer)
    stylized_feats = vgg_features(params, stylized, n_layer)
    loss_s = style_loss(stylized_feats, style_feats)
    if content_weight > 0:
        cf = vgg_features(params, content, 4)[-1]
        loss_c = content_loss(stylized_feats[3], cf)
    else:
        loss_c = jnp.asarray(0.0)
    return loss_c, loss_s


# ---------------------------------------------------------------------------
# Init / conversion
# ---------------------------------------------------------------------------

_CHANNELS = [
    (3, 3), (3, 64), (64, 64), (64, 128), (128, 128),
    (128, 256), (256, 256), (256, 256), (256, 256),
    (256, 512), (512, 512), (512, 512), (512, 512), (512, 512),
]


def init_vgg(key) -> List[Dict]:
    params = []
    for k, (cin, cout) in zip(jax.random.split(key, len(_CHANNELS)), _CHANNELS):
        ksz = 1 if cin == 3 and cout == 3 else 3
        fan_in = ksz * ksz * cin
        bound = (1.0 / fan_in) ** 0.5
        params.append({
            "w": jax.random.uniform(k, (ksz, ksz, cin, cout), jnp.float32,
                                    -bound, bound),
            "b": jnp.zeros((cout,)),
        })
    return params


def vgg_from_torch(sd: Dict[str, np.ndarray]) -> List[Dict]:
    """Bare-Sequential state_dict ('0.weight', '2.weight', ...) -> params."""
    params = []
    for idx in _CONV_IDX:
        w = np.asarray(sd[f"{idx}.weight"]).transpose(2, 3, 1, 0)
        params.append({
            "w": jnp.asarray(w),
            "b": jnp.asarray(sd[f"{idx}.bias"]),
        })
    return params


def vgg_to_torch(params: List[Dict]) -> Dict[str, np.ndarray]:
    """Inverse of vgg_from_torch (bare-Sequential key layout)."""
    out = {}
    for idx, p in zip(_CONV_IDX, params):
        out[f"{idx}.weight"] = np.asarray(p["w"]).transpose(3, 2, 0, 1)
        out[f"{idx}.bias"] = np.asarray(p["b"])
    return out


def load_vgg(path: str, strict: bool = True, seed: int = 0) -> List[Dict]:
    from vstnet_tpu.io.checkpoint import load_torch_state_dict

    sd = load_torch_state_dict(path)
    if not strict:
        import jax

        from vstnet_tpu.io.checkpoint import tolerant_state_dict

        expected = vgg_to_torch(init_vgg(jax.random.PRNGKey(seed)))
        sd = tolerant_state_dict(sd, expected, label=path)
    return vgg_from_torch(sd)
