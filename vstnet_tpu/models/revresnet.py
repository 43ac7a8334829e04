"""Reversible residual stylization network (TPU-native, NHWC).

Capability parity with the reference RevResNet
(/root/reference/models/RevResNet.py:166-263) and its package twin
VSTEncoder/VSTDecoder (/root/reference/project/image_style/vstnet.py:223-322):
one weight tree runs both directions —

  encode:  image (B,H,W,3) --inj_pad--> 32ch --split--> 30 additive-coupling
           blocks (stride-2 blocks space-to-depth both streams) --merge-->
           512ch @ H/4 --channel_reduction--> latent
  decode:  exact algebraic inverse, block by block, in reverse order.

Design departures from the reference (TPU-first, not a port):
  * NHWC at the public boundary; NCHW inside the block stack. XLA tiles
    the two minor dims (H sublanes, W lanes), so the 4/16/64-channel
    streams cost no lane padding in NCHW — the NHWC formulation measured
    8-32x padding expansion on autodiff-saved f32 residuals and a 22 s
    training step (PERF.md); NCHW internals take it to sub-second.
  * Pure functions over a params pytree; `jax.jit` at the pipeline level.
  * Python-level loop over blocks (static unroll): 30 blocks of 3 convs
    compile into one fused XLA program; no data-dependent control flow.
  * Additive coupling means the inverse is exact algebra, not approximation:
    y1 = F(x2) + x1  =>  x1 = y1 - F(x2).

Params tree layout (keys chosen so the torch state_dict converter in
vstnet_tpu/io/checkpoint.py is a pure rename):

  {
    "stack": [ {"conv1": {"w","b"}, "conv2": ..., "conv3": ...}, ... x30 ],
    "reduction": [ {...}, {...} ],          # channel_reduction.block_list
  }
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from vstnet_tpu.config import RevResNetConfig
from vstnet_tpu.ops.coupling import (
    channel_merge_nchw as channel_merge,
    channel_split_nchw as channel_split,
    injective_pad_nchw as injective_pad,
    injective_unpad_nchw as injective_unpad,
    nchw_to_nhwc,
    nhwc_to_nchw,
    pixel_shuffle_nchw as pixel_shuffle,
    pixel_unshuffle_nchw as pixel_unshuffle,
)
from vstnet_tpu.ops.pad_conv import residual_branch_nchw as residual_branch


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _init_conv(key, kh, kw, cin, cout, dtype=jnp.float32):
    # torch Conv2d default init: kaiming_uniform(a=sqrt(5)) -> U(±1/sqrt(fan_in)).
    # Bias zero like the reference init_layers
    # (/root/reference/models/RevResNet.py:91-94). The small gain also keeps
    # activation variance bounded across the 30 additive couplings, which
    # the exact-inverse numerics depend on.
    fan_in = kh * kw * cin
    bound = (1.0 / fan_in) ** 0.5
    w = jax.random.uniform(key, (kh, kw, cin, cout), dtype, -bound, bound)
    return {"w": w, "b": jnp.zeros((cout,), dtype)}


def _init_branch(key, channel: int, stride: int, mult: int, kernel: int, dtype):
    in_ch = channel if stride == 1 else channel // 4
    mid = channel // mult
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv1": _init_conv(k1, kernel, kernel, in_ch, mid, dtype),
        "conv2": _init_conv(k2, kernel, kernel, mid, mid, dtype),
        "conv3": _init_conv(k3, kernel, kernel, mid, channel, dtype),
    }


def init_revresnet(key, cfg: RevResNetConfig, dtype=jnp.float32) -> Dict:
    plan = cfg.block_plan()
    keys = jax.random.split(key, len(plan) + cfg.reduction_blocks)
    stack: List[Dict] = [
        _init_branch(k, ch, st, cfg.mult, cfg.kernel, dtype)
        for k, (ch, st) in zip(keys[: len(plan)], plan)
    ]
    red_ch = cfg.hidden_dim * 4 ** cfg.sp_steps
    reduction = [
        _init_branch(k, red_ch, 1, cfg.mult, cfg.kernel, dtype)
        for k in keys[len(plan):]
    ]
    return {"stack": stack, "reduction": reduction}


# ---------------------------------------------------------------------------
# Coupling blocks
# ---------------------------------------------------------------------------

def _block_forward(x1, x2, bparams, stride: int):
    """Additive coupling forward (reference residual_block.forward,
    /root/reference/models/RevResNet.py:96-104):
      stride 1: (x1, x2) -> (x2, F(x2) + x1)
      stride 2: F is strided; both streams space-to-depth before the add.
    """
    fx2 = residual_branch(x2, bparams, stride=stride)
    if stride == 2:
        x1 = pixel_unshuffle(x1)
        x2 = pixel_unshuffle(x2)
    return x2, fx2 + x1


def _block_inverse(y1, y2, bparams, stride: int):
    """Exact inverse (reference residual_block.inverse,
    /root/reference/models/RevResNet.py:106-116)."""
    if stride == 2:
        x2 = pixel_shuffle(y1)
    else:
        x2 = y1
    fx2 = residual_branch(x2, bparams, stride=stride)
    x1 = y2 - fx2
    if stride == 2:
        x1 = pixel_shuffle(x1)
    return x1, x2


# ---------------------------------------------------------------------------
# Channel reduction head
# ---------------------------------------------------------------------------

def _maybe_remat(fn, cfg: RevResNetConfig, stride: int):
    """Per-block rematerialization: under autodiff only the inter-block
    stream states are kept; conv intermediates are recomputed in backward.
    This is what makes the 5-pass training step of the reference
    (train.py:141-190) fit in HBM at full crop sizes."""
    if not cfg.remat:
        return lambda x1, x2, bp: fn(x1, x2, bp, stride)
    return jax.checkpoint(lambda x1, x2, bp: fn(x1, x2, bp, stride))


def _reduction_forward(x, reduction_params, cfg: RevResNetConfig):
    """channel_reduction.forward (/root/reference/models/RevResNet.py:131-146).

    For both shipped configs out_ch * 4**sp_steps == in_ch, so the inner
    injective pad is 0 channels and is elided here; the residual blocks run
    per-stream, then merge + sp_steps depth-to-space spreads.
    """
    x1, x2 = channel_split(x)
    fwd = _maybe_remat(_block_forward, cfg, 1)
    for bp in reduction_params:
        x1, x2 = fwd(x1, x2, bp)
    x = channel_merge(x1, x2)
    for _ in range(cfg.sp_steps):
        x = pixel_shuffle(x)
    return x


def _reduction_inverse(x, reduction_params, cfg: RevResNetConfig):
    for _ in range(cfg.sp_steps):
        x = pixel_unshuffle(x)
    x1, x2 = channel_split(x)
    inv = _maybe_remat(_block_inverse, cfg, 1)
    for bp in reversed(reduction_params):
        x1, x2 = inv(x1, x2, bp)
    return channel_merge(x1, x2)


# ---------------------------------------------------------------------------
# Encoder / decoder
# ---------------------------------------------------------------------------

def encode(params: Dict, x, cfg: RevResNetConfig):
    """Image (B, H, W, 3) in [0,1] -> latent (B, H/ls, W/ls, 2*hidden_dim).

    H and W must be multiples of cfg.down_scale (= 4).
    """
    ds = cfg.down_scale
    if x.shape[1] % ds or x.shape[2] % ds:
        raise ValueError(
            f"encode: spatial dims {x.shape[1]}x{x.shape[2]} must be multiples "
            f"of {ds}; pad the input first (the pipeline's pad_to_multiple does this)"
        )
    plan = cfg.block_plan()
    x = nhwc_to_nchw(x)
    x = injective_pad(x, cfg.inj_pad)
    x1, x2 = channel_split(x)
    for bp, (_, stride) in zip(params["stack"], plan):
        x1, x2 = _maybe_remat(_block_forward, cfg, stride)(x1, x2, bp)
    x = channel_merge(x1, x2)
    return nchw_to_nhwc(_reduction_forward(x, params["reduction"], cfg))


def decode(params: Dict, z, cfg: RevResNetConfig):
    """Latent -> image; exact inverse of `encode` with the same params."""
    plan = cfg.block_plan()
    x = _reduction_inverse(nhwc_to_nchw(z), params["reduction"], cfg)
    x1, x2 = channel_split(x)
    for bp, (_, stride) in zip(reversed(params["stack"]), reversed(plan)):
        x1, x2 = _maybe_remat(_block_inverse, cfg, stride)(x1, x2, bp)
    x = channel_merge(x1, x2)
    return nchw_to_nhwc(injective_unpad(x, cfg.inj_pad))


def latent_shape(cfg: RevResNetConfig, h: int, w: int):
    ls = cfg.latent_scale
    return h // ls, w // ls, cfg.latent_channels
