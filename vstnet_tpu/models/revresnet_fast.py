"""Fast-path reversible network: fused Pallas coupling blocks in CW layout.

Same math as models/revresnet.py (which remains the reference/training
path), but the hot stride-1 coupling blocks run as single fused Pallas
kernels in channels-on-sublanes (B, H, C, W) layout
(vstnet_tpu/ops/coupling_cw.py). The two stride-2 transition blocks and the
pixel shuffles stay in XLA (also in CW layout); the NHWC<->CW transposes
happen once at the image/latent boundary.

Parity: bit-faithful to the standard path to f32 roundoff (the fused kernel
reproduces per-conv ReflectionPad2d border semantics exactly); fused
encode/decode remain exact inverses of each other.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax

from vstnet_tpu.config import RevResNetConfig
from vstnet_tpu.ops.coupling_cw import (
    cw_to_nhwc,
    fused_coupling_cw,
    nhwc_to_cw,
    pack_branch_weights,
    pixel_shuffle_cw,
    pixel_unshuffle_cw,
)


VMEM_BUDGET = 14 * 1024 * 1024  # total kn2row intermediates (f32)
# Fuse only the thin-stream stage (16ch streams / 4ch bottlenecks at full
# res) — that's where XLA is ~25x off roofline. Fatter stages run XLA,
# which is already adequate there (measured: 64ch stage fused with tiny
# tiles LOSES to XLA).
FUSE_MAX_CHANNELS = 16


def pick_tile(h: int, c: int = 16, w: int = 512) -> int:
    """Largest divisor of h whose summed kn2row intermediates
    (~(9c + 9*c/4*2 + extras) rows of (th+6) x (w+6) f32) fit VMEM."""
    per_row = (w + 6) * 4 * (9 * c + 2 * 9 * max(c // 4, 1) + 4 * c)
    cap = max(VMEM_BUDGET // per_row - 6, 1)
    for th in range(min(h, cap, 64), 0, -1):
        if h % th == 0:
            return th
    return 1


def pack_revresnet(params: Dict, cfg: RevResNetConfig, dtype=None) -> Dict:
    """Standard params pytree -> fast-path pytree: stride-1 branches packed
    for the fused kernel; stride-2 branches kept HWIO for the XLA path."""
    plan = cfg.block_plan()

    def cvt(tree):
        return jax.tree.map(lambda a: a.astype(dtype), tree) if dtype else tree

    stack = []
    for bp, (ch, stride) in zip(params["stack"], plan):
        if stride == 1 and ch <= FUSE_MAX_CHANNELS:
            stack.append({"packed": cvt(pack_branch_weights(bp))})
        else:
            stack.append({"raw": cvt(bp)})
    red_ch = cfg.hidden_dim * 4 ** cfg.sp_steps
    reduction = [
        {"packed": cvt(pack_branch_weights(bp))}
        if red_ch <= FUSE_MAX_CHANNELS else {"raw": cvt(bp)}
        for bp in params["reduction"]
    ]
    return {"stack": stack, "reduction": reduction}


# ---------------------------------------------------------------------------
# XLA fallback branch in CW layout (stride-2 transition blocks)
# ---------------------------------------------------------------------------

def _reflect_pad_cw(x, pad: int):
    return jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (pad, pad)),
                   mode="reflect")


def _conv_cw(x, w, b, stride=1, relu=False):
    out = lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), "VALID",
        dimension_numbers=("NHCW", "HWIO", "NHCW"),
        preferred_element_type=jnp.float32,
        precision=(lax.Precision.HIGHEST if x.dtype == jnp.float32
                   else lax.Precision.DEFAULT),
    )
    out = out + b.astype(jnp.float32)[None, None, :, None]
    if relu:
        out = jax.nn.relu(out)
    return out.astype(x.dtype)


def _branch_cw_xla(x, raw, stride):
    h = _conv_cw(_reflect_pad_cw(x, 1), raw["conv1"]["w"], raw["conv1"]["b"],
                 stride=stride, relu=True)
    h = _conv_cw(_reflect_pad_cw(h, 1), raw["conv2"]["w"], raw["conv2"]["b"],
                 relu=True)
    return _conv_cw(_reflect_pad_cw(h, 1), raw["conv3"]["w"],
                    raw["conv3"]["b"])


def _block_forward_cw(x1, x2, bp, stride):
    if stride == 1 and "packed" in bp:
        _, h, c, w = x1.shape
        return x2, fused_coupling_cw(
            x1, x2, bp["packed"], th=pick_tile(h, c, w))
    if stride == 1:
        return x2, _branch_cw_xla(x2, bp["raw"], 1) + x1
    fx2 = _branch_cw_xla(x2, bp["raw"], stride)
    x1 = pixel_unshuffle_cw(x1)
    x2 = pixel_unshuffle_cw(x2)
    return x2, fx2 + x1


def _block_inverse_cw(y1, y2, bp, stride):
    if stride == 1 and "packed" in bp:
        x2 = y1
        _, h, c, w = x2.shape
        x1 = fused_coupling_cw(
            y2, x2, bp["packed"], th=pick_tile(h, c, w), inverse=True)
        return x1, x2
    if stride == 1:
        x2 = y1
        return y2 - _branch_cw_xla(x2, bp["raw"], 1), x2
    x2 = pixel_shuffle_cw(y1)
    fx2 = _branch_cw_xla(x2, bp["raw"], stride)
    x1 = pixel_shuffle_cw(y2 - fx2)
    return x1, x2


# ---------------------------------------------------------------------------
# Encoder / decoder
# ---------------------------------------------------------------------------

def _split_cw(x):
    n = x.shape[2] // 2
    return x[:, :, :n, :], x[:, :, n:, :]


def _merge_cw(x1, x2):
    return jnp.concatenate([x1, x2], axis=2)


def encode_fast(fast_params: Dict, x, cfg: RevResNetConfig):
    """x: NHWC (B, H, W, 3) -> latent NHWC, via the fused CW path."""
    plan = cfg.block_plan()
    xc = nhwc_to_cw(x)
    xc = jnp.pad(xc, ((0, 0), (0, 0), (0, cfg.inj_pad), (0, 0)))
    x1, x2 = _split_cw(xc)
    for bp, (_, stride) in zip(fast_params["stack"], plan):
        x1, x2 = _block_forward_cw(x1, x2, bp, stride)
    x = _merge_cw(x1, x2)

    # channel reduction
    x1, x2 = _split_cw(x)
    for bp in fast_params["reduction"]:
        x1, x2 = _block_forward_cw(x1, x2, bp, 1)
    x = _merge_cw(x1, x2)
    for _ in range(cfg.sp_steps):
        x = pixel_shuffle_cw(x)
    return cw_to_nhwc(x)


def decode_fast(fast_params: Dict, z, cfg: RevResNetConfig):
    plan = cfg.block_plan()
    x = nhwc_to_cw(z)
    for _ in range(cfg.sp_steps):
        x = pixel_unshuffle_cw(x)
    x1, x2 = _split_cw(x)
    for bp in reversed(fast_params["reduction"]):
        x1, x2 = _block_inverse_cw(x1, x2, bp, 1)
    x = _merge_cw(x1, x2)

    x1, x2 = _split_cw(x)
    for bp, (_, stride) in zip(reversed(fast_params["stack"]),
                               reversed(plan)):
        x1, x2 = _block_inverse_cw(x1, x2, bp, stride)
    x = _merge_cw(x1, x2)
    x = x[:, :, : x.shape[2] - cfg.inj_pad, :]
    return cw_to_nhwc(x)
