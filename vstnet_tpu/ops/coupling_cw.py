"""Fused coupling-block kernel (Pallas/TPU) in channels-on-sublanes layout.

Why: XLA's conv path on the tiny-channel shapes of this network (streams of
16ch with 4ch bottlenecks at 512^2) runs ~25x off the HBM roofline — the
NHWC minor dims (W, C<=16) force (8,128) tile padding and every conv
round-trips intermediates through HBM. Measured stage-1 cost: 5.85 ms/frame.

Design:
  * Arrays live as (B, H, C, W): C on sublanes (16 | 4->8 pad only), W on
    lanes (512 = 4 exact tiles) — zero layout waste in HBM and VMEM.
  * One `pallas_call` computes the whole residual branch of a coupling
    block — ReflectionPad+Conv+ReLU x3 + bias + the additive coupling —
    per H-tile, holding every intermediate in VMEM.
  * Convs are kn2row: per input row a single (9*Cout, Cin)x(Cin, W) MXU dot
    produces all 9 tap contributions; the 3x3 accumulation is 9 shifted
    VPU adds over the tile.
  * Border semantics are EXACTLY the reference's per-conv ReflectionPad2d
    (models/RevResNet.py:79-88): the input is reflect-padded by 3 once, and
    after conv1/conv2 the out-of-bounds halo rows/cols are overwritten with
    reflections of the just-computed valid region (reflect-of-intermediate,
    not conv-of-extended-reflection) — so outputs match the reference
    everywhere, including the image border, and the exact-inverse property
    is preserved bit-for-bit between the fused encode and decode.

Weight packing: standard HWIO (3,3,Cin,Cout) -> (Cin, 9*Cout) with column
order n = (ky*3 + kx)*Cout + cout (pack_branch_weights).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD = 3  # total halo: three 3x3 VALID convs


# ---------------------------------------------------------------------------
# Weight packing
# ---------------------------------------------------------------------------

def pack_branch_weights(branch):
    """{conv1,conv2,conv3: {w (3,3,Cin,Cout), b}} -> packed CW form."""
    def pack(w):
        kh, kw, cin, cout = w.shape
        # (cin, ky, kx, cout) -> (cin, 9*cout)
        return jnp.transpose(w, (2, 0, 1, 3)).reshape(cin, kh * kw * cout)

    return {
        "w1": pack(branch["conv1"]["w"]),
        "b1": branch["conv1"]["b"].reshape(-1, 1),  # (m, 1): 2D for VMEM
        "w2": pack(branch["conv2"]["w"]),
        "b2": branch["conv2"]["b"].reshape(-1, 1),
        "w3": pack(branch["conv3"]["w"]),
        "b3": branch["conv3"]["b"].reshape(-1, 1),
    }


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _conv_tile(x, w_packed, n_rows_out, w_out, cout, acc_dtype):
    """kn2row conv over a VMEM tile, channels-major.

    x: (Cin, T, Wx) with T = n_rows_out + 2, minor dims (T, Wx).
    Returns (cout, n_rows_out, w_out) in acc_dtype (pre-bias, pre-relu).

    One dot per conv: (9*cout, Cin) x (Cin, T*Wx) on the MXU, output in the
    natural (N, T, Wx) layout; the 3x3 kernel support is then 9 shifted
    slice-adds on the VPU (sublane/lane shifts).
    """
    precision = (
        lax.Precision.HIGHEST
        if w_packed.dtype == jnp.float32
        else lax.Precision.DEFAULT
    )
    # Mosaic only lowers 2D dots: one (9*cout, Cin)x(Cin, Wx) dot per row.
    t = x.shape[1]
    rows = [
        jax.lax.dot_general(
            w_packed, x[:, i],
            (((0,), (0,)), ((), ())),
            preferred_element_type=acc_dtype,
            precision=precision,
        )[:, None, :]
        for i in range(t)
    ]
    p = jnp.concatenate(rows, axis=1)  # (9*cout, T, Wx)

    out = None
    for ky in range(3):
        for kx in range(3):
            n0 = (ky * 3 + kx) * cout
            piece = p[n0:n0 + cout, ky:ky + n_rows_out, kx:kx + w_out]
            out = piece if out is None else out + piece
    return out


def _reflect_fix_cols(h, oob: int):
    """Replace the `oob` out-of-bounds cols on each side with reflections of
    the valid region (torch ReflectionPad2d semantics). Slice+concat — no
    scatter (unsupported in Mosaic). h: (C, T, Wtot), cols = last dim."""
    wtot = h.shape[-1]
    left = [h[..., 2 * oob - j][..., None] for j in range(oob)]
    right = [
        h[..., 2 * (wtot - 1 - oob) - p][..., None]
        for p in range(wtot - oob, wtot)
    ]
    return jnp.concatenate(left + [h[..., oob:wtot - oob]] + right, axis=-1)


def _reflect_fix_rows(h, oob: int, is_top, is_bottom):
    """h: (C, Ttot, W), rows = axis 1, fixed only at image top/bottom."""
    ttot = h.shape[1]
    top = [
        jnp.where(is_top, h[:, 2 * oob - p], h[:, p])[:, None]
        for p in range(oob)
    ]
    bottom = [
        jnp.where(is_bottom, h[:, 2 * (ttot - 1 - oob) - p], h[:, p])[:, None]
        for p in range(ttot - oob, ttot)
    ]
    return jnp.concatenate(top + [h[:, oob:ttot - oob]] + bottom, axis=1)


def _coupling_kernel(x2p_ref, x1_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                     w3_ref, b3_ref, out_ref, *, th, w_img, c, m1, m2,
                     n_tiles, inverse):
    i = pl.program_id(1)
    is_top = i == 0
    is_bottom = i == n_tiles - 1
    f32 = jnp.float32

    # channels-major working layout: (C, T, W)
    xc = jnp.swapaxes(x2p_ref[0], 0, 1)

    # conv1: rows [0, th+4), cols W+4, channels m1
    h1 = _conv_tile(xc, w1_ref[...], th + 4, w_img + 4, m1, f32)
    h1 = jnp.maximum(h1 + b1_ref[...].astype(f32)[:, :, None], 0.0)
    h1 = _reflect_fix_cols(h1, 2)
    h1 = _reflect_fix_rows(h1, 2, is_top, is_bottom)
    h1 = h1.astype(x2p_ref.dtype)

    # conv2: rows [0, th+2), cols W+2, channels m2
    h2 = _conv_tile(h1, w2_ref[...], th + 2, w_img + 2, m2, f32)
    h2 = jnp.maximum(h2 + b2_ref[...].astype(f32)[:, :, None], 0.0)
    h2 = _reflect_fix_cols(h2, 1)
    h2 = _reflect_fix_rows(h2, 1, is_top, is_bottom)
    h2 = h2.astype(x2p_ref.dtype)

    # conv3: rows [0, th), cols W, channels c
    fx = _conv_tile(h2, w3_ref[...], th, w_img, c, f32)
    fx = fx + b3_ref[...].astype(f32)[:, :, None]

    x1 = jnp.swapaxes(x1_ref[0], 0, 1).astype(f32)
    y = (x1 - fx) if inverse else (fx + x1)
    out_ref[0] = jnp.swapaxes(y, 0, 1).astype(out_ref.dtype)


@partial(jax.jit,
         static_argnames=("th", "inverse", "interpret"))
def fused_coupling_cw(x1, x2, packed, th: int = 16, inverse: bool = False,
                      interpret: bool = False):
    """Additive coupling block, CW layout, stride 1.

    x1, x2: (B, H, C, W). Returns F(x2) + x1 (or x1 - F(x2) when inverse),
    matching residual_block.forward/.inverse (RevResNet.py:96-116) with
    exact reflect-pad border semantics.
    """
    b, h, c, w = x2.shape
    assert h % th == 0, f"H={h} not divisible by tile {th}"
    m1 = packed["b1"].shape[0]
    m2 = packed["b2"].shape[0]

    x2p = jnp.pad(x2, ((0, 0), (PAD, PAD), (0, 0), (PAD, PAD)),
                  mode="reflect")
    n_tiles = h // th

    el = pl.Element
    grid = (b, n_tiles)
    kernel = partial(
        _coupling_kernel, th=th, w_img=w, c=c, m1=m1, m2=m2,
        n_tiles=n_tiles, inverse=inverse,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((el(1), el(th + 2 * PAD), el(c), el(w + 2 * PAD)),
                         lambda bb, ii: (bb, ii * th, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, c, w), lambda bb, ii: (bb, ii, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w3
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b3
        ],
        out_specs=pl.BlockSpec((1, th, c, w), lambda bb, ii: (bb, ii, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x1.shape, x1.dtype),
        interpret=interpret,
    )(x2p, x1, packed["w1"], packed["b1"], packed["w2"], packed["b2"],
      packed["w3"], packed["b3"])


# ---------------------------------------------------------------------------
# CW layout helpers (channel order identical to the NHWC path)
# ---------------------------------------------------------------------------

def nhwc_to_cw(x):
    return jnp.transpose(x, (0, 1, 3, 2))  # (B,H,W,C) -> (B,H,C,W)


def cw_to_nhwc(x):
    return jnp.transpose(x, (0, 1, 3, 2))


def pixel_unshuffle_cw(x, size: int = 2):
    """(B,H,C,W) -> (B,H/s,s*s*C,W/s) with the (s1,s2,c) channel grouping of
    ops.coupling.pixel_unshuffle."""
    b, h, c, w = x.shape
    nh, nw = h // size, w // size
    x = x.reshape(b, nh, size, c, nw, size)
    x = x.transpose(0, 1, 2, 5, 3, 4)  # b, nh, s1, s2, c, nw
    return x.reshape(b, nh, size * size * c, nw)


def pixel_shuffle_cw(x, size: int = 2):
    b, h, c, w = x.shape
    nc = c // (size * size)
    x = x.reshape(b, h, size, size, nc, w)
    x = x.transpose(0, 1, 2, 4, 5, 3)  # b, h, s1, nc, w, s2
    return x.reshape(b, h * size, nc, w * size)
