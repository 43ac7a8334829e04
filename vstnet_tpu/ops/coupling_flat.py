"""Fused coupling-block kernel v2: "flat rows-in-lanes" layout.

Motivation (measured on v5e): XLA's conv path runs the 16ch/4ch stage of
the reversible network ~25x off roofline (5.85 ms/frame for 10 blocks at
512^2); a first Pallas kernel in (B,H,C,W) halved that but was limited by
per-row MXU dispatches, and Mosaic cannot lower 3D dot_generals or
sublane-lane reshapes.

This version makes every kernel op a native 2D Mosaic op by flattening the
image into lane space:

    tensor layout: (B, C, L) with L = (H + 6) * S,  S = row stride =
    (W + 6 + padding) rounded up to 128 lanes. Row r of the image lives in
    lanes [(r+3)*S, (r+4)*S); cols [3, 3+W) of a row are valid.

  * one MXU dot per conv per tile: (9*Cout, Cin) x (Cin, T*S)
  * the 3x3 kernel support = 9 shifted lane-slice adds (dy rows = dy*S
    lanes, dx cols = dx lanes)
  * reflect borders (torch ReflectionPad2d, per conv, exactly like the
    reference models/RevResNet.py:79-88):
      - W edges: every row needs col (2) and col (3+W) mirrored before each
        conv -> two lane-rolls + masked selects over the whole tile
      - H edges: only the first/last grid tiles mirror their halo row
        segments (lane-slice concat under jnp.where)
  * halo rows between tiles are REAL rows read via overlapping Element
    blocks; the 3+3 allocated boundary rows are never read (boundary tiles
    reconstruct them by reflection), so no halo maintenance pass exists.

Exactness: identical math to the reference path (verified to f32 roundoff
in tests); the fused encode/decode pair stays exactly inverse.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 3  # rows/cols of boundary slack around the image


def row_stride(w: int) -> int:
    """Lane stride of one image row: W + 2*HALO rounded up to 128."""
    return ((w + 2 * HALO) + 127) // 128 * 128


def flat_len(h: int, w: int) -> int:
    return (h + 2 * HALO) * row_stride(w)


# ---------------------------------------------------------------------------
# Layout conversion (XLA side)
# ---------------------------------------------------------------------------

def nhwc_to_flat(x):
    """(B, H, W, C) -> (B, C, (H+6)*S). Boundary slots are zero (their
    contents are never read — kernels reconstruct reflections)."""
    b, h, w, c = x.shape
    s = row_stride(w)
    x = jnp.transpose(x, (0, 3, 1, 2))  # (B, C, H, W)
    x = jnp.pad(x, ((0, 0), (0, 0), (HALO, HALO), (HALO, s - w - HALO)))
    return x.reshape(b, c, (h + 2 * HALO) * s)


def flat_to_nhwc(xf, h: int, w: int):
    b, c, _ = xf.shape
    s = row_stride(w)
    x = xf.reshape(b, c, h + 2 * HALO, s)[:, :, HALO:HALO + h, HALO:HALO + w]
    return jnp.transpose(x, (0, 2, 3, 1))


# ---------------------------------------------------------------------------
# Kernel helpers (all 2D: (channels, lanes))
# ---------------------------------------------------------------------------

def _fix_cols(x, s: int, w: int, n_lanes: int):
    """Mirror one column on each side of every row: col 2 <- col 4 and
    col (3+W) <- col (1+W)... in image terms, col -1 <- col +1.

    Positions within a row: valid cols at [3, 3+W); we fix lane offset 2
    (image col -1) from offset 4 (image col +1), and offset 3+W (image col
    W) from offset 1+W (image col W-2)."""
    lanes = lax.broadcasted_iota(jnp.int32, (1, n_lanes), 1)
    pos = lanes % s
    # circular lane shifts via slice+concat (pltpu.roll lacks bf16 support)
    left = jnp.concatenate([x[:, 2:], x[:, :2]], 1)    # lane l <- l+2
    right = jnp.concatenate([x[:, -2:], x[:, :-2]], 1)  # lane l <- l-2
    x = jnp.where(pos == 2, left, x)
    x = jnp.where(pos == 3 + w, right, x)
    return x


def _fix_rows(x, s: int, rows_to_fix, is_top, is_bottom,
              tc: int, bc: int):
    """Mirror halo row segments at the image top/bottom.

    x: (C, frame_rows*S). tc = frame row holding image row 0 (top tiles);
    bc = frame row holding image row H-1 (bottom tiles). For j in
    rows_to_fix: top row (tc - j) <- (tc + j); bottom (bc + j) <- (bc - j).
    """
    n_lanes = x.shape[1]

    def replace_row(xx, dst: int, src: int):
        pieces = []
        if dst > 0:
            pieces.append(xx[:, : dst * s])
        pieces.append(xx[:, src * s:(src + 1) * s])
        if (dst + 1) * s < n_lanes:
            pieces.append(xx[:, (dst + 1) * s:])
        return jnp.concatenate(pieces, axis=1)

    top = x
    bot = x
    for j in rows_to_fix:
        top = replace_row(top, tc - j, tc + j)
        bot = replace_row(bot, bc + j, bc - j)
    x = jnp.where(is_top, top, x)
    x = jnp.where(is_bottom, bot, x)
    return x


def _conv_flat(x, w_packed, cout: int, s: int, out_lanes: int,
               out_base: int):
    """3x3 conv in flat layout.

    x: (Cin, n_lanes) — reflect-fixed input.
    Returns (cout, out_lanes) f32 starting at lane offset out_base of x's
    coordinate frame (out_base points at the first output row's lane 0).
    """
    precision = (
        lax.Precision.HIGHEST if w_packed.dtype == jnp.float32
        else lax.Precision.DEFAULT
    )
    p = jax.lax.dot_general(
        w_packed, x, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )  # (9*cout, n_lanes)
    # guard lanes: tap offsets reach 1 lane past each end (junk positions)
    zero = jnp.zeros((p.shape[0], 1), p.dtype)
    p = jnp.concatenate([zero, p, zero], axis=1)

    out = None
    for ky in range(3):
        for kx in range(3):
            n0 = (ky * 3 + kx) * cout
            start = 1 + out_base + (ky - 1) * s + (kx - 1)
            piece = lax.slice(
                p, (n0, start), (n0 + cout, start + out_lanes))
            out = piece if out is None else out + piece
    return out


def _coupling_kernel_flat(x2_ref, x1_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                          w3_ref, b3_ref, out_ref, *, th, s, w_img, c,
                          n_tiles, inverse):
    """One grid program: output rows [i*TH, i*TH+TH).

    x2 block: local rows [0, T) with T = TH+6 (halo 3 each side); the
    output block aligns with local rows [3, 3+TH).
    """
    i = pl.program_id(1)
    is_top = i == 0
    is_bottom = i == n_tiles - 1
    t = th + 2 * HALO
    n_lanes = t * s
    dt = x2_ref.dtype

    x = x2_ref[0]
    # input fixes: rows ±(1..3) at image boundary; col ±1 for conv1.
    # x frame: image row 0 at frame row 3 (top), image row H-1 at frame
    # row t-4 (bottom tile covers image rows [H-TH-3, H+2]).
    x = _fix_rows(x, s, (1, 2, 3), is_top, is_bottom, HALO, t - 4)
    x1c = _fix_cols(x, s, w_img, n_lanes)

    # conv1: h1 valid on local rows [1, t-1) — compute lanes [s, (t-1)*s)
    h1_lanes = (t - 2) * s
    h1 = _conv_flat(x1c, w1_ref[...], b1_ref.shape[0], s, h1_lanes, s)
    h1 = jnp.maximum(h1 + b1_ref[...][:, :1], 0.0).astype(dt)
    # h1 frame: rows [1, t-1): image row 0 at frame 2; H-1 at frame t-5
    h1 = _fix_rows(h1, s, (1, 2), is_top, is_bottom, 2, t - 5)
    h1 = _fix_cols(h1, s, w_img, h1_lanes)

    # conv2: h2 valid on local rows [2, t-2)
    h2_lanes = (t - 4) * s
    h2 = _conv_flat(h1, w2_ref[...], b2_ref.shape[0], s, h2_lanes, s)
    h2 = jnp.maximum(h2 + b2_ref[...][:, :1], 0.0).astype(dt)
    # h2 frame: rows [2, t-2): image row 0 at frame 1; H-1 at frame t-6
    h2 = _fix_rows(h2, s, (1,), is_top, is_bottom, 1, t - 6)
    h2 = _fix_cols(h2, s, w_img, h2_lanes)

    # conv3: fx on local rows [3, t-3) == output rows
    fx_lanes = (t - 6) * s
    fx = _conv_flat(h2, w3_ref[...], c, s, fx_lanes, s)
    fx = fx + b3_ref[...][:, :1]

    x1 = x1_ref[0].astype(jnp.float32)
    y = (x1 - fx) if inverse else (fx + x1)
    out_ref[0] = y.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("th", "h", "w", "inverse", "interpret"))
def fused_coupling_flat(x1f, x2f, packed, h: int, w: int, th: int = 64,
                        inverse: bool = False, interpret: bool = False):
    """Additive coupling block on flat-layout tensors.

    x1f, x2f: (B, C, (H+6)*S). Returns y in the same layout (its boundary
    slots are garbage — never read downstream).
    """
    b, c, _ = x2f.shape
    assert h % th == 0, f"H={h} not divisible by tile {th}"
    s = row_stride(w)
    n_tiles = h // th
    t = th + 2 * HALO

    el = pl.Element
    kernel = partial(
        _coupling_kernel_flat, th=th, s=s, w_img=w, c=c,
        n_tiles=n_tiles, inverse=inverse,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((el(1), el(c), el(t * s)),
                         lambda bb, ii: (bb, 0, ii * th * s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((el(1), el(c), el(th * s)),
                         lambda bb, ii: (bb, 0, (HALO + ii * th) * s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((el(1), el(c), el(th * s)),
                               lambda bb, ii: (bb, 0, (HALO + ii * th) * s),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x1f.shape, x1f.dtype),
        interpret=interpret,
    )(x2f, x1f, packed["w1"], packed["b1"], packed["w2"], packed["b2"],
      packed["w3"], packed["b3"])
