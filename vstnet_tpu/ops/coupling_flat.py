"""Fused coupling-block kernel: "flat rows-in-lanes" layout (v3).

Motivation (measured on v5e): XLA's conv path runs the 16ch/4ch stage of
the reversible network ~25x off roofline (5.85 ms/frame for 10 blocks at
512^2, B=16) because NHWC minor dims (W, C<=16) force (8,128) tile padding
and every conv round-trips HBM. This kernel makes every hot op a native 2D
Mosaic op by flattening the image into lane space:

    tensor layout: (B, C, L) with L = (H + 6) * S,  S = row stride =
    (W + 6) rounded up to 128 lanes. Row r of the image lives in lanes
    [(r+3)*S, (r+4)*S); cols [3, 3+W) of a row are valid.

v3 performance structure (v2's measured cost: 65 us/frame memory floor +
85 us dots + ~330 us of misaligned tap shifts and unconditional reflect
fixes, per block at 512^2):

  * column taps folded into the dot: the input is stacked as
    [shift+1, center, shift-1] rows -> ONE (3*Cin, 3*Mp) x (3*Cin, L) MXU
    dot per conv; only the 3 row taps remain as adds, each offset by a
    multiple of S (S % 128 == 0) -> every slice is lane- and sublane-
    aligned.
  * column reflection (torch ReflectionPad2d at the true image edge,
    reference models/RevResNet.py:79-88) merged into those two shifted
    copies: 2 selects on the Cin-row input instead of rolls+selects on
    every conv output.
  * row reflection runs under lax.cond — only the first/last grid tiles
    pay it; interior tiles skip the copies entirely.
  * bottleneck channel counts padded to sublane multiples (8) so per-tap
    row offsets stay aligned; junk channels carry zero weights/biases.

Exactness: identical math to the reference path (f32 parity tests); the
fused encode/decode pair stays exactly inverse (the inverse re-evaluates
the same F bit-for-bit).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 3  # rows/cols of boundary slack around the image


def _rup(n: int, m: int = 8) -> int:
    return (n + m - 1) // m * m


def pack_branch_weights_flat(branch, dtype=None):
    """{conv1,conv2,conv3: {w (3,3,Cin,Cout), b}} -> stacked flat form.

    Weight matrix per conv: (3*Cin_p, 3*Mp) with row block kx*Cin_p + ci
    and column block ky*Mp + co — matching the kernel's [x(c-1), x(c),
    x(c+1)] input stack, so one dot yields the three row-tap partials."""
    def pack(w, cin_p, cout_p):
        kh, kw, cin, cout = w.shape
        w = jnp.pad(w, ((0, 0), (0, 0), (0, cin_p - cin),
                        (0, cout_p - cout)))
        # (ky, kx, ci, co) -> (kx, ci, ky, co) -> (3*cin_p, 3*cout_p)
        return jnp.transpose(w, (1, 2, 0, 3)).reshape(
            kw * cin_p, kh * cout_p)

    w1, b1 = branch["conv1"]["w"], branch["conv1"]["b"]
    w2, b2 = branch["conv2"]["w"], branch["conv2"]["b"]
    w3, b3 = branch["conv3"]["w"], branch["conv3"]["b"]
    m1p, m2p = _rup(w1.shape[3]), _rup(w2.shape[3])
    packed = {
        "w1": pack(w1, w1.shape[2], m1p),
        "b1": jnp.pad(b1, (0, m1p - b1.shape[0])).reshape(-1, 1),
        "w2": pack(w2, m1p, m2p),
        "b2": jnp.pad(b2, (0, m2p - b2.shape[0])).reshape(-1, 1),
        "w3": pack(w3, m2p, w3.shape[3]),
        "b3": b3.reshape(-1, 1),
    }
    if dtype is not None:
        packed = jax.tree.map(lambda a: a.astype(dtype), packed)
    return packed


def row_stride(w: int) -> int:
    """Lane stride of one image row.

    When W is a multiple of 128 the stride is exactly W — no column halo
    at all: the in-kernel edge-reflection selects already REPLACE the +-1
    taps at image columns 0/W-1, so the lane that would wrap into the
    neighboring row is never consumed. Otherwise W + 2*HALO rounded up to
    128 (halo slack holds the rounding). This removes 20-50% of the lane
    traffic and dot width on the production shapes (512/256/128)."""
    if w % 128 == 0:
        return w
    return ((w + 2 * HALO) + 127) // 128 * 128


def col_offset(w: int) -> int:
    """Lane offset of image column 0 within a row."""
    return 0 if w % 128 == 0 else HALO


def flat_len(h: int, w: int, halo_rows: int = HALO) -> int:
    return (h + 2 * halo_rows) * row_stride(w)


# ---------------------------------------------------------------------------
# Layout conversion (XLA side)
# ---------------------------------------------------------------------------

def nhwc_to_flat(x, halo_rows: int = HALO):
    """(B, H, W, C) -> (B, C, (H+2R)*S). Boundary slots are zero (their
    contents are never read — kernels reconstruct reflections).

    A k-block fused chain variant (R = 3k halo) was built and measured in
    round 2: it LOSES to the per-block kernel (0.82-0.94x at stage1
    shapes; Mosaic VMEM overflow at th>=64) because XLA already overlaps
    the per-block stream traffic — see PERF.md. R != 3 remains supported
    for the tiled ultra-res path."""
    b, h, w, c = x.shape
    s = row_stride(w)
    co = col_offset(w)
    x = jnp.transpose(x, (0, 3, 1, 2))  # (B, C, H, W)
    x = jnp.pad(x, ((0, 0), (0, 0), (halo_rows, halo_rows),
                    (co, s - w - co)))
    return x.reshape(b, c, (h + 2 * halo_rows) * s)


def flat_to_nhwc(xf, h: int, w: int, halo_rows: int = HALO):
    b, c, _ = xf.shape
    s = row_stride(w)
    co = col_offset(w)
    x = xf.reshape(b, c, h + 2 * halo_rows, s)[
        :, :, halo_rows:halo_rows + h, co:co + w]
    return jnp.transpose(x, (0, 2, 3, 1))


# ---------------------------------------------------------------------------
# Kernel helpers (all 2D: (channels, lanes))
# ---------------------------------------------------------------------------

def _shift_stack(x, pos, w_img: int, co: int):
    """[x(c-1), x(c), x(c+1)] stacked on sublanes, with image-edge column
    reflection folded in: at image col 0 the (c-1) tap reads col +1; at
    image col W-1 the (c+1) tap reads col W-2. The selects also make the
    cross-row lane wrap harmless in the haloless (S == W) layout."""
    xr0 = jnp.concatenate([x[:, -1:], x[:, :-1]], 1)  # y(c) = x(c-1)
    xl0 = jnp.concatenate([x[:, 1:], x[:, :1]], 1)    # y(c) = x(c+1)
    xr = jnp.where(pos == co, xl0, xr0)
    xl = jnp.where(pos == co + w_img - 1, xr0, xl0)
    return jnp.concatenate([xr, x, xl], axis=0)


def _conv_flat(x, w_packed, b, mp: int, s: int, pos, w_img: int, co: int,
               relu: bool, out_dtype, split_ky: bool = False):
    """3x3 conv via one stacked dot + 3 aligned row-tap adds.

    x: (Cin, L). Returns (mp, L - 2S): the output FRAME shrinks one row
    each side (out local row r' = input local row r'+1), so every tap
    slice lands in-bounds with offsets 0/S/2S — aligned, no guard copy.

    split_ky=True runs one dot per row tap and accumulates (bit-identical
    add order): live VMEM drops from a (3*mp, L) f32 block to
    (mp, L) + (mp, L-2S) — the lever that buys wide-channel kernels a
    bigger row tile."""
    precision = (
        lax.Precision.HIGHEST if w_packed.dtype == jnp.float32
        else lax.Precision.DEFAULT
    )
    xs = _shift_stack(x, pos, w_img, co)
    n_out = x.shape[1] - 2 * s
    out = None
    if split_ky:
        for ky in range(3):
            wk = lax.slice(w_packed, (0, ky * mp),
                           (w_packed.shape[0], (ky + 1) * mp))
            pk = lax.dot_general(
                wk, xs, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
            piece = lax.slice(pk, (0, ky * s), (mp, ky * s + n_out))
            out = piece if out is None else out + piece
    else:
        p = lax.dot_general(
            w_packed, xs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # (3*mp, L): row block ky
        for ky in range(3):
            piece = lax.slice(
                p, (ky * mp, ky * s), ((ky + 1) * mp, ky * s + n_out))
            out = piece if out is None else out + piece
    out = out + b
    if relu:
        out = jnp.maximum(out, 0.0)
    return out.astype(out_dtype)


def _replace_row(xx, s: int, dst: int, src: int):
    """Copy row segment src -> dst in a (C, rows*s) flat tensor."""
    n_lanes = xx.shape[1]
    pieces = []
    if dst > 0:
        pieces.append(xx[:, : dst * s])
    pieces.append(xx[:, src * s:(src + 1) * s])
    if (dst + 1) * s < n_lanes:
        pieces.append(xx[:, (dst + 1) * s:])
    return jnp.concatenate(pieces, axis=1)


def _reflect_rows(x, s: int, rows, center_top: int, center_bot: int,
                  is_top, is_bottom):
    """Mirror halo row segments at the image top/bottom under lax.cond —
    interior tiles skip the copies. For j in rows: top row (ct - j) <-
    (ct + j); bottom (cb + j) <- (cb - j)."""

    def replace_row(xx, dst: int, src: int):
        return _replace_row(xx, s, dst, src)

    def fix(xx):
        top = xx
        for j in rows:
            top = replace_row(top, center_top - j, center_top + j)
        top = jnp.where(is_top, top, xx)
        bot = top
        for j in rows:
            bot = replace_row(bot, center_bot + j, center_bot - j)
        return jnp.where(is_bottom, bot, top)

    return lax.cond(is_top | is_bottom, fix, lambda xx: xx, x)


def _coupling_kernel_flat(x2_ref, x1_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                          w3_ref, b3_ref, out_ref, *, th, s, w_img, co, c,
                          n_tiles, inverse, padded=True):
    """One grid program: output rows [i*TH, i*TH+TH).

    x2 block: local rows [0, T) with T = TH+6 (halo 3 each side); the
    output block aligns with local rows [3, 3+TH).

    padded=False (the no-copy entry path): the source array has NO halo
    rows; the x2 index map clips the window start into [0, H-T], so the
    top tile's data sits 3 rows early and the bottom tile's 3 rows late.
    A whole-block roll (one aligned two-piece concat, only the boundary
    tiles pay under lax.cond) restores the uniform local frame; the
    wrapped-in garbage rows land exactly where the reflection fix
    rewrites them anyway.
    """
    i = pl.program_id(1)
    is_top = i == 0
    is_bottom = i == n_tiles - 1
    t = th + 2 * HALO
    dt = x2_ref.dtype
    m1 = b1_ref.shape[0]
    m2 = b2_ref.shape[0]

    def pos(n_lanes):
        return lax.broadcasted_iota(jnp.int32, (1, n_lanes), 1) % s

    # Frames: input covers absolute rows [0, t); each conv's output frame
    # drops one row per side. Image row 0 sits at absolute row 3 (top
    # tile); image row H-1 at absolute row t-4 (bottom tile) — reflection
    # centers below are those, expressed in each tensor's local frame.
    x = x2_ref[0]
    if not padded:
        k = HALO * s

        def shift_fix(xx):
            # top tile: window clipped from -3 to 0 -> data 3 rows early,
            # roll down; bottom tile: clipped 3 late, roll up. Wrapped-in
            # garbage rows are rewritten by the reflection fix below.
            down = jnp.concatenate([xx[:, -k:], xx[:, :-k]], 1)
            up = jnp.concatenate([xx[:, k:], xx[:, :k]], 1)
            return jnp.where(is_top, down, up)

        x = lax.cond(is_top | is_bottom, shift_fix, lambda xx: xx, x)
    x = _reflect_rows(x, s, (1, 2, 3), HALO, t - 4, is_top, is_bottom)

    h1 = _conv_flat(x, w1_ref[...], b1_ref[...], m1, s, pos(t * s), w_img,
                    co, relu=True, out_dtype=dt)      # frame [1, t-1)
    h1 = _reflect_rows(h1, s, (1, 2), HALO - 1, t - 5, is_top, is_bottom)

    h2 = _conv_flat(h1, w2_ref[...], b2_ref[...], m2, s, pos((t - 2) * s),
                    w_img, co, relu=True, out_dtype=dt)  # frame [2, t-2)
    h2 = _reflect_rows(h2, s, (1,), HALO - 2, t - 6, is_top, is_bottom)

    fx = _conv_flat(h2, w3_ref[...], b3_ref[...], c, s, pos((t - 4) * s),
                    w_img, co, relu=False, out_dtype=jnp.float32,
                    split_ky=c >= 128)
    # fx frame is [3, t-3) == exactly the output rows
    x1 = x1_ref[0].astype(jnp.float32)
    y = (x1 - fx) if inverse else (fx + x1)
    out_ref[0] = y.astype(out_ref.dtype)


# ---------------------------------------------------------------------------
# Stride-2 transition block (fused, on pixel-unshuffled streams)
# ---------------------------------------------------------------------------
#
# The reference transition block (models/RevResNet.py:96-116) applies a
# stride-2 3x3 conv1 to the full-res C-channel stream, then space-to-depth
# on both streams. XLA runs those tiny-channel strided convs 10-30x off
# roofline (measured 80-91 us/frame each @B64 at 512^2 where the floor is
# 2-10 us). Algebraically the stride-2 conv IS a 2x2 conv on the
# pixel-unshuffled 4C-channel half-res stream: output row r reads full
# rows 2r-1, 2r, 2r+1, i.e. unshuffled rows {r-1 (row-phase p=1 only), r}
# — so after the (already required) unshuffle, the whole branch becomes
# a half-res fused kernel in the same flat layout as the stride-1 blocks:
# one 2-tap stacked dot (conv1') + two ordinary 3x3 flat convs, streams
# never leaving flat across the stage boundary.
#
# Phase channel order is pixel_unshuffle_nchw's [p][q][ci]
# (ops/coupling.py:113-119). Zero-weight slots: (row-tap a=0, p=0) and
# (col-tap b=0, q=0) have no originating full-res tap.

def pack_transition_weights_flat(branch, dtype=None):
    """Stride-2 branch {conv1 (3,3,C,M), conv2 (3,3,M,M), conv3 (3,3,M,4C)}
    -> flat form on unshuffled 4C-channel streams.

    conv1 becomes W1' (2*4C, 2*Mp): row block b_tap*4C + (p*2+q)*C + ci,
    column block a_tap*Mp + co, where original tap (ki, kj) maps to
    (a, p) = {0:(0,1), 1:(1,0), 2:(1,1)}[ki] and likewise (b, q) for kj.
    conv2/conv3 pack as ordinary 3x3 flat weights (half resolution)."""
    w1, b1 = branch["conv1"]["w"], branch["conv1"]["b"]
    w2, b2 = branch["conv2"]["w"], branch["conv2"]["b"]
    w3, b3 = branch["conv3"]["w"], branch["conv3"]["b"]
    c = w1.shape[2]
    m1p, m2p = _rup(w1.shape[3]), _rup(w2.shape[3])

    w1 = jnp.pad(w1, ((0, 0), (0, 0), (0, 0), (0, m1p - w1.shape[3])))
    w1t = jnp.zeros((2, 4 * c, 2, m1p), w1.dtype)
    tap = {0: (0, 1), 1: (1, 0), 2: (1, 1)}  # k -> (tap index, phase)
    for ki in range(3):
        a, p = tap[ki]
        for kj in range(3):
            b_, q = tap[kj]
            blk = (p * 2 + q) * c
            w1t = w1t.at[b_, blk:blk + c, a, :].add(w1[ki, kj])
    w1t = w1t.reshape(2 * 4 * c, 2 * m1p)

    def pack(w, cin_p, cout_p):
        kh, kw, cin, cout = w.shape
        w = jnp.pad(w, ((0, 0), (0, 0), (0, cin_p - cin),
                        (0, cout_p - cout)))
        return jnp.transpose(w, (1, 2, 0, 3)).reshape(
            kw * cin_p, kh * cout_p)

    packed = {
        "w1": w1t,
        "b1": jnp.pad(b1, (0, m1p - b1.shape[0])).reshape(-1, 1),
        "w2": pack(w2, m1p, m2p),
        "b2": jnp.pad(b2, (0, m2p - b2.shape[0])).reshape(-1, 1),
        "w3": pack(w3, m2p, w3.shape[3]),
        "b3": b3.reshape(-1, 1),
    }
    if dtype is not None:
        packed = jax.tree.map(lambda a: a.astype(dtype), packed)
    return packed


def _shift_stack2(x, pos, co: int):
    """[x(c-1), x(c)] stacked on sublanes for the 2x2 phase conv. At image
    col 0 the (c-1) tap substitutes col 0 itself: full-res column
    reflection puts full col -1 at the q=1 phase of u-col 0, and the q=0
    channels of this tap carry zero weights. The select also neutralizes
    the cross-row lane wrap in the haloless (S == W) layout."""
    xr0 = jnp.concatenate([x[:, -1:], x[:, :-1]], 1)
    xr = jnp.where(pos == co, x, xr0)
    return jnp.concatenate([xr, x], axis=0)


def _conv_flat2(x, w_packed, b, mp: int, s: int, pos, co: int, out_dtype):
    """2x2 phase conv (conv1' of a transition): one stacked dot + 2 row-tap
    adds. x: (4C, L). Output frame drops one row each side — row k of the
    output is u-row (k+1) of the input frame (the a=0 tap reads one row
    up; the bottom row is dropped for frame parity with the 3x3 chain
    that follows), so the downstream _conv_flat bookkeeping is unchanged."""
    precision = (
        lax.Precision.HIGHEST if w_packed.dtype == jnp.float32
        else lax.Precision.DEFAULT
    )
    xs = _shift_stack2(x, pos, co)
    p = lax.dot_general(
        w_packed, xs, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )  # (2*mp, L): row block a
    n_out = x.shape[1] - 2 * s
    out = (lax.slice(p, (0, 0), (mp, n_out))
           + lax.slice(p, (mp, s), (2 * mp, s + n_out)))
    out = jnp.maximum(out + b, 0.0)
    return out.astype(out_dtype)


def _transition_core(x, x1, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                     *, s, w_img, co, c, is_top, is_bottom, inverse, dt):
    """Shared conv chain of the fused transition: x (CU, t*s) halo'd
    unshuffled conv stream (already boundary-realigned), x1 (CU, th*s)
    add stream. Returns F(x)+-x1 as (CU, th*s) f32.

    Frame bookkeeping matches _coupling_kernel_flat: input local rows
    [0, t); conv1' (2-row window) emits rows with u-row g = k - 2; conv2
    g = k - 1; conv3 g = k — exactly the output tile."""
    t = x.shape[1] // s
    m1 = b1_ref.shape[0]
    m2 = b2_ref.shape[0]

    def pos(n_lanes):
        return lax.broadcasted_iota(jnp.int32, (1, n_lanes), 1) % s

    # Top-edge row reflection for the 2x2 conv: full row -1 = full row 1 =
    # the p=1 phase of u-row 0, so the u-row -1 slot (local row 2) takes a
    # copy of u-row 0 (local 3) — the p=0 channels of the a=0 tap carry
    # zero weights. The 2-row window never reads below the output row, so
    # there is no bottom fix at this level. Expressed as a lane-masked
    # where (Mosaic fails to legalize the scalar-cond select over these
    # vectors); the aligned one-row shift is one cheap VPU pass.
    lane_row = lax.broadcasted_iota(jnp.int32, (1, t * s), 1) // s
    x_down1 = jnp.concatenate([x[:, s:], x[:, :s]], 1)  # row r <- row r+1
    x = jnp.where(is_top & (lane_row == HALO - 1), x_down1, x)

    h1 = _conv_flat2(x, w1_ref[...], b1_ref[...], m1, s, pos(t * s), co,
                     out_dtype=dt)                     # u-row g = k - 2
    h1 = _reflect_rows(h1, s, (1,), HALO - 1, t - 5, is_top, is_bottom)

    h2 = _conv_flat(h1, w2_ref[...], b2_ref[...], m2, s, pos((t - 2) * s),
                    w_img, co, relu=True, out_dtype=dt)  # g = k - 1
    h2 = _reflect_rows(h2, s, (1,), HALO - 2, t - 6, is_top, is_bottom)

    fx = _conv_flat(h2, w3_ref[...], b3_ref[...], c, s, pos((t - 4) * s),
                    w_img, co, relu=False, out_dtype=jnp.float32,
                    split_ky=c >= 128)                             # g = k
    x1 = x1.astype(jnp.float32)
    return (x1 - fx) if inverse else (fx + x1)


def _transition_kernel_flat(x2_ref, x1_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                            w3_ref, b3_ref, out_ref, *, th, s, w_img, co, c,
                            n_tiles, inverse, padded=True):
    """One grid program of the fused transition: output rows
    [i*TH, i*TH + TH) of F(x2u) +- x1u at HALF resolution (the streams are
    already unshuffled; w_img/s/co all refer to the half-res grid)."""
    i = pl.program_id(1)
    is_top = i == 0
    is_bottom = i == n_tiles - 1
    dt = x2_ref.dtype

    x = x2_ref[0]
    if not padded:
        k = HALO * s

        def shift_fix(xx):
            down = jnp.concatenate([xx[:, -k:], xx[:, :-k]], 1)
            up = jnp.concatenate([xx[:, k:], xx[:, :k]], 1)
            return jnp.where(is_top, down, up)

        x = lax.cond(is_top | is_bottom, shift_fix, lambda xx: xx, x)
    y = _transition_core(x, x1_ref[0], w1_ref, b1_ref, w2_ref, b2_ref,
                         w3_ref, b3_ref, s=s, w_img=w_img, co=co, c=c,
                         is_top=is_top, is_bottom=is_bottom,
                         inverse=inverse, dt=dt)
    out_ref[0] = y.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("th", "h", "w", "inverse", "interpret",
                                   "padded"))
def fused_transition_flat(x1f, x2f, packed, h: int, w: int, th: int = 32,
                          inverse: bool = False, interpret: bool = False,
                          padded: bool = True):
    """Fused stride-2 transition block on flat HALF-RES unshuffled streams.

    Forward: x1f = unshuffle(x1), x2f = unshuffle(x2) both (B, 4C, ...)
    flat at half resolution; returns F(x2f) + x1f (caller swaps streams as
    with fused_coupling_flat). Inverse: pass (x1f=y2, x2f=y1) with
    inverse=True to get y2 - F(y1); the caller pixel-shuffles outside.
    h/w are the HALF-RES image dims; padded semantics as in
    fused_coupling_flat."""
    b, cu, _ = x2f.shape
    assert h % th == 0, f"H={h} not divisible by tile {th}"
    s = row_stride(w)
    n_tiles = h // th
    t = th + 2 * HALO
    if not padded:
        assert th >= HALO and h >= t, (
            f"no-pad path needs TH>={HALO} and H>=TH+6 (h={h}, th={th})")

    el = pl.Element
    kernel = partial(
        _transition_kernel_flat, th=th, s=s, w_img=w, co=col_offset(w),
        c=cu, n_tiles=n_tiles, inverse=inverse, padded=padded,
    )
    if padded:
        x2_map = lambda bb, ii: (bb, 0, ii * th * s)
        x1_map = lambda bb, ii: (bb, 0, (HALO + ii * th) * s)
    else:
        x2_map = lambda bb, ii: (
            bb, 0, jnp.clip(ii * th - HALO, 0, h - t) * s)
        x1_map = lambda bb, ii: (bb, 0, ii * th * s)
    return pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((el(1), el(cu), el(t * s)), x2_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((el(1), el(cu), el(th * s)), x1_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((el(1), el(cu), el(th * s)), x1_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x1f.shape, x1f.dtype),
        interpret=interpret,
    )(x2f, x1f, packed["w1"], packed["b1"], packed["w2"], packed["b2"],
      packed["w3"], packed["b3"])


@partial(jax.jit, static_argnames=("th", "h", "w", "inverse", "interpret",
                                   "padded"))
def fused_coupling_flat(x1f, x2f, packed, h: int, w: int, th: int = 64,
                        inverse: bool = False, interpret: bool = False,
                        padded: bool = True):
    """Additive coupling block on flat-layout tensors.

    padded=True: x1f, x2f (B, C, (H+6)*S); returns the same layout (its
    boundary slots are garbage — never read downstream).

    padded=False: x1f, x2f (B, C, H*S) — NO halo rows, so for S == W the
    tensor is a zero-copy reshape of the NCHW image and no materialized
    pad/slice sits at the pallas_call boundary (XLA cannot fuse into a
    custom call). Requires H >= TH + 6 and TH >= 3; the kernel clips the
    halo window into range and rolls the boundary tiles (see
    _coupling_kernel_flat).
    """
    b, c, _ = x2f.shape
    assert h % th == 0, f"H={h} not divisible by tile {th}"
    s = row_stride(w)
    n_tiles = h // th
    t = th + 2 * HALO
    if not padded:
        assert th >= HALO and h >= t, (
            f"no-pad path needs TH>={HALO} and H>=TH+6 (h={h}, th={th})")

    el = pl.Element
    kernel = partial(
        _coupling_kernel_flat, th=th, s=s, w_img=w, co=col_offset(w), c=c,
        n_tiles=n_tiles, inverse=inverse, padded=padded,
    )
    if padded:
        x2_map = lambda bb, ii: (bb, 0, ii * th * s)
        x1_map = lambda bb, ii: (bb, 0, (HALO + ii * th) * s)
    else:
        x2_map = lambda bb, ii: (
            bb, 0, jnp.clip(ii * th - HALO, 0, h - t) * s)
        x1_map = lambda bb, ii: (bb, 0, ii * th * s)
    return pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((el(1), el(c), el(t * s)), x2_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((el(1), el(c), el(th * s)), x1_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((el(1), el(c), el(th * s)), x1_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x1f.shape, x1f.dtype),
        interpret=interpret,
    )(x2f, x1f, packed["w1"], packed["b1"], packed["w2"], packed["b2"],
      packed["w3"], packed["b3"])


# ---------------------------------------------------------------------------
# Full-res-boundary fused transition: the pixel (un)shuffle lives INSIDE
# the kernel. The XLA-side 6D phase transposes around fused_transition_flat
# are real HBM copies that cannot fuse through the custom-call boundary
# (the documented cause of the B256 fused-transition regression, PERF.md);
# here the kernel reads the FULL-RES flat stream (a zero-copy reshape of
# NCHW for 128-multiple widths) and does the (un)shuffle in-VMEM. The q
# (lane) phase split is a fixed per-row lane permutation, computed as a
# PERMUTATION-MATRIX DOT on the MXU: Mosaic refuses strided lane
# loads/stores on long flat memrefs ("last dim size is not 128 in
# original base memref", hardware round-5 finding), but a (w2, w2)
# 0/1-matrix contraction is bread-and-butter — and EXACT, since every
# output column has exactly one nonzero (bf16 1.0 products are exact;
# the f32 path dots at Precision.HIGHEST whose bf16x3 operand split is
# exact for 1.0 multiplies). Full rows are stacked on sublanes so all
# rows permute in ONE fat MXU dot. The p (row) phase split is aligned
# lane-segment concats. Semantics == pixel_unshuffle_nchw ∘
# fused_transition_flat (tests assert exact equality in f32).
# ---------------------------------------------------------------------------

def _q_perm(w2: int, dtype, inverse: bool = False):
    """(w2, w2) lane-permutation matrix P[r, m] = (r == sel(m)).

    Forward: out column m < s takes lane 2m (q=0), column s+m takes lane
    2m+1 (q=1) — deinterleave into [evens | odds] halves. Inverse: out
    lane l takes stacked lane l//2 + (l%2)*s — re-interleave."""
    r = lax.broadcasted_iota(jnp.int32, (w2, w2), 0)
    m = lax.broadcasted_iota(jnp.int32, (w2, w2), 1)
    s = w2 // 2
    if inverse:
        sel = m // 2 + (m % 2) * s
    else:
        sel = jnp.where(m < s, 2 * m, 2 * (m - s) + 1)
    return (r == sel).astype(dtype)


def _perm_precision(dtype):
    return (lax.Precision.HIGHEST if dtype == jnp.float32
            else lax.Precision.DEFAULT)


def _unshuffle_from_ref(ref, n_rows: int, s2: int):
    """ref (1, C, n_rows*2 * s2*2) full-res flat window -> (4C, n_rows*s2)
    unshuffled, channel order [p][q][ci] (pixel_unshuffle_nchw's)."""
    x = ref[0]                       # (C, 2*n_rows * 2*s2)
    c = x.shape[0]
    w2 = 2 * s2
    # stack the 2*n_rows full rows on sublanes -> (2n*C, w2)
    rows = jnp.concatenate(
        [x[:, r * w2:(r + 1) * w2] for r in range(2 * n_rows)], axis=0)
    d = lax.dot_general(
        rows, _q_perm(w2, rows.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_perm_precision(rows.dtype)).astype(x.dtype)
    qe, qo = d[:, :s2], d[:, s2:]    # (2n*C, s2) each

    def grp(q, p):
        # rows with parity p, re-laid as lane segments -> (C, n*s2)
        return jnp.concatenate(
            [q[(2 * j + p) * c:(2 * j + p + 1) * c] for j in range(n_rows)],
            axis=1)

    return jnp.concatenate(
        [grp(qe, 0), grp(qo, 0), grp(qe, 1), grp(qo, 1)], axis=0)


def _interleave_rows(b_p0, b_p1, n_rows: int, s2: int):
    """(C, n*s2) x2 -> (C, 2n*s2): full row 2j from b_p0, 2j+1 from b_p1."""
    parts = []
    for j in range(n_rows):
        parts.append(b_p0[:, j * s2:(j + 1) * s2])
        parts.append(b_p1[:, j * s2:(j + 1) * s2])
    return jnp.concatenate(parts, axis=1)


def _shuffle_to_ref(ref, xu, n_rows: int, s2: int):
    """xu (4C, n_rows*s2) unshuffled -> ref (1, C, 2n*2s2) full-res flat:
    p row interleave (lane segments), then the q lane interleave as the
    inverse permutation dot on sublane-stacked full rows."""
    c = xu.shape[0] // 4
    q0 = _interleave_rows(xu[:c], xu[2 * c:3 * c], n_rows, s2)
    q1 = _interleave_rows(xu[c:2 * c], xu[3 * c:], n_rows, s2)
    w2 = 2 * s2
    # stack rows as [q0_row | q1_row] on sublanes -> (2n*C, w2)
    rows = jnp.concatenate(
        [jnp.concatenate([q0[:, r * s2:(r + 1) * s2],
                          q1[:, r * s2:(r + 1) * s2]], axis=1)
         for r in range(2 * n_rows)], axis=0)
    d = lax.dot_general(
        rows, _q_perm(w2, rows.dtype, inverse=True), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_perm_precision(rows.dtype)).astype(xu.dtype)
    ref[0] = jnp.concatenate(
        [d[r * c:(r + 1) * c] for r in range(2 * n_rows)], axis=1)


def _transition_kernel_full(x2_ref, x1_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                            w3_ref, b3_ref, x2u_ref, y_ref, *, s2, w_img,
                            co, c4, th, n_tiles):
    """Forward full-res-boundary transition: reads full-res flat streams,
    emits (unshuffle(x2) tile, F(unshuffle(x2)) + unshuffle(x1))."""
    i = pl.program_id(1)
    is_top = i == 0
    is_bottom = i == n_tiles - 1
    t = th + 2 * HALO
    dt = x2_ref.dtype

    x = _unshuffle_from_ref(x2_ref, t, s2)
    # nopad boundary realignment — the window clip happens at full-row
    # granularity (2x the u-row clip), so after the in-kernel unshuffle
    # the u-row displacement is exactly HALO, as in the flat nopad path
    k = HALO * s2

    def shift_fix(xx):
        down = jnp.concatenate([xx[:, -k:], xx[:, :-k]], 1)
        up = jnp.concatenate([xx[:, k:], xx[:, :k]], 1)
        return jnp.where(is_top, down, up)

    x = lax.cond(is_top | is_bottom, shift_fix, lambda xx: xx, x)
    x1u = _unshuffle_from_ref(x1_ref, th, s2)
    y = _transition_core(x, x1u, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref,
                         b3_ref, s=s2, w_img=w_img, co=co, c=c4,
                         is_top=is_top, is_bottom=is_bottom,
                         inverse=False, dt=dt)
    x2u_ref[0] = x[:, HALO * s2:(HALO + th) * s2]
    y_ref[0] = y.astype(y_ref.dtype)


def _transition_kernel_full_inv(y1_ref, y2_ref, w1_ref, b1_ref, w2_ref,
                                b2_ref, w3_ref, b3_ref, x1_ref, x2_ref, *,
                                s2, w_img, co, c4, th, n_tiles):
    """Inverse: reads half-res unshuffled streams (y1 halo'd), emits the
    FULL-RES shuffled streams x1 = shuffle(y2 - F(y1)), x2 = shuffle(y1)."""
    i = pl.program_id(1)
    is_top = i == 0
    is_bottom = i == n_tiles - 1
    dt = y1_ref.dtype
    k = HALO * s2

    x = y1_ref[0]

    def shift_fix(xx):
        down = jnp.concatenate([xx[:, -k:], xx[:, :-k]], 1)
        up = jnp.concatenate([xx[:, k:], xx[:, :k]], 1)
        return jnp.where(is_top, down, up)

    x = lax.cond(is_top | is_bottom, shift_fix, lambda xx: xx, x)
    x1u = _transition_core(x, y2_ref[0], w1_ref, b1_ref, w2_ref, b2_ref,
                           w3_ref, b3_ref, s=s2, w_img=w_img, co=co, c=c4,
                           is_top=is_top, is_bottom=is_bottom,
                           inverse=True, dt=dt)
    _shuffle_to_ref(x1_ref, x1u.astype(x1_ref.dtype), th, s2)
    _shuffle_to_ref(x2_ref, x[:, HALO * s2:(HALO + th) * s2], th, s2)


@partial(jax.jit, static_argnames=("th", "h", "w", "inverse", "interpret"))
def fused_transition_full(a, b_, packed, h: int, w: int, th: int = 16,
                          inverse: bool = False, interpret: bool = False):
    """Fused stride-2 transition with IN-KERNEL pixel (un)shuffle.

    h/w are the HALF-RES dims; requires w % 128 == 0 (zero-copy flat at
    both resolutions), h % th == 0, th >= HALO, h >= th + 6 (the nopad
    regime — other shapes route through fused_transition_flat).

    Forward (inverse=False): a = x1 NCHW (B, C, 2h, 2w) full-res,
    b_ = x2 NCHW; returns (unshuffle(x2) , F(unshuffle(x2)) +
    unshuffle(x1)) as flat (B, 4C, h*w) pairs — the next stage's
    (x1f, x2f), already in its zero-copy entry layout.

    Inverse: a = y2 flat (B, 4C, h*w), b_ = y1 flat; returns
    (x1, x2) = (shuffle(y2 - F(y1)), shuffle(y1)) as NCHW full-res."""
    assert h % th == 0 and th >= HALO and h >= th + 2 * HALO, (h, th)
    assert w % 128 == 0, f"full-boundary transition needs w%128==0, got {w}"
    s2 = row_stride(w)
    assert s2 == w
    n_tiles = h // th
    t = th + 2 * HALO
    el = pl.Element
    wf = 2 * w

    if not inverse:
        x1, x2 = a, b_
        bsz, c = x1.shape[0], x1.shape[1]
        x1f = x1.reshape(bsz, c, 2 * h * wf)
        x2f = x2.reshape(bsz, c, 2 * h * wf)
        kernel = partial(_transition_kernel_full, s2=s2, w_img=w,
                         co=col_offset(w), c4=4 * c, th=th, n_tiles=n_tiles)
        out = jax.ShapeDtypeStruct((bsz, 4 * c, h * w), x1.dtype)
        return pl.pallas_call(
            kernel,
            grid=(bsz, n_tiles),
            in_specs=[
                pl.BlockSpec(
                    (el(1), el(c), el(2 * t * wf)),
                    lambda bb, ii: (
                        bb, 0,
                        2 * jnp.clip(ii * th - HALO, 0, h - t) * wf),
                    memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (el(1), el(c), el(2 * th * wf)),
                    lambda bb, ii: (bb, 0, 2 * ii * th * wf),
                    memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((el(1), el(4 * c), el(th * s2)),
                             lambda bb, ii: (bb, 0, ii * th * s2),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((el(1), el(4 * c), el(th * s2)),
                             lambda bb, ii: (bb, 0, ii * th * s2),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[out, out],
            interpret=interpret,
        )(x2f, x1f, packed["w1"], packed["b1"], packed["w2"], packed["b2"],
          packed["w3"], packed["b3"])

    y2, y1 = a, b_
    bsz, c4 = y1.shape[0], y1.shape[1]
    c = c4 // 4
    kernel = partial(_transition_kernel_full_inv, s2=s2, w_img=w,
                     co=col_offset(w), c4=c4, th=th, n_tiles=n_tiles)
    out = jax.ShapeDtypeStruct((bsz, c, 2 * h * wf), y1.dtype)
    x1f, x2f = pl.pallas_call(
        kernel,
        grid=(bsz, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (el(1), el(c4), el(t * s2)),
                lambda bb, ii: (
                    bb, 0, jnp.clip(ii * th - HALO, 0, h - t) * s2),
                memory_space=pltpu.VMEM),
            pl.BlockSpec((el(1), el(c4), el(th * s2)),
                         lambda bb, ii: (bb, 0, ii * th * s2),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((el(1), el(c), el(2 * th * wf)),
                         lambda bb, ii: (bb, 0, 2 * ii * th * wf),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((el(1), el(c), el(2 * th * wf)),
                         lambda bb, ii: (bb, 0, 2 * ii * th * wf),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[out, out],
        interpret=interpret,
    )(y1, y2, packed["w1"], packed["b1"], packed["w2"], packed["b2"],
      packed["w3"], packed["b3"])
    return (x1f.reshape(bsz, c, 2 * h, wf),
            x2f.reshape(bsz, c, 2 * h, wf))
