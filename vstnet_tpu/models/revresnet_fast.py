"""Fast-path reversible network: fused flat-layout Pallas coupling blocks.

Same math as models/revresnet.py (which remains the reference/training
path), but the hot stride-1 coupling blocks run as single fused Pallas
kernels in the flat rows-in-lanes layout (vstnet_tpu/ops/coupling_flat.py):
one MXU dot per conv, all tap adds lane-aligned, intermediates in VMEM.

Stage routing (measured on v5e at 512^2):
  * stage1 (16ch streams, 4ch mid, full res): XLA is ~25x off roofline
    (lane-pads C=16 to 128); flat kernel ~2.9x faster than even an
    isolated XLA block and ~4x in-network.
  * stage2 (64ch): XLA pads 64->128 (2x waste); flat wins.
  * stage3 (256ch) + reduction (256ch): C fills the lane tiles — XLA convs
    are near-roofline there; fusing loses to VMEM pressure. They run XLA
    in NCHW, which is also the natural neighbor layout of the flat form
    (entering/leaving flat is a minor-dim pad/slice, not a transpose).
  * stride-2 transitions: XLA runs their tiny-channel strided convs
    10-30x off roofline; at batch <= TR_FUSE_MAX_BATCH they run as fused
    flat kernels on the pixel-unshuffled streams (the stride-2 conv is
    algebraically a 2x2 phase conv at half res — ops/coupling_flat.py),
    sharing the following stage's flat segment. At larger batches XLA's
    transpose-into-conv fusions win; both weight forms are packed and
    the route picks per batch.

Parity: bit-faithful to the standard path to f32 roundoff (the fused
kernel reproduces per-conv ReflectionPad2d border semantics exactly);
fused encode/decode remain exact inverses of each other.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax

from vstnet_tpu.config import RevResNetConfig
from vstnet_tpu.ops.coupling import pixel_shuffle_nchw, pixel_unshuffle_nchw
from vstnet_tpu.ops.coupling_flat import (
    HALO,
    col_offset,
    flat_len,
    fused_coupling_flat,
    fused_transition_flat,
    fused_transition_full,
    pack_branch_weights_flat,
    pack_transition_weights_flat,
    row_stride,
)

# Fuse stride-1 blocks whose stream channel count is at most this.
# 256 since round 5: with the transitions running in-kernel (TR_FULL),
# fusing stage3 + reduction removes the last XLA conv segment and its
# layout-reconciliation copies at the custom-call borders — measured
# 148.1 -> 166.8 fps/chip @B128 512² (163.8-166.9 at EVERY batch 16-256;
# the batch dependence collapses once the network is kernel-resident).
# Round 4 measured the same routing at -3% — that was BEFORE TR_FULL,
# when the pallas boundary forced the stride-2 phase transposes to
# materialize on both sides. Env kill switch: VSTNET_FUSE_MAX_CH.
FUSE_MAX_CHANNELS = int(os.environ.get("VSTNET_FUSE_MAX_CH", "256"))
# Fuse stride-2 transition blocks whose UNSHUFFLED stream channel count is
# at most this (the kernel runs at half resolution on the unshuffled
# streams — ops/coupling_flat.py transition section; XLA runs the
# tiny-channel strided convs 10-30x off roofline).
TR_FUSE_MAX_CHANNELS = 256
# ... but only for batches up to this. Measured on v5e @512² (same-day
# A/B): fused transitions are +6% device-plane at B64 and +0.3% wall at
# B128, yet -3.4% at B256 — at large batch XLA fuses one side of each 6D
# phase transpose into the stride-2 conv reads, and the custom-call
# boundary forces both sides to materialize (~+390 us/frame of %copy).
# Both forms are packed; encode/decode route per batch.
TR_FUSE_MAX_BATCH = 64
# Full-res-boundary transition route: the pixel (un)shuffle runs INSIDE
# the kernel (coupling_flat.fused_transition_full — lane-permutation
# dots + aligned segment concats on VMEM-resident data), so the
# XLA-side 6D phase transposes that caused the B256 regression never
# exist and the batch cap above does not apply. Requires the zero-copy
# regime (half-res width % 128 == 0). Env kill switch: VSTNET_TR_FULL=0.
TR_FULL_FUSE = os.environ.get("VSTNET_TR_FULL", "1") != "0"
# VMEM budget for picking the row-tile size (v5e ~16 MB/core).
VMEM_BUDGET = 13 * 1024 * 1024


def pick_tile(h: int, c: int, w: int, dtype_bytes: int = 2,
              nopad: bool = False) -> int:
    """Largest tile height whose kernel working set fits VMEM.

    Dominant live tensors per program (L = (th+6)*S lanes): the stacked
    input (3*Cin, L) in activation dtype, the dot output (3*Mp, L) f32
    (Mp = padded mid channels; conv3's is (3*C, L)), and the two stream
    blocks. The no-pad entry path's boundary-tile shift_fix holds two
    extra (Cin, L) copies live (ops/coupling_flat.py) — nopad=True
    budgets for them.
    """
    s = row_stride(w)
    mp = max(_rup8(c // 4), 8)
    if c >= 128:
        # conv3 runs split-ky here (ops/coupling_flat.py:_conv_flat):
        # the f32 dot peak is one per-tap (C, L) block + the (C, L-2S)
        # accumulator, not the unsplit (3*C, L). Calibrated against
        # Mosaic's measured scoped stack (hardware round-5): bf16 c=256
        # needs ~c*18 B/lane-row (16.43 MB at th=8, s=256 — the padded
        # 768² route FAILED under the old c*14 model), and f32 ~c*37
        # (16.87 MB at th=8, s=128: Precision.HIGHEST triples the
        # operand copies via the bf16x3 split). Model: 3 stream taps
        # (x3 for f32 HIGHEST) + 2 f32 accumulator blocks + one
        # activation-sized slack block.
        mult = 3 if dtype_bytes == 4 else 1
        per_row = s * c * (3 * dtype_bytes * mult + 2 * 4 + 4)
    else:
        # peak ~ shift stack (3*Cin) in act dtype + dot output (3*Mp)
        # f32, whichever conv is widest (validated against what Mosaic
        # accepts on v5e: stage1 th=64 compiles and is fastest)
        per_row = s * 3 * (c * dtype_bytes + max(mp, c) * 4)
    if nopad:
        # shift_fix's temporaries die before the dot peak; one extra
        # stream block of allowance is what Mosaic's scoped accounting
        # needs in practice (stage2 th=32 nopad verified on v5e)
        per_row += c * dtype_bytes * s
    cap = max(VMEM_BUDGET // per_row - 6, 1)
    for th in range(min(h, cap, 128), 0, -1):
        if h % th == 0:
            return th
    return 1


def _rup8(n: int) -> int:
    return (n + 7) // 8 * 8


# Mosaic's measured scoped-vmem stack for the transition kernel: 16.18 MB
# at (t=26, s=128, cu=256, bf16) = ~19 B per channel*lane*row — about
# 6 activation-dtype copies (stream, top-fix shift, shift_fix temps,
# 2-tap stack, mids) + ~8 B of f32 dot/accum terms per element, with
# Mosaic's conservative liveness. Budget against the real 16 MB scoped
# limit with margin; the 512² production shape lands on th=16 (13.7 MB,
# verified compiling on v5e) and the failing CLI shape (h'=80, th=20,
# 16.18 MB) now picks th=16 too.
VMEM_LIMIT_TR = 15 * 1024 * 1024


def pick_tile_tr(h: int, cu: int, w: int, dtype_bytes: int = 2,
                 nopad: bool = False) -> int:
    """Row tile for the fused TRANSITION kernel at unshuffled channel
    count cu, calibrated to Mosaic's measured stack accounting (above).
    nopad adds nothing measurable beyond the modeled shift temporaries —
    the calibration point WAS the nopad form."""
    del nopad  # calibration already includes the nopad shift temporaries
    s = row_stride(w)
    per_row = s * cu * (6 * dtype_bytes + 8)
    cap = max(VMEM_LIMIT_TR // per_row - 6, 1)
    for th in range(min(h, cap, 128), 0, -1):
        if h % th == 0:
            return th
    return 1


def pack_revresnet(params: Dict, cfg: RevResNetConfig, dtype=None) -> Dict:
    """Standard params pytree -> fast-path pytree: stride-1 branches packed
    for the fused flat kernel; others kept HWIO for the XLA path.

    The wide-channel (>64) fuse cap applies to the bf16 fast path only:
    f32 is the fidelity tier whose stage3/reduction stay on XLA's
    Precision.HIGHEST convs (the parity-gated round-4 routing) — and the
    f32 c=256 kernel working set measurably overflows the 16 MB scoped
    VMEM limit at production shapes (hardware round-5 finding)."""
    plan = cfg.block_plan()

    def cvt(tree):
        return jax.tree.map(lambda a: a.astype(dtype), tree) if dtype else tree

    fuse_max = (FUSE_MAX_CHANNELS if dtype == jnp.bfloat16
                else min(FUSE_MAX_CHANNELS, 64))
    stack = []
    for bp, (ch, stride) in zip(params["stack"], plan):
        if stride == 1 and ch <= fuse_max:
            stack.append({"packed": cvt(pack_branch_weights_flat(bp))})
        elif stride == 2 and ch <= TR_FUSE_MAX_CHANNELS:
            # both forms: encode/decode route by batch (TR_FUSE_MAX_BATCH)
            stack.append({"packed_tr": cvt(pack_transition_weights_flat(bp)),
                          "raw": cvt(bp)})
        else:
            stack.append({"raw": cvt(bp)})
    red_ch = cfg.hidden_dim * 4 ** cfg.sp_steps
    reduction = [
        {"packed": cvt(pack_branch_weights_flat(bp))}
        if red_ch <= fuse_max else {"raw": cvt(bp)}
        for bp in params["reduction"]
    ]
    return {"stack": stack, "reduction": reduction}


# ---------------------------------------------------------------------------
# NCHW XLA ops (stride-2 transitions, shuffles, fat stages)
# ---------------------------------------------------------------------------

def _reflect_pad_nchw(x, pad: int):
    return jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)),
                   mode="reflect")


def _conv_nchw(x, w, b, stride=1, relu=False):
    out = lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), "VALID",
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        preferred_element_type=jnp.float32,
        precision=(lax.Precision.HIGHEST if x.dtype == jnp.float32
                   else lax.Precision.DEFAULT),
    )
    out = out + b.astype(jnp.float32)[None, :, None, None]
    if relu:
        out = jax.nn.relu(out)
    return out.astype(x.dtype)


def _branch_nchw(x, raw, stride):
    h = _conv_nchw(_reflect_pad_nchw(x, 1), raw["conv1"]["w"],
                   raw["conv1"]["b"], stride=stride, relu=True)
    h = _conv_nchw(_reflect_pad_nchw(h, 1), raw["conv2"]["w"],
                   raw["conv2"]["b"], relu=True)
    return _conv_nchw(_reflect_pad_nchw(h, 1), raw["conv3"]["w"],
                      raw["conv3"]["b"])




# ---------------------------------------------------------------------------
# flat <-> NCHW (minor-dim pad/slice only)
# ---------------------------------------------------------------------------

def _to_flat(x):
    b, c, h, w = x.shape
    s = row_stride(w)
    co = col_offset(w)
    x = jnp.pad(x, ((0, 0), (0, 0), (3, 3), (co, s - w - co)))
    return x.reshape(b, c, (h + 6) * s)


def _from_flat(xf, h: int, w: int):
    b, c, _ = xf.shape
    s = row_stride(w)
    co = col_offset(w)
    return xf.reshape(b, c, h + 6, s)[:, :, 3:3 + h, co:co + w]


# ---------------------------------------------------------------------------
# Encoder / decoder
# ---------------------------------------------------------------------------

def _nopad_ok(h: int, w: int, th: int) -> bool:
    """The zero-copy flat entry/exit: for 128-multiple widths the flat
    row stride equals W (no column halo), so (B,C,H,W) <-> (B,C,H*W) is a
    free reshape and no materialized pad/slice sits at the pallas_call
    boundary (XLA cannot fuse through a custom call — the pads/slices of
    the padded form are real HBM copies, ~24% of the fused frame time in
    the round-3 roofline). The kernel then reconstructs the row halo by
    clipping its window and rolling the two boundary tiles."""
    from vstnet_tpu.ops.coupling_flat import HALO

    return w % 128 == 0 and th >= HALO and h >= th + 2 * HALO


def _pick_route(x1, h, w):
    """(th, nopad) for a fused stage: prefer the zero-copy entry when a
    shift-budgeted tile still satisfies its constraints."""
    c = x1.shape[1]
    nbytes = 2 if x1.dtype == jnp.bfloat16 else 4
    th_np = pick_tile(h, c, w, dtype_bytes=nbytes, nopad=True)
    if _nopad_ok(h, w, th_np):
        return th_np, True
    return pick_tile(h, c, w, dtype_bytes=nbytes), False


def _tr_tile(x1, h, w, th_run, nopad):
    """Transition-kernel tile height: its own (bigger) budget, falling
    back to the run's tile if the no-pad constraints would break."""
    nbytes = 2 if x1.dtype == jnp.bfloat16 else 4
    th_tr = pick_tile_tr(h, x1.shape[1], w, nbytes, nopad=nopad)
    if nopad and not _nopad_ok(h, w, th_tr):
        return th_run
    return th_tr


def _tr_full_th(h: int, w: int, cu: int, nbytes: int = 2):
    """Tile height for the full-res-boundary transition, or None when the
    route doesn't apply (h/w are the HALF-res dims, cu = 4C). Budget: the
    half-res working set of pick_tile_tr plus the in-kernel (de)interleave
    values — sublane-stacked full rows, the f32 permutation-dot output,
    and the (2w)² lane-permutation matrix itself (a constant, charged
    against the limit)."""
    if not TR_FULL_FUSE or w % 128 != 0:
        return None
    s = row_stride(w)
    per_row = s * cu * (10 * nbytes + 16)
    limit = VMEM_LIMIT_TR - (2 * w) * (2 * w) * nbytes
    if limit <= 0:
        return None
    cap = max(limit // per_row - 6, 1)
    for th in range(min(h, cap, 128), HALO - 1, -1):
        if h % th == 0 and h >= th + 2 * HALO:
            return th
    return None


def _fused_stage_forward(x1, x2, blocks, h, w, tr=None):
    """Run one fused segment keeping streams flat: an optional leading
    stride-2 transition followed by consecutive fused stride-1 blocks at
    the same resolution. With tr, the streams arrive either ALREADY
    unshuffled at half res (legacy route — the caller pixel_unshuffles)
    or at FULL res (x1.shape[2] == 2h: the full-boundary route, where
    fused_transition_full does the unshuffle in-kernel)."""
    if tr is not None and x1.shape[2] == 2 * h:
        nbytes = 2 if x1.dtype == jnp.bfloat16 else 4
        th_f = _tr_full_th(h, w, 4 * x1.shape[1], nbytes)
        if th_f is None:
            # callers pre-check with the same nbytes, so this is only a
            # safety net: fall back to the legacy half-res entry
            x1 = pixel_unshuffle_nchw(x1)
            x2 = pixel_unshuffle_nchw(x2)
        else:
            x1f, x2f = fused_transition_full(x1, x2, tr["packed_tr"], h, w,
                                             th=th_f)
            b, c4 = x1f.shape[0], x1f.shape[1]
            x1 = x1f.reshape(b, c4, h, w)  # free: nopad flat == NCHW bytes
            x2 = x2f.reshape(b, c4, h, w)
            tr = None
    b, c = x1.shape[0], x1.shape[1]
    th, nopad = _pick_route(x1, h, w)
    if nopad:
        x1f, x2f = x1.reshape(b, c, h * w), x2.reshape(b, c, h * w)
    else:
        x1f, x2f = _to_flat(x1), _to_flat(x2)
    if tr is not None:
        x1f, x2f = x2f, fused_transition_flat(
            x1f, x2f, tr["packed_tr"], h, w,
            th=_tr_tile(x1, h, w, th, nopad), padded=not nopad)
    for bp in blocks:
        x1f, x2f = x2f, fused_coupling_flat(x1f, x2f, bp["packed"], h, w,
                                            th=th, padded=not nopad)
    if nopad:
        return x1f.reshape(b, c, h, w), x2f.reshape(b, c, h, w)
    return _from_flat(x1f, h, w), _from_flat(x2f, h, w)


def _fused_stage_inverse(x1, x2, blocks, h, w, tr=None):
    """Inverse of _fused_stage_forward. With tr, streams leave either
    still unshuffled at half res (legacy route — the caller
    pixel_shuffles) or at FULL res NCHW (the full-boundary route does the
    shuffle in-kernel; callers detect via shape[2] == 2h)."""
    b, c = x1.shape[0], x1.shape[1]
    th, nopad = _pick_route(x1, h, w)
    nbytes = 2 if x1.dtype == jnp.bfloat16 else 4
    th_full = (_tr_full_th(h, w, c, nbytes)
               if tr is not None and nopad else None)
    if nopad:
        x1f, x2f = x1.reshape(b, c, h * w), x2.reshape(b, c, h * w)
    else:
        x1f, x2f = _to_flat(x1), _to_flat(x2)
    for bp in reversed(blocks):
        # forward: (a, b) -> (b, F(b)+a); inverse: (p, q) -> (q - F(p), p)
        x1f, x2f = fused_coupling_flat(x2f, x1f, bp["packed"], h, w,
                                       th=th, inverse=True,
                                       padded=not nopad), x1f
    if tr is not None:
        if th_full is not None:
            # (y1, y2) = (x1f, x2f): emits full-res shuffled NCHW pairs
            return fused_transition_full(x2f, x1f, tr["packed_tr"], h, w,
                                         th=th_full, inverse=True)
        x1f, x2f = fused_transition_flat(
            x2f, x1f, tr["packed_tr"], h, w,
            th=_tr_tile(x1, h, w, th, nopad), inverse=True,
            padded=not nopad), x1f
    if nopad:
        return x1f.reshape(b, c, h, w), x2f.reshape(b, c, h, w)
    return _from_flat(x1f, h, w), _from_flat(x2f, h, w)


def _block_forward_nchw(x1, x2, bp, stride):
    if stride == 1:
        return x2, _branch_nchw(x2, bp["raw"], 1) + x1
    fx2 = _branch_nchw(x2, bp["raw"], stride)
    x1 = pixel_unshuffle_nchw(x1)
    x2 = pixel_unshuffle_nchw(x2)
    return x2, fx2 + x1


def _block_inverse_nchw(y1, y2, bp, stride):
    if stride == 1:
        x2 = y1
        return y2 - _branch_nchw(x2, bp["raw"], 1), x2
    x2 = pixel_shuffle_nchw(y1)
    fx2 = _branch_nchw(x2, bp["raw"], stride)
    x1 = pixel_shuffle_nchw(y2 - fx2)
    return x1, x2


def _segments(fast_params, plan, batch: int, hw=None, nbytes: int = 2):
    """Group the block plan into runs: ("nchw", None, [(bp, stride)...])
    or ("fused", tr_bp_or_None, [stride-1 bps...]). A fused stride-2
    transition STARTS a fused run — it changes resolution, and the
    following fused blocks share its flat segment (no layout exit
    between the transition and the stage it opens). Transitions route to
    the fused kernel at batch <= TR_FUSE_MAX_BATCH (the measured
    crossover — see the constant above), OR at any batch when the
    full-res-boundary route applies (hw = the FULL input resolution of
    the stack; the in-kernel unshuffle removes the XLA transposes that
    caused the large-batch regression)."""
    runs = []
    h, w = hw if hw is not None else (0, 0)
    for bp, (ch, stride) in zip(fast_params["stack"], plan):
        if stride == 2 and h:
            h, w = h // 2, w // 2  # resolution AFTER this transition
        tr_fuse = batch <= TR_FUSE_MAX_BATCH or (
            stride == 2 and h > 0
            and _tr_full_th(h, w, ch, nbytes) is not None)
        if "packed_tr" in bp and tr_fuse:
            runs.append(["fused", bp, []])
        elif "packed" in bp:
            if runs and runs[-1][0] == "fused":
                runs[-1][2].append(bp)
            else:
                runs.append(["fused", None, [bp]])
        else:
            if runs and runs[-1][0] == "nchw":
                runs[-1][2].append((bp, stride))
            else:
                runs.append(["nchw", None, [(bp, stride)]])
    return runs


def encode_fast(fast_params: Dict, x, cfg: RevResNetConfig,
                packed_latent: bool = False):
    """x: NHWC (B, H, W, 3) -> latent NHWC, via the fused flat path.

    packed_latent=True returns the pre-shuffle NCHW tensor
    (B, latent_channels * 4**sp_steps, H/4, W/4) and skips the final
    pixel shuffles + layout transpose: each shuffled pixel's latent is a
    contiguous C-chunk of these channels, so the global cWCT can run
    directly on this form (cwct.transfer_with_factors_packed) and
    decode_fast(packed_latent=True) consumes it back — saving ~1 ms/frame
    of shuffle transposes per stylize round trip."""
    plan = cfg.block_plan()
    x = jnp.transpose(x, (0, 3, 1, 2))  # NCHW
    x = jnp.pad(x, ((0, 0), (0, cfg.inj_pad), (0, 0), (0, 0)))
    n = x.shape[1] // 2
    x1, x2 = x[:, :n], x[:, n:]

    hw0 = (x.shape[2], x.shape[3])
    nbytes = 2 if x.dtype == jnp.bfloat16 else 4
    for kind, tr, blocks in _segments(fast_params, plan, x.shape[0], hw0,
                                      nbytes):
        if kind == "fused":
            if tr is not None:
                hh, hw = x1.shape[2] // 2, x1.shape[3] // 2
                if _tr_full_th(hh, hw, 4 * x1.shape[1], nbytes) is None:
                    # legacy route: unshuffle in XLA, half-res kernel
                    x1 = pixel_unshuffle_nchw(x1)
                    x2 = pixel_unshuffle_nchw(x2)
                # else: full-res entry — the stage's fused_transition_full
                # unshuffles in-kernel
                x1, x2 = _fused_stage_forward(x1, x2, blocks, hh, hw,
                                              tr=tr)
            else:
                h, w = x1.shape[2], x1.shape[3]
                x1, x2 = _fused_stage_forward(x1, x2, blocks, h, w)
        else:
            for bp, stride in blocks:
                x1, x2 = _block_forward_nchw(x1, x2, bp, stride)

    x = jnp.concatenate([x1, x2], axis=1)
    n = x.shape[1] // 2
    x1, x2 = x[:, :n], x[:, n:]
    red = fast_params["reduction"]
    if red and "packed" in red[0]:
        h, w = x1.shape[2], x1.shape[3]
        x1, x2 = _fused_stage_forward(x1, x2, red, h, w)
    else:
        for bp in red:
            x1, x2 = _block_forward_nchw(x1, x2, bp, 1)
    x = jnp.concatenate([x1, x2], axis=1)
    if packed_latent:
        return x
    for _ in range(cfg.sp_steps):
        x = pixel_shuffle_nchw(x)
    return jnp.transpose(x, (0, 2, 3, 1))


def decode_fast(fast_params: Dict, z, cfg: RevResNetConfig,
                packed_latent: bool = False):
    plan = cfg.block_plan()
    if packed_latent:
        x = z
    else:
        x = jnp.transpose(z, (0, 3, 1, 2))
        for _ in range(cfg.sp_steps):
            x = pixel_unshuffle_nchw(x)
    n = x.shape[1] // 2
    x1, x2 = x[:, :n], x[:, n:]
    red = fast_params["reduction"]
    if red and "packed" in red[0]:
        h, w = x1.shape[2], x1.shape[3]
        x1, x2 = _fused_stage_inverse(x1, x2, red, h, w)
    else:
        for bp in reversed(red):
            x1, x2 = _block_inverse_nchw(x1, x2, bp, 1)
    x = jnp.concatenate([x1, x2], axis=1)

    n = x.shape[1] // 2
    x1, x2 = x[:, :n], x[:, n:]
    # full input resolution for the route decision (stage3 runs at 1/4)
    hw0 = (x1.shape[2] * 4, x1.shape[3] * 4)
    nbytes = 2 if x.dtype == jnp.bfloat16 else 4
    for kind, tr, blocks in reversed(_segments(fast_params, plan,
                                                x.shape[0], hw0, nbytes)):
        if kind == "fused":
            h, w = x1.shape[2], x1.shape[3]
            x1, x2 = _fused_stage_inverse(x1, x2, blocks, h, w, tr=tr)
            if tr is not None and x1.shape[2] != 2 * h:
                # legacy route left half-res unshuffled streams
                x1 = pixel_shuffle_nchw(x1)
                x2 = pixel_shuffle_nchw(x2)
        else:
            for bp, stride in reversed(blocks):
                x1, x2 = _block_inverse_nchw(x1, x2, bp, stride)
    x = jnp.concatenate([x1, x2], axis=1)
    x = x[:, : x.shape[1] - cfg.inj_pad]
    return jnp.transpose(x, (0, 2, 3, 1))
