"""SegFormer-B4/B5 semantic segmentation (MiT backbone + all-MLP head),
JAX/NHWC.

Capability parity with the reference package segmenter
(/root/reference/project/image_style/segment.py:26-560): 4-stage
Mix-Transformer (B4 depths [3,8,27,3], dims [64,128,320,512], heads
[1,2,5,8], spatial-reduction ratios [8,4,2,1]), all-MLP decode head with BN
fuse, 150 ADE20K classes, replicate pad + ImageNet normalize + bilinear
upsample + argmax mask, and small-hole removal. The research video path's
MiT-B5 profile (video_transfer.py:119-127) loads through the same code —
stage depth is a leading scan axis, not an architecture change; converter
depths are inferred from checkpoint keys.

TPU-first design:
  * NHWC / channels-last; token tensors are (B, N, C).
  * Each stage's identical blocks run under one lax.scan over stacked
    params — 41 blocks compile as 4 scanned bodies, not 41 inlined ones.
  * Eval-only: BatchNorm folds running stats; no dropout/droppath (the
    reference inference model has none either).

Checkpoint schema: the torch keys of SegmentModel (backbone.*, decode_head.*)
convert via segformer_from_torch below.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from vstnet_tpu.ops.resize import pad_to_multiple, resize_bilinear

# fused dwconv+bias+GELU MixFFN kernel on the bf16 path (ops/dwconv.py);
# VSTNET_DW_FUSE=0 reverts to the XLA ops
_DW_FUSE = os.environ.get("VSTNET_DW_FUSE", "1") != "0"

EMBED_DIMS = (64, 128, 320, 512)
NUM_HEADS = (1, 2, 5, 8)
DEPTHS = (3, 8, 27, 3)  # MiT-B4 (the package segmenter, segment.py:327-337)
# MiT-B5 — the research video path's segmenter variant
# (/root/reference/video_transfer.py:119-127 loads
# segformer.b5.640x640.ade.160k); same dims/heads/sr, deeper stages 2-3.
DEPTHS_B5 = (3, 6, 40, 3)
SR_RATIOS = (8, 4, 2, 1)
MLP_RATIO = 4
EMBEDDING_DIM = 768
NUM_CLASSES = 150

# LayerNorm eps: Block/stage norms use 1e-6 (partial(LayerNorm, eps=1e-6),
# segment.py:334); patch-embed and attention-sr norms use the torch default
# 1e-5 (segment.py:126,60).
EPS_BLOCK = 1e-6
EPS_DEFAULT = 1e-5

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------

def _layer_norm(x, p, eps):
    """LN with f32 internals regardless of activation dtype (bf16 mean/var
    would lose the stability the reference's f32/half-autocast keeps)."""
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    y = (x32 - mu) * lax.rsqrt(var + eps)
    return (y * p["g"].astype(jnp.float32)
            + p["b"].astype(jnp.float32)).astype(dt)


def _linear(x, p):
    return x @ p["w"].astype(x.dtype) + p["b"].astype(x.dtype)


def _conv(x, p, stride=1, padding="SAME", groups=1):
    out = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
        precision=(lax.Precision.HIGHEST if x.dtype == jnp.float32
                   else lax.Precision.DEFAULT),
    ).astype(x.dtype)
    if "b" in p:
        # cast the bias: an f32 bias would promote a bf16 activation back
        # to f32 — and, through LN's astype(dt), every block downstream —
        # silently turning the half path into the f32 program
        out = out + p["b"].astype(out.dtype)
    return out


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

def _attention(x, p, h, w, num_heads, sr_ratio):
    """Spatial-reduction attention (segment.py:44-84). x: (B, N, C).

    bf16 routes the single-pass flash kernel (ops/attention.py) — the
    XLA einsum path materializes the (N, M) f32 score matrix in HBM
    (268 MB per stage-1 block at 1024²); same math, same f32 softmax."""
    from vstnet_tpu.ops.attention import flash_ok, sr_attention_flash

    b, n, c = x.shape
    hd = c // num_heads
    scale = hd ** -0.5

    q = _linear(x, p["q"]).reshape(b, n, num_heads, hd)

    if sr_ratio > 1:
        xs = x.reshape(b, h, w, c)
        xs = _conv(xs, p["sr"], stride=sr_ratio, padding="VALID")
        xs = xs.reshape(b, -1, c)
        xs = _layer_norm(xs, p["norm"], EPS_DEFAULT)
    else:
        xs = x
    kv = _linear(xs, p["kv"]).reshape(b, -1, 2, num_heads, hd)
    k, v = kv[:, :, 0], kv[:, :, 1]  # (B, M, heads, hd)
    m = k.shape[1]

    if flash_ok(n, m, x.dtype):
        qg = q.transpose(0, 2, 1, 3).reshape(b * num_heads, n, hd)
        kg = k.transpose(0, 2, 1, 3).reshape(b * num_heads, m, hd)
        vg = v.transpose(0, 2, 1, 3).reshape(b * num_heads, m, hd)
        og = sr_attention_flash(qg, kg, vg, float(scale))
        out = og.reshape(b, num_heads, n, hd).transpose(0, 2, 1, 3)
    else:
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                          preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
    return _linear(out.reshape(b, n, c), p["proj"])


def _mlp(x, p, h, w):
    """Mix-FFN: fc1 -> 3x3 depthwise conv -> GELU -> fc2 (segment.py:26-41).

    bf16 routes the fused dwconv+bias+GELU Pallas kernel (ops/dwconv.py):
    the depthwise conv never touches the MXU — it is 9 shifted
    multiply-adds — and fusing the GELU removes an HBM round trip over
    the widest activation in the network. The f32 path keeps the XLA ops
    (strict parity gates)."""
    b, n, _ = x.shape
    x = _linear(x, p["fc1"])
    c = x.shape[-1]
    xs = x.reshape(b, h, w, c)
    if x.dtype == jnp.bfloat16 and c % 128 == 0 and _DW_FUSE:
        from vstnet_tpu.ops.dwconv import dwconv3x3_bias_gelu

        xs = dwconv3x3_bias_gelu(xs, p["dw"]["w"], p["dw"]["b"])
        return _linear(xs.reshape(b, n, c), p["fc2"])
    xs = _conv(xs, p["dw"], padding="SAME", groups=c)
    x = xs.reshape(b, n, c)
    x = jax.nn.gelu(x, approximate=False)
    return _linear(x, p["fc2"])


def _block(x, p, h, w, num_heads, sr_ratio):
    x = x + _attention(_layer_norm(x, p["norm1"], EPS_BLOCK), p["attn"],
                       h, w, num_heads, sr_ratio)
    x = x + _mlp(_layer_norm(x, p["norm2"], EPS_BLOCK), p["mlp"], h, w)
    return x


def _stage(x, stage_params, h, w, num_heads, sr_ratio):
    """Run all blocks of one stage with lax.scan over stacked params."""
    def body(carry, bp):
        return _block(carry, bp, h, w, num_heads, sr_ratio), None

    x, _ = lax.scan(body, x, stage_params["blocks"])
    return _layer_norm(x, stage_params["norm"], EPS_BLOCK)


def _patch_embed(x, p, stride):
    """Overlapping patch embed: strided conv + LN (segment.py:111-134).
    x NHWC image/featuremap -> tokens (B, N, C), (h, w).

    Padding must be the torch-explicit k//2 on BOTH sides (k=7 -> (3,3));
    XLA "SAME" would split the 3-pixel total as (1,2) for stride 4 and
    shift every window.
    """
    k = p["proj"]["w"].shape[0]
    pad = k // 2
    x = _conv(x, p["proj"], stride=stride, padding=[(pad, pad), (pad, pad)])
    b, h, w, c = x.shape
    x = x.reshape(b, h * w, c)
    return _layer_norm(x, p["norm"], EPS_DEFAULT), h, w


# ---------------------------------------------------------------------------
# Backbone + head
# ---------------------------------------------------------------------------

def backbone_features(params, x):
    """MiT-B4 backbone -> 4 NHWC feature maps at 1/4, 1/8, 1/16, 1/32."""
    feats = []
    for s in range(4):
        stride = 4 if s == 0 else 2
        tokens, h, w = _patch_embed(x, params["patch_embed"][s], stride)
        tokens = _stage(tokens, params["stages"][s], h, w,
                        NUM_HEADS[s], SR_RATIOS[s])
        x = tokens.reshape(tokens.shape[0], h, w, -1)
        feats.append(x)
    return feats


def decode_head(params, feats):
    """All-MLP head (segment.py:391-468): per-level linear to 768, upsample
    to 1/4 grid, concat [c4,c3,c2,c1], 1x1 conv + BN + ReLU, 1x1 pred."""
    hp = params["head"]
    b, h1, w1, _ = feats[0].shape

    ups = []
    for lvl in (3, 2, 1, 0):  # c4, c3, c2, c1 order (segment.py:463)
        c = _linear(feats[lvl], hp["linear_c"][lvl])
        if lvl != 0:
            c = resize_bilinear(c, h1, w1)
        ups.append(c)
    x = jnp.concatenate(ups, axis=-1)

    x = _conv(x, {"w": hp["fuse"]["w"]}, padding="VALID")
    # BN folded to per-channel scale/shift in f32, applied in x's dtype
    bn = hp["fuse"]["bn"]
    scale = (bn["g"].astype(jnp.float32)
             * lax.rsqrt(bn["var"].astype(jnp.float32) + 1e-5))
    shift = bn["b"].astype(jnp.float32) - bn["mean"].astype(jnp.float32) * scale
    x = x * scale.astype(x.dtype) + shift.astype(x.dtype)
    x = jax.nn.relu(x)
    return _conv(x, hp["pred"], padding="VALID")  # (B, h1, w1, 150)


@partial(jax.jit, static_argnames=("half",))
def segment_logits(params, image, half: bool = False):
    """image: NHWC float [0,1], H/W multiples of 4 -> (B, H, W, 150) f32.

    half=True runs the backbone/head in bfloat16 (the reference deploys
    the segmenter in half precision, segment.py:479); layernorm internals
    and the final logits stay f32."""
    x = (image.astype(jnp.float32) - IMAGENET_MEAN) / IMAGENET_STD
    if half:
        x = x.astype(jnp.bfloat16)
    feats = backbone_features(params, x)
    logits = decode_head(params, feats).astype(jnp.float32)
    return resize_bilinear(logits, image.shape[1], image.shape[2])


@partial(jax.jit, static_argnames=("half",))
def segment_mask(params, image, half: bool = False):
    """argmax class mask (B, H, W) int32 (softmax elided — same argmax)."""
    return jnp.argmax(
        segment_logits(params, image, half=half), axis=-1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Segmenter-resolution quality gate. Running the segmenter on a downscale
# is the reference's own capacity strategy (segment.py:477-479) and the
# masked fast path's biggest lever (PERF.md: 43 -> 70 fps/chip at
# --seg_size 256); this makes the choice principled instead of a blind
# flag: measure how well downscaled masks agree with native-resolution
# masks on sample frames and take the largest downscale that passes.
# ---------------------------------------------------------------------------

def seg_hw_for(h: int, w: int, seg_size: int):
    """(h, w) capped so max side == seg_size, floored to /4 (the CLI's
    downscale rule). None if seg_size doesn't shrink the frame."""
    if seg_size <= 0 or max(h, w) <= seg_size:
        return None
    ss = seg_size / max(h, w)
    return (max(int(h * ss) // 4 * 4, 4), max(int(w * ss) // 4 * 4, 4))


def mask_quality(masks_ref, masks_test) -> dict:
    """Agreement metrics between two (B, H, W) int mask stacks:
    pixel_acc (fraction of equal pixels) and mean_iou (mean IoU over
    labels present in either stack)."""
    import numpy as np

    a = np.asarray(masks_ref)
    b = np.asarray(masks_test)
    assert a.shape == b.shape, (a.shape, b.shape)
    pixel_acc = float((a == b).mean())
    ious = []
    for lbl in np.union1d(np.unique(a), np.unique(b)):
        inter = np.logical_and(a == lbl, b == lbl).sum()
        union = np.logical_or(a == lbl, b == lbl).sum()
        if union > 0:
            ious.append(inter / union)
    return {"pixel_acc": pixel_acc,
            "mean_iou": float(np.mean(ious)) if ious else 1.0}


def pick_seg_size(params, frames, candidates=(256, 384, 512),
                  min_pixel_acc: float = 0.95, min_iou: float = 0.80,
                  half: bool = True, segment_fn=None) -> int:
    """Smallest candidate seg_size (largest downscale -> fastest masked
    program) whose nearest-upsampled masks still agree with the
    native-resolution masks on `frames` ((B,H,W,3) float [0,1] sample
    frames, e.g. the first video batch). Returns 0 (= native) when no
    candidate passes — quality degrades gracefully to the exact mode.

    Region statistics are insensitive to boundary-pixel precision
    (PERF.md masked section), so the gate measures label AGREEMENT, not
    boundary sharpness."""
    import numpy as np

    fn = segment_fn or (lambda x, hw: segment_mask(
        params, jax.image.resize(x, (x.shape[0], *hw, 3), "bilinear")
        if hw else x, half=half))
    h, w = frames.shape[1], frames.shape[2]
    native = np.asarray(fn(frames, None))
    for cand in sorted(candidates):
        hw = seg_hw_for(h, w, cand)
        if hw is None:
            continue  # candidate doesn't shrink the frame
        small = fn(frames, hw)
        up = np.asarray(jax.image.resize(
            jnp.asarray(small), native.shape, "nearest"))
        q = mask_quality(native, up)
        if q["pixel_acc"] >= min_pixel_acc and q["mean_iou"] >= min_iou:
            return cand
    return 0


# ---------------------------------------------------------------------------
# Init (random; pretrained weights come from the torch checkpoint)
# ---------------------------------------------------------------------------

def _init_linear(key, cin, cout):
    k1, _ = jax.random.split(key)
    bound = (1.0 / cin) ** 0.5
    return {
        "w": jax.random.uniform(k1, (cin, cout), jnp.float32, -bound, bound),
        "b": jnp.zeros((cout,)),
    }


def _init_conv_p(key, kh, kw, cin, cout, groups=1, bias=True):
    k1, _ = jax.random.split(key)
    fan_in = kh * kw * (cin // groups)
    bound = (1.0 / fan_in) ** 0.5
    p = {"w": jax.random.uniform(
        k1, (kh, kw, cin // groups, cout), jnp.float32, -bound, bound)}
    if bias:
        p["b"] = jnp.zeros((cout,))
    return p


def _init_ln(c):
    return {"g": jnp.ones((c,)), "b": jnp.zeros((c,))}


def _init_block(key, dim, num_heads, sr_ratio):
    ks = jax.random.split(key, 8)
    attn = {
        "q": _init_linear(ks[0], dim, dim),
        "kv": _init_linear(ks[1], dim, dim * 2),
        "proj": _init_linear(ks[2], dim, dim),
    }
    if sr_ratio > 1:
        attn["sr"] = _init_conv_p(ks[3], sr_ratio, sr_ratio, dim, dim)
        attn["norm"] = _init_ln(dim)
    hidden = dim * MLP_RATIO
    mlp = {
        "fc1": _init_linear(ks[4], dim, hidden),
        "dw": _init_conv_p(ks[5], 3, 3, hidden, hidden, groups=hidden),
        "fc2": _init_linear(ks[6], hidden, dim),
    }
    return {"norm1": _init_ln(dim), "attn": attn, "norm2": _init_ln(dim),
            "mlp": mlp}


def init_segformer(key, depths=DEPTHS) -> Dict:
    keys = jax.random.split(key, 16)
    patch_embed = []
    stages = []
    for s in range(4):
        cin = 3 if s == 0 else EMBED_DIMS[s - 1]
        ksz = 7 if s == 0 else 3
        patch_embed.append({
            "proj": _init_conv_p(keys[s], ksz, ksz, cin, EMBED_DIMS[s]),
            "norm": _init_ln(EMBED_DIMS[s]),
        })
        bkeys = jax.random.split(keys[4 + s], depths[s])
        blocks = [
            _init_block(bk, EMBED_DIMS[s], NUM_HEADS[s], SR_RATIOS[s])
            for bk in bkeys
        ]
        stages.append({
            "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
            "norm": _init_ln(EMBED_DIMS[s]),
        })

    head = {
        "linear_c": [
            _init_linear(k, d, EMBEDDING_DIM)
            for k, d in zip(jax.random.split(keys[8], 4), EMBED_DIMS)
        ],
        "fuse": {
            "w": _init_conv_p(keys[9], 1, 1, EMBEDDING_DIM * 4,
                              EMBEDDING_DIM, bias=False)["w"],
            "bn": {"g": jnp.ones((EMBEDDING_DIM,)),
                   "b": jnp.zeros((EMBEDDING_DIM,)),
                   "mean": jnp.zeros((EMBEDDING_DIM,)),
                   "var": jnp.ones((EMBEDDING_DIM,))},
        },
        "pred": _init_conv_p(keys[10], 1, 1, EMBEDDING_DIM, NUM_CLASSES),
    }
    return {"patch_embed": patch_embed, "stages": stages, "head": head}


# ---------------------------------------------------------------------------
# Torch checkpoint conversion
# ---------------------------------------------------------------------------

def _t_lin(sd, prefix):
    return {"w": jnp.asarray(np.asarray(sd[f"{prefix}.weight"]).T),
            "b": jnp.asarray(sd[f"{prefix}.bias"])}


def _t_conv(sd, prefix, bias=True):
    w = np.asarray(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)
    p = {"w": jnp.asarray(w)}
    if bias:
        p["b"] = jnp.asarray(sd[f"{prefix}.bias"])
    return p


def _t_ln(sd, prefix):
    return {"g": jnp.asarray(sd[f"{prefix}.weight"]),
            "b": jnp.asarray(sd[f"{prefix}.bias"])}


def _inv_lin(out, p, prefix):
    out[f"{prefix}.weight"] = np.asarray(p["w"]).T
    out[f"{prefix}.bias"] = np.asarray(p["b"])


def _inv_conv(out, p, prefix):
    out[f"{prefix}.weight"] = np.asarray(p["w"]).transpose(3, 2, 0, 1)
    if "b" in p:
        out[f"{prefix}.bias"] = np.asarray(p["b"])


def _inv_ln(out, p, prefix):
    out[f"{prefix}.weight"] = np.asarray(p["g"])
    out[f"{prefix}.bias"] = np.asarray(p["b"])


def segformer_to_torch(params: Dict) -> Dict[str, np.ndarray]:
    """Inverse of segformer_from_torch: params pytree -> reference
    state_dict keys (backbone.*/decode_head.*, segment.py layout). Used
    for export and to size the expected tree for tolerant loading."""
    out: Dict[str, np.ndarray] = {}
    for s, pe in enumerate(params["patch_embed"]):
        _inv_conv(out, pe["proj"], f"backbone.patch_embed{s + 1}.proj")
        _inv_ln(out, pe["norm"], f"backbone.patch_embed{s + 1}.norm")
    for s, st in enumerate(params["stages"]):
        depth = int(st["blocks"]["norm1"]["g"].shape[0])
        for i in range(depth):
            blk = jax.tree.map(lambda x, i=i: x[i], st["blocks"])
            bp = f"backbone.block{s + 1}.{i}"
            _inv_ln(out, blk["norm1"], f"{bp}.norm1")
            _inv_lin(out, blk["attn"]["q"], f"{bp}.attn.q")
            _inv_lin(out, blk["attn"]["kv"], f"{bp}.attn.kv")
            _inv_lin(out, blk["attn"]["proj"], f"{bp}.attn.proj")
            if "sr" in blk["attn"]:
                _inv_conv(out, blk["attn"]["sr"], f"{bp}.attn.sr")
                _inv_ln(out, blk["attn"]["norm"], f"{bp}.attn.norm")
            _inv_ln(out, blk["norm2"], f"{bp}.norm2")
            _inv_lin(out, blk["mlp"]["fc1"], f"{bp}.mlp.fc1")
            _inv_conv(out, blk["mlp"]["dw"], f"{bp}.mlp.dwconv.dwconv")
            _inv_lin(out, blk["mlp"]["fc2"], f"{bp}.mlp.fc2")
        _inv_ln(out, st["norm"], f"backbone.norm{s + 1}")
    head = params["head"]
    for i, lc in enumerate(head["linear_c"]):
        _inv_lin(out, lc, f"decode_head.linear_c{i + 1}.proj")
    out["decode_head.linear_fuse.conv.weight"] = np.asarray(
        head["fuse"]["w"]).transpose(3, 2, 0, 1)
    bn = head["fuse"]["bn"]
    out["decode_head.linear_fuse.bn.weight"] = np.asarray(bn["g"])
    out["decode_head.linear_fuse.bn.bias"] = np.asarray(bn["b"])
    out["decode_head.linear_fuse.bn.running_mean"] = np.asarray(bn["mean"])
    out["decode_head.linear_fuse.bn.running_var"] = np.asarray(bn["var"])
    _inv_conv(out, head["pred"], "decode_head.linear_pred")
    return out


def infer_depths(sd) -> tuple:
    """Per-stage block counts from the checkpoint's backbone.blockS.i.*
    keys — distinguishes MiT-B4 (3,8,27,3) from B5 (3,6,40,3) without a
    flag, so both the package B4 and research-video B5 checkpoints load
    through the same converter."""
    depths = []
    for s in range(4):
        n = 0
        while f"backbone.block{s + 1}.{n}.norm1.weight" in sd:
            n += 1
        depths.append(n)
    return tuple(depths)


def segformer_from_torch(sd: Dict[str, np.ndarray],
                         depths=None) -> Dict:
    """Convert the reference SegmentModel state_dict (backbone.* /
    decode_head.*) to the vstnet_tpu pytree. Handles any MiT depth
    profile (B4/B5); depths are inferred from the keys when not given."""
    if depths is None:
        depths = infer_depths(sd)
        if not all(depths):
            raise ValueError(
                f"cannot infer MiT stage depths from checkpoint: {depths}")
    patch_embed = []
    stages = []
    for s in range(4):
        pe = f"backbone.patch_embed{s + 1}"
        patch_embed.append({
            "proj": _t_conv(sd, f"{pe}.proj"),
            "norm": _t_ln(sd, f"{pe}.norm"),
        })
        blocks = []
        for i in range(depths[s]):
            bp = f"backbone.block{s + 1}.{i}"
            attn = {
                "q": _t_lin(sd, f"{bp}.attn.q"),
                "kv": _t_lin(sd, f"{bp}.attn.kv"),
                "proj": _t_lin(sd, f"{bp}.attn.proj"),
            }
            if SR_RATIOS[s] > 1:
                attn["sr"] = _t_conv(sd, f"{bp}.attn.sr")
                attn["norm"] = _t_ln(sd, f"{bp}.attn.norm")
            blocks.append({
                "norm1": _t_ln(sd, f"{bp}.norm1"),
                "attn": attn,
                "norm2": _t_ln(sd, f"{bp}.norm2"),
                "mlp": {
                    "fc1": _t_lin(sd, f"{bp}.mlp.fc1"),
                    "dw": _t_conv(sd, f"{bp}.mlp.dwconv.dwconv"),
                    "fc2": _t_lin(sd, f"{bp}.mlp.fc2"),
                },
            })
        stages.append({
            "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
            "norm": _t_ln(sd, f"backbone.norm{s + 1}"),
        })

    head = {
        "linear_c": [
            _t_lin(sd, f"decode_head.linear_c{i + 1}.proj") for i in range(4)
        ],
        "fuse": {
            "w": jnp.asarray(
                np.asarray(sd["decode_head.linear_fuse.conv.weight"])
                .transpose(2, 3, 1, 0)),
            "bn": {
                "g": jnp.asarray(sd["decode_head.linear_fuse.bn.weight"]),
                "b": jnp.asarray(sd["decode_head.linear_fuse.bn.bias"]),
                "mean": jnp.asarray(
                    sd["decode_head.linear_fuse.bn.running_mean"]),
                "var": jnp.asarray(
                    sd["decode_head.linear_fuse.bn.running_var"]),
            },
        },
        "pred": _t_conv(sd, "decode_head.linear_pred"),
    }
    return {"patch_embed": patch_embed, "stages": stages, "head": head}


# ---------------------------------------------------------------------------
# High-level segmenter (pad, mask, hole removal, remapping)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class Segmenter:
    """SegmentModel-equivalent wrapper: pad -> mask -> hole removal, plus
    self/cross remapping for the CLI auto-seg flow."""

    params: Dict
    min_ratio: float = 0.01
    label_mapping: Optional[jnp.ndarray] = None
    half: bool = False
    MAX_TIMES = 4

    @classmethod
    def load(cls, checkpoint: Optional[str] = None, min_ratio: float = 0.01,
             label_mapping: Optional[str] = None, seed: int = 0,
             depths=DEPTHS, half: bool = False, strict: bool = True):
        """Checkpoint depths (B4 vs B5) are auto-detected; `depths` only
        sets the profile of a random-init (no-checkpoint) segmenter.
        half=True runs inference in bfloat16 (reference deploys in half,
        segment.py:479). strict=False loads foreign checkpoints with
        skip-with-warning on missing/mismatched tensors (the reference
        GGUF loader's behavior, ggml_engine.h:400-423)."""
        from vstnet_tpu.models.remapping import load_label_mapping

        if checkpoint:
            from vstnet_tpu.io.checkpoint import load_torch_state_dict

            sd = load_torch_state_dict(checkpoint)
            if not strict:
                from vstnet_tpu.io.checkpoint import tolerant_state_dict

                got = infer_depths(sd)
                expected = segformer_to_torch(init_segformer(
                    jax.random.PRNGKey(seed),
                    depths=got if all(got) else depths))
                sd = tolerant_state_dict(sd, expected, label=checkpoint)
            params = segformer_from_torch(sd)
        else:
            params = init_segformer(jax.random.PRNGKey(seed), depths=depths)
        return cls(params=params, min_ratio=min_ratio,
                   label_mapping=load_label_mapping(label_mapping),
                   half=half)

    def segment(self, image, remove_holes: bool = True):
        """image NHWC float [0,1] -> (B, H, W) int32 mask."""
        h, w = image.shape[1], image.shape[2]
        x = pad_to_multiple(image, self.MAX_TIMES)
        mask = segment_mask(self.params, x, half=self.half)[:, :h, :w]
        if remove_holes and self.label_mapping is not None:
            from vstnet_tpu.models.remapping import remove_small_holes

            mask = remove_small_holes(mask, self.label_mapping,
                                      min_ratio=self.min_ratio)
        return mask

    def remap(self, cmask, smask, min_ratio: Optional[float] = None):
        """CLI auto-seg post-processing (image_transfer.py:107-125):
        self-remap both masks, then cross-remap content onto style."""
        from vstnet_tpu.models.remapping import cross_remapping, self_remapping

        r = self.min_ratio if min_ratio is None else min_ratio
        cm = self_remapping(jnp.asarray(cmask), self.label_mapping, r)
        sm = self_remapping(jnp.asarray(smask), self.label_mapping, r)
        cm = cross_remapping(cm, sm, self.label_mapping)
        return np.asarray(cm), np.asarray(sm)
