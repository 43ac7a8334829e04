"""SegFormer-B4 parity vs the reference torch implementation, and
vectorized remapping parity vs SegReMapping."""

import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vstnet_tpu.models.remapping import (
    cross_remapping,
    load_label_mapping,
    self_remapping,
)
from vstnet_tpu.models.segformer import (
    Segmenter,
    backbone_features,
    decode_head,
    init_segformer,
    segment_logits,
    segment_mask,
    segformer_from_torch,
)


def _load_ref_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_segment():
    # torchvision isn't in this image; the reference only uses its
    # `normalize` inside SegmentModel.forward, which these tests don't call.
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tf = types.ModuleType("torchvision.transforms")
        tff = types.ModuleType("torchvision.transforms.functional")
        tff.normalize = lambda x, mean, std: x
        tf.functional = tff
        tv.transforms = tf
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tf
        sys.modules["torchvision.transforms.functional"] = tff
    return _load_ref_module(
        "ref_segment", "/root/reference/project/image_style/segment.py"
    )


@pytest.fixture(scope="module")
def torch_pair(ref_segment):
    """Random-weight reference backbone+head and the converted JAX params."""
    torch.manual_seed(0)
    backbone = ref_segment.mit_b4()
    head = ref_segment.SegFormerHead(backbone.embedding_dim)
    backbone.eval()
    head.eval()
    sd = {f"backbone.{k}": v.detach().numpy() for k, v in backbone.state_dict().items()}
    sd.update(
        {f"decode_head.{k}": v.detach().numpy() for k, v in head.state_dict().items()}
    )
    params = segformer_from_torch(sd)
    return backbone, head, params


def test_backbone_parity(torch_pair, rng):
    backbone, _, params = torch_pair
    x = rng.uniform(size=(1, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        ref_feats = backbone(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    feats = backbone_features(params, jnp.asarray(x))
    assert len(feats) == 4
    for i, (ours, theirs) in enumerate(zip(feats, ref_feats)):
        t = theirs.numpy().transpose(0, 2, 3, 1)
        assert ours.shape == t.shape, f"stage {i}: {ours.shape} vs {t.shape}"
        np.testing.assert_allclose(
            np.asarray(ours), t, rtol=1e-3, atol=1e-4,
            err_msg=f"stage {i} mismatch",
        )


def test_head_parity(torch_pair, rng):
    backbone, head, params = torch_pair
    x = rng.uniform(size=(1, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        ref_feats = backbone(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        ref_logits = head(ref_feats).numpy().transpose(0, 2, 3, 1)

    feats = backbone_features(params, jnp.asarray(x))
    logits = np.asarray(decode_head(params, feats))
    assert logits.shape == ref_logits.shape
    np.testing.assert_allclose(logits, ref_logits, rtol=1e-3, atol=1e-3)


def test_segment_mask_shapes():
    params = init_segformer(jax.random.PRNGKey(0))
    seg = Segmenter(params=params, label_mapping=load_label_mapping())
    img = jnp.zeros((1, 50, 62, 3))  # not /4 — pad + crop path
    mask = seg.segment(img)
    assert mask.shape == (1, 50, 62)
    m = np.asarray(mask)
    assert m.min() >= 0 and m.max() < 150


def test_b5_profile_and_depth_inference():
    """MiT-B5 (video research segmenter, video_transfer.py:119-127): the
    deeper profile runs through the same scanned stages, and converter
    depth inference distinguishes B4/B5 checkpoints from their keys."""
    from vstnet_tpu.models.segformer import DEPTHS_B5, infer_depths

    params = init_segformer(jax.random.PRNGKey(0), depths=DEPTHS_B5)
    for s, d in enumerate(DEPTHS_B5):
        assert params["stages"][s]["blocks"]["norm1"]["g"].shape[0] == d
    mask = segment_mask(params, jnp.zeros((1, 32, 32, 3)))
    assert mask.shape == (1, 32, 32)

    def fake_sd(depths):
        return {
            f"backbone.block{s + 1}.{i}.norm1.weight": None
            for s in range(4) for i in range(depths[s])
        }

    assert infer_depths(fake_sd((3, 8, 27, 3))) == (3, 8, 27, 3)
    assert infer_depths(fake_sd(DEPTHS_B5)) == DEPTHS_B5


# ---------------------------------------------------------------------------
# Remapping parity
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_remap():
    sys.modules.setdefault(
        "todos",
        types.SimpleNamespace(debug=types.SimpleNamespace(output_var=lambda *a, **k: None)),
    )
    return _load_ref_module(
        "ref_remap",
        "/root/reference/models/segmentation/SegReMapping.py",
    )


def _random_seg(rng, labels, shape, probs=None):
    return rng.choice(labels, size=shape, p=probs).astype(np.int64)


def test_self_remapping_parity(ref_remap, rng):
    ref = ref_remap.SegReMapping(
        "/root/reference/models/segmentation/ade20k_semantic_rel.npy",
        min_ratio=0.02,
    )
    mapping = load_label_mapping()
    # seg with one dominant label, a medium one, and a tiny one
    seg = np.zeros((64, 64), np.int64)
    seg[40:, :] = 21
    seg[:2, :3] = 93  # 6 px -> tiny
    ref_out = ref.self_remapping(seg)
    ours = np.asarray(self_remapping(jnp.asarray(seg, jnp.int32), mapping, 0.02))
    np.testing.assert_array_equal(ours, ref_out)


def test_self_remapping_random_parity(ref_remap, rng):
    ref = ref_remap.SegReMapping(
        "/root/reference/models/segmentation/ade20k_semantic_rel.npy",
        min_ratio=0.05,
    )
    mapping = load_label_mapping()
    for seed in range(3):
        r = np.random.default_rng(seed)
        seg = _random_seg(
            r, np.array([3, 17, 52, 93, 121]), (48, 48),
            probs=[0.5, 0.3, 0.17, 0.02, 0.01],
        )
        ref_out = ref.self_remapping(seg)
        ours = np.asarray(
            self_remapping(jnp.asarray(seg, jnp.int32), mapping, 0.05)
        )
        np.testing.assert_array_equal(ours, ref_out)


def test_cross_remapping_parity(ref_remap, rng):
    ref = ref_remap.SegReMapping(
        "/root/reference/models/segmentation/ade20k_semantic_rel.npy"
    )
    mapping = load_label_mapping()
    r = np.random.default_rng(7)
    cseg = _random_seg(r, np.array([2, 4, 9, 16, 21]), (40, 40))
    sseg = _random_seg(r, np.array([2, 9, 21, 76]), (40, 40))
    ref_out = ref.cross_remapping(cseg, sseg)
    ours = np.asarray(
        cross_remapping(
            jnp.asarray(cseg, jnp.int32), jnp.asarray(sseg, jnp.int32), mapping
        )
    )
    np.testing.assert_array_equal(ours, ref_out)


def test_video_remap_composed_equals_sequential():
    """The masked-video fast path composes self+cross remapping into one
    150-entry table + one gather (video_remap). Must be bit-equal to the
    sequential self_remapping -> cross_remapping the f32 path runs."""
    from vstnet_tpu.models.remapping import video_remap, video_remap_plan

    mapping = load_label_mapping()
    r = np.random.default_rng(11)
    b, h, w = 3, 48, 48
    cm = jnp.asarray(
        _random_seg(r, np.array([3, 17, 52, 93, 121, 140]), (b, h, w),
                    probs=[0.4, 0.3, 0.2, 0.06, 0.03, 0.01]), jnp.int32)
    sm = jnp.asarray(
        _random_seg(r, np.array([3, 52, 76]), (1, h, w)), jnp.int32)

    for min_ratio in (0.02, 0.05):
        seq = cross_remapping(
            self_remapping(cm, mapping, min_ratio),
            jnp.broadcast_to(sm, (b, h, w)), mapping)
        in_style, cross_tab = video_remap_plan(sm, mapping)
        fused = video_remap(cm, in_style, cross_tab, mapping, min_ratio)
        np.testing.assert_array_equal(np.asarray(fused), np.asarray(seq))


def test_half_precision_logits_agree():
    """bf16 segmenter (reference deploys in half, segment.py:479): logits
    stay highly correlated with the f32 pass; shapes/dtypes intact."""
    params = init_segformer(jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(0).uniform(size=(1, 64, 64, 3)), jnp.float32)
    lo32 = np.asarray(segment_logits(params, x)).ravel()
    lo16 = np.asarray(segment_logits(params, x, half=True)).ravel()
    assert lo16.dtype == np.float32
    cos = float(np.dot(lo16, lo32)
                / (np.linalg.norm(lo16) * np.linalg.norm(lo32) + 1e-12))
    assert cos > 0.99, f"bf16/f32 logit cosine {cos:.4f}"
    m = segment_mask(params, x, half=True)
    assert m.shape == (1, 64, 64) and m.dtype == jnp.int32


@pytest.mark.parametrize("g,n,m,d", [
    (1, 64, 16, 64),    # stage-1 family: 1 head, M = N/4 here
    (2, 48, 48, 64),    # sr_ratio 1 (M = N), N not a tile multiple (pad)
    (5, 128, 32, 64),   # stage-3 family: 5 heads
])
def test_flash_attention_matches_einsum(rng, g, n, m, d):
    """ops/attention.py single-pass flash kernel == the XLA einsum →
    f32 softmax → einsum reference, including the bf16 probs cast and
    the padded-N row slicing."""
    from vstnet_tpu.ops.attention import sr_attention_flash

    q = jnp.asarray(rng.standard_normal((g, n, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((g, m, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((g, m, d)), jnp.bfloat16)
    scale = d ** -0.5

    s = jnp.einsum("gnd,gmd->gnm", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
    ref = jnp.einsum("gnm,gmd->gnd", p, v,
                     preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    got = sr_attention_flash(q, k, v, float(scale), interpret=True)
    assert got.shape == (g, n, d) and got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2)


def test_attention_block_flash_vs_f32(rng):
    """The bf16 segmenter block (which routes the flash kernel) tracks
    the f32 einsum block through _attention — end-to-end dispatch check
    at an sr_ratio>1 shape above the MIN_Q routing threshold."""
    from vstnet_tpu.models.segformer import _attention, _init_block
    from vstnet_tpu.ops.attention import flash_ok

    hw = 96  # 9216 tokens >= MIN_Q: the kernel actually routes
    assert flash_ok(hw * hw, (hw // 4) ** 2, jnp.bfloat16)
    p = _init_block(jax.random.PRNGKey(3), 64, num_heads=1, sr_ratio=4)
    x = jnp.asarray(rng.standard_normal((1, hw * hw, 64)) * 0.1,
                    jnp.float32)
    ref = np.asarray(_attention(x, p["attn"], hw, hw, 1, 4))
    got = np.asarray(
        _attention(x.astype(jnp.bfloat16), p["attn"], hw, hw, 1, 4),
        dtype=np.float32)
    cos = float((ref.ravel() @ got.ravel())
                / (np.linalg.norm(ref) * np.linalg.norm(got) + 1e-12))
    assert cos > 0.99, f"flash-bf16 vs f32 attention cosine {cos:.4f}"


def test_remap_video_batch_vs_single_style():
    """The video auto-seg case: a batch of frame masks remapped against
    ONE style mask (broadcast to the batch — the shapes the video CLI
    feeds seg.remap). Regression for the b8-content/b1-style crash."""
    from vstnet_tpu.models.segformer import Segmenter

    rng_l = np.random.default_rng(3)
    seg = Segmenter(params={}, label_mapping=load_label_mapping())
    cm = rng_l.integers(0, 150, size=(4, 16, 16)).astype(np.int32)
    sm = rng_l.integers(0, 150, size=(1, 16, 16)).astype(np.int32)
    sm_b = np.broadcast_to(sm, (4, 16, 16))
    out_cm, out_sm = seg.remap(cm, sm_b)
    assert out_cm.shape == (4, 16, 16)
    # every remapped content label must exist in the style mask
    for i in range(4):
        assert set(np.unique(out_cm[i])) <= set(np.unique(out_sm[i]))


# ---------------------------------------------------------------------------
# Segmenter-resolution quality gate (pick_seg_size)
# ---------------------------------------------------------------------------

def test_mask_quality_metrics():
    from vstnet_tpu.models.segformer import mask_quality

    a = np.zeros((1, 8, 8), np.int32)
    a[:, :, 4:] = 1
    q = mask_quality(a, a)
    assert q["pixel_acc"] == 1.0 and q["mean_iou"] == 1.0

    b = a.copy()
    b[:, 0, :] = 2  # 8 of 64 pixels flip to a new label
    q = mask_quality(a, b)
    assert q["pixel_acc"] == pytest.approx(56 / 64)
    # label 0: inter 28 / union 32; label 1: 28/32; label 2: 0/8
    assert q["mean_iou"] == pytest.approx((28 / 32 + 28 / 32 + 0) / 3)


def test_seg_hw_for_rule():
    from vstnet_tpu.models.segformer import seg_hw_for

    assert seg_hw_for(512, 512, 256) == (256, 256)
    assert seg_hw_for(512, 256, 256) == (256, 128)
    assert seg_hw_for(200, 100, 256) is None   # no shrink
    assert seg_hw_for(512, 512, 0) is None     # native requested
    h, w = seg_hw_for(500, 300, 256)
    assert h % 4 == 0 and w % 4 == 0


def test_pick_seg_size_scale_invariant_masks(rng):
    """A segmenter whose masks are resolution-independent (coarse blocky
    labels) must gate to the SMALLEST candidate (largest downscale)."""
    from vstnet_tpu.models.segformer import pick_seg_size

    frames = jnp.asarray(rng.uniform(size=(2, 512, 512, 3)), jnp.float32)

    def coarse_fn(x, hw):
        h = x.shape[1] if hw is None else hw[0]
        w = x.shape[2] if hw is None else hw[1]
        yy = np.add.outer(np.arange(h) * 2 // h, np.arange(w) * 2 // w)
        return jnp.asarray(np.broadcast_to(yy[None], (x.shape[0], h, w)),
                           jnp.int32)

    got = pick_seg_size(None, frames, candidates=(256, 384),
                        segment_fn=coarse_fn)
    assert got == 256


def test_pick_seg_size_falls_back_to_native(rng):
    """A segmenter whose downscaled masks disagree with native ones must
    return 0 (exact mode) — never a silently-wrong downscale."""
    from vstnet_tpu.models.segformer import pick_seg_size

    frames = jnp.asarray(rng.uniform(size=(1, 512, 512, 3)), jnp.float32)
    rng2 = np.random.default_rng(3)

    def noisy_fn(x, hw):
        h = x.shape[1] if hw is None else hw[0]
        w = x.shape[2] if hw is None else hw[1]
        return jnp.asarray(
            rng2.integers(0, 150, size=(x.shape[0], h, w)), jnp.int32)

    got = pick_seg_size(None, frames, candidates=(256,),
                        segment_fn=noisy_fn)
    assert got == 0


# ---------------------------------------------------------------------------
# Fused MixFFN dwconv+bias+GELU kernel (ops/dwconv.py)
# ---------------------------------------------------------------------------

def test_erf_approx_accuracy():
    from vstnet_tpu.ops.dwconv import _erf_f32

    import scipy.special as sp

    x = jnp.asarray(np.linspace(-5, 5, 4001), jnp.float32)
    got = np.asarray(_erf_f32(x))
    ref = sp.erf(np.linspace(-5, 5, 4001))
    assert np.max(np.abs(got - ref)) < 2e-6


@pytest.mark.parametrize("b,h,w,c", [
    (2, 16, 16, 128),   # single-tile route
    (1, 32, 8, 256),    # multi-tile (budget forced below)
])
def test_dwconv_gelu_kernel_parity(rng, b, h, w, c):
    """Fused kernel == XLA depthwise SAME conv + bias + exact GELU (torch
    zero-pad semantics), f32, top/interior/bottom tiles."""
    import vstnet_tpu.ops.dwconv as dw

    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((3, 3, 1, c)) * 0.3, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)

    ref = jax.lax.conv_general_dilated(
        x, wgt, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST) + bias
    ref = jax.nn.gelu(ref, approximate=False)

    got = dw.dwconv3x3_bias_gelu(x, wgt, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-6)


def test_dwconv_gelu_multitile_matches_single(rng, monkeypatch):
    """Shrink the VMEM budget so the kernel tiles rows (clip + shift +
    zero-halo masking paths) and compare against the single-tile result."""
    import vstnet_tpu.ops.dwconv as dw

    x = jnp.asarray(rng.standard_normal((1, 32, 8, 128)), jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((3, 3, 1, 128)) * 0.3,
                      jnp.float32)
    bias = jnp.asarray(rng.standard_normal((128,)) * 0.1, jnp.float32)
    whole = np.asarray(dw.dwconv3x3_bias_gelu(x, wgt, bias,
                                              interpret=True))
    monkeypatch.setattr(dw, "VMEM_BUDGET", 8 * 128 * 2 * 3 * 8)  # 8 rows
    # the budget is read at trace time — drop the cached executable
    dw.dwconv3x3_bias_gelu.clear_cache()
    try:
        tiled = np.asarray(dw.dwconv3x3_bias_gelu(x, wgt, bias,
                                                  interpret=True))
    finally:
        dw.dwconv3x3_bias_gelu.clear_cache()
    np.testing.assert_array_equal(tiled, whole)


def test_mlp_bf16_routes_fused_kernel(rng, monkeypatch):
    """The bf16 MixFFN must call the fused kernel (and match the XLA ops
    at bf16 tolerance)."""
    from vstnet_tpu.models import segformer as sf
    from vstnet_tpu.ops import dwconv as dw

    calls = []
    orig = dw.dwconv3x3_bias_gelu

    def spy(x, w, b, interpret=False):
        calls.append(x.shape)
        return orig(x, w, b, interpret=True)

    monkeypatch.setattr(dw, "dwconv3x3_bias_gelu", spy)

    c = 128
    p = {"fc1": {"w": jnp.asarray(rng.standard_normal((32, c)) * 0.1,
                                  jnp.float32),
                 "b": jnp.zeros((c,), jnp.float32)},
         "dw": {"w": jnp.asarray(rng.standard_normal((3, 3, 1, c)) * 0.3,
                                 jnp.float32),
                "b": jnp.zeros((c,), jnp.float32)},
         "fc2": {"w": jnp.asarray(rng.standard_normal((c, 32)) * 0.1,
                                  jnp.float32),
                 "b": jnp.zeros((32,), jnp.float32)}}
    x32 = jnp.asarray(rng.standard_normal((1, 64, 32)), jnp.float32)

    ref = np.asarray(sf._mlp(x32, p, 8, 8))            # f32: XLA ops
    assert not calls
    p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)
    got = np.asarray(sf._mlp(x32.astype(jnp.bfloat16), p16, 8, 8)
                     ).astype(np.float32)
    assert calls and calls[0] == (1, 8, 8, c)
    cos = float((ref.ravel() @ got.ravel())
                / (np.linalg.norm(ref) * np.linalg.norm(got) + 1e-9))
    assert cos > 0.99
