"""End-to-end stylization pipelines.

Two API tiers, mirroring the reference's two layers:

  * research tier (image_transfer.py semantics): encode -> cWCT (global /
    masked / interpolated) -> decode, raw output (clamped at save time) —
    /root/reference/image_transfer.py:171-206.
  * package tier (VSTNetModel.forward semantics): pad -> encode both ->
    auto-segment -> masked cWCT -> decode -> bilinear resize back -> Lab
    luminance blend (content L + stylized ab) —
    /root/reference/project/image_style/vstnet.py:189-220.

Everything here is jit-compiled once per input bucket shape; the CLI layer
pads inputs to /4 (and optionally to shape buckets) before calling in.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from vstnet_tpu.config import ARTISTIC_CONFIG, PHOTO_CONFIG, RevResNetConfig
from vstnet_tpu.models import cwct
from vstnet_tpu.models.revresnet import decode, encode, init_revresnet
from vstnet_tpu.ops.color import lab2rgb, rgb2lab
from vstnet_tpu.ops.resize import pad_to_multiple, resize_bilinear


# ---------------------------------------------------------------------------
# Research tier: pure stylize functions (jittable)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg",))
def stylize(params, content, style, cfg: RevResNetConfig):
    """Global stylization: decode(cWCT(encode(c), encode(s)))."""
    z_c = encode(params, content, cfg)
    z_s = encode(params, style, cfg)
    z_cs = cwct.transfer(z_c, z_s)
    return decode(params, z_cs, cfg)


@partial(jax.jit, static_argnames=("cfg", "max_labels"))
def stylize_masked(
    params, content, style, cmask, smask, cfg: RevResNetConfig,
    max_labels: int = 32,
):
    """Regional stylization with semantic masks at latent resolution.

    Masks are (B, H, W) integer labels at *image* resolution; they are
    nearest-resampled to the latent grid (the reference indexes latents with
    image-resolution masks because the photo latent is full-res; the
    artistic latent is half-res, where the reference's research path relies
    on caller-side resizing — here it is handled uniformly).
    """
    z_c = encode(params, content, cfg)
    z_s = encode(params, style, cfg)
    cm = _mask_to_latent(cmask, z_c.shape)
    sm = _mask_to_latent(smask, z_s.shape)
    z_cs = cwct.transfer_masked(z_c, z_s, cm, sm, max_labels=max_labels)
    return decode(params, z_cs, cfg)


@partial(jax.jit, static_argnames=("cfg",))
def stylize_interp(params, content, styles, alpha_s, cfg: RevResNetConfig,
                   alpha_c=0.0):
    """Multi-style interpolation (+ alpha_c content blend).

    styles: (S, B, H, W, 3) stacked style images (same shape).
    alpha_c is a TRACED scalar — an interpolation sweep (the reference's
    teaser, README.md:108-120) reuses one compiled program for every
    alpha instead of recompiling per value.
    """
    z_c = encode(params, content, cfg)
    z_styles = jax.vmap(lambda s: encode(params, s, cfg))(styles)
    z_cs = cwct.interpolation(z_c, z_styles, alpha_s, alpha_c=alpha_c)
    return decode(params, z_cs, cfg)


@partial(jax.jit, static_argnames=("cfg",))
def stylize_interp_fast(fast_params, content, style, cfg: RevResNetConfig,
                        alpha_c):
    """Single-style interpolation (content blend by a TRACED alpha_c) on
    the fused bf16 packed-latent path — cWCT.interpolation semantics
    (models/cWCT.py:206-262) via cwct.interp_with_factors_packed; parity
    with the f32 stylize_interp is PSNR-gated in tests."""
    from vstnet_tpu.models import revresnet_fast as rf

    c_lat = cfg.latent_channels
    zp_c = rf.encode_fast(fast_params, content.astype(jnp.bfloat16), cfg,
                          packed_latent=True)
    zp_s = rf.encode_fast(fast_params, style.astype(jnp.bfloat16), cfg,
                          packed_latent=True)
    ls, mu_s = cwct.style_factors_packed(zp_s, c_lat)
    z_cs = cwct.interp_with_factors_packed(zp_c, ls, mu_s, alpha_c, c_lat)
    out = rf.decode_fast(fast_params, z_cs, cfg, packed_latent=True)
    return out.astype(jnp.float32)


@partial(jax.jit, static_argnames=("cfg",))
def stylize_interp_multi_fast(fast_params, content, styles, alpha_s,
                              cfg: RevResNetConfig, alpha_c):
    """Multi-style interpolation on the fused bf16 packed-latent path.

    styles: (S, H, W, 3) stacked style images (encoded as ONE batch);
    alpha_s: (S,) weights. The per-style packed factors are mixed linearly
    (reference interpolation semantics, cWCT.py:206-262: alpha_s-weighted
    sum of coloring Cholesky factors and means), then applied with the
    traced alpha_c content blend."""
    from vstnet_tpu.models import revresnet_fast as rf

    c_lat = cfg.latent_channels
    zp_c = rf.encode_fast(fast_params, content.astype(jnp.bfloat16), cfg,
                          packed_latent=True)
    zp_s = rf.encode_fast(fast_params, styles.astype(jnp.bfloat16), cfg,
                          packed_latent=True)
    ls_all, mu_all = cwct.style_factors_packed(zp_s, c_lat)  # (S,C,C),(S,C)
    a = jnp.asarray(alpha_s, jnp.float32)
    ls = jnp.einsum("s,scd->cd", a, ls_all)[None]
    mu = jnp.einsum("s,sc->c", a, mu_all)[None]
    z_cs = cwct.interp_with_factors_packed(zp_c, ls, mu, alpha_c, c_lat)
    out = rf.decode_fast(fast_params, z_cs, cfg, packed_latent=True)
    return out.astype(jnp.float32)


@partial(jax.jit, static_argnames=("cfg",))
def stylize_fast(fast_params, content, style, cfg: RevResNetConfig):
    """Global stylization on the fused bf16 Pallas path with the packed
    latent (the transfer commutes with the final pixel shuffles, so both
    are skipped). ≥40 dB agreement with `stylize` (tests)."""
    from vstnet_tpu.models import revresnet_fast as rf

    c_lat = cfg.latent_channels
    zp_c = rf.encode_fast(fast_params, content.astype(jnp.bfloat16), cfg,
                          packed_latent=True)
    zp_s = rf.encode_fast(fast_params, style.astype(jnp.bfloat16), cfg,
                          packed_latent=True)
    ls, mu_s = cwct.style_factors_packed(zp_s, c_lat)
    z_cs = cwct.transfer_with_factors_packed(zp_c, ls, mu_s, c_lat)
    out = rf.decode_fast(fast_params, z_cs, cfg, packed_latent=True)
    return out.astype(jnp.float32)


@partial(jax.jit, static_argnames=("cfg", "max_labels"))
def stylize_masked_fast(fast_params, content, style, cmask, smask,
                        cfg: RevResNetConfig, max_labels: int = 32):
    """Regional stylization on the fused bf16 path (stats/Cholesky f32)."""
    from vstnet_tpu.models import revresnet_fast as rf

    z_c = rf.encode_fast(fast_params, content.astype(jnp.bfloat16), cfg)
    z_s = rf.encode_fast(fast_params, style.astype(jnp.bfloat16), cfg)
    cm = _mask_to_latent(cmask, z_c.shape)
    sm = _mask_to_latent(smask, z_s.shape)
    z_cs = cwct.transfer_masked(z_c, z_s, cm, sm, max_labels=max_labels)
    out = rf.decode_fast(fast_params, z_cs.astype(jnp.bfloat16), cfg)
    return out.astype(jnp.float32)


def _mask_to_latent(mask, z_shape):
    """Nearest-resample an int mask (B,H,W) to the latent grid (B,h,w)."""
    b, h, w, _ = z_shape
    if mask.shape[1] == h and mask.shape[2] == w:
        return mask
    return jax.image.resize(mask, (b, h, w), method="nearest")


# ---------------------------------------------------------------------------
# Video tier: per-batch fused programs against per-video precomputed style
# state. ONE definition serves both execution modes: the video CLI jits
# these directly on a single device, and parallel/sharding.py wraps the
# same functions in shard_map for the multi-chip composition.
# ---------------------------------------------------------------------------

def make_fused_video_fn(cfg: RevResNetConfig, out_u8: bool = False,
                        interp: bool = False):
    """fn(fast_params, frames, ls, mu_s[, alpha_c]) -> stylized frames.

    The fused bf16 flat-Pallas global-transfer video program: packed-latent
    encode -> transfer (or alpha_c-interpolated transfer; alpha_c is a
    TRACED scalar) against the precomputed packed style factors -> packed
    decode. The workload of the reference frame loop
    (/root/reference/video_transfer.py:160-214) with the style factored
    out of the loop. out_u8 packs the frames to uint8 on-device."""
    from vstnet_tpu.models import revresnet_fast as rf

    c_lat = cfg.latent_channels

    def fn(fast_params, frames, ls, mu_s, *alpha):
        # compute in the packed-weight dtype (bf16 in production; f32 in
        # the exactness tests)
        dt = jax.tree_util.tree_leaves(fast_params)[0].dtype
        zp = rf.encode_fast(fast_params, frames.astype(dt), cfg,
                            packed_latent=True)
        if interp:
            z_cs = cwct.interp_with_factors_packed(zp, ls, mu_s, alpha[0],
                                                   c_lat)
        else:
            z_cs = cwct.transfer_with_factors_packed(zp, ls, mu_s, c_lat)
        out = rf.decode_fast(fast_params, z_cs, cfg, packed_latent=True)
        out = jnp.clip(out.astype(jnp.float32), 0.0, 1.0)
        if out_u8:
            return jnp.round(out * 255.0).astype(jnp.uint8)
        return out

    return fn


def make_masked_fused_video_fn(cfg: RevResNetConfig, min_ratio: float = 0.02,
                               out_u8: bool = False, seg_hw=None,
                               seg_half: bool = True):
    """fn(fast_params, seg_params, mapping, style_region, remap_plan,
    frames) -> (stylized, content_masks).

    The masked (auto-seg) video program: per-frame in-graph segment ->
    composed one-gather video_remap -> fused bf16 encode -> content-side
    regional cWCT against per-video style statistics
    (cwct.style_region_factors) -> fused decode. The per-frame auto-seg
    flow of the reference (/root/reference/video_transfer.py:163-184) as
    ONE compiled program.

    seg_hw=(sh, sw): run the segmenter on bilinear-downscaled frames (the
    reference itself caps the segmenter input, segment.py:477-479; region
    statistics are insensitive to boundary-pixel precision). The returned
    masks are upsampled back to frame resolution (nearest).

    seg_half (default True, matching the reference's half-precision
    segmenter deployment, segment.py:479): bf16 backbone/head — masks
    feed region statistics only, and boundary-pixel flips are noise
    there."""
    from vstnet_tpu.models import revresnet_fast as rf
    from vstnet_tpu.models.remapping import video_remap
    from vstnet_tpu.models.segformer import segment_mask

    def fn(fast_params, seg_params, mapping, style_region, remap_plan,
           frames):
        labels_k, ns_k, mean_s_k, cov_s_k = style_region
        in_style, cross_tab = remap_plan
        seg_in = frames
        if seg_hw is not None and tuple(seg_hw) != frames.shape[1:3]:
            seg_in = resize_bilinear(frames, seg_hw[0], seg_hw[1])
        cm = segment_mask(seg_params, seg_in, half=seg_half)
        cm = video_remap(cm, in_style, cross_tab, mapping, min_ratio)
        if cm.shape[1:] != frames.shape[1:3]:
            cm = jax.image.resize(
                cm, (cm.shape[0], *frames.shape[1:3]), method="nearest")
        dt = jax.tree_util.tree_leaves(fast_params)[0].dtype
        z_c = rf.encode_fast(fast_params, frames.astype(dt), cfg)
        cm_lat = _mask_to_latent(cm, z_c.shape)
        z_cs = cwct.transfer_masked_factored(
            z_c, cm_lat, labels_k, ns_k, mean_s_k, cov_s_k)
        out = rf.decode_fast(fast_params, z_cs.astype(dt), cfg)
        out = jnp.clip(out.astype(jnp.float32), 0.0, 1.0)
        if out_u8:
            out = jnp.round(out * 255.0).astype(jnp.uint8)
        return out, cm

    return fn


# ---------------------------------------------------------------------------
# Package tier: full photo pipeline with Lab luminance blend
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg", "max_labels", "use_masks"))
def photo_forward(
    params,
    c_image,
    s_image,
    cmask,
    smask,
    cfg: RevResNetConfig,
    max_labels: int = 32,
    use_masks: bool = True,
):
    """VSTNetModel.forward semantics
    (/root/reference/project/image_style/vstnet.py:189-220):

    inputs already padded to /4; masks precomputed (auto-seg or manual).
    Returns rgb in [0,1] with the content's Lab luminance preserved.
    """
    content_lab = rgb2lab(c_image)

    if c_image.shape == s_image.shape:
        z = encode(params, jnp.concatenate([c_image, s_image]), cfg)
        z_c, z_s = jnp.split(z, 2)
    else:
        z_s = encode(params, s_image, cfg)
        z_c = encode(params, c_image, cfg)

    if use_masks:
        cm = _mask_to_latent(cmask, z_c.shape)
        sm = _mask_to_latent(smask, z_s.shape)
        z_cs = cwct.transfer_masked(z_c, z_s, cm, sm, max_labels=max_labels)
    else:
        z_cs = cwct.transfer(z_c, z_s)

    output = decode(params, z_cs, cfg)
    output = jnp.clip(output, 0.0, 1.0)

    output_lab = rgb2lab(output)
    blend_lab = jnp.concatenate(
        [content_lab[..., 0:1], output_lab[..., 1:3]], axis=-1
    )
    return lab2rgb(blend_lab)


@partial(jax.jit, static_argnames=("cfg", "max_labels", "use_masks"))
def photo_forward_fast(
    fast_params,
    c_image,
    s_image,
    cmask,
    smask,
    cfg: RevResNetConfig,
    max_labels: int = 32,
    use_masks: bool = True,
):
    """photo_forward on the fused bf16 fast path (revresnet_fast): same
    VSTNetModel.forward semantics, with encode/decode running the flat
    Pallas kernels in bfloat16 and the cWCT statistics/Cholesky in f32.

    The global (maskless) route additionally uses the packed latent —
    the transfer commutes with the final pixel shuffles, so both are
    skipped. Agreement with the f32 photo_forward is PSNR-gated in
    tests/test_fast_path.py (the 40 dB bar of BASELINE.md; measured
    55.9 dB fused-vs-XLA at 512px on random-init weights — no trained
    checkpoint ships in this environment; see PERF.md caveat)."""
    from vstnet_tpu.models import revresnet_fast as rf

    content_lab = rgb2lab(c_image)
    cb = c_image.astype(jnp.bfloat16)
    sb = s_image.astype(jnp.bfloat16)

    if use_masks:
        if cb.shape == sb.shape:
            # one batched encode for both images (shapes are trace-time
            # static, so this branch compiles in only when applicable)
            z = rf.encode_fast(
                fast_params, jnp.concatenate([cb, sb]), cfg)
            z_c, z_s = jnp.split(z, 2)
        else:
            z_s = rf.encode_fast(fast_params, sb, cfg)
            z_c = rf.encode_fast(fast_params, cb, cfg)
        cm = _mask_to_latent(cmask, z_c.shape)
        sm = _mask_to_latent(smask, z_s.shape)
        z_cs = cwct.transfer_masked(z_c, z_s, cm, sm, max_labels=max_labels)
        output = rf.decode_fast(
            fast_params, z_cs.astype(jnp.bfloat16), cfg)
    else:
        c_lat = cfg.latent_channels
        zp_s = rf.encode_fast(fast_params, sb, cfg, packed_latent=True)
        zp_c = rf.encode_fast(fast_params, cb, cfg, packed_latent=True)
        ls, mu_s = cwct.style_factors_packed(zp_s, c_lat)
        z_cs = cwct.transfer_with_factors_packed(zp_c, ls, mu_s, c_lat)
        output = rf.decode_fast(fast_params, z_cs, cfg, packed_latent=True)

    output = jnp.clip(output.astype(jnp.float32), 0.0, 1.0)
    output_lab = rgb2lab(output)
    blend_lab = jnp.concatenate(
        [content_lab[..., 0:1], output_lab[..., 1:3]], axis=-1
    )
    return lab2rgb(blend_lab)


# ---------------------------------------------------------------------------
# Model objects (weights + config + convenience methods)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class StyleModel:
    """A loaded stylization model: config + params (+ optional segmenter)."""

    cfg: RevResNetConfig
    params: dict
    mode: str = "photorealistic"
    segmenter: Optional[object] = None  # models.segformer.Segmenter

    MAX_TIMES = 4

    @property
    def fast_params(self):
        """bf16 flat-packed weights for the fused Pallas path (cached)."""
        if getattr(self, "_fast_params", None) is None:
            from vstnet_tpu.models import revresnet_fast as rf

            object.__setattr__(
                self, "_fast_params",
                rf.pack_revresnet(self.params, self.cfg,
                                  dtype=jnp.bfloat16))
        return self._fast_params

    @classmethod
    def from_checkpoint(cls, path: str, mode: str = "photorealistic",
                        dtype=jnp.float32, strict: bool = True):
        from vstnet_tpu.io.checkpoint import load_revresnet

        cfg = PHOTO_CONFIG if mode.lower() == "photorealistic" else ARTISTIC_CONFIG
        return cls(cfg=cfg, mode=mode,
                   params=load_revresnet(path, dtype, strict=strict, cfg=cfg))

    @classmethod
    def random_init(cls, seed: int = 0, mode: str = "photorealistic"):
        cfg = PHOTO_CONFIG if mode.lower() == "photorealistic" else ARTISTIC_CONFIG
        return cls(
            cfg=cfg,
            params=init_revresnet(jax.random.PRNGKey(seed), cfg),
            mode=mode,
        )

    # -- convenience wrappers ------------------------------------------------

    def stylize(self, content, style, cmask=None, smask=None, alpha_c=None,
                fast: bool = False):
        """Stylize padded /4 NHWC float images. Returns raw decoder output
        (research semantics — caller clamps/saves). fast=True uses the
        fused bf16 Pallas path for every route, interpolation included."""
        if alpha_c is not None and cmask is None:
            if fast:
                return stylize_interp_fast(
                    self.fast_params, content, style, self.cfg,
                    jnp.float32(alpha_c))
            return stylize_interp(
                self.params, content, style[None], jnp.asarray([1.0]),
                self.cfg, alpha_c=float(alpha_c),
            )
        if cmask is not None and smask is not None:
            if fast:
                return stylize_masked_fast(
                    self.fast_params, content, style, cmask, smask,
                    self.cfg, max_labels=cwct.label_capacity(cmask),
                )
            return stylize_masked(
                self.params, content, style, cmask, smask, self.cfg,
                max_labels=cwct.label_capacity(cmask),
            )
        if fast:
            return stylize_fast(self.fast_params, content, style, self.cfg)
        return stylize(self.params, content, style, self.cfg)

    def stylize_multi(self, content, styles, alpha_s, alpha_c=None,
                      fast: bool = False):
        """Multi-style interpolation (the reference README's teaser grid,
        README.md:108-120): styles (S, H, W, 3) stacked at one shape,
        alpha_s (S,) weights (caller-normalized), optional alpha_c content
        blend. Global transfer only (matches the reference's
        interpolation path — no masks)."""
        a_c = jnp.float32(0.0 if alpha_c is None else alpha_c)
        if fast:
            return stylize_interp_multi_fast(
                self.fast_params, content, styles, jnp.asarray(alpha_s),
                self.cfg, a_c)
        return stylize_interp(
            self.params, content, styles[:, None], jnp.asarray(alpha_s),
            self.cfg, alpha_c=a_c)

    def photo_pipeline(self, c_image, s_image, cmask=None, smask=None,
                       fast: bool = False):
        """Full package pipeline on unpadded inputs: pad, stylize, resize
        back, Lab-blend. Masks optional (None -> global transfer or
        auto-seg when a segmenter is attached). fast=True routes the
        encode/decode through the fused bf16 Pallas path (≥40 dB
        agreement with the f32 path)."""
        b, h, w, _ = c_image.shape
        c_pad = pad_to_multiple(c_image, self.MAX_TIMES)
        s_pad = pad_to_multiple(s_image, self.MAX_TIMES)

        if cmask is None and self.segmenter is not None:
            if c_pad.shape == s_pad.shape:
                masks = self.segmenter.segment(
                    jnp.concatenate([c_pad, s_pad]))
                cmask, smask = masks[:b], masks[b:]
            else:
                cmask = self.segmenter.segment(c_pad)
                smask = self.segmenter.segment(s_pad)
        use_masks = cmask is not None
        if not use_masks:
            # placeholder masks (ignored under use_masks=False)
            cmask = jnp.zeros(c_pad.shape[:3], jnp.int32)
            smask = jnp.zeros(s_pad.shape[:3], jnp.int32)

        fwd = photo_forward_fast if fast else photo_forward
        weights = self.fast_params if fast else self.params
        out = fwd(
            weights, c_pad, s_pad, cmask, smask, self.cfg,
            max_labels=cwct.label_capacity(cmask) if use_masks else 32,
            use_masks=use_masks,
        )
        if out.shape[1] != h or out.shape[2] != w:
            out = resize_bilinear(out, h, w)
        return out


def create_photo_style_model(checkpoint: Optional[str] = None, **kw):
    if checkpoint:
        return StyleModel.from_checkpoint(checkpoint, mode="photorealistic", **kw)
    return StyleModel.random_init(mode="photorealistic")


def create_artist_style_model(checkpoint: Optional[str] = None, **kw):
    if checkpoint:
        return StyleModel.from_checkpoint(checkpoint, mode="artistic", **kw)
    return StyleModel.random_init(mode="artistic")


def image_photo_predict(content_files, style_file, output_dir: str,
                        checkpoint: Optional[str] = None):
    """Batch predict in the spirit of image_style.image_photo_predict
    (/root/reference/project/image_style/__init__.py:97-127): writes
    [content | style | output] triptychs per input. content_files may be
    a glob pattern string (the reference's demo.py calling convention) or
    a list of paths."""
    import os

    import numpy as np

    from vstnet_tpu.io.image import load_image, save_image

    if isinstance(content_files, str):
        import glob as _glob

        pattern = content_files
        content_files = sorted(_glob.glob(pattern))
        if not content_files:
            raise FileNotFoundError(f"no content images match {pattern!r}")

    model = create_photo_style_model(checkpoint)
    os.makedirs(output_dir, exist_ok=True)
    style = load_image(style_file)
    results = []
    for cf in content_files:
        content = load_image(cf)
        sh, sw = content.shape[1:3]
        s = jnp.asarray(style)
        if s.shape[1:3] != (sh, sw):
            s = resize_bilinear(s, sh, sw)
        out = cwct.host_check_finite(model.photo_pipeline(jnp.asarray(content), s))
        trip = np.concatenate(
            [np.asarray(content[0]), np.asarray(s[0]), np.asarray(out[0])], axis=1
        )
        dst = os.path.join(
            output_dir, os.path.splitext(os.path.basename(cf))[0] + ".png"
        )
        save_image(trip, dst)
        results.append(dst)
    return results
