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


@partial(jax.jit, static_argnames=("cfg", "alpha_c"))
def stylize_interp(params, content, styles, alpha_s, cfg: RevResNetConfig,
                   alpha_c: float = 0.0):
    """Multi-style interpolation (+ alpha_c content blend).

    styles: (S, B, H, W, 3) stacked style images (same shape).
    """
    z_c = encode(params, content, cfg)
    z_styles = jax.vmap(lambda s: encode(params, s, cfg))(styles)
    z_cs = cwct.interpolation(z_c, z_styles, alpha_s, alpha_c=alpha_c)
    return decode(params, z_cs, cfg)


def _mask_to_latent(mask, z_shape):
    """Nearest-resample an int mask (B,H,W) to the latent grid (B,h,w)."""
    b, h, w, _ = z_shape
    if mask.shape[1] == h and mask.shape[2] == w:
        return mask
    return jax.image.resize(mask, (b, h, w), method="nearest")


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

    @classmethod
    def from_checkpoint(cls, path: str, mode: str = "photorealistic",
                        dtype=jnp.float32):
        from vstnet_tpu.io.checkpoint import load_revresnet

        cfg = PHOTO_CONFIG if mode.lower() == "photorealistic" else ARTISTIC_CONFIG
        return cls(cfg=cfg, params=load_revresnet(path, dtype), mode=mode)

    @classmethod
    def random_init(cls, seed: int = 0, mode: str = "photorealistic"):
        cfg = PHOTO_CONFIG if mode.lower() == "photorealistic" else ARTISTIC_CONFIG
        return cls(
            cfg=cfg,
            params=init_revresnet(jax.random.PRNGKey(seed), cfg),
            mode=mode,
        )

    # -- convenience wrappers ------------------------------------------------

    def stylize(self, content, style, cmask=None, smask=None, alpha_c=None):
        """Stylize padded /4 NHWC float images. Returns raw decoder output
        (research semantics — caller clamps/saves)."""
        if alpha_c is not None and cmask is None:
            return stylize_interp(
                self.params, content, style[None], jnp.asarray([1.0]),
                self.cfg, alpha_c=float(alpha_c),
            )
        if cmask is not None and smask is not None:
            return stylize_masked(
                self.params, content, style, cmask, smask, self.cfg,
                max_labels=cwct.label_capacity(cmask),
            )
        return stylize(self.params, content, style, self.cfg)

    def photo_pipeline(self, c_image, s_image, cmask=None, smask=None):
        """Full package pipeline on unpadded inputs: pad, stylize, resize
        back, Lab-blend. Masks optional (None -> global transfer or
        auto-seg when a segmenter is attached)."""
        b, h, w, _ = c_image.shape
        c_pad = pad_to_multiple(c_image, self.MAX_TIMES)
        s_pad = pad_to_multiple(s_image, self.MAX_TIMES)

        if cmask is None and self.segmenter is not None:
            cmask = self.segmenter.segment(c_pad)
            smask = self.segmenter.segment(s_pad)
        use_masks = cmask is not None
        if not use_masks:
            # placeholder masks (ignored under use_masks=False)
            cmask = jnp.zeros(c_pad.shape[:3], jnp.int32)
            smask = jnp.zeros(s_pad.shape[:3], jnp.int32)

        out = photo_forward(
            self.params, c_pad, s_pad, cmask, smask, self.cfg,
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
    [content | style | output] triptychs per input."""
    import os

    import numpy as np

    from vstnet_tpu.io.image import load_image, save_image

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
