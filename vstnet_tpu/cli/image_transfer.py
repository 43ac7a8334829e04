"""Image style transfer CLI.

Flag-compatible with the reference entry point
(/root/reference/image_transfer.py:15-37):

    python -m vstnet_tpu.cli.image_transfer \
        --mode photorealistic --ckpoint checkpoints/photo_image.pt \
        --content data/content/01.jpg --style data/style/01.jpg \
        --out_dir output --max_size 1280 [--alpha_c A] \
        [--auto_seg | --content_seg C.png --style_seg S.png] \
        [--save_seg_label] [--save_seg_color] [--min_ratio R]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="vstnet_tpu image style transfer")
    p.add_argument("--mode", type=str, default="photorealistic",
                   choices=["photorealistic", "artistic"])
    p.add_argument("--ckpoint", type=str, default=None,
                   help=".pt/.pth (reference format) or .msgpack (native)")
    p.add_argument("--content", type=str, default="data/content/01.jpg")
    p.add_argument("--style", type=str, default="data/style/01.jpg")
    p.add_argument("--out_dir", type=str, default="output")
    p.add_argument("--max_size", type=int, default=1280)
    p.add_argument("--alpha_c", type=float, default=None)
    # multi-style interpolation (the reference README's teaser grids,
    # /root/reference/README.md:108-120; cWCT.interpolation alpha_s path)
    p.add_argument("--styles", type=str, nargs="+", default=None,
                   help="two or more style images for multi-style "
                        "interpolation (global transfer; combine with "
                        "--alpha_s weights and optionally --alpha_c)")
    p.add_argument("--alpha_s", type=float, nargs="+", default=None,
                   help="interpolation weights for --styles "
                        "(default uniform; normalized to sum to 1)")
    # segmentation
    p.add_argument("--content_seg", type=str, default=None)
    p.add_argument("--style_seg", type=str, default=None)
    p.add_argument("--auto_seg", action="store_true", default=False)
    p.add_argument("--save_seg_label", action="store_true", default=True)
    p.add_argument("--save_seg_color", action="store_true", default=True)
    p.add_argument("--label_mapping", type=str, default=None,
                   help="ade20k semantic relation .npy (defaults to bundled)")
    p.add_argument("--palette", type=str, default=None)
    p.add_argument("--min_ratio", type=float, default=0.02)
    p.add_argument("--seg_ckpoint", type=str, default=None,
                   help="SegFormer-B4 checkpoint for --auto_seg")
    p.add_argument("--seg_size", type=int, default=0,
                   help="run the segmenter on a downscale capped at this "
                        "size (0 = the reference's 1024 cap, "
                        "segment.py:477); region statistics are "
                        "insensitive to mask boundary precision, and the "
                        "segmenter dominates the masked pipeline's cost")
    # ultra-resolution (4K+) tiling — bounded-memory single-chip path
    p.add_argument("--ultra_threshold", type=int, default=1536,
                   help="route images larger than this through spatial "
                        "tiling (models/ultra.py)")
    p.add_argument("--tile", type=int, default=1024)
    p.add_argument("--overlap", type=int, default=128)
    p.add_argument("--fast", action="store_true", default=False,
                   help="fused bf16 Pallas path (≥40 dB agreement with "
                        "the f32 default; ~4x faster on TPU)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.alpha_c is not None and not 0.0 <= args.alpha_c <= 1.0:
        raise SystemExit(
            f"error: --alpha_c must be in [0, 1], got {args.alpha_c}")
    alpha_s = None
    if args.styles:
        if args.auto_seg or args.content_seg or args.style_seg:
            raise SystemExit(
                "error: --styles interpolation is a global transfer "
                "(no segmentation), matching the reference's "
                "cWCT.interpolation")
        k = len(args.styles)
        if args.alpha_s is None:
            alpha_s = [1.0 / k] * k
        else:
            if len(args.alpha_s) != k:
                raise SystemExit(
                    f"error: --alpha_s needs {k} weights (one per style), "
                    f"got {len(args.alpha_s)}")
            if any(a < 0 for a in args.alpha_s) or sum(args.alpha_s) <= 0:
                raise SystemExit(
                    "error: --alpha_s weights must be non-negative with a "
                    "positive sum")
            tot = sum(args.alpha_s)
            alpha_s = [a / tot for a in args.alpha_s]
    elif args.alpha_s is not None:
        raise SystemExit("error: --alpha_s requires --styles")

    import jax.numpy as jnp

    from vstnet_tpu.io.image import (
        device_put_image,
        load_image,
        load_segment_image,
        save_image,
    )
    from vstnet_tpu.models.pipeline import StyleModel

    if args.ckpoint:
        if args.ckpoint.endswith(".msgpack"):
            from vstnet_tpu.config import ARTISTIC_CONFIG, PHOTO_CONFIG
            from vstnet_tpu.io.checkpoint import load_native

            cfg = (PHOTO_CONFIG if args.mode == "photorealistic"
                   else ARTISTIC_CONFIG)
            model = StyleModel(cfg=cfg, params=load_native(args.ckpoint),
                               mode=args.mode)
        else:
            model = StyleModel.from_checkpoint(args.ckpoint, args.mode)
    else:
        print("WARNING: no --ckpoint given; using random weights (smoke mode)")
        model = StyleModel.random_init(mode=args.mode)

    ds = model.cfg.down_scale
    # uint8 host arrays; normalization happens on device (4x less upload)
    content = load_image(args.content, args.max_size, ds, as_uint8=True)
    style_paths = args.styles if alpha_s is not None else [args.style]
    style = load_image(style_paths[0], args.max_size, ds, as_uint8=True)

    # segmenter capacity (reference: MAX 1024, segment.py:477): huge images
    # are segmented on a downscaled copy, then the mask is nearest-
    # upsampled — labels are resolution-stable. --seg_size lowers the cap
    # (same knob as the video CLI's).
    seg_max = args.seg_size if args.seg_size > 0 else 1024

    def _segment_capped(seg, img_u8):
        h0, w0 = img_u8.shape[1:3]
        x = device_put_image(img_u8)
        if max(h0, w0) > seg_max:
            from vstnet_tpu.ops.resize import resize_bilinear

            f = seg_max / max(h0, w0)
            nh = max(int(h0 * f) // 4 * 4, 4)
            nw = max(int(w0 * f) // 4 * 4, 4)
            import jax

            m = seg.segment(resize_bilinear(x, nh, nw))
            return np.asarray(jax.image.resize(
                m, (1, h0, w0), method="nearest"))
        return np.asarray(seg.segment(x))

    cmask = smask = None
    if args.auto_seg:
        from vstnet_tpu.models.segformer import Segmenter

        # --fast runs the segmenter in bf16 (the reference deploys it in
        # half precision too, segment.py:479): 74.8 -> 55.3 ms @1024²
        # device-side. The earlier "bf16 measured slower" note was a
        # mismeasurement — an f32 bias add silently promoted the whole
        # half program back to f32 (see PERF.md segmenter note).
        seg = Segmenter.load(args.seg_ckpoint, min_ratio=args.min_ratio,
                             label_mapping=args.label_mapping,
                             half=args.fast)
        cmask = _segment_capped(seg, content)
        smask = _segment_capped(seg, style)
        cmask, smask = seg.remap(cmask, smask)
        _maybe_save_seg(args, cmask, smask)
    elif args.content_seg and args.style_seg:
        cmask = load_segment_image(args.content_seg, content.shape[1:3])
        smask = load_segment_image(args.style_seg, style.shape[1:3])

    def _finish(out):
        from vstnet_tpu.models.cwct import host_check_finite

        host_check_finite(out)
        cn = os.path.splitext(os.path.basename(args.content))[0]
        sn = "+".join(os.path.splitext(os.path.basename(sp))[0]
                      for sp in style_paths)
        path = os.path.join(args.out_dir, f"{cn}_{sn}.png")
        save_image(out, path)  # device array: uint8-packed readback
        print(f"Save at {path}")
        return path

    c = device_put_image(content)
    s = device_put_image(style)
    styles_dev = None
    if alpha_s is not None:
        from vstnet_tpu.ops.resize import resize_bilinear as _rb

        # stack every style at the first style's shape (the factors are
        # statistics — scale-stable; stacking needs one static shape)
        h1, w1 = s.shape[1:3]
        parts = [s]
        for sp in style_paths[1:]:
            si = device_put_image(
                load_image(sp, args.max_size, ds, as_uint8=True))
            if si.shape[1:3] != (h1, w1):
                si = _rb(si, h1, w1)
            parts.append(si)
        styles_dev = jnp.concatenate(parts, axis=0)  # (S, h, w, 3)
    if max(content.shape[1:3]) > args.ultra_threshold:
        # Ultra-resolution: bounded-memory tiled path. All modes are
        # first-class here (the reference demos ultra-res as such,
        # README.md:133-138): global, regional (--auto_seg/--content_seg,
        # streaming per-label statistics), interpolated (--alpha_c), and
        # the fused bf16 fast path (--fast).
        import jax

        from vstnet_tpu.models import cwct as _cwct
        from vstnet_tpu.models.ultra import (
            stylize_tiled,
            stylize_tiled_interp,
            stylize_tiled_masked,
        )
        from vstnet_tpu.ops.resize import resize_bilinear

        if max(style.shape[1:3]) > args.ultra_threshold:
            sh, sw = style.shape[1:3]
            f = args.ultra_threshold / max(sh, sw)
            nh = max(int(sh * f) // 4 * 4, 4)
            nw = max(int(sw * f) // 4 * 4, 4)
            print(f"note: style resized {sh}x{sw} -> {nh}x{nw} for "
                  "factor computation (statistics are scale-stable)")
            s = resize_bilinear(s, nh, nw)
            if styles_dev is not None:
                styles_dev = resize_bilinear(styles_dev, nh, nw)
            if smask is not None:
                smask = np.asarray(jax.image.resize(
                    jnp.asarray(smask), (1, nh, nw), method="nearest"))
        fast_params = model.fast_params if args.fast else None
        print(f"ultra-res: tiling {content.shape[1]}x{content.shape[2]} "
              f"(tile={args.tile}, overlap={args.overlap}"
              + (", fused bf16" if args.fast else "") + ")")
        if cmask is not None:
            out = stylize_tiled_masked(
                model.params, c, s, jnp.asarray(cmask), jnp.asarray(smask),
                model.cfg, tile=args.tile, overlap=args.overlap,
                max_labels=_cwct.label_capacity(cmask),
                fast_params=fast_params)
        elif alpha_s is not None or args.alpha_c is not None:
            if alpha_s is not None:
                s_list = [styles_dev[i:i + 1]
                          for i in range(styles_dev.shape[0])]
                a_s = jnp.asarray(alpha_s)
            else:
                s_list, a_s = [s], jnp.asarray([1.0])
            out = stylize_tiled_interp(
                model.params, c, s_list, a_s, model.cfg,
                alpha_c=float(args.alpha_c or 0.0), tile=args.tile,
                overlap=args.overlap, fast_params=fast_params)
        else:
            out = stylize_tiled(model.params, c, s, model.cfg,
                                tile=args.tile, overlap=args.overlap,
                                fast_params=fast_params)
        return _finish(out)
    if alpha_s is not None:
        out = model.stylize_multi(c, styles_dev, alpha_s,
                                  alpha_c=args.alpha_c, fast=args.fast)
    elif cmask is not None:
        out = model.stylize(c, s, jnp.asarray(cmask), jnp.asarray(smask),
                            fast=args.fast)
    elif args.alpha_c is not None:
        out = model.stylize(c, s, alpha_c=args.alpha_c, fast=args.fast)
    else:
        out = model.stylize(c, s, fast=args.fast)

    return _finish(out)


def _maybe_save_seg(args, cmask, smask):
    if not (args.save_seg_label or args.save_seg_color):
        return
    from PIL import Image

    seg_dir = os.path.join(args.out_dir, "segmentation")
    os.makedirs(seg_dir, exist_ok=True)
    if args.save_seg_label:
        Image.fromarray(cmask[0].astype(np.uint8)).save(
            os.path.join(seg_dir, "content_seg_label.png"))
        Image.fromarray(smask[0].astype(np.uint8)).save(
            os.path.join(seg_dir, "style_seg_label.png"))
    if args.save_seg_color:
        from vstnet_tpu.models.remapping import ade20k_palette

        pal = ade20k_palette(args.palette)
        for name, m in (("content", cmask), ("style", smask)):
            color = pal[np.clip(m[0], 0, len(pal) - 1)]
            Image.fromarray(color.astype(np.uint8)).save(
                os.path.join(seg_dir, f"{name}_seg_color.png"))


if __name__ == "__main__":
    main()
