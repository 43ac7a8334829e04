"""Artifact export CLI — produce the AOT StableHLO modules the native
tier runs.

The reference's export surface is project/smoke.py:81-284 (ONNX encoder/
decoder/segmenter, each gated by an output-equivalence assert); here the
same artifacts (plus the fused full-stylize program and the segment-render
program) export as StableHLO for any PJRT runtime — most directly
`native/build/vstnet-native`:

    vstnet-export --what stylize --ckpoint photo_image.pt \
        --height 512 --width 512 -o artifacts/
    vstnet-export --what segment-render --seg_ckpoint image_segment.pth \
        --height 512 --width 512 -o artifacts/
    vstnet-native --artifact artifacts/stylize_512x512.mlir \
        --style s.png -o out/ c.png

Weights are BAKED into the module (the artifact is self-contained); the
deserialized-artifact parity gates live in tests/test_runtime.py.
"""

from __future__ import annotations

import argparse
import os

WHAT = ("stylize", "encoder", "decoder", "segmenter", "segment-render")


def build_parser():
    p = argparse.ArgumentParser(
        description="export vstnet_tpu AOT StableHLO artifacts")
    p.add_argument("--what", default="stylize", choices=WHAT + ("all",),
                   help="which program to export (all = every one the "
                        "given checkpoints allow)")
    p.add_argument("--mode", type=str, default="photorealistic",
                   choices=["photorealistic", "artistic"])
    p.add_argument("--ckpoint", type=str, default=None,
                   help="RevResNet .pt/.pth (reference format); random "
                        "weights with a warning if omitted")
    p.add_argument("--seg_ckpoint", type=str, default=None,
                   help="SegFormer checkpoint for segmenter/segment-render")
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--blend", type=float, default=0.5,
                   help="segment-render: blend * label color + "
                        "(1-blend) * input (1.0 = pure color render)")
    p.add_argument("--min_ratio", type=float, default=0.02)
    p.add_argument("--platform", default="tpu", choices=["tpu", "cpu"],
                   help="lowering target (tpu keeps Cholesky as HLO; cpu "
                        "artifacts run on a CPU PJRT plugin)")
    p.add_argument("--out_dir", "-o", type=str, default="artifacts")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.height % 4 or args.width % 4:
        raise SystemExit("error: --height/--width must be multiples of 4")

    from vstnet_tpu.runtime.export import save_exported

    wanted = list(WHAT) if args.what == "all" else [args.what]
    need_rev = any(w in ("stylize", "encoder", "decoder") for w in wanted)
    need_seg = any(w in ("segmenter", "segment-render") for w in wanted)
    h, w, b = args.height, args.width, args.batch
    plats = (args.platform,)
    written = []

    if need_rev:
        from vstnet_tpu.models.pipeline import StyleModel
        from vstnet_tpu.runtime.export import (
            export_decoder,
            export_encoder,
            export_stylize,
        )

        if args.ckpoint:
            model = StyleModel.from_checkpoint(args.ckpoint, args.mode)
        else:
            print("WARNING: no --ckpoint; exporting RANDOM weights "
                  "(smoke artifacts only)")
            model = StyleModel.random_init(mode=args.mode)
        fns = {"stylize": export_stylize, "encoder": export_encoder,
               "decoder": export_decoder}
        for what in wanted:
            if what not in fns:
                continue
            blob, oshape = fns[what](model.params, model.cfg, h, w,
                                     batch=b, platforms=plats)
            path = os.path.join(args.out_dir, f"{what}_{h}x{w}.mlir")
            save_exported(path, blob)
            print(f"wrote {path} (out {oshape})")
            written.append(path)

    if need_seg:
        from vstnet_tpu.models.segformer import Segmenter
        from vstnet_tpu.runtime.export import (
            export_segment_render,
            export_segmenter,
        )

        if args.seg_ckpoint:
            seg = Segmenter.load(args.seg_ckpoint,
                                 min_ratio=args.min_ratio)
            seg_params = seg.params
        else:
            import jax

            from vstnet_tpu.models.segformer import init_segformer

            print("WARNING: no --seg_ckpoint; exporting RANDOM segmenter "
                  "weights (smoke artifacts only)")
            seg_params = init_segformer(jax.random.PRNGKey(0))
        if "segmenter" in wanted:
            blob, oshape = export_segmenter(seg_params, h, w, batch=b,
                                            platforms=plats)
            path = os.path.join(args.out_dir, f"segmenter_{h}x{w}.mlir")
            save_exported(path, blob)
            print(f"wrote {path} (out {oshape})")
            written.append(path)
        if "segment-render" in wanted:
            blob, oshape = export_segment_render(
                seg_params, h, w, blend=args.blend,
                min_ratio=args.min_ratio, platforms=plats)
            path = os.path.join(args.out_dir,
                                f"segment_render_{h}x{w}.mlir")
            save_exported(path, blob)
            print(f"wrote {path} (out {oshape})")
            written.append(path)

    if not written:
        raise SystemExit("error: nothing to export for the given flags")
    return written


if __name__ == "__main__":
    main()
