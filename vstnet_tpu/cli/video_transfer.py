"""Video style transfer CLI — flag-compatible with the reference
(/root/reference/video_transfer.py:17-37), redesigned as a frame-batched
streaming pipeline:

  * the style image is encoded and Cholesky-factored ONCE (the reference
    re-encodes the style inside the frame loop, video_transfer.py:195);
  * frames run through one jitted encode->transfer->decode program in
    batches (frames are independent at inference — SURVEY §3.2 — so
    batching is pure data parallelism and feeds the MXU);
  * ALL local devices are used by default: frames are sharded over a
    'data' mesh and each chip runs the fused bf16 flat-Pallas path on its
    shard (parallel/sharding.py:parallel_stylize_fused) — the v5e-8
    aggregate-throughput composition;
  * auto-seg runs IN-GRAPH: segment -> self/cross label remap -> masked
    cWCT compile into the same program as the stylize, so the masked path
    keeps the same 2-batches-in-flight async dispatch as the global path
    (no host round trip per batch); under --precision bf16 it runs the
    fused masked program (per-video factored style statistics + composed
    one-gather remap — 4.7x over the f32 masked program, PERF.md);
  * --alpha_c interpolation also runs fused under bf16: style factors
    mixed once, alpha_c a traced scalar (a sweep reuses one compiled
    program), per frame only the content factor + blend — measured at
    the same fps as the global fused path;
  * host decode (PIL/JPEG) overlaps device compute via async dispatch,
    with uint8 arrays at both device boundaries.

No mp4 encoder exists in this environment; .mp4 outputs are written as
MJPEG .avi (the reference's own seg-debug format) with a notice.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="vstnet_tpu video style transfer")
    p.add_argument("--mode", type=str, default="photorealistic",
                   choices=["photorealistic", "artistic"])
    p.add_argument("--ckpoint", type=str, default=None)
    p.add_argument("--video", type=str, default="data/content/04.avi",
                   help="video file (MJPEG avi) or frame directory")
    p.add_argument("--style", type=str, default="data/style/04.jpg")
    p.add_argument("--out_dir", type=str, default="output")
    p.add_argument("--max_size", type=int, default=1280)
    p.add_argument("--alpha_c", type=float, default=None)
    p.add_argument("--fps", type=int, default=10)
    p.add_argument("--batch", type=int, default=8,
                   help="frames per device step (scaled by the local "
                        "device count when >1 chip is visible); per-chip "
                        "throughput is batch-flat under the kernel-"
                        "resident bf16 path (PERF.md round-5), so the "
                        "small default costs nothing")
    p.add_argument("--precision", type=str, default="bf16",
                   choices=["bf16", "f32"],
                   help="bf16 runs the fused Pallas fast path (>=55 dB "
                        "vs f32); f32 runs the reference-exact path")
    # segmentation
    p.add_argument("--auto_seg", action="store_true", default=False)
    p.add_argument("--save_seg_label", action="store_true", default=True)
    p.add_argument("--save_seg_color", action="store_true", default=True)
    p.add_argument("--label_mapping", type=str, default=None)
    p.add_argument("--palette", type=str, default=None)
    p.add_argument("--min_ratio", type=float, default=0.02)
    p.add_argument("--seg_ckpoint", type=str, default=None)
    p.add_argument("--seg_size", type=int, default=-1,
                   help="max side for the per-frame SEGMENTER input on the "
                        "fast masked path (0 = native frame size; -1 = "
                        "AUTO, default: pick the largest downscale whose "
                        "masks agree with native-resolution masks on the "
                        "first frame — models/segformer.py:pick_seg_size). "
                        "The reference caps its segmenter input the same "
                        "way (segment.py:477-479); region statistics are "
                        "insensitive to mask boundary precision, and the "
                        "segmenter is ~half of the masked frame time at "
                        "512² (PERF.md)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from vstnet_tpu.io.image import load_image
    from vstnet_tpu.io.video import (
        AsyncWriter,
        AviWriter,
        prefetch_frames,
        read_frames,
    )
    from vstnet_tpu.models import cwct
    from vstnet_tpu.models.pipeline import StyleModel
    from vstnet_tpu.models.revresnet import decode, encode
    from vstnet_tpu.ops.resize import resize_bilinear

    if args.ckpoint:
        model = StyleModel.from_checkpoint(args.ckpoint, args.mode)
    else:
        print("WARNING: no --ckpoint given; using random weights (smoke mode)")
        model = StyleModel.random_init(mode=args.mode)
    cfg = model.cfg

    # ----- device topology: every chip in the job (pod-aware) ----------
    from vstnet_tpu.parallel.multihost import (
        host_local_to_global,
        init_distributed,
        process_batch_bounds,
    )

    init_distributed()  # env-gated; single-host runs fall through
    n_proc = jax.process_count()
    n_dev = jax.device_count()
    mesh = None
    if n_dev > 1:
        from vstnet_tpu.parallel import make_mesh

        mesh = make_mesh(n_dev, axes=("data",))
        print(f"data-parallel over {n_dev} devices"
              + (f" on {n_proc} hosts" if n_proc > 1 else ""))
    batch_total = args.batch * max(n_dev, 1)

    frames_iter, n_frames, src_fps = read_frames(args.video)
    # decode-ahead thread: JPEG decode overlaps device compute, bounded
    # at two batches of decoded frames (never the whole video in RAM)
    frames_iter = prefetch_frames(frames_iter, depth=2 * batch_total)
    first = next(frames_iter)
    h0, w0 = first.shape[:2]
    scale = min(args.max_size / max(h0, w0), 1.0)
    h = int(h0 * scale) // cfg.down_scale * cfg.down_scale
    w = int(w0 * scale) // cfg.down_scale * cfg.down_scale

    style = load_image(args.style, args.max_size, cfg.down_scale)
    z_s = encode(model.params, jnp.asarray(style), cfg)
    ls, mu_s = cwct.style_factors(z_s)

    # bf16 fused Pallas paths (global: packed latent; masked: spatial
    # latent + factored per-label style statistics; interp: packed latent
    # with the per-frame content blend by a traced alpha_c).
    on_tpu = jax.default_backend() != "cpu"  # Pallas needs the TPU
    use_fast = (args.precision == "bf16" and not args.auto_seg
                and args.alpha_c is None and on_tpu)
    use_fast_masked = (args.precision == "bf16" and args.auto_seg
                       and on_tpu)
    use_fast_interp = (args.precision == "bf16" and not args.auto_seg
                       and args.alpha_c is not None and on_tpu)

    def _to_u8(x):
        """Device-side uint8 pack: 4x less readback than f32 frames (the
        host link is the video bottleneck — PERF.md)."""
        return jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0).astype(jnp.uint8)

    if use_fast or use_fast_masked or use_fast_interp:
        from vstnet_tpu.models import revresnet_fast as rf

        fast_params = rf.pack_revresnet(model.params, cfg,
                                        dtype=jnp.bfloat16)
        c_lat = cfg.latent_channels

    if use_fast_interp:
        # style factors in the packed layout, computed once; alpha_c is a
        # TRACED scalar (one compile serves an interpolation sweep)
        zp_s = rf.encode_fast(
            fast_params, jnp.asarray(style).astype(jnp.bfloat16), cfg,
            packed_latent=True)
        ls_p, mu_p = cwct.style_factors_packed(zp_s, c_lat)
        # ONE program body serves both (models/pipeline.py builder);
        # multi-chip just wraps it in shard_map
        if mesh is not None:
            from vstnet_tpu.parallel import parallel_stylize_fused

            _interp_fn = parallel_stylize_fused(
                mesh, cfg, out_u8=True, interp=True)
        else:
            from vstnet_tpu.models.pipeline import make_fused_video_fn

            _interp_fn = jax.jit(
                make_fused_video_fn(cfg, out_u8=True, interp=True))

        def stylize_batch_interp(fp, frames, a):
            return _interp_fn(fp, frames, ls_p, mu_p, a)

    if use_fast:
        if mesh is not None:
            from vstnet_tpu.parallel import parallel_stylize_fused

            _fast_fn = parallel_stylize_fused(mesh, cfg, out_u8=True)
        else:
            from vstnet_tpu.models.pipeline import make_fused_video_fn

            _fast_fn = jax.jit(make_fused_video_fn(cfg, out_u8=True))

        def stylize_batch_fast(fp, frames):
            return _fast_fn(fp, frames, ls, mu_s)

    smask = None
    seg = None
    if args.auto_seg:
        from vstnet_tpu.models.remapping import (
            cross_remapping,
            self_remapping,
        )
        from vstnet_tpu.models.segformer import Segmenter, segment_mask

        seg = Segmenter.load(args.seg_ckpoint, min_ratio=args.min_ratio,
                             label_mapping=args.label_mapping)
        # style mask: segmented + self-remapped ONCE
        smask = seg.segment(jnp.asarray(style))
        smask = self_remapping(smask, seg.label_mapping, args.min_ratio)

        if use_fast_masked:
            from vstnet_tpu.models.pipeline import _mask_to_latent
            from vstnet_tpu.models.remapping import video_remap_plan

            from vstnet_tpu.models.segformer import (
                pick_seg_size,
                seg_hw_for,
            )

            seg_size = args.seg_size
            if seg_size == -1:
                # quality gate on the first frame: largest downscale whose
                # masks agree with native-resolution segmentation
                probe = resize_bilinear(
                    jnp.asarray(first, jnp.float32)[None] / 255.0, h, w)
                seg_size = pick_seg_size(seg.params, probe, half=True)
                print(f"auto seg_size: {seg_size or 'native'} "
                      "(mask-agreement gate, models/segformer.py)")
            seg_hw = seg_hw_for(h, w, seg_size)

            # style side factored ONCE per video: per-label latent
            # statistics + the frame-independent halves of the remap
            z_s_sp = rf.encode_fast(
                fast_params, jnp.asarray(style).astype(jnp.bfloat16), cfg)
            sm_lat = _mask_to_latent(smask, z_s_sp.shape)
            k_cap = cwct.label_capacity(sm_lat)
            style_region = cwct.style_region_factors(
                z_s_sp, sm_lat, max_labels=k_cap)
            remap_plan = video_remap_plan(smask, seg.label_mapping)

            # ONE program body (models/pipeline.py builder): in-graph
            # segment -> composed one-gather remap (video_remap) ->
            # content-side-only regional cWCT against the precomputed
            # style factors -> fused decode. 137.7 -> ~35 ms/frame vs
            # the f32 masked program (PERF.md masked-video section).
            if mesh is not None:
                from vstnet_tpu.parallel import (
                    parallel_stylize_masked_fused,
                )

                _masked_fn = parallel_stylize_masked_fused(
                    mesh, cfg, min_ratio=args.min_ratio, out_u8=True,
                    seg_hw=seg_hw)
            else:
                from vstnet_tpu.models.pipeline import (
                    make_masked_fused_video_fn,
                )

                _masked_fn = jax.jit(make_masked_fused_video_fn(
                    cfg, min_ratio=args.min_ratio, out_u8=True,
                    seg_hw=seg_hw))

    @jax.jit
    def stylize_batch(params, frames):
        z_c = encode(params, frames, cfg)
        if args.alpha_c is not None:
            z_cs = cwct.interpolation(
                z_c, z_s[None], jnp.asarray([1.0]), alpha_c=float(args.alpha_c))
        else:
            z_cs = cwct.transfer_with_factors(z_c, ls, mu_s)
        return _to_u8(decode(params, z_cs, cfg))

    if mesh is not None and not use_fast and args.alpha_c is None \
            and not args.auto_seg:
        # standard-path global transfer over all chips
        from vstnet_tpu.parallel import parallel_stylize_factored

        _sharded_std = parallel_stylize_factored(mesh, cfg)

        def stylize_batch(params, frames):  # noqa: F811
            return _to_u8(_sharded_std(params, frames, ls, mu_s))

    @jax.jit
    def stylize_batch_masked(params, seg_params, frames):
        """Segment -> remap -> masked cWCT -> decode, ONE program: the
        per-frame auto-seg flow of the reference (video_transfer.py:163-184)
        with the label remapping in-graph (models/remapping.py is pure
        JAX), so the masked path keeps async dispatch — nothing touches
        the host until the writer drains the batch. Segmenter weights are
        an ARGUMENT (not a closure): baked-constant weights blow the
        remote-compile module size through the relay."""
        from vstnet_tpu.models.pipeline import _mask_to_latent

        cm = segment_mask(seg_params, frames)
        cm = self_remapping(cm, seg.label_mapping, args.min_ratio)
        sm_b = jnp.broadcast_to(smask, (frames.shape[0], *smask.shape[-2:]))
        cm = cross_remapping(cm, sm_b, seg.label_mapping)
        z_c = encode(params, frames, cfg)
        z_ss = jnp.broadcast_to(z_s, (frames.shape[0], *z_s.shape[1:]))
        # masks live on the FRAME grid; the latent grid is smaller for the
        # artistic profile (latent at 1/2 res) — resample both (the fast
        # masked path and pipeline.stylize_masked do the same)
        z_cs = cwct.transfer_masked(z_c, z_ss,
                                    _mask_to_latent(cm, z_c.shape),
                                    _mask_to_latent(sm_b, z_ss.shape))
        return _to_u8(decode(params, z_cs, cfg)), cm

    from vstnet_tpu.io.video import have_cv2, make_video_writer

    vname = os.path.splitext(os.path.basename(args.video))[0]
    sname = os.path.splitext(os.path.basename(args.style))[0]
    # reference output: <video>_<style>.mp4 (video_transfer.py:92-96);
    # MJPEG AVI fallback when no mp4 encoder exists in the environment
    ext = ".mp4" if have_cv2() else ".avi"
    out_name = f"{vname}_{sname}{ext}"
    out_path = os.path.join(args.out_dir, out_name)
    if ext == ".avi":
        print(f"writing MJPEG AVI to {out_path} "
              "(no mp4 encoder in this environment)")
    else:
        print(f"writing mp4 to {out_path}")
    # frame encode runs on a writer thread, off the dispatch path
    writer = AsyncWriter(make_video_writer(out_path, fps=args.fps))

    label_writer = color_writer = None
    palette = None
    if args.auto_seg and args.save_seg_label:
        label_writer = AsyncWriter(AviWriter(
            os.path.join(args.out_dir, "segmentation", "content_seg_label.avi"),
            fps=args.fps))
    if args.auto_seg and args.save_seg_color:
        from vstnet_tpu.models.remapping import ade20k_palette

        palette = ade20k_palette(args.palette)
        color_writer = AsyncWriter(AviWriter(
            os.path.join(args.out_dir, "segmentation", "content_seg_color.avi"),
            fps=args.fps))

    def frame_stream():
        yield first
        yield from frames_iter

    @jax.jit
    def _prep(batch_u8):
        # uint8 upload (4x less host->device traffic), scale+resize on chip
        return resize_bilinear(batch_u8.astype(jnp.float32) / 255.0, h, w)

    def to_device_batch(batch_np):
        x = np.stack(batch_np)
        if mesh is not None:
            if n_proc > 1:
                # pod: every host decodes the stream, each uploads only
                # its contiguous slice of the global batch
                lo, hi = process_batch_bounds(x.shape[0], n_proc)
                return _prep(host_local_to_global(mesh, x[lo:hi]))
            from vstnet_tpu.parallel import shard_batch

            return _prep(shard_batch(mesh, x))
        return _prep(jnp.asarray(x))

    t0 = time.time()
    done = 0
    pending = []  # (device_array, n_valid) — async dispatch overlap
    batch_np = []

    def flush(batch_np):
        n = len(batch_np)
        while len(batch_np) < batch_total:  # pad to static shape
            batch_np.append(batch_np[-1])
        x = to_device_batch(batch_np)
        if use_fast_masked:
            out, cm = _masked_fn(fast_params, seg.params, seg.label_mapping,
                                 style_region, remap_plan, x)
            return out, n, cm
        if args.auto_seg:
            out, cm = stylize_batch_masked(model.params, seg.params, x)
            return out, n, cm
        if use_fast:
            return stylize_batch_fast(fast_params, x), n, None
        if use_fast_interp:
            return stylize_batch_interp(
                fast_params, x, jnp.float32(args.alpha_c)), n, None
        return stylize_batch(model.params, x), n, None

    for frame in frame_stream():
        batch_np.append(frame)
        if len(batch_np) == batch_total:
            pending.append(flush(batch_np))
            batch_np = []
        while len(pending) > 2:  # keep 2 batches in flight
            done += _drain(pending.pop(0), writer, label_writer,
                           color_writer, palette)
    if batch_np:
        pending.append(flush(batch_np))
    for p in pending:
        done += _drain(p, writer, label_writer, color_writer, palette)

    # close every writer even if one fails (AviWriter finalizes its
    # container in close(); skipping one would silently drop that video)
    close_err = None
    for wtr in (writer, label_writer, color_writer):
        if wtr is None:
            continue
        try:
            wtr.close()
        except Exception as e:
            close_err = close_err or e
    if close_err is not None:
        raise close_err
    dt = time.time() - t0
    print(f"Save at {out_path}: {done} frames at {w}x{h}, "
          f"{done / dt:.1f} frames/sec end-to-end")
    return out_path


def _np_global(x):
    """Device array -> host numpy; on a pod the output shards live on
    other hosts, so gather them (every process participates)."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def _drain(item, writer, label_writer, color_writer, palette):
    out, n, cm = item
    arr = _np_global(out)  # blocks on device
    if cm is not None:
        cm = _np_global(cm)
    import jax

    if jax.process_index() != 0:
        return n  # container writing is a process-0 duty
    for i in range(n):
        writer.write(arr[i])
        if cm is not None and label_writer is not None:
            label_writer.write(np.stack([cm[i].astype(np.uint8)] * 3, -1))
        if cm is not None and color_writer is not None:
            color_writer.write(palette[np.clip(cm[i], 0, len(palette) - 1)])
    return n


if __name__ == "__main__":
    main()
