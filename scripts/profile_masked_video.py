"""Device-trace throughput of the AUTO-SEG video program (the in-graph
segment -> self/cross remap -> masked cWCT -> decode pipeline that
cli/video_transfer.py dispatches per batch). Reports device-plane ms/frame
— relay-RPC-proof, same methodology as profile_stylize.py.

Usage: python scripts/profile_masked_video.py [batch] [size] [fast[,segN]]
  fast: any third arg routes the bf16 fused masked program (composed
  video_remap + factored style statistics) instead of the f32 one.
  fast,seg256: additionally run the SEGMENTER at 256 max side (the
  --seg_size CLI knob; masks upsampled nearest).
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vstnet_tpu.config import PHOTO_CONFIG
from vstnet_tpu.models import cwct
from vstnet_tpu.models.remapping import (
    cross_remapping,
    load_label_mapping,
    self_remapping,
)
from vstnet_tpu.models.revresnet import decode, encode, init_revresnet
from vstnet_tpu.models.segformer import init_segformer, segment_mask


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    fast = len(sys.argv) > 3
    seg_half = len(sys.argv) > 3 and "half" in sys.argv[3]
    seg_size = 0
    if len(sys.argv) > 3:
        for part in sys.argv[3].split(","):
            if part.startswith("seg") and part[3:].isdigit():
                seg_size = int(part[3:])
    logdir = "/tmp/prof_masked_video"
    import shutil

    shutil.rmtree(logdir, ignore_errors=True)
    cfg = PHOTO_CONFIG
    params = init_revresnet(jax.random.PRNGKey(0), cfg)
    seg_params = init_segformer(jax.random.PRNGKey(1))
    mapping = load_label_mapping()
    rng = np.random.default_rng(0)

    style = jnp.asarray(rng.uniform(size=(1, size, size, 3)), jnp.float32)
    smask = self_remapping(
        segment_mask(seg_params, style), mapping, 0.02)

    if fast:
        from vstnet_tpu.models import revresnet_fast as rf
        from vstnet_tpu.models.remapping import (
            video_remap,
            video_remap_plan,
        )

        fp = rf.pack_revresnet(params, cfg, dtype=jnp.bfloat16)
        z_s_sp = rf.encode_fast(fp, style.astype(jnp.bfloat16), cfg)
        style_region = cwct.style_region_factors(z_s_sp, smask,
                                                 max_labels=32)
        remap_plan = video_remap_plan(smask, mapping)

        from vstnet_tpu.ops.resize import resize_bilinear

        @jax.jit
        def masked_batch(fp, seg_params, style_region, remap_plan, frames):
            labels_k, ns_k, mean_s_k, cov_s_k = style_region
            in_style, cross_tab = remap_plan
            seg_in = frames
            if seg_size and seg_size < size:
                seg_in = resize_bilinear(frames, seg_size, seg_size)
            cm = segment_mask(seg_params, seg_in, half=seg_half)
            cm = video_remap(cm, in_style, cross_tab, mapping, 0.02)
            if cm.shape[1:] != frames.shape[1:3]:
                cm = jax.image.resize(
                    cm, (cm.shape[0], *frames.shape[1:3]), method="nearest")
            z_c = rf.encode_fast(fp, frames.astype(jnp.bfloat16), cfg)
            z_cs = cwct.transfer_masked_factored(
                z_c, cm, labels_k, ns_k, mean_s_k, cov_s_k)
            out = rf.decode_fast(fp, z_cs.astype(jnp.bfloat16), cfg)
            out = out.astype(jnp.float32)
            return jnp.round(jnp.clip(out, 0, 1) * 255).astype(jnp.uint8)

        fn_args = (fp, seg_params, style_region, remap_plan)
    else:
        z_s = encode(params, style, cfg)

        @jax.jit
        def masked_batch(params, seg_params, z_s, smask, frames):
            cm = segment_mask(seg_params, frames)
            cm = self_remapping(cm, mapping, 0.02)
            sm_b = jnp.broadcast_to(smask,
                                    (frames.shape[0], *smask.shape[-2:]))
            cm = cross_remapping(cm, sm_b, mapping)
            z_c = encode(params, frames, cfg)
            z_ss = jnp.broadcast_to(z_s, (frames.shape[0], *z_s.shape[1:]))
            z_cs = cwct.transfer_masked(z_c, z_ss, cm, sm_b)
            out = decode(params, z_cs, cfg)
            return jnp.round(jnp.clip(out, 0, 1) * 255).astype(jnp.uint8)

        fn_args = (params, seg_params, z_s, smask)

    frames = jnp.asarray(rng.uniform(size=(batch, size, size, 3)),
                         jnp.float32)
    out = masked_batch(*fn_args, frames)
    _ = np.asarray(out[0, 0, :2, 0])

    n_iters = 3
    with jax.profiler.trace(logdir):
        for _ in range(n_iters):
            out = masked_batch(*fn_args, frames)
        _ = np.asarray(out[0, 0, :2, 0])

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    for f in glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                       recursive=True):
        xs = xplane_pb2.XSpace()
        with open(f, "rb") as fh:
            xs.ParseFromString(fh.read())
        for p in xs.planes:
            if "TPU" not in p.name:
                continue
            for ln in p.lines:
                if ln.name != "XLA Ops":
                    continue
                tot = sum(e.duration_ps for e in ln.events) / 1e12  # s
                per_frame = tot / (batch * n_iters)
                print(f"masked auto-seg video program: "
                      f"{per_frame*1e3:.2f} ms/frame device-side "
                      f"= {1.0/per_frame:.1f} fps/chip "
                      f"(B={batch} @{size}²)")


if __name__ == "__main__":
    main()
