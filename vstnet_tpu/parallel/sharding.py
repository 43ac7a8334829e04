"""Sharded entry points: data-parallel stylization and training, spatial
sharding for ultra-resolution.

Design: annotate shardings on jit boundaries and let XLA GSPMD insert the
collectives (all-reduce for data-parallel grads, halo exchanges for
spatially-partitioned 3x3 convs, psums for the cWCT covariance over a
sharded pixel axis). No hand-written NCCL-style code — this is the
TPU-idiomatic replacement for the distributed layer the reference lacks.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vstnet_tpu.config import RevResNetConfig
from vstnet_tpu.models import cwct
from vstnet_tpu.models.revresnet import decode, encode


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    """NHWC batch axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def spatial_sharded(mesh: Mesh) -> NamedSharding:
    """NHWC: batch over 'data', H over 'spatial' (2D mesh)."""
    return NamedSharding(mesh, P("data", "spatial"))


def shard_batch(mesh: Mesh, x, spatial: bool = False):
    """Place a host array with batch (and optionally H) sharded."""
    sh = spatial_sharded(mesh) if spatial else batch_sharded(mesh)
    return jax.device_put(x, sh)


# ---------------------------------------------------------------------------
# Data-parallel inference
# ---------------------------------------------------------------------------

def parallel_stylize(mesh: Mesh, cfg: RevResNetConfig, spatial: bool = False):
    """Compiled stylize(params, content, style) with the batch sharded over
    'data' (and rows over 'spatial' when a 2D mesh is given). Params are
    replicated. The style batch must match the content batch (tile the
    style, or use cwct.style_factors for one-style-many-frames)."""
    data_sh = spatial_sharded(mesh) if spatial else batch_sharded(mesh)

    @partial(jax.jit,
             in_shardings=(replicated(mesh), data_sh, data_sh),
             out_shardings=data_sh)
    def fn(params, content, style):
        z_c = encode(params, content, cfg)
        z_s = encode(params, style, cfg)
        z_cs = cwct.transfer(z_c, z_s)
        return decode(params, z_cs, cfg)

    return fn


def parallel_stylize_factored(mesh: Mesh, cfg: RevResNetConfig,
                              spatial: bool = False):
    """Video fast path: frames sharded over 'data', one precomputed style
    factor broadcast everywhere."""
    data_sh = spatial_sharded(mesh) if spatial else batch_sharded(mesh)
    rep = replicated(mesh)

    @partial(jax.jit,
             in_shardings=(rep, data_sh, rep, rep),
             out_shardings=data_sh)
    def fn(params, frames, ls, mu_s):
        z_c = encode(params, frames, cfg)
        z_cs = cwct.transfer_with_factors(z_c, ls, mu_s)
        return jnp.clip(decode(params, z_cs, cfg), 0.0, 1.0)

    return fn


# ---------------------------------------------------------------------------
# Data-parallel FUSED inference (the north-star composition: the bf16 flat
# Pallas path x all chips. Frames are embarrassingly parallel — SURVEY §3.2 —
# so the program has ZERO collectives: each device runs the fused kernels on
# its local frame shard against replicated weights/style factors. shard_map
# (not bare GSPMD annotations) because XLA cannot partition a pallas_call
# custom-call; per-device batch shards keep the kernel grid untouched.)
# ---------------------------------------------------------------------------

def parallel_stylize_fused(mesh: Mesh, cfg: RevResNetConfig,
                           out_u8: bool = False, interp: bool = False):
    """Compiled stylize(fast_params, frames, ls, mu_s) with frames sharded
    over 'data' and the fused flat-Pallas encode/decode + packed-latent
    cWCT running per-shard (models/revresnet_fast.py; the workload of the
    reference frame loop, /root/reference/video_transfer.py:160-214).

    fast_params: pack_revresnet(..., dtype=bf16) pytree, replicated.
    ls/mu_s: one precomputed style factor (batch 1), replicated.
    frames: (B, H, W, 3) float in [0,1]; B must divide by the data axis.
    out_u8=True packs the output to uint8 on-device (4x less readback).
    interp=True: the returned fn takes a trailing TRACED alpha_c scalar
    and runs the content-blend interpolation (cWCT.py:206-262 semantics)
    via cwct.interp_with_factors_packed — the --alpha_c video path."""
    from vstnet_tpu.models.pipeline import make_fused_video_fn

    local_fn = make_fused_video_fn(cfg, out_u8=out_u8, interp=interp)

    specs = (P(), P("data"), P(), P()) + ((P(),) if interp else ())
    sharded = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=specs,
        out_specs=P("data"),
        check_vma=False,  # pallas_call has no replication rule
    )
    return jax.jit(sharded)


def parallel_stylize_masked_fused(mesh: Mesh, cfg: RevResNetConfig,
                                  min_ratio: float = 0.02,
                                  out_u8: bool = False,
                                  seg_hw=None, seg_half: bool = True):
    """The masked (auto-seg) video program over all chips: frames sharded
    on 'data'; segmenter weights, the remap tables, and the per-label
    style statistics (cwct.style_region_factors — computed once per
    video) replicated. Per-frame segment -> composed video_remap ->
    fused bf16 encode -> content-side regional cWCT -> fused decode, all
    in ONE program per shard with zero collectives (frames are
    independent — SURVEY §3.2). The multi-chip form of the per-frame
    auto-seg flow at /root/reference/video_transfer.py:163-184.

    Returns fn(fast_params, seg_params, mapping, style_region,
    remap_plan, frames) -> (stylized, content_masks).

    seg_hw=(sh, sw): run the segmenter on bilinear-downscaled frames (the
    reference itself caps the segmenter input, segment.py:477-479; region
    statistics are insensitive to boundary-pixel precision). The returned
    masks are upsampled back to frame resolution (nearest)."""
    from vstnet_tpu.models.pipeline import make_masked_fused_video_fn

    local_fn = make_masked_fused_video_fn(cfg, min_ratio=min_ratio,
                                          out_u8=out_u8, seg_hw=seg_hw,
                                          seg_half=seg_half)

    sharded = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P("data")),
        out_specs=(P("data"), P("data")),
        check_vma=False,  # pallas_call has no replication rule
    )
    return jax.jit(sharded)


# ---------------------------------------------------------------------------
# Data-parallel training
# ---------------------------------------------------------------------------

def make_parallel_train_step(mesh: Mesh, opt, cfg: RevResNetConfig, weights,
                             spatial: bool = False,
                             temporal_phase: bool = False):
    """Full training step sharded over the mesh: batch split on 'data'
    (optionally rows on 'spatial'), params/optimizer state replicated;
    XLA all-reduces the gradients.

    Returns step(params, opt_state, vgg_params, a, b, flow, noise)
    -> (params, opt_state, aux).
    """
    import optax

    from vstnet_tpu.train.losses import loss_and_grads

    data_sh = spatial_sharded(mesh) if spatial else batch_sharded(mesh)
    rep = replicated(mesh)
    flow_sh = data_sh

    @partial(
        jax.jit,
        in_shardings=(rep, rep, rep, data_sh, data_sh, flow_sh, data_sh),
        out_shardings=(rep, rep, rep),
        donate_argnums=(0, 1),
    )
    def step(params, opt_state, vgg_params, a, b, flow, noise):
        grads, aux = loss_and_grads(
            params, vgg_params, a, b, flow, noise, cfg, weights,
            temporal_phase,
        )
        updates, opt_state2 = opt.update(grads, opt_state, params)
        params2 = optax.apply_updates(params, updates)
        return params2, opt_state2, aux

    return step


def make_parallel_flat_step(mesh: Mesh, opt, cfg: RevResNetConfig, weights,
                            unravel, spatial: bool = False,
                            temporal_phase: bool = False,
                            compute_dtype=None):
    """The flat-buffer production step (train/trainer.py:make_flat_step)
    over a device mesh: batch sharded on 'data' (optionally rows on
    'spatial'), the single raveled master vector and optimizer moments
    replicated. GSPMD reduces the whole gradient as ONE fused all-reduce
    over the flat vector — the ideal ICI collective shape (vs ~100
    per-leaf reductions for a tree step).

    Signature-compatible with make_flat_step so the trainer can swap
    steps: returns step(flat, opt_state, vgg_params, a, b, flow, noise,
    temporal_phase=...) -> (flat', opt_state', aux_stack). The
    constructor-level temporal_phase sets the default; compute_dtype =
    jnp.bfloat16 gives the mixed-precision step (f32 master vector,
    bf16 convs).
    """
    import optax

    from vstnet_tpu.train.losses import loss_and_grads_flat

    data_sh = spatial_sharded(mesh) if spatial else batch_sharded(mesh)
    rep = replicated(mesh)
    default_temporal = temporal_phase

    # temporal_phase is a positional static arg (pjit rejects kwargs when
    # in_shardings is given)
    @partial(
        jax.jit,
        static_argnums=(7,),
        in_shardings=(rep, rep, rep, data_sh, data_sh, data_sh, data_sh),
        out_shardings=(rep, rep, rep),
        donate_argnums=(0, 1),
    )
    def step(flat, opt_state, vgg_params, a, b, flow, noise,
             temporal_phase=default_temporal):
        grads, aux_stack = loss_and_grads_flat(
            flat, unravel, vgg_params, a, b, flow, noise, cfg, weights,
            temporal_phase, compute_dtype=compute_dtype)
        updates, opt_state = opt.update(grads, opt_state, flat)
        return optax.apply_updates(flat, updates), opt_state, aux_stack

    return step
