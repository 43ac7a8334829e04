"""Training losses and the fused train step.

Reproduces the loss structure of the reference trainer
(/root/reference/train.py:120-201):

  total = content_weight * L_content + style_weight * L_style
        + rec_weight * L_cycle + temporal_weight * L_temporal
  plus the Matting-Laplacian gradient INJECTED directly into d(stylized)
  (train.py:164-177: scaled by lap_weight, clamped to ±0.05, then
  stylized.backward(grad)) — here expressed as a second cotangent in one
  jax.vjp call, so the whole step is a single fused XLA program.

The reversible network runs 5 passes per step exactly like the reference
(encode a, encode b, decode, re-encode stylized, decode cycle).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from vstnet_tpu.config import RevResNetConfig
from vstnet_tpu.models import cwct
from vstnet_tpu.models.revresnet import decode, encode
from vstnet_tpu.models.vgg import vgg_losses
from vstnet_tpu.ops.matting import matting_loss_and_grad
from vstnet_tpu.ops.warp import flow_warp_nearest


@dataclasses.dataclass(frozen=True)
class LossWeights:
    """Defaults match train.py:31-41."""

    style: float = 1.0
    content: float = 0.0
    lap: float = 1500.0
    rec: float = 10.0
    temporal: float = 60.0
    lap_clamp: float = 0.05
    noise_level: float = 0.001


def _forward_losses(params, vgg_params, images_a, images_b, cfg,
                    weights: LossWeights, flow, noise,
                    temporal_phase: bool):
    """Returns ((total_loss, stylized), aux_dict)."""
    z_c = encode(params, images_a, cfg)
    z_s = encode(params, images_b, cfg)
    z_cs = cwct.transfer(z_c, z_s)
    stylized = decode(params, z_cs, cfg)

    loss_c, loss_s = vgg_losses(
        vgg_params, images_a, images_b, stylized,
        n_layer=4, content_weight=weights.content,
    )

    if weights.rec > 0:
        z_cs2 = encode(params, stylized, cfg)
        z_csc = cwct.transfer(z_cs2, z_c)
        rec = decode(params, z_csc, cfg)
        loss_rec = jnp.mean(jnp.abs(rec - images_a))
    else:
        loss_rec = jnp.asarray(0.0)

    if temporal_phase:
        # Fake second frame: warp + gaussian noise
        # (TemporalLoss.GenerateFakeData, utils/TemporalLoss.py:78-94).
        second = flow_warp_nearest(images_a, flow) + noise
        z_c2 = encode(params, second, cfg)
        z_cs2t = cwct.transfer(z_c2, z_s)
        stylized2 = decode(params, z_cs2t, cfg)
        warped1 = flow_warp_nearest(stylized, flow)
        loss_tmp = jnp.mean(jnp.abs(warped1 - stylized2))
        warped_a = flow_warp_nearest(images_a, flow)
        loss_tmp_gt = jnp.mean(jnp.abs(warped_a - second))
    else:
        loss_tmp = jnp.asarray(0.0)
        loss_tmp_gt = jnp.asarray(0.0)

    total = (
        weights.content * loss_c
        + weights.style * loss_s
        + weights.rec * loss_rec
        + weights.temporal * loss_tmp
    )
    aux = {
        "loss_c": loss_c,
        "loss_s": loss_s,
        "loss_rec": loss_rec,
        "loss_tmp": loss_tmp,
        "loss_tmp_gt": loss_tmp_gt,
    }
    return (total, stylized), aux


@partial(jax.jit, static_argnames=("cfg", "weights", "temporal_phase"))
def loss_and_grads(params, vgg_params, images_a, images_b, flow, noise,
                   cfg: RevResNetConfig, weights: LossWeights,
                   temporal_phase: bool = False):
    """One fused forward+backward: returns (grads, aux).

    The Laplacian term enters as a direct cotangent on `stylized`
    (clamped, scaled), reproducing train.py's grad injection without a
    second backward pass.
    """
    (outs, vjp_fn, aux) = jax.vjp(
        lambda p: _forward_losses(p, vgg_params, images_a, images_b, cfg,
                                  weights, flow, noise, temporal_phase),
        params,
        has_aux=True,
    )
    total, stylized = outs

    if weights.lap > 0:
        lap_per_sample, lap_grad = matting_loss_and_grad(images_a, stylized)
        lap_cotangent = jnp.clip(
            lap_grad * weights.lap, -weights.lap_clamp, weights.lap_clamp
        )
        aux = dict(aux, loss_lap=jnp.mean(lap_per_sample))
    else:
        lap_cotangent = jnp.zeros_like(stylized)
        aux = dict(aux, loss_lap=jnp.asarray(0.0))

    (grads,) = vjp_fn((jnp.asarray(1.0, total.dtype), lap_cotangent))
    aux["loss_total"] = total
    return grads, aux


AUX_KEYS = ("loss_c", "loss_s", "loss_rec", "loss_tmp", "loss_tmp_gt",
            "loss_lap", "loss_total")


def loss_and_grads_flat(flat_params, unravel, vgg_params, images_a,
                        images_b, flow, noise, cfg: RevResNetConfig,
                        weights: LossWeights, temporal_phase: bool = False,
                        compute_dtype=None):
    """loss_and_grads against a single raveled parameter vector.

    Returns (flat_grads (N,), aux_stack (len(AUX_KEYS),)). One gradient
    buffer instead of ~100 tree leaves: jit outputs cost per-buffer
    dispatch overhead on some PJRT transports (measured ~30-55 ms/buffer
    through the axon relay — PERF.md), and a flat master buffer is also
    the natural layout for fused optimizer updates and data-parallel
    gradient all-reduces.

    compute_dtype=jnp.bfloat16 runs the forward/backward in bf16 mixed
    precision: the flat master stays f32 (the cast's vjp accumulates
    gradients back to f32), activations/convs run single-pass MXU bf16;
    cWCT statistics/Cholesky and the matting regularizer keep their f32
    internals. Default (None) is the reference's full-f32 semantics.
    """
    def fwd(fp):
        p = unravel(fp)
        if compute_dtype is not None:
            p = jax.tree.map(lambda a: a.astype(compute_dtype), p)
            return _forward_losses(
                p, vgg_params, images_a.astype(compute_dtype),
                images_b.astype(compute_dtype), cfg, weights,
                flow, noise, temporal_phase)
        return _forward_losses(
            p, vgg_params, images_a, images_b, cfg, weights, flow,
            noise, temporal_phase)

    (outs, vjp_fn, aux) = jax.vjp(fwd, flat_params, has_aux=True)
    total, stylized = outs

    if weights.lap > 0:
        lap_per_sample, lap_grad = matting_loss_and_grad(images_a, stylized)
        lap_cotangent = jnp.clip(
            lap_grad * weights.lap, -weights.lap_clamp, weights.lap_clamp
        )
        aux = dict(aux, loss_lap=jnp.mean(lap_per_sample))
    else:
        lap_cotangent = jnp.zeros_like(stylized)
        aux = dict(aux, loss_lap=jnp.asarray(0.0))

    (flat_grads,) = vjp_fn((jnp.asarray(1.0, total.dtype),
                            lap_cotangent.astype(stylized.dtype)))
    aux["loss_total"] = total
    aux_stack = jnp.stack([jnp.asarray(aux[k], jnp.float32)
                           for k in AUX_KEYS])
    return flat_grads, aux_stack
