"""Ultra-resolution stylization via bounded-memory spatial tiling.

The reference demos 4K stylization by running the whole image through the
network on a large-memory GPU (README.md:133-138); this environment's
single chip cannot compile a 4K program (the relay's AOT helper dies), and
a v5e-8 would rather shard it. This module is the single-chip path: process
the image as overlapping tiles so device memory and compile size stay
bounded at ANY resolution, in three mathematically-careful steps:

  1. style factors: whole style image encoded once (styles are small) ->
     (Ls, mu_s) via cwct.style_factors.
  2. streaming content statistics: encode each tile, accumulate the global
     latent mean/covariance from each tile's OWNED (non-overlapping) region
     — identical moments to the whole-image pass wherever the owned region
     sits in the tile's exact interior (the reversible net is fully
     convolutional; a pixel's latent is exact once the tile provides its
     receptive field).
  3. transform + decode per tile, raised-cosine blending across overlaps.

Exactness: with overlap >= the encode+decode receptive field the blended
regions combine bit-identical values and the result equals the whole-image
pipeline to float tolerance; with smaller overlaps the seams are blended
approximations (imperceptible in practice, tested PSNR-gated). Tiles are
all the same shape => exactly two compiled programs regardless of image
size. The multi-chip alternative (halo-exchange spatial sharding) lives in
parallel/spatial_sharded; this path needs only one chip.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from vstnet_tpu.config import RevResNetConfig
from vstnet_tpu.models import cwct
from vstnet_tpu.models.revresnet import decode, encode


def receptive_field(cfg: RevResNetConfig) -> int:
    """One-sided receptive field (pixels) of encode (== decode): each
    3x3 conv adds 1 px at its stage's scale; 3 convs per block."""
    rf = 0
    scale = 1
    for n, stride in zip(cfg.n_blocks, cfg.strides):
        scale *= stride
        rf += 3 * n * scale
    rf += 3 * 2 * scale  # channel-reduction blocks
    return rf


def _starts(total: int, tile: int, stride: int):
    """Tile start offsets covering [0, total) with the last tile flush
    against the edge (so true image borders get true reflection
    semantics, not reflections of padded content)."""
    if total <= tile:
        return [0]
    s = list(range(0, total - tile, stride))
    s.append(total - tile)
    return s


def _ramp(n: int, overlap: int, lo_edge: bool, hi_edge: bool):
    """1D blending weights: 1 in the interior, raised-cosine over the
    overlap margins; image-edge sides stay at 1."""
    w = np.ones(n, np.float32)
    r = 0.5 - 0.5 * np.cos(np.linspace(0.0, np.pi, overlap + 2)[1:-1])
    if not lo_edge:
        w[:overlap] = r
    if not hi_edge:
        w[n - overlap:] = r[::-1]
    return w


@partial(jax.jit, static_argnames=("cfg",))
def _tile_moments(params, tile_img, own_mask, cfg: RevResNetConfig):
    """Encode one tile; masked latent moments over the owned region.
    own_mask: (h_lat, w_lat) f32 in {0,1}. Returns (n, s1 (C,), s2 (C,C))."""
    z = encode(params, tile_img, cfg)[0].astype(jnp.float32)
    zm = z * own_mask[..., None]
    n = jnp.sum(own_mask)
    s1 = jnp.sum(zm, axis=(0, 1))
    s2 = jnp.einsum("hwc,hwd->cd", zm, z,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    return n, s1, s2


@partial(jax.jit, static_argnames=("cfg",))
def _tile_stylize(params, tile_img, t, b, cfg: RevResNetConfig):
    z = encode(params, tile_img, cfg)
    return decode(params, cwct.apply_transform(z, t, b), cfg)


def stylize_tiled(params, content, style, cfg: RevResNetConfig,
                  tile: int = 1024, overlap: int = 128,
                  eps: float = cwct.EPS_DEFAULT):
    """Global-cWCT stylization of an arbitrarily large content image.

    content: (1, H, W, 3) NHWC (H, W multiples of cfg.down_scale);
    style: (1, Hs, Ws, 3) encoded whole. Returns (1, H, W, 3) raw decoder
    output (research semantics; caller clamps).
    """
    _, h, w, _ = content.shape
    ds = cfg.down_scale
    if h % ds or w % ds:
        raise ValueError(f"content dims must be multiples of {ds}")
    tile = min(tile, max(h, w))
    tile = max(tile - tile % ds, ds)
    overlap = max(overlap - overlap % ds, ds)
    th = min(tile, h)
    tw = min(tile, w)
    stride_h = max(th - 2 * overlap, ds)
    stride_w = max(tw - 2 * overlap, ds)

    ls, mu_s = cwct.style_factors(
        encode(params, style, cfg).astype(jnp.float32), eps)
    ls, mu_s = ls[0], mu_s[0]

    ys = _starts(h, th, stride_h)
    xs = _starts(w, tw, stride_w)
    sc = cfg.latent_scale

    # pass 1: streaming latent moments (each latent pixel owned by exactly
    # one tile; ownership splits at overlap midpoints)
    n_tot = jnp.zeros((), jnp.float32)
    s1_tot = jnp.zeros((cfg.latent_channels,), jnp.float32)
    s2_tot = jnp.zeros((cfg.latent_channels,) * 2, jnp.float32)
    content_np = content  # device array; slices below are device slices
    for iy, y0 in enumerate(ys):
        for ix, x0 in enumerate(xs):
            t_img = jax.lax.dynamic_slice(
                content_np, (0, y0, x0, 0), (1, th, tw, 3))
            own = np.zeros((th // sc, tw // sc), np.float32)
            oy0 = 0 if iy == 0 else (overlap // sc)
            oy1 = th // sc if iy == len(ys) - 1 else (
                (ys[iy + 1] - y0) // sc + overlap // sc)
            ox0 = 0 if ix == 0 else (overlap // sc)
            ox1 = tw // sc if ix == len(xs) - 1 else (
                (xs[ix + 1] - x0) // sc + overlap // sc)
            # clip against previous tile's ownership upper bound
            own[oy0:oy1, ox0:ox1] = 1.0
            n, s1, s2 = _tile_moments(params, t_img, jnp.asarray(own), cfg)
            n_tot = n_tot + n
            s1_tot = s1_tot + s1
            s2_tot = s2_tot + s2

    mean_c = s1_tot / n_tot
    cov_c = (s2_tot - n_tot * jnp.outer(mean_c, mean_c)) / (n_tot - 1.0)
    t_mat, b_vec = cwct.transform_from_stats(mean_c, cov_c, ls, mu_s, eps)

    # pass 2: transform + decode + blend. The accumulators live ON DEVICE
    # (per-tile f32 readbacks dominated 4K wall time through slow host
    # links; only the final image crosses to the host — PERF.md).
    out = jnp.zeros((h, w, 3), jnp.float32)
    wsum = jnp.zeros((h, w, 1), jnp.float32)
    for iy, y0 in enumerate(ys):
        wy = jnp.asarray(_ramp(th, overlap, y0 == 0, y0 + th == h))
        for ix, x0 in enumerate(xs):
            t_img = jax.lax.dynamic_slice(
                content_np, (0, y0, x0, 0), (1, th, tw, 3))
            o = _tile_stylize(params, t_img, t_mat, b_vec, cfg)[0]
            wx = jnp.asarray(_ramp(tw, overlap, x0 == 0, x0 + tw == w))
            wt = (wy[:, None] * wx[None, :])[..., None]
            out = out.at[y0:y0 + th, x0:x0 + tw].add(
                o.astype(jnp.float32) * wt)
            wsum = wsum.at[y0:y0 + th, x0:x0 + tw].add(wt)
    return (out / wsum)[None]


def ownership_check(h: int, w: int, cfg, tile: int, overlap: int) -> bool:
    """Debug helper: verify every latent pixel is owned exactly once."""
    ds = cfg.down_scale
    tile = max(min(tile, max(h, w)) - min(tile, max(h, w)) % ds, ds)
    th, tw = min(tile, h), min(tile, w)
    overlap = max(overlap - overlap % ds, ds)
    sh, sw = max(th - 2 * overlap, ds), max(tw - 2 * overlap, ds)
    sc = cfg.latent_scale
    cover = np.zeros((h // sc, w // sc), np.int32)
    ys, xs = _starts(h, th, sh), _starts(w, tw, sw)
    for iy, y0 in enumerate(ys):
        for ix, x0 in enumerate(xs):
            oy0 = 0 if iy == 0 else overlap // sc
            oy1 = th // sc if iy == len(ys) - 1 else (
                (ys[iy + 1] - y0) // sc + overlap // sc)
            ox0 = 0 if ix == 0 else overlap // sc
            ox1 = tw // sc if ix == len(xs) - 1 else (
                (xs[ix + 1] - x0) // sc + overlap // sc)
            cover[y0 // sc + oy0:y0 // sc + oy1,
                  x0 // sc + ox0:x0 // sc + ox1] += 1
    return bool((cover == 1).all())
