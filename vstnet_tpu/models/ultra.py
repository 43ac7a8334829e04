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


def _enc(weights, x, cfg, fast: bool):
    """Tile encode: f32 reference path, or the fused bf16 flat-Pallas path
    (weights = pack_revresnet(..., bf16)); latent returned f32 either way
    (statistics/Cholesky stay f32 — cwct module contract)."""
    if fast:
        from vstnet_tpu.models import revresnet_fast as rf

        return rf.encode_fast(weights, x.astype(jnp.bfloat16), cfg).astype(
            jnp.float32)
    return encode(weights, x, cfg)


def _dec(weights, z, cfg, fast: bool):
    if fast:
        from vstnet_tpu.models import revresnet_fast as rf

        return rf.decode_fast(weights, z.astype(jnp.bfloat16), cfg).astype(
            jnp.float32)
    return decode(weights, z, cfg)


@partial(jax.jit, static_argnames=("cfg", "fast"))
def _tile_moments(weights, tile_img, own_mask, cfg: RevResNetConfig,
                  fast: bool = False):
    """Encode one tile; masked latent moments over the owned region.
    own_mask: (h_lat, w_lat) f32 in {0,1}. Returns (n, s1 (C,), s2 (C,C))."""
    z = _enc(weights, tile_img, cfg, fast)[0].astype(jnp.float32)
    zm = z * own_mask[..., None]
    n = jnp.sum(own_mask)
    s1 = jnp.sum(zm, axis=(0, 1))
    s2 = jnp.einsum("hwc,hwd->cd", zm, z,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    return n, s1, s2


@partial(jax.jit, static_argnames=("cfg", "fast"))
def _tile_stylize(weights, tile_img, t, b, cfg: RevResNetConfig,
                  fast: bool = False):
    z = _enc(weights, tile_img, cfg, fast)
    return _dec(weights, cwct.apply_transform(z, t, b), cfg, fast)


@partial(jax.jit, static_argnames=("cfg", "fast"))
def _tile_moments_masked(weights, tile_img, own_mask, mask_lat, labels,
                         cfg: RevResNetConfig, fast: bool = False):
    """Per-label raw moments over the tile's OWNED region: non-owned
    pixels take label -2 (matches nothing), then one chunked-scan pass
    (cwct.region_moments) — bounded footprint at any tile size."""
    z = _enc(weights, tile_img, cfg, fast)[0].astype(jnp.float32)
    x = z.reshape(-1, z.shape[-1])
    m = jnp.where(own_mask.reshape(-1) > 0, mask_lat.reshape(-1), -2)
    return cwct.region_moments(x, m.astype(jnp.int32), labels)


@partial(jax.jit, static_argnames=("cfg", "fast"))
def _tile_stylize_masked(weights, tile_img, mask_lat, labels, ts, bs,
                         valids, cfg: RevResNetConfig, fast: bool = False):
    z = _enc(weights, tile_img, cfg, fast)
    sh = z.shape
    x = z[0].reshape(-1, sh[-1]).astype(jnp.float32)
    y = cwct.apply_regions(x, mask_lat.reshape(-1).astype(jnp.int32),
                           labels, ts, bs, valids)
    return _dec(weights, y.reshape(sh).astype(z.dtype), cfg, fast)


class _TileGrid:
    """Tile geometry shared by every tiled variant: starts, ownership
    bounds (each latent pixel owned by exactly ONE tile; splits at overlap
    midpoints), and blending ramps."""

    def __init__(self, h, w, cfg, tile, overlap):
        ds = cfg.down_scale
        if h % ds or w % ds:
            raise ValueError(f"content dims must be multiples of {ds}")
        tile = min(tile, max(h, w))
        tile = max(tile - tile % ds, ds)
        self.overlap = max(overlap - overlap % ds, ds)
        self.th = min(tile, h)
        self.tw = min(tile, w)
        stride_h = max(self.th - 2 * self.overlap, ds)
        stride_w = max(self.tw - 2 * self.overlap, ds)
        self.h, self.w = h, w
        self.ys = _starts(h, self.th, stride_h)
        self.xs = _starts(w, self.tw, stride_w)
        self.sc = cfg.latent_scale

    def tiles(self):
        for iy, y0 in enumerate(self.ys):
            for ix, x0 in enumerate(self.xs):
                yield iy, y0, ix, x0

    def own_mask(self, iy, y0, ix, x0):
        sc, ov = self.sc, self.overlap
        own = np.zeros((self.th // sc, self.tw // sc), np.float32)
        oy0 = 0 if iy == 0 else (ov // sc)
        oy1 = self.th // sc if iy == len(self.ys) - 1 else (
            (self.ys[iy + 1] - y0) // sc + ov // sc)
        ox0 = 0 if ix == 0 else (ov // sc)
        ox1 = self.tw // sc if ix == len(self.xs) - 1 else (
            (self.xs[ix + 1] - x0) // sc + ov // sc)
        own[oy0:oy1, ox0:ox1] = 1.0
        return own

    def blend(self, out, wsum, o, y0, x0):
        wy = jnp.asarray(_ramp(self.th, self.overlap, y0 == 0,
                               y0 + self.th == self.h))
        wx = jnp.asarray(_ramp(self.tw, self.overlap, x0 == 0,
                               x0 + self.tw == self.w))
        wt = (wy[:, None] * wx[None, :])[..., None]
        out = out.at[y0:y0 + self.th, x0:x0 + self.tw].add(
            o.astype(jnp.float32) * wt)
        wsum = wsum.at[y0:y0 + self.th, x0:x0 + self.tw].add(wt)
        return out, wsum


def _pick_weights(params, fast_params):
    return (fast_params, True) if fast_params is not None else (params, False)


def stylize_tiled(params, content, style, cfg: RevResNetConfig,
                  tile: int = 1024, overlap: int = 128,
                  eps: float = cwct.EPS_DEFAULT, fast_params=None):
    """Global-cWCT stylization of an arbitrarily large content image.

    content: (1, H, W, 3) NHWC (H, W multiples of cfg.down_scale);
    style: (1, Hs, Ws, 3) encoded whole. Returns (1, H, W, 3) raw decoder
    output (research semantics; caller clamps). fast_params routes tile
    encode/decode through the fused bf16 flat-Pallas path (statistics
    stay f32).
    """
    _, h, w, _ = content.shape
    g = _TileGrid(h, w, cfg, tile, overlap)
    weights, fast = _pick_weights(params, fast_params)

    ls, mu_s = cwct.style_factors(
        _enc(weights, style, cfg, fast).astype(jnp.float32), eps)
    ls, mu_s = ls[0], mu_s[0]

    # pass 1: streaming latent moments over owned regions
    n_tot = jnp.zeros((), jnp.float32)
    s1_tot = jnp.zeros((cfg.latent_channels,), jnp.float32)
    s2_tot = jnp.zeros((cfg.latent_channels,) * 2, jnp.float32)
    for iy, y0, ix, x0 in g.tiles():
        t_img = jax.lax.dynamic_slice(
            content, (0, y0, x0, 0), (1, g.th, g.tw, 3))
        own = g.own_mask(iy, y0, ix, x0)
        n, s1, s2 = _tile_moments(weights, t_img, jnp.asarray(own), cfg,
                                  fast)
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
    for _, y0, _, x0 in g.tiles():
        t_img = jax.lax.dynamic_slice(
            content, (0, y0, x0, 0), (1, g.th, g.tw, 3))
        o = _tile_stylize(weights, t_img, t_mat, b_vec, cfg, fast)[0]
        out, wsum = g.blend(out, wsum, o, y0, x0)
    return (out / wsum)[None]


def stylize_tiled_masked(params, content, style, cmask, smask,
                         cfg: RevResNetConfig, tile: int = 1024,
                         overlap: int = 128, max_labels: int = 32,
                         eps: float = cwct.EPS_DEFAULT,
                         min_pixels: float = cwct.MIN_PIXELS,
                         max_ratio: float = cwct.MAX_RATIO_RESEARCH,
                         fast_params=None):
    """Regional (semantic-mask) stylization of an arbitrarily large image:
    the reference's first-class ultra-res mode with segmentation
    (README.md:133-138 + cWCT._transfer_seg, models/cWCT.py:49-109), as a
    bounded-memory streaming computation.

    Pass 1 accumulates PER-LABEL latent moments across tiles (each latent
    pixel owned by exactly one tile; cwct.region_moments chunked scan);
    the per-label transforms then come from exactly the same statistics as
    a whole-image masked transfer. Pass 2 applies the per-region
    transforms tile by tile with raised-cosine seam blending.

    cmask: (1, H, W) int labels at content resolution; smask (1, Hs, Ws).
    """
    _, h, w, _ = content.shape
    g = _TileGrid(h, w, cfg, tile, overlap)
    weights, fast = _pick_weights(params, fast_params)
    sc = g.sc

    labels = jnp.unique(
        jnp.asarray(cmask).reshape(-1), size=max_labels,
        fill_value=jnp.int32(-1)).astype(jnp.int32)

    # full-image masks at latent resolution (nearest)
    cm_lat = jax.image.resize(
        jnp.asarray(cmask)[0], (h // sc, w // sc), method="nearest"
    ).astype(jnp.int32)

    # style stats: style images are small — encode whole, one pass
    z_s = _enc(weights, style, cfg, fast)[0].astype(jnp.float32)
    sm_lat = jax.image.resize(
        jnp.asarray(smask)[0], z_s.shape[:2], method="nearest"
    ).astype(jnp.int32)
    ns, mean_s, cov_s = cwct.stats_from_moments(*cwct.region_moments(
        z_s.reshape(-1, z_s.shape[-1]), sm_lat.reshape(-1), labels))

    # pass 1: streaming per-label content moments over owned regions
    k = labels.shape[0]
    c = cfg.latent_channels
    cnt = jnp.zeros((k,), jnp.float32)
    sm_tot = jnp.zeros((k, c), jnp.float32)
    gm_tot = jnp.zeros((k, c, c), jnp.float32)
    for iy, y0, ix, x0 in g.tiles():
        t_img = jax.lax.dynamic_slice(
            content, (0, y0, x0, 0), (1, g.th, g.tw, 3))
        m_tile = jax.lax.dynamic_slice(
            cm_lat, (y0 // sc, x0 // sc), (g.th // sc, g.tw // sc))
        own = jnp.asarray(g.own_mask(iy, y0, ix, x0))
        n1, s1, g1 = _tile_moments_masked(weights, t_img, own, m_tile,
                                          labels, cfg, fast)
        cnt, sm_tot, gm_tot = cnt + n1, sm_tot + s1, gm_tot + g1

    nc, mean_c, cov_c = cwct.stats_from_moments(cnt, sm_tot, gm_tot)
    ts, bs, valids = cwct.region_transforms(
        labels, nc, mean_c, cov_c, ns, mean_s, cov_s, eps,
        float(min_pixels), max_ratio)

    # pass 2: per-region transform + decode + blend
    out = jnp.zeros((h, w, 3), jnp.float32)
    wsum = jnp.zeros((h, w, 1), jnp.float32)
    for _, y0, _, x0 in g.tiles():
        t_img = jax.lax.dynamic_slice(
            content, (0, y0, x0, 0), (1, g.th, g.tw, 3))
        m_tile = jax.lax.dynamic_slice(
            cm_lat, (y0 // sc, x0 // sc), (g.th // sc, g.tw // sc))
        o = _tile_stylize_masked(weights, t_img, m_tile, labels, ts, bs,
                                 valids, cfg, fast)[0]
        out, wsum = g.blend(out, wsum, o, y0, x0)
    return (out / wsum)[None]


def stylize_tiled_interp(params, content, styles, alpha_s,
                         cfg: RevResNetConfig, alpha_c: float = 0.0,
                         tile: int = 1024, overlap: int = 128,
                         eps: float = cwct.EPS_DEFAULT, fast_params=None):
    """Style interpolation (+ alpha_c content blend) at ultra resolution:
    mix_Ls = sum_i alpha_i Ls_i blended with Lc by alpha_c
    (cWCT.interpolation semantics, models/cWCT.py:206-262) applied through
    the streaming tiler — one global transform, so only the content
    statistics stream.

    styles: list of (1, Hs, Ws, 3) images; alpha_s: (S,) weights.
    """
    _, h, w, _ = content.shape
    g = _TileGrid(h, w, cfg, tile, overlap)
    weights, fast = _pick_weights(params, fast_params)

    ls_list, mu_list = [], []
    for s_img in styles:
        l, m = cwct.style_factors(
            _enc(weights, s_img, cfg, fast).astype(jnp.float32), eps)
        ls_list.append(l[0])
        mu_list.append(m[0])
    alpha_s = jnp.asarray(alpha_s, jnp.float32)
    mix_ls = sum(a * l for a, l in zip(alpha_s, ls_list))
    mix_mu = sum(a * m for a, m in zip(alpha_s, mu_list))

    n_tot = jnp.zeros((), jnp.float32)
    s1_tot = jnp.zeros((cfg.latent_channels,), jnp.float32)
    s2_tot = jnp.zeros((cfg.latent_channels,) * 2, jnp.float32)
    for iy, y0, ix, x0 in g.tiles():
        t_img = jax.lax.dynamic_slice(
            content, (0, y0, x0, 0), (1, g.th, g.tw, 3))
        own = g.own_mask(iy, y0, ix, x0)
        n, s1, s2 = _tile_moments(weights, t_img, jnp.asarray(own), cfg,
                                  fast)
        n_tot, s1_tot, s2_tot = n_tot + n, s1_tot + s1, s2_tot + s2

    mean_c = s1_tot / n_tot
    cov_c = (s2_tot - n_tot * jnp.outer(mean_c, mean_c)) / (n_tot - 1.0)
    lc = cwct.robust_cholesky(cov_c, eps)
    mix_ls = mix_ls * (1.0 - alpha_c) + lc * alpha_c
    mix_mu = mix_mu * (1.0 - alpha_c) + mean_c * alpha_c
    t_mat, b_vec = cwct.transform_from_stats(mean_c, cov_c, mix_ls, mix_mu,
                                             eps)

    out = jnp.zeros((h, w, 3), jnp.float32)
    wsum = jnp.zeros((h, w, 1), jnp.float32)
    for _, y0, _, x0 in g.tiles():
        t_img = jax.lax.dynamic_slice(
            content, (0, y0, x0, 0), (1, g.th, g.tw, 3))
        o = _tile_stylize(weights, t_img, t_mat, b_vec, cfg, fast)[0]
        out, wsum = g.blend(out, wsum, o, y0, x0)
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
