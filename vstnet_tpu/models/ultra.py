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


# Tiles per device dispatch. Pass 1 and pass 2 each run in
# ceil(n_tiles / TILE_BATCH) dispatches: the tile slicing, the network,
# the moment accumulation, AND the overlap blending all happen in-graph
# (round 2 dispatched one program per tile plus host-side .at[].add
# blends — dispatch-bound through any host link).
TILE_BATCH = 4


def _slice_tiles(content, y0s, x0s, th: int, tw: int):
    """content (1, H, W, 3), y0s/x0s (T,) traced -> (T, th, tw, 3)."""
    return jax.vmap(lambda y0, x0: jax.lax.dynamic_slice(
        content[0], (y0, x0, 0), (th, tw, 3)))(y0s, x0s)


@partial(jax.jit, static_argnames=("cfg", "th", "tw", "fast"),
         donate_argnums=(4,))
def _moments_chunk(weights, content, y0s, x0s, acc, owns,
                   cfg: RevResNetConfig, th: int, tw: int,
                   fast: bool = False):
    """One dispatch: encode a batch of tiles and add their owned-region
    latent moments to the carried accumulators. owns: (T, h_lat, w_lat)
    f32 in {0,1} (all-zero rows pad the tail chunk harmlessly)."""
    tiles = _slice_tiles(content, y0s, x0s, th, tw)
    z = _enc(weights, tiles, cfg, fast).astype(jnp.float32)
    zm = z * owns[..., None]
    n, s1, s2 = acc
    n = n + jnp.sum(owns)
    s1 = s1 + jnp.sum(zm, axis=(0, 1, 2))
    s2 = s2 + jnp.einsum("bhwc,bhwd->cd", zm, z,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
    return n, s1, s2


@partial(jax.jit, static_argnames=("cfg", "th", "tw", "sc", "fast"),
         donate_argnums=(4,))
def _moments_chunk_masked(weights, content, y0s, x0s, acc, owns, cm_lat,
                          labels, cfg: RevResNetConfig, th: int, tw: int,
                          sc: int, fast: bool = False):
    """Per-label variant: non-owned pixels take label -2 (match nothing),
    then one chunked-scan pass per tile batch (cwct.region_moments)."""
    tiles = _slice_tiles(content, y0s, x0s, th, tw)
    z = _enc(weights, tiles, cfg, fast).astype(jnp.float32)
    t_count, c = z.shape[0], z.shape[-1]
    m_tiles = jax.vmap(lambda y0, x0: jax.lax.dynamic_slice(
        cm_lat, (y0 // sc, x0 // sc), (th // sc, tw // sc)))(y0s, x0s)
    m = jnp.where(owns > 0, m_tiles, -2).reshape(t_count, -1)
    cnt, sm, gm = cwct.region_moments(
        z.reshape(t_count, -1, c), m.astype(jnp.int32), labels,
        batched=True)
    a_cnt, a_sm, a_gm = acc
    return (a_cnt + cnt.sum(0), a_sm + sm.sum(0), a_gm + gm.sum(0))


def _blend_loop(o, wts, y0s, x0s, out, wsum, th: int, tw: int):
    """Accumulate a batch of stylized tiles into the (H, W) canvases
    in-graph (raised-cosine weights; wt=0 rows pad the tail chunk)."""
    def body(i, carry):
        out, wsum = carry
        y0, x0 = y0s[i], x0s[i]
        patch = jax.lax.dynamic_slice(out, (y0, x0, 0), (th, tw, 3))
        out = jax.lax.dynamic_update_slice(
            out, patch + o[i].astype(jnp.float32) * wts[i], (y0, x0, 0))
        wp = jax.lax.dynamic_slice(wsum, (y0, x0, 0), (th, tw, 1))
        wsum = jax.lax.dynamic_update_slice(wsum, wp + wts[i], (y0, x0, 0))
        return out, wsum

    return jax.lax.fori_loop(0, o.shape[0], body, (out, wsum))


@partial(jax.jit, static_argnames=("cfg", "th", "tw", "fast"),
         donate_argnums=(7, 8))
def _stylize_chunk(weights, content, y0s, x0s, wts, t, b, out, wsum,
                   cfg: RevResNetConfig, th: int, tw: int,
                   fast: bool = False):
    tiles = _slice_tiles(content, y0s, x0s, th, tw)
    z = _enc(weights, tiles, cfg, fast)
    o = _dec(weights, cwct.apply_transform(z, t, b), cfg, fast)
    return _blend_loop(o, wts, y0s, x0s, out, wsum, th, tw)


@partial(jax.jit, static_argnames=("cfg", "th", "tw", "sc", "fast"),
         donate_argnums=(9, 10))
def _stylize_chunk_masked(weights, content, y0s, x0s, wts, cm_lat, labels,
                          tsb, valids, out, wsum, cfg: RevResNetConfig,
                          th: int, tw: int, sc: int, fast: bool = False):
    ts, bs = tsb
    tiles = _slice_tiles(content, y0s, x0s, th, tw)
    z = _enc(weights, tiles, cfg, fast)
    sh = z.shape
    m_tiles = jax.vmap(lambda y0, x0: jax.lax.dynamic_slice(
        cm_lat, (y0 // sc, x0 // sc), (th // sc, tw // sc)))(y0s, x0s)
    x = z.reshape(sh[0], -1, sh[-1]).astype(jnp.float32)
    y = jax.vmap(
        lambda xx, mm: cwct.apply_regions(
            xx, mm.reshape(-1).astype(jnp.int32), labels, ts, bs, valids)
    )(x, m_tiles)
    o = _dec(weights, y.reshape(sh).astype(z.dtype), cfg, fast)
    return _blend_loop(o, wts, y0s, x0s, out, wsum, th, tw)


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

    def tile_weight(self, y0, x0):
        wy = _ramp(self.th, self.overlap, y0 == 0, y0 + self.th == self.h)
        wx = _ramp(self.tw, self.overlap, x0 == 0, x0 + self.tw == self.w)
        return (wy[:, None] * wx[None, :])[..., None]

    def chunks(self, tile_batch: int = TILE_BATCH, need: str = "own"):
        """Tile-batch assembly: (y0s, x0s, owns, wts) device arrays per
        chunk of `tile_batch` tiles; the tail chunk is padded with repeats
        of the last tile carrying ZERO ownership and blend weight, so
        padded slots contribute nothing to either pass.

        Each pass consumes only one canvas kind — `need` ("own" for the
        moment pass, "wt" for the blend pass) skips building and
        uploading the other, halving a traffic stream on the very host
        link the tiled path exists to protect (each canvas is a full
        f32 tile per tile)."""
        items = list(self.tiles())
        for c0 in range(0, len(items), tile_batch):
            chunk = items[c0:c0 + tile_batch]
            y0s, x0s, canv = [], [], []
            for iy, y0, ix, x0 in chunk:
                y0s.append(y0)
                x0s.append(x0)
                canv.append(self.own_mask(iy, y0, ix, x0) if need == "own"
                            else self.tile_weight(y0, x0))
            for _ in range(tile_batch - len(chunk)):
                y0s.append(y0s[-1])
                x0s.append(x0s[-1])
                canv.append(np.zeros_like(canv[-1]))
            stacked = jnp.asarray(np.stack(canv))
            yield (jnp.asarray(np.asarray(y0s, np.int32)),
                   jnp.asarray(np.asarray(x0s, np.int32)),
                   stacked if need == "own" else None,
                   stacked if need == "wt" else None)


def _pick_weights(params, fast_params):
    return (fast_params, True) if fast_params is not None else (params, False)


def stylize_tiled(params, content, style, cfg: RevResNetConfig,
                  tile: int = 1024, overlap: int = 128,
                  eps: float = cwct.EPS_DEFAULT, fast_params=None,
                  tile_batch: int = TILE_BATCH):
    """Global-cWCT stylization of an arbitrarily large content image.

    content: (1, H, W, 3) NHWC (H, W multiples of cfg.down_scale);
    style: (1, Hs, Ws, 3) encoded whole. Returns (1, H, W, 3) raw decoder
    output (research semantics; caller clamps). fast_params routes tile
    encode/decode through the fused bf16 flat-Pallas path (statistics
    stay f32). Tiles run `tile_batch` per dispatch; everything — slicing,
    network, moment accumulation, blending — stays on device, so only the
    final image crosses the host link.
    """
    _, h, w, _ = content.shape
    g = _TileGrid(h, w, cfg, tile, overlap)
    weights, fast = _pick_weights(params, fast_params)

    ls, mu_s = cwct.style_factors(
        _enc(weights, style, cfg, fast).astype(jnp.float32), eps)
    ls, mu_s = ls[0], mu_s[0]

    # pass 1: streaming latent moments over owned regions
    acc = (jnp.zeros((), jnp.float32),
           jnp.zeros((cfg.latent_channels,), jnp.float32),
           jnp.zeros((cfg.latent_channels,) * 2, jnp.float32))
    for y0s, x0s, owns, _ in g.chunks(tile_batch, need="own"):
        acc = _moments_chunk(weights, content, y0s, x0s, acc, owns, cfg,
                             g.th, g.tw, fast)

    n_tot, s1_tot, s2_tot = acc
    mean_c = s1_tot / n_tot
    cov_c = (s2_tot - n_tot * jnp.outer(mean_c, mean_c)) / (n_tot - 1.0)
    t_mat, b_vec = cwct.transform_from_stats(mean_c, cov_c, ls, mu_s, eps)

    # pass 2: transform + decode + in-graph blend
    out = jnp.zeros((h, w, 3), jnp.float32)
    wsum = jnp.zeros((h, w, 1), jnp.float32)
    for y0s, x0s, _, wts in g.chunks(tile_batch, need="wt"):
        out, wsum = _stylize_chunk(weights, content, y0s, x0s, wts,
                                   t_mat, b_vec, out, wsum, cfg,
                                   g.th, g.tw, fast)
    return (out / wsum)[None]


def stylize_tiled_masked(params, content, style, cmask, smask,
                         cfg: RevResNetConfig, tile: int = 1024,
                         overlap: int = 128, max_labels: int = 32,
                         eps: float = cwct.EPS_DEFAULT,
                         min_pixels: float = cwct.MIN_PIXELS,
                         max_ratio: float = cwct.MAX_RATIO_RESEARCH,
                         fast_params=None,
                         tile_batch: int = TILE_BATCH):
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

    # the fixed-size unique below silently drops labels beyond max_labels
    # (content passthrough for those regions) — that must be the caller's
    # explicit choice, never a surprise on a many-label 4K mask; the CLI
    # sizes max_labels via cwct.label_capacity
    import numpy as _np

    n_distinct = int(_np.unique(_np.asarray(cmask)).size)
    if n_distinct > max_labels:
        raise ValueError(
            f"content mask has {n_distinct} distinct labels > "
            f"max_labels={max_labels}; raise max_labels (e.g. "
            "cwct.label_capacity(mask)) or pre-merge the mask")

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
    acc = (jnp.zeros((k,), jnp.float32),
           jnp.zeros((k, c), jnp.float32),
           jnp.zeros((k, c, c), jnp.float32))
    for y0s, x0s, owns, _ in g.chunks(tile_batch, need="own"):
        acc = _moments_chunk_masked(weights, content, y0s, x0s, acc, owns,
                                    cm_lat, labels, cfg, g.th, g.tw, sc,
                                    fast)

    nc, mean_c, cov_c = cwct.stats_from_moments(*acc)
    ts, bs, valids = cwct.region_transforms(
        labels, nc, mean_c, cov_c, ns, mean_s, cov_s, eps,
        float(min_pixels), max_ratio)

    # pass 2: per-region transform + decode + in-graph blend
    out = jnp.zeros((h, w, 3), jnp.float32)
    wsum = jnp.zeros((h, w, 1), jnp.float32)
    for y0s, x0s, _, wts in g.chunks(tile_batch, need="wt"):
        out, wsum = _stylize_chunk_masked(
            weights, content, y0s, x0s, wts, cm_lat, labels, (ts, bs),
            valids, out, wsum, cfg, g.th, g.tw, sc, fast)
    return (out / wsum)[None]


def stylize_tiled_interp(params, content, styles, alpha_s,
                         cfg: RevResNetConfig, alpha_c: float = 0.0,
                         tile: int = 1024, overlap: int = 128,
                         eps: float = cwct.EPS_DEFAULT, fast_params=None,
                         tile_batch: int = TILE_BATCH):
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

    acc = (jnp.zeros((), jnp.float32),
           jnp.zeros((cfg.latent_channels,), jnp.float32),
           jnp.zeros((cfg.latent_channels,) * 2, jnp.float32))
    for y0s, x0s, owns, _ in g.chunks(tile_batch, need="own"):
        acc = _moments_chunk(weights, content, y0s, x0s, acc, owns, cfg,
                             g.th, g.tw, fast)
    n_tot, s1_tot, s2_tot = acc

    mean_c = s1_tot / n_tot
    cov_c = (s2_tot - n_tot * jnp.outer(mean_c, mean_c)) / (n_tot - 1.0)
    lc = cwct.robust_cholesky(cov_c, eps)
    mix_ls = mix_ls * (1.0 - alpha_c) + lc * alpha_c
    mix_mu = mix_mu * (1.0 - alpha_c) + mean_c * alpha_c
    t_mat, b_vec = cwct.transform_from_stats(mean_c, cov_c, mix_ls, mix_mu,
                                             eps)

    out = jnp.zeros((h, w, 3), jnp.float32)
    wsum = jnp.zeros((h, w, 1), jnp.float32)
    for y0s, x0s, _, wts in g.chunks(tile_batch, need="wt"):
        out, wsum = _stylize_chunk(weights, content, y0s, x0s, wts,
                                   t_mat, b_vec, out, wsum, cfg,
                                   g.th, g.tw, fast)
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
