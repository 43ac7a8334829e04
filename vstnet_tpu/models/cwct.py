"""Cholesky whitening–coloring transfer (cWCT) as batched XLA linear algebra.

Capability parity with the reference cWCT
(/root/reference/models/cWCT.py:18-262) and its package twin
(/root/reference/project/image_style/cwct.py:16-129):

  * global transfer:         y = Ls @ Lc^{-1} @ (x - mu_c) + mu_s
  * regional (masked):       the same transform per semantic region
  * interpolation:           multi-style Cholesky-factor mixing + alpha_c

TPU-first design decisions (vs the reference's per-label Python loops with
host<->device index copies, cWCT.py:70-103):

  * Latents stay in pixels-major (N, C) layout — a free reshape of NHWC.
    The whole transform collapses to ONE per-sample matmul
    y = x @ T^T + b with T = Ls Lc^{-1}, b = mu_s - T mu_c, so no
    physical (C, N) transpose of the big tensor ever materializes
    (measured 30x off the bandwidth roofline before this change).
  * Region statistics are masked contractions; the per-region 32x32
    transforms come from a vmapped Cholesky; recombine is a lax.scan of
    masked selects — static shapes, jit/vmap/shard-safe. Covariance
    contractions over sharded pixels become psums under GSPMD.
  * The reference's try/except eps-escalation retry (cWCT.py:115-128)
    becomes a vectorized "first finite Cholesky among escalating jitters".

Precision: statistics/Cholesky always run in f32 (`linalg_dtype`), even if
the surrounding network computes in bf16.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

EPS_DEFAULT = 2e-5
# Reference validity thresholds: both regions >10 px and area ratio bounded
# (research 100x — cWCT.py:178; package tightens to 10x — cwct.py:118).
MIN_PIXELS = 10
MAX_RATIO_RESEARCH = 100.0
MAX_RATIO_PACKAGE = 10.0


# ---------------------------------------------------------------------------
# Robust Cholesky
# ---------------------------------------------------------------------------

def robust_cholesky(cov, eps: float = EPS_DEFAULT, attempts: int = 8,
                    use_double: bool = False):
    """First finite Cholesky among escalating diagonal jitters
    (vectorized form of /root/reference/models/cWCT.py:111-128; the k=0
    candidate keeps the common case bit-comparable).

    Failure semantics match the reference's "raise after exhausting eps
    escalation" (cWCT.py:127-128): if no jitter yields a finite factor
    (e.g. non-finite input covariance), the result is NaN and poisons the
    output, which host boundaries detect via `host_check_finite` — never a
    silent identity fallback.

    use_double=True is the reference's `use_double` escape hatch
    (cWCT.py:13): after the f32 escalation fails, retry the factorization
    in float64 on the HOST (TPUs have no f64 units) via pure_callback.
    Opt-in fidelity mode — the callback fences the program at every call,
    so it stays off the production fast paths."""
    c = cov.shape[-1]
    eye = jnp.eye(c, dtype=cov.dtype)
    scales = jnp.concatenate(
        [jnp.zeros((1,), cov.dtype),
         2.0 ** jnp.arange(attempts - 1, dtype=cov.dtype)]
    ) * jnp.asarray(eps, cov.dtype)

    cands = cov[None] + scales[:, None, None] * eye
    ls = jnp.linalg.cholesky(cands)
    ok = jnp.all(jnp.isfinite(ls), axis=(-1, -2))
    idx = jnp.argmax(ok)
    l = ls[idx]
    bad = ~jnp.all(jnp.isfinite(l))
    if use_double:
        # last resort: full ladder regardless of the f32 attempt budget —
        # f64 arithmetic can factor matrices every f32 jitter step loses
        # to rounding, and a rounded-indefinite f32 covariance still needs
        # a jitter step even in f64
        l64 = jax.pure_callback(
            partial(_host_cholesky_f64, eps=eps, attempts=max(attempts, 8)),
            jax.ShapeDtypeStruct(cov.shape, cov.dtype), cov,
            vmap_method="sequential")
        l = jnp.where(bad, l64, l)
        bad = ~jnp.all(jnp.isfinite(l))
    return jnp.where(bad, jnp.full_like(l, jnp.nan), l)


def _host_cholesky_f64(cov_np, eps: float, attempts: int):
    """Host-side float64 Cholesky with the same eps-escalation ladder;
    returns NaN on total failure (poison contract preserved)."""
    import numpy as np

    c64 = np.asarray(cov_np, dtype=np.float64)
    eye = np.eye(c64.shape[-1])
    for k in range(attempts):
        jitter = 0.0 if k == 0 else eps * (2.0 ** (k - 1))
        try:
            l = np.linalg.cholesky(c64 + jitter * eye)
            if np.all(np.isfinite(l)):
                return l.astype(cov_np.dtype)
        except np.linalg.LinAlgError:
            continue
    return np.full_like(np.asarray(cov_np), np.nan)


def host_check_finite(x, what: str = "stylized output"):
    """Host-boundary failure detection: raise if the cWCT poisoned the
    output with NaN (reference contract: cWCT.py:127-128 raises
    'Cholesky Decomposition fails'). Call on results about to be saved or
    returned to the user. The reduction runs on device — only one bool
    crosses the host link (a full f32 readback here dominated 4K wall
    time on slow transports)."""
    import numpy as np

    if hasattr(x, "dtype") and not isinstance(x, np.ndarray):
        import jax.numpy as jnp

        ok = bool(jnp.isfinite(x).all())
    else:
        ok = bool(np.isfinite(np.asarray(x)).all())
    if not ok:
        raise FloatingPointError(
            f"Cholesky decomposition failed: non-finite {what} "
            "(degenerate feature covariance survived eps escalation)"
        )
    return x


def _inv_lower(l):
    eye = jnp.eye(l.shape[-1], dtype=l.dtype)
    return jax.scipy.linalg.solve_triangular(l, eye, lower=True)


# ---------------------------------------------------------------------------
# Statistics in (N, C) layout
# ---------------------------------------------------------------------------

def _feat_stats(x):
    """x: (N, C) -> mean (C,), covariance (C, C) with /(n-1)."""
    n = x.shape[0]
    mean = jnp.mean(x, axis=0)
    xc = x - mean
    cov = jnp.einsum("nc,nd->cd", xc, xc,
                     preferred_element_type=jnp.float32,
                     precision=lax.Precision.HIGHEST) / (n - 1)
    return mean, cov


def _masked_stats(x, w):
    """Masked mean/cov. x: (N, C); w: (N,) in {0,1}."""
    n = jnp.sum(w)
    safe_n = jnp.maximum(n, 2.0)
    xw = x * w[:, None]
    mean = jnp.sum(xw, axis=0) / jnp.maximum(n, 1.0)
    s2 = jnp.einsum("nc,nd->cd", xw, x, preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)
    cov = (s2 - n * jnp.outer(mean, mean)) / (safe_n - 1.0)
    return n, mean, cov


def _region_transform(mean_c, cov_c, mean_s, cov_s, eps,
                      use_double: bool = False):
    """T = Ls @ Lc^{-1}, b = mu_s - T mu_c (the package's fused
    content_feat_coloring algebra, cwct.py:86-106)."""
    lc = robust_cholesky(cov_c, eps, use_double=use_double)
    ls = robust_cholesky(cov_s, eps, use_double=use_double)
    t = _mm(ls, _inv_lower(lc))
    b = mean_s - _mm(t, mean_c)
    return t, b


def _mm(a, b):
    """f32 matmul at HIGHEST precision (TPU defaults to bf16-grade passes
    even for f32 operands; the whitening statistics and factors must be
    true f32 for the >=40 dB parity gate — reference runs f64-capable
    torch, cWCT.py:13)."""
    return jnp.matmul(a, b, precision=lax.Precision.HIGHEST)


def _apply(x, t, b):
    """y = x @ T^T + b for x (N, C)."""
    return jnp.einsum("nc,dc->nd", x, t,
                      preferred_element_type=jnp.float32,
                      precision=lax.Precision.HIGHEST) + b


def _apply_native(x, t, b):
    """y = x @ T^T + b applied in x's own dtype (bf16 fast path: skips the
    f32 cast round trip of the full latent; statistics/factors stay f32).
    f32 inputs still get HIGHEST (the parity path)."""
    prec = (lax.Precision.HIGHEST if x.dtype == jnp.float32
            else lax.Precision.DEFAULT)
    y = jnp.einsum("nc,dc->nd", x, t.astype(x.dtype),
                   preferred_element_type=jnp.float32, precision=prec)
    return (y + b).astype(x.dtype)


def _to_nc(feat):
    b, h, w, c = feat.shape
    return feat.reshape(b, h * w, c)


# ---------------------------------------------------------------------------
# Global transfer
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("eps", "use_double"))
def transfer(content_feat, style_feat, eps: float = EPS_DEFAULT,
             use_double: bool = False):
    """Global cWCT. content_feat (B,Hc,Wc,C), style_feat (B,Hs,Ws,C).
    Mirrors cWCT._transfer (/root/reference/models/cWCT.py:24-47).
    use_double retries failed factorizations in f64 on the host (the
    reference's use_double flag, cWCT.py:13) — fidelity escape hatch."""
    shape = content_feat.shape
    dt = content_feat.dtype
    xc = _to_nc(content_feat).astype(jnp.float32)
    xs = _to_nc(style_feat).astype(jnp.float32)

    def one(xcb, xsb):
        mc, cc = _feat_stats(xcb)
        ms, cs = _feat_stats(xsb)
        t, b = _region_transform(mc, cc, ms, cs, eps, use_double)
        return _apply(xcb, t, b)

    out = jax.vmap(one)(xc, xs)
    return out.reshape(shape).astype(dt)


# ---------------------------------------------------------------------------
# Precomputed style factors (video fast path: style encoded & factored ONCE,
# fixing the reference's per-frame style re-encode, video_transfer.py:195)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("eps",))
def style_factors(style_feat, eps: float = EPS_DEFAULT):
    """style_feat (B,H,W,C) -> (Ls (B,C,C), mu_s (B,C))."""
    xs = _to_nc(style_feat).astype(jnp.float32)

    def one(x):
        mean, cov = _feat_stats(x)
        return robust_cholesky(cov, eps), mean

    return jax.vmap(one)(xs)


@partial(jax.jit, static_argnames=("eps",))
def transfer_with_factors(content_feat, ls, mu_s, eps: float = EPS_DEFAULT):
    """Global transfer against precomputed style factors. ls/mu_s may have
    batch 1 to broadcast over the content batch (video frames).

    Statistics/factors run in f32; the per-pixel apply runs in the input's
    own dtype (bf16 inference avoids the f32 round trip of the big
    tensor)."""
    shape = content_feat.shape
    xc = _to_nc(content_feat)
    if ls.shape[0] == 1 and xc.shape[0] > 1:
        ls = jnp.broadcast_to(ls, (xc.shape[0], *ls.shape[1:]))
        mu_s = jnp.broadcast_to(mu_s, (xc.shape[0], *mu_s.shape[1:]))

    def one(x, l, m):
        mc, cc = _feat_stats(x.astype(jnp.float32))
        lc = robust_cholesky(cc, eps)
        t = _mm(l, _inv_lower(lc))
        b = m - _mm(t, mc)
        return _apply_native(x, t, b)

    out = jax.vmap(one)(xc, ls.astype(jnp.float32), mu_s.astype(jnp.float32))
    return out.reshape(shape)


# ---------------------------------------------------------------------------
# Packed-latent variants: the reversible net's final pixel-shuffles move
# channels to space, but every shuffled pixel's latent vector is a
# CONTIGUOUS C-chunk of the pre-shuffle channels — so the global cWCT
# commutes with the shuffle. The fused inference path therefore skips the
# shuffles entirely (models/revresnet_fast.py packed_latent=True) and runs
# the transfer on the pre-shuffle NCHW tensor (B, G*C, h, w).
# ---------------------------------------------------------------------------

def _to_gcn(zp, c: int):
    b, k, h, w = zp.shape
    return zp.reshape(b, k // c, c, h * w)  # (B, G, C, N)


def _packed_stats(x):
    """x: (G, C, N) f32 -> mean (C,), cov (C, C)."""
    n = x.shape[0] * x.shape[2]
    mean = jnp.mean(x, axis=(0, 2))
    xc = x - mean[None, :, None]
    cov = jnp.einsum("gcn,gdn->cd", xc, xc,
                     preferred_element_type=jnp.float32,
                     precision=lax.Precision.HIGHEST) / (n - 1)
    return mean, cov


@partial(jax.jit, static_argnames=("c", "eps"))
def style_factors_packed(zp, c: int, eps: float = EPS_DEFAULT):
    """(Ls, mu_s) from a packed NCHW latent (B, G*C, h, w)."""
    z = _to_gcn(zp, c).astype(jnp.float32)

    def one(x):
        mean, cov = _packed_stats(x)
        return robust_cholesky(cov, eps), mean

    return jax.vmap(one)(z)


@partial(jax.jit, static_argnames=("c", "eps"))
def transfer_with_factors_packed(zp, ls, mu_s, c: int,
                                 eps: float = EPS_DEFAULT):
    """Global transfer on a packed NCHW latent — same math as
    transfer_with_factors on the shuffled latent (tested equivalent)."""
    shape = zp.shape
    z = _to_gcn(zp, c)
    if ls.shape[0] == 1 and z.shape[0] > 1:
        ls = jnp.broadcast_to(ls, (z.shape[0], *ls.shape[1:]))
        mu_s = jnp.broadcast_to(mu_s, (z.shape[0], *mu_s.shape[1:]))

    def one(x, l, m):  # x: (G, C, N)
        mean, cov = _packed_stats(x.astype(jnp.float32))
        lc = robust_cholesky(cov, eps)
        t = _mm(l, _inv_lower(lc))
        b = m - _mm(t, mean)
        prec = (lax.Precision.HIGHEST if x.dtype == jnp.float32
                else lax.Precision.DEFAULT)
        y = jnp.einsum("dc,gcn->gdn", t.astype(x.dtype), x,
                       preferred_element_type=jnp.float32, precision=prec)
        return (y + b[None, :, None]).astype(x.dtype)

    out = jax.vmap(one)(z, ls.astype(jnp.float32), mu_s.astype(jnp.float32))
    return out.reshape(shape)


@partial(jax.jit, static_argnames=("c", "eps"))
def interp_with_factors_packed(zp, mix_ls, mix_mu, alpha_c, c: int,
                               eps: float = EPS_DEFAULT):
    """Style interpolation on a packed NCHW latent against precomputed
    (already alpha_s-mixed) style factors — the fused video form of
    `interpolation` (reference cWCT.py:206-262): per frame only the
    content factor is computed, then blended by the TRACED scalar alpha_c
    (mix_ls(1-a) + Lc·a, same for the means) and applied as one matmul.
    At alpha_c == 0 this is exactly transfer_with_factors_packed.

    mix_ls/mu: (1, C, C)/(1, C) from style_factors_packed (single style)
    or an alpha_s-weighted sum of several (interpolation semantics)."""
    shape = zp.shape
    z = _to_gcn(zp, c)
    mix_ls = jnp.broadcast_to(mix_ls.astype(jnp.float32),
                              (z.shape[0], *mix_ls.shape[1:]))
    mix_mu = jnp.broadcast_to(mix_mu.astype(jnp.float32),
                              (z.shape[0], *mix_mu.shape[1:]))
    a = jnp.asarray(alpha_c, jnp.float32)

    def one(x, l, m):  # x: (G, C, N)
        mean, cov = _packed_stats(x.astype(jnp.float32))
        lc = robust_cholesky(cov, eps)
        bl = l * (1.0 - a) + lc * a
        bm = m * (1.0 - a) + mean * a
        t = _mm(bl, _inv_lower(lc))
        b = bm - _mm(t, mean)
        prec = (lax.Precision.HIGHEST if x.dtype == jnp.float32
                else lax.Precision.DEFAULT)
        y = jnp.einsum("dc,gcn->gdn", t.astype(x.dtype), x,
                       preferred_element_type=jnp.float32, precision=prec)
        return (y + b[None, :, None]).astype(x.dtype)

    out = jax.vmap(one)(z, mix_ls, mix_mu)
    return out.reshape(shape)


# ---------------------------------------------------------------------------
# Streaming/global transform pieces (ultra-resolution tiled pipeline)
# ---------------------------------------------------------------------------

def transform_from_stats(mean_c, cov_c, ls, mu_s, eps: float = EPS_DEFAULT):
    """Global-transfer transform from precomputed content statistics and
    style factors: T = Ls Lc^{-1}, b = mu_s - T mu_c. Content statistics
    may come from a streaming accumulation over tiles (models/ultra.py) —
    mathematically identical to the in-graph whole-image path."""
    lc = robust_cholesky(cov_c, eps)
    t = _mm(ls, _inv_lower(lc))
    b = mu_s - _mm(t, mean_c)
    return t, b


def apply_transform(feat, t, b):
    """Apply y = x @ T^T + b to an NHWC latent (single transform)."""
    shape = feat.shape
    dt = feat.dtype
    x = feat.reshape(-1, shape[-1]).astype(jnp.float32)
    return _apply(x, t, b).reshape(shape).astype(dt)


# ---------------------------------------------------------------------------
# Regional (masked) transfer — fixed label capacity, no Python loops
# ---------------------------------------------------------------------------

# Compile buckets for the static region capacity K. ADE20K has 150 classes
# (the reference handles every label present via a Python loop,
# cWCT.py:70-103); bucketing bounds recompiles while guaranteeing no label
# is ever silently dropped when callers size K via `label_capacity`.
LABEL_BUCKETS = (8, 16, 32, 64, 150)


def label_capacity(*masks) -> int:
    """Host-side: smallest compile bucket covering every distinct label in
    the given masks. Pass the content mask (style-only labels never get a
    region of their own — cWCT.py:70 iterates content labels)."""
    import numpy as np

    n = 1
    for m in masks:
        if m is not None:
            n = max(n, int(np.unique(np.asarray(m)).size))
    for b in LABEL_BUCKETS:
        if b >= n:
            return b
    return n

# Pixel-chunk length for the scanned region statistics/apply. Bounds the
# (chunk, K, C) one-hot product tensor (the only large intermediate) so
# HBM traffic stays ~2*N*K*C*4 bytes instead of K full-image passes.
# Sized so scan-iteration overhead (~0.1 ms/iter measured through the
# relay) stays small: 1024^2 pixels -> 32 iterations.
REGION_CHUNK = 32768


def _chunked(x, m, chunk):
    """Pad N to a chunk multiple (pad labels -2 match nothing) and fold
    into (n_chunks, chunk, ...) scan operands."""
    n, c = x.shape
    pad = (-n) % chunk
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, c), x.dtype)])
        m = jnp.concatenate([m, jnp.full((pad,), -2, m.dtype)])
    return x.reshape(-1, chunk, c), m.reshape(-1, chunk)


def region_moments(x, m, labels, chunk=REGION_CHUNK, batched=False):
    """Per-label raw moments in ONE chunked pass over the pixels.

    x (N, C) f32, m (N,) int32, labels (K,) -> counts (K,), sums (K, C),
    gram (K, C, C). Raw moments (not means/covs) so callers can ACCUMULATE
    them across streaming passes — the ultra-res tiler adds per-tile
    moments over tile-owned pixels and finalizes once (models/ultra.py).
    batched=True: leading image axis on x/m (shared scan over images)."""
    if not batched:
        x, m = x[None], m[None]
    i, n, c = x.shape
    k = labels.shape[0]
    folded = jax.vmap(lambda a, b: _chunked(a, b, chunk))(x, m)
    xs = jnp.swapaxes(folded[0], 0, 1)  # (n_chunks, I, chunk, C)
    ms = jnp.swapaxes(folded[1], 0, 1)

    # Exactness note for bf16 inputs (the fused fast path's latent): the
    # one-hot weights are 0/1, so w*x never rounds, and the MXU multiplies
    # bf16 operands exactly into the f32 accumulator — a single-pass bf16
    # contraction here equals the f32 HIGHEST (6-pass) contraction bit for
    # bit on bf16-representable data, at ~6x less MXU work and half the
    # HBM traffic (tested: tests/test_cwct.py bf16 moments exactness).
    prec = (lax.Precision.HIGHEST if x.dtype == jnp.float32
            else lax.Precision.DEFAULT)

    def body(carry, inp):
        cnt, sm, gm = carry
        xcb, mcb = inp
        w = (mcb[..., None] == labels[None, None, :]).astype(x.dtype)
        cnt = cnt + jnp.sum(w, axis=1, dtype=jnp.float32)
        sm = sm + jnp.einsum("ink,inc->ikc", w, xcb,
                             preferred_element_type=jnp.float32,
                             precision=prec)
        xw = jnp.einsum("ink,inc->iknc", w, xcb)
        gm = gm + jnp.einsum("iknc,ind->ikcd", xw, xcb,
                             preferred_element_type=jnp.float32,
                             precision=prec)
        return (cnt, sm, gm), None

    init = (jnp.zeros((i, k), jnp.float32),
            jnp.zeros((i, k, c), jnp.float32),
            jnp.zeros((i, k, c, c), jnp.float32))
    (cnt, sm, gm), _ = lax.scan(body, init, (xs, ms))
    if not batched:
        return cnt[0], sm[0], gm[0]
    return cnt, sm, gm


def stats_from_moments(cnt, sm, gm):
    """(counts, sums, gram) -> (counts, means, covs) with the /(n-1) +
    clamped divisors of _masked_stats. Works on any leading batch dims."""
    means = sm / jnp.maximum(cnt, 1.0)[..., None]
    covs = (
        gm - cnt[..., None, None] * means[..., :, None] * means[..., None, :]
    ) / (jnp.maximum(cnt, 2.0) - 1.0)[..., None, None]
    return cnt, means, covs


def _region_stats(x, m, labels, chunk=REGION_CHUNK, batched=False):
    """Per-label masked stats in ONE pass (see region_moments)."""
    return stats_from_moments(
        *region_moments(x, m, labels, chunk=chunk, batched=batched))


def region_transforms(labels, nc, mean_c, cov_c, ns, mean_s, cov_s,
                      eps: float = EPS_DEFAULT,
                      min_pixels: float = MIN_PIXELS,
                      max_ratio: float = MAX_RATIO_RESEARCH):
    """Per-label (T, b, valid) from per-label content/style stats, with the
    reference's region validity rule (both regions >min_pixels, area ratio
    bounded — cWCT.py:178)."""
    valids = (
        (labels >= 0)
        & (nc > min_pixels)
        & (ns > min_pixels)
        & (nc < max_ratio * ns)
        & (ns < max_ratio * nc)
    )
    ts, bs = jax.vmap(
        lambda mc, cc, ms_, cs: _region_transform(mc, cc, ms_, cs, eps)
    )(mean_c, cov_c, mean_s, cov_s)
    return ts, bs, valids


def apply_regions(x, m, labels, ts, bs, valids, chunk=REGION_CHUNK):
    """Public wrapper of the scanned per-region apply (ultra-res tiler)."""
    return _apply_regions(x, m, labels, ts, bs, valids, chunk=chunk)


def _apply_regions(x, m, labels, ts, bs, valids, chunk=REGION_CHUNK):
    """y_n = T_{label(n)} x_n + b for pixels in valid regions; content
    passthrough otherwise. One scanned pass; (chunk, K, C) bounded.

    f32 inputs run at HIGHEST precision (the parity path); bf16 inputs
    (fused fast path) apply the transform in bf16 single-pass MXU form
    with f32 accumulation, like _apply_native."""
    n = x.shape[0]
    xs, ms = _chunked(x, m, chunk)
    f32_in = x.dtype == jnp.float32
    prec = lax.Precision.HIGHEST if f32_in else lax.Precision.DEFAULT
    ts_c = ts if f32_in else ts.astype(x.dtype)

    def body(_, inp):
        xcb, mcb = inp
        sel = (mcb[:, None] == labels[None, :]) & valids[None, :]
        w = sel.astype(x.dtype)
        z = jnp.einsum("kdc,nc->nkd", ts_c, xcb,
                       preferred_element_type=jnp.float32,
                       precision=prec)
        y = (jnp.einsum("nk,nkd->nd", w, z,
                        preferred_element_type=jnp.float32,
                        precision=prec)
             + sel.astype(jnp.float32) @ bs)
        keep = ~jnp.any(sel, axis=1)
        return None, jnp.where(keep[:, None], xcb, y.astype(x.dtype))

    _, ys = lax.scan(body, None, (xs, ms))
    return ys.reshape(-1, x.shape[1])[:n]


def _transfer_seg_single(xc, xs, cmask, smask, eps, max_labels,
                         min_pixels, max_ratio):
    """xc (Nc,C), xs (Ns,C), cmask (Nc,), smask (Ns,) int32 -> (Nc,C)."""
    labels = jnp.unique(
        cmask, size=max_labels, fill_value=jnp.int32(-1)
    ).astype(jnp.int32)

    if xc.shape == xs.shape:
        # one scanned pass over both images (halves the loop overhead)
        n2, mean2, cov2 = _region_stats(
            jnp.concatenate([xc[None], xs[None]]),
            jnp.concatenate([cmask[None], smask[None]]), labels,
            batched=True)
        (nc, ns), (mean_c, mean_s), (cov_c, cov_s) = n2, mean2, cov2
    else:
        nc, mean_c, cov_c = _region_stats(xc, cmask, labels)
        ns, mean_s, cov_s = _region_stats(xs, smask, labels)
    ts, bs, valids = region_transforms(
        labels, nc, mean_c, cov_c, ns, mean_s, cov_s, eps,
        min_pixels, max_ratio)

    return _apply_regions(xc, cmask, labels, ts, bs, valids)


@partial(
    jax.jit,
    static_argnames=("eps", "max_labels", "min_pixels", "max_ratio"),
)
def transfer_masked(
    content_feat,
    style_feat,
    cmask,
    smask,
    eps: float = EPS_DEFAULT,
    max_labels: int = 32,
    min_pixels: int = MIN_PIXELS,
    max_ratio: float = MAX_RATIO_RESEARCH,
):
    """Regional cWCT guided by semantic masks (cWCT._transfer_seg semantics,
    /root/reference/models/cWCT.py:49-109, without the Python label loop).

    content_feat (B,Hc,Wc,C); cmask (B,Hc,Wc) int labels >= 0. Pixels whose
    label fails the validity rule keep their content features. max_labels is
    the static region capacity K (first K distinct labels).

    bf16 latents (the fused fast path) run the moment/apply contractions
    in single-pass bf16 MXU form with f32 accumulation (exact for the
    one-hot moments — see region_moments); statistics and Cholesky stay
    f32 regardless."""
    shape = content_feat.shape
    dt = content_feat.dtype
    xc = _to_nc(content_feat)
    xs = _to_nc(style_feat)
    cd = jnp.promote_types(xc.dtype, xs.dtype)
    if cd != jnp.bfloat16:
        cd = jnp.float32  # only all-bf16 inputs take the bf16 fast form
    xc = xc.astype(cd)
    xs = xs.astype(cd)
    cm = cmask.reshape(cmask.shape[0], -1).astype(jnp.int32)
    sm = smask.reshape(smask.shape[0], -1).astype(jnp.int32)
    out = jax.vmap(
        lambda a, b, c, d: _transfer_seg_single(
            a, b, c, d, eps, max_labels, float(min_pixels), max_ratio
        )
    )(xc, xs, cm, sm)
    return out.reshape(shape).astype(dt)


# ---------------------------------------------------------------------------
# Factored regional transfer (masked-video fast path): the style image and
# its mask are FIXED for a whole video, so the per-label style statistics
# are computed once up front; per frame only the content moments, the KxCxC
# Choleskys, and the apply remain. transfer_masked recomputes the style
# moments for every frame of every batch (the style latent is broadcast
# B-fold) — on the video workload that doubled the masked-cWCT cost.
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("max_labels",))
def style_region_factors(style_feat, smask, max_labels: int = 32):
    """Per-label style statistics, computed ONCE for a fixed style.

    style_feat (1,H,W,C) latent; smask (1,H,W) int labels (already
    self-remapped). Returns (labels (K,), ns (K,), mean_s (K,C),
    cov_s (K,C,C)). The label set is the STYLE's distinct labels: after
    cross_remapping every content label lands in this set (content labels
    the style lacks are remapped; the rare no-candidate fallback keeps a
    non-style label, which fails the style-pixel validity rule in both
    the factored and unfactored variants and passes through)."""
    xs = _to_nc(style_feat).astype(jnp.float32)[0]
    sm = smask.reshape(-1).astype(jnp.int32)
    labels = jnp.unique(
        sm, size=max_labels, fill_value=jnp.int32(-1)
    ).astype(jnp.int32)
    ns, mean_s, cov_s = _region_stats(xs, sm, labels)
    return labels, ns, mean_s, cov_s


@partial(jax.jit, static_argnames=("eps", "min_pixels", "max_ratio"))
def transfer_masked_factored(
    content_feat,
    cmask,
    labels,
    ns,
    mean_s,
    cov_s,
    eps: float = EPS_DEFAULT,
    min_pixels: int = MIN_PIXELS,
    max_ratio: float = MAX_RATIO_RESEARCH,
):
    """Regional cWCT against precomputed per-label style statistics
    (style_region_factors). Equal to transfer_masked whenever every
    content label appears in `labels` (guaranteed after cross_remapping;
    tested bit-for-bit in tests/test_cwct.py). content_feat (B,H,W,C);
    cmask (B,H,W); the style-side arrays are shared across the batch.

    K is static via labels.shape — no max_labels argument needed.

    bf16 content latents (the fused fast path) stay bf16 through the
    moment/apply contractions (exact one-hot sums with f32 accumulation —
    see region_moments); statistics, Cholesky, and transforms are always
    f32."""
    shape = content_feat.shape
    dt = content_feat.dtype
    xc = _to_nc(content_feat)
    if xc.dtype not in (jnp.float32, jnp.bfloat16):
        xc = xc.astype(jnp.float32)
    cm = cmask.reshape(cmask.shape[0], -1).astype(jnp.int32)

    def one(x, m):
        nc, mean_c, cov_c = _region_stats(x, m, labels)
        ts, bs, valids = region_transforms(
            labels, nc, mean_c, cov_c, ns, mean_s, cov_s, eps,
            float(min_pixels), max_ratio)
        return _apply_regions(x, m, labels, ts, bs, valids)

    out = jax.vmap(one)(xc, cm)
    return out.reshape(shape).astype(dt)


# ---------------------------------------------------------------------------
# Interpolation (multi-style mixing + content blend)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("eps",))
def interpolation(
    content_feat,
    style_feats,      # (S, B, Hs, Ws, C) or list of (B,Hs,Ws,C)
    alpha_s,          # (S,) weights
    alpha_c: float = 0.0,
    eps: float = EPS_DEFAULT,
):
    """Style interpolation (cWCT.interpolation, cWCT.py:206-262):
    mix_Ls = sum_i alpha_i Ls_i, mix_mu = sum_i alpha_i mu_i, optionally
    blended with the content factor by alpha_c, coloring the whitened
    content. Expressed as one fused matmul: y = x @ T^T + b with
    T = mix_Ls Lc^{-1}."""
    if isinstance(style_feats, (list, tuple)):
        style_feats = jnp.stack(style_feats)
    shape = content_feat.shape
    dt = content_feat.dtype
    xc = _to_nc(content_feat).astype(jnp.float32)
    alpha_s = jnp.asarray(alpha_s, jnp.float32)
    xs = jax.vmap(_to_nc)(style_feats).astype(jnp.float32)  # (S, B, Ns, C)
    xs = jnp.swapaxes(xs, 0, 1)  # (B, S, Ns, C)
    if xs.shape[0] == 1 and xc.shape[0] > 1:
        # batch-1 styles broadcast over a frame batch (the video CLI
        # passes one style against batched frames — same contract as
        # transfer_with_factors)
        xs = jnp.broadcast_to(xs, (xc.shape[0], *xs.shape[1:]))

    def per_batch(xcb, xsb):
        mean_c, cov_c = _feat_stats(xcb)
        lc = robust_cholesky(cov_c, eps)

        def style_factor(xs1):
            mean_s, cov_s = _feat_stats(xs1)
            return robust_cholesky(cov_s, eps), mean_s

        ls_all, mu_all = jax.vmap(style_factor)(xsb)
        mix_ls = jnp.einsum("s,scd->cd", alpha_s, ls_all)
        mix_mu = jnp.einsum("s,sc->c", alpha_s, mu_all)
        mix_ls = mix_ls * (1.0 - alpha_c) + lc * alpha_c
        mix_mu = mix_mu * (1.0 - alpha_c) + mean_c * alpha_c

        t = _mm(mix_ls, _inv_lower(lc))
        b = mix_mu - _mm(t, mean_c)
        return _apply(xcb, t, b)

    out = jax.vmap(per_batch)(xc, xs)
    return out.reshape(shape).astype(dt)
