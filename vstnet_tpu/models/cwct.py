"""Cholesky whitening–coloring transfer (cWCT) as batched XLA linear algebra.

Capability parity with the reference cWCT
(/root/reference/models/cWCT.py:18-262) and its package twin
(/root/reference/project/image_style/cwct.py:16-129):

  * global transfer:         y = Ls @ Lc^{-1} @ (x - mu_c) + mu_s
  * regional (masked):       the same transform per semantic region
  * interpolation:           multi-style Cholesky-factor mixing + alpha_c

TPU-first design decisions (vs the reference's per-label Python loops with
host<->device index copies, cWCT.py:70-103):

  * Latents are NHWC; all math is batched einsum/matmul over the pixel axis.
  * The regional variant uses a **fixed label capacity K**: region statistics
    are masked reductions (MXU matmuls against a one-hot weighting), the
    per-region 32x32 transforms are built with a vmapped Cholesky, and the
    recombine is a lax.scan of masked selects — fully static shapes, no
    data-dependent control flow, jit/vmap/shard-safe. Covariance reductions
    over sharded pixels become psum-able (see vstnet_tpu/parallel).
  * The reference's try/except eps-escalation retry (cWCT.py:115-128)
    becomes a vectorized "first finite Cholesky among escalating jitters".
  * Whitening uses a triangular solve instead of torch.inverse(L)
    (better conditioned; same math).

Precision: covariance/Cholesky always run in f32+ (`linalg_dtype`), even if
the surrounding network computes in bf16.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

EPS_DEFAULT = 2e-5
# Matches reference validity thresholds: both regions >10 px and area ratio
# bounded (research uses 100x — cWCT.py:178; the package tightens to 10x —
# project/image_style/cwct.py:118).
MIN_PIXELS = 10
MAX_RATIO_RESEARCH = 100.0
MAX_RATIO_PACKAGE = 10.0


# ---------------------------------------------------------------------------
# Robust Cholesky
# ---------------------------------------------------------------------------

def robust_cholesky(cov, eps: float = EPS_DEFAULT, attempts: int = 8):
    """First finite Cholesky among escalating diagonal jitters.

    Reproduces the reference's escalating-eps retry loop
    (/root/reference/models/cWCT.py:111-128) without data-dependent Python
    control flow: candidates cov + k*eps*I for k in {0,1,2,4,...}; pick the
    first whose factorization is finite. The k=0 candidate keeps the common
    case bit-comparable with the reference (which adds no jitter on success).
    """
    c = cov.shape[-1]
    eye = jnp.eye(c, dtype=cov.dtype)
    cov = jnp.where(jnp.isfinite(cov), cov, eye)  # degenerate/empty regions
    scales = jnp.concatenate(
        [jnp.zeros((1,), cov.dtype),
         2.0 ** jnp.arange(attempts - 1, dtype=cov.dtype)]
    ) * jnp.asarray(eps, cov.dtype)

    cands = cov[None] + scales[:, None, None] * eye  # (A, C, C)
    ls = jnp.linalg.cholesky(cands)
    ok = jnp.all(jnp.isfinite(ls), axis=(-1, -2))
    idx = jnp.argmax(ok)  # first True; 0 if none (then output is garbage-safe below)
    l = ls[idx]
    # Last-resort fallback: identity (region will be masked invalid anyway).
    return jnp.where(jnp.all(jnp.isfinite(l)), l, eye)


def _inv_lower(l):
    """L^{-1} for a lower-triangular L via triangular solve."""
    eye = jnp.eye(l.shape[-1], dtype=l.dtype)
    return jax.scipy.linalg.solve_triangular(l, eye, lower=True)


# ---------------------------------------------------------------------------
# Statistics
# ---------------------------------------------------------------------------

def _feat_stats(x):
    """x: (C, N) -> mean (C,), covariance (C, C) with /(n-1) like the
    reference (cWCT.py:144)."""
    n = x.shape[-1]
    mean = jnp.mean(x, axis=-1)
    xc = x - mean[:, None]
    cov = (xc @ xc.T) / (n - 1)
    return mean, cov


def _masked_stats(x, w):
    """Masked mean/cov. x: (C, N); w: (N,) in {0,1}.

    cov = (sum_w x x^T - n mu mu^T) / (n - 1), the same unbiased estimator
    the reference computes on gathered pixels (cWCT.py:144) — here as one
    masked matmul, no gather.
    """
    n = jnp.sum(w)
    safe_n = jnp.maximum(n, 2.0)
    xw = x * w[None, :]
    mean = jnp.sum(xw, axis=-1) / jnp.maximum(n, 1.0)
    s2 = xw @ x.T  # (C, C) = sum_w x x^T
    cov = (s2 - n * jnp.outer(mean, mean)) / (safe_n - 1.0)
    return n, mean, cov


def _region_transform(mean_c, cov_c, mean_s, cov_s, eps):
    """Fused coloring transform: T = Ls @ Lc^{-1}, b = mu_s - T mu_c
    (the package's content_feat_coloring algebra,
    /root/reference/project/image_style/cwct.py:86-106)."""
    lc = robust_cholesky(cov_c, eps)
    ls = robust_cholesky(cov_s, eps)
    t = ls @ _inv_lower(lc)
    b = mean_s - t @ mean_c
    return t, b


# ---------------------------------------------------------------------------
# Global transfer
# ---------------------------------------------------------------------------

def _transfer_single(xc, xs, eps):
    """xc: (C, Nc), xs: (C, Ns) -> (C, Nc)."""
    mean_c, cov_c = _feat_stats(xc)
    mean_s, cov_s = _feat_stats(xs)
    lc = robust_cholesky(cov_c, eps)
    ls = robust_cholesky(cov_s, eps)
    whiten = jax.scipy.linalg.solve_triangular(
        lc, xc - mean_c[:, None], lower=True
    )
    return ls @ whiten + mean_s[:, None]


def _to_cn(feat):
    """NHWC (B,H,W,C) -> (B, C, N)."""
    b, h, w, c = feat.shape
    return jnp.transpose(feat.reshape(b, h * w, c), (0, 2, 1))


def _from_cn(x, shape):
    b, h, w, c = shape
    return jnp.transpose(x, (0, 2, 1)).reshape(b, h, w, c)


@partial(jax.jit, static_argnames=("eps",))
def transfer(content_feat, style_feat, eps: float = EPS_DEFAULT):
    """Global cWCT. content_feat (B,Hc,Wc,C), style_feat (B,Hs,Ws,C).

    Mirrors cWCT._transfer (/root/reference/models/cWCT.py:24-47).
    """
    shape = content_feat.shape
    dt = content_feat.dtype
    xc = _to_cn(content_feat).astype(jnp.float32)
    xs = _to_cn(style_feat).astype(jnp.float32)
    out = jax.vmap(lambda a, b: _transfer_single(a, b, eps))(xc, xs)
    return _from_cn(out, shape).astype(dt)


# ---------------------------------------------------------------------------
# Precomputed style factors (video fast path: style encoded & factored ONCE,
# fixing the reference's per-frame style re-encode, video_transfer.py:195)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("eps",))
def style_factors(style_feat, eps: float = EPS_DEFAULT):
    """style_feat (B,H,W,C) -> (Ls (B,C,C), mu_s (B,C))."""
    xs = _to_cn(style_feat).astype(jnp.float32)

    def one(x):
        mean, cov = _feat_stats(x)
        return robust_cholesky(cov, eps), mean

    return jax.vmap(one)(xs)


@partial(jax.jit, static_argnames=("eps",))
def transfer_with_factors(content_feat, ls, mu_s, eps: float = EPS_DEFAULT):
    """Global transfer against precomputed style factors. ls/mu_s may have
    batch 1 to broadcast over the content batch (video frames)."""
    shape = content_feat.shape
    dt = content_feat.dtype
    xc = _to_cn(content_feat).astype(jnp.float32)
    if ls.shape[0] == 1 and xc.shape[0] > 1:
        ls = jnp.broadcast_to(ls, (xc.shape[0], *ls.shape[1:]))
        mu_s = jnp.broadcast_to(mu_s, (xc.shape[0], *mu_s.shape[1:]))

    def one(x, l, m):
        mean_c, cov_c = _feat_stats(x)
        lc = robust_cholesky(cov_c, eps)
        whiten = jax.scipy.linalg.solve_triangular(
            lc, x - mean_c[:, None], lower=True
        )
        return l @ whiten + m[:, None]

    out = jax.vmap(one)(xc, ls, mu_s)
    return _from_cn(out, shape).astype(dt)


# ---------------------------------------------------------------------------
# Regional (masked) transfer — fixed label capacity, no Python loops
# ---------------------------------------------------------------------------

def _transfer_seg_single(xc, xs, cmask, smask, eps, max_labels,
                         min_pixels, max_ratio):
    """xc (C,Nc), xs (C,Ns), cmask (Nc,), smask (Ns,) int32 -> (C,Nc)."""
    # Distinct content labels, padded to K with -1 (absent sentinel).
    labels = jnp.unique(
        cmask, size=max_labels, fill_value=jnp.int32(-1)
    ).astype(jnp.int32)
    # unique() pads with fill_value only when fewer distinct values exist,
    # but -1 could collide if... masks are non-negative labels by contract.

    def per_label(label):
        wc = (cmask == label).astype(jnp.float32)
        ws = (smask == label).astype(jnp.float32)
        nc, mean_c, cov_c = _masked_stats(xc, wc)
        ns, mean_s, cov_s = _masked_stats(xs, ws)
        valid = (
            (label >= 0)
            & (nc > min_pixels)
            & (ns > min_pixels)
            & (nc < max_ratio * ns)
            & (ns < max_ratio * nc)
        )
        t, b = _region_transform(mean_c, cov_c, mean_s, cov_s, eps)
        return t, b, valid

    ts, bs, valids = jax.vmap(per_label)(labels)  # (K,C,C), (K,C), (K,)

    def apply_one(out, args):
        t, b, valid, label = args
        y = t @ xc + b[:, None]
        sel = valid & (cmask == label)
        return jnp.where(sel[None, :], y, out), None

    out, _ = lax.scan(apply_one, xc, (ts, bs, valids, labels))
    return out


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
    """Regional cWCT guided by semantic masks.

    content_feat (B,Hc,Wc,C); cmask (B,Hc,Wc) int labels >= 0 (and likewise
    for style). Pixels whose label fails the validity rule keep their
    content features — same semantics as cWCT._transfer_seg
    (/root/reference/models/cWCT.py:49-109), minus the Python label loop.

    max_labels is the static region capacity K; content label sets larger
    than K are truncated by jnp.unique (first K distinct values).
    """
    shape = content_feat.shape
    dt = content_feat.dtype
    xc = _to_cn(content_feat).astype(jnp.float32)
    xs = _to_cn(style_feat).astype(jnp.float32)
    cm = cmask.reshape(cmask.shape[0], -1).astype(jnp.int32)
    sm = smask.reshape(smask.shape[0], -1).astype(jnp.int32)
    out = jax.vmap(
        lambda a, b, c, d: _transfer_seg_single(
            a, b, c, d, eps, max_labels, float(min_pixels), max_ratio
        )
    )(xc, xs, cm, sm)
    return _from_cn(out, shape).astype(dt)


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
    """Style interpolation (cWCT.interpolation,
    /root/reference/models/cWCT.py:206-262):

      mix_Ls = sum_i alpha_i * Ls_i, mix_mu = sum_i alpha_i * mu_i, then
      optionally blend with the content factor by alpha_c, and color the
      whitened content.
    """
    if isinstance(style_feats, (list, tuple)):
        style_feats = jnp.stack(style_feats)
    shape = content_feat.shape
    dt = content_feat.dtype
    xc = _to_cn(content_feat).astype(jnp.float32)  # (B, C, N)
    alpha_s = jnp.asarray(alpha_s, jnp.float32)

    def per_batch(xcb, xsb):
        # xcb (C, N); xsb (S, C, Ns)
        mean_c, cov_c = _feat_stats(xcb)
        lc = robust_cholesky(cov_c, eps)
        whiten = jax.scipy.linalg.solve_triangular(
            lc, xcb - mean_c[:, None], lower=True
        )

        def style_factor(xs1):
            mean_s, cov_s = _feat_stats(xs1)
            return robust_cholesky(cov_s, eps), mean_s

        ls_all, mu_all = jax.vmap(style_factor)(xsb)  # (S,C,C), (S,C)
        mix_ls = jnp.einsum("s,scd->cd", alpha_s, ls_all)
        mix_mu = jnp.einsum("s,sc->c", alpha_s, mu_all)

        mix_ls = mix_ls * (1.0 - alpha_c) + lc * alpha_c
        mix_mu = mix_mu * (1.0 - alpha_c) + mean_c * alpha_c

        return mix_ls @ whiten + mix_mu[:, None]

    xs = jax.vmap(_to_cn, in_axes=0)(style_feats)  # (S, B, C, Ns)
    xs = jnp.transpose(xs, (1, 0, 2, 3)).astype(jnp.float32)  # (B, S, C, Ns)
    out = jax.vmap(per_batch)(xc, xs)
    return _from_cn(out, shape).astype(dt)
