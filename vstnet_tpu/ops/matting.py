"""Matting-Laplacian photorealism regularizer — matrix-free, on-device.

The reference builds a sparse (HW x HW) matting Laplacian per crop on the
CPU in DataLoader workers (numpy sliding windows + per-window 3x3 inverses,
/root/reference/utils/MattingLaplacian.py:15-81) and computes
loss = x^T L x / HW and grad = 2 L x / HW per channel
(laplacian_loss_grad, :84-96).

TPU-first reformulation (win_rad=1): L = D - W never needs materializing.
With window size n=9, per window k (guidance image I, window mean mu_k,
regularized covariance inverse V_k):

    W_ij^k = (1/n) * (1 + (I_i - mu_k)^T V_k (I_j - mu_k))
    sum_j W_ij^k = 1                       (since sum_j (I_j - mu_k) = 0)
    =>  D_ii = #windows containing i  (a box count)

    x^T W x = sum_k (1/n) [ s1_k^2 + t_k^T V_k t_k ]
        s1_k = sum_{i in k} x_i          (3x3 box sum of x)
        t_k  = sum_{i in k} x_i I_i - mu_k s1_k

so the whole quadratic form is a handful of 3x3 box filters plus a
closed-form 3x3 inverse per window — all dense, fused by XLA, and
differentiable (jax.grad gives exactly 2 L x). The expensive host-side
Laplacian precompute of the reference disappears entirely.

Numerical equivalence with the reference's sparse construction is covered
by tests/test_matting.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

WIN_SIZE = 9.0


def _box3_valid(x):
    """VALID 3x3 box sum over H,W of an NHWC tensor."""
    return lax.reduce_window(
        x, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "VALID"
    )


def _inv3x3(m):
    """Closed-form inverse of (..., 3, 3) SPD matrices (adjugate/det)."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    co_a = e * i - f * h
    co_b = -(d * i - f * g)
    co_c = d * h - e * g
    det = a * co_a + b * co_b + c * co_c
    adj = jnp.stack([
        jnp.stack([co_a, -(b * i - c * h), b * f - c * e], -1),
        jnp.stack([co_b, a * i - c * g, -(a * f - c * d)], -1),
        jnp.stack([co_c, -(a * h - b * g), a * e - b * d], -1),
    ], -2)
    return adj / det[..., None, None]


def matting_laplacian_quadform(image, x, eps: float = 1e-7):
    """sum over channels of x_c^T L(image) x_c.

    image: (B, H, W, 3) guidance in [0,1] (the CONTENT crop — the reference
    builds L from the content image, utils/dataset.py:72-75).
    x:     (B, H, W, C) the field the Laplacian acts on (stylized RGB).
    Returns (B,) per-sample quadratic forms (unnormalized — the /HW of
    laplacian_loss_grad is applied by the caller).

    Numerics: everything is computed in CENTERED form. Using the algebraic
    identity x^T L x = sum_k [ sum_i (x_i - xbar_k)^2 - (1/n) t_k^T V_k t_k ]
    with t_k = sum_i (x_i - xbar_k)(I_i - mu_k) keeps all products at the
    local-contrast scale — the uncentered E[II^T] - mu mu^T form cancels
    catastrophically in f32 on flat image regions (the per-window inverse is
    eps-dominated there, amplifying the cancellation ~1e7x).
    """
    img = image.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    b, h, w, _ = img.shape
    hc, wc = h - 2, w - 2
    c = xf.shape[-1]

    mu = _box3_valid(img) / WIN_SIZE      # (B,Hc,Wc,3)
    xbar = _box3_valid(xf) / WIN_SIZE     # (B,Hc,Wc,C)

    cov = jnp.zeros((b, hc, wc, 3, 3), jnp.float32)
    q = jnp.zeros((b, hc, wc, c), jnp.float32)
    t = jnp.zeros((b, hc, wc, c, 3), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            di = img[:, dy:dy + hc, dx:dx + wc, :] - mu      # (B,Hc,Wc,3)
            dxv = xf[:, dy:dy + hc, dx:dx + wc, :] - xbar    # (B,Hc,Wc,C)
            cov = cov + di[..., :, None] * di[..., None, :]
            q = q + dxv * dxv
            t = t + dxv[..., :, None] * di[..., None, :]

    v = _inv3x3(
        cov / WIN_SIZE + (eps / WIN_SIZE) * jnp.eye(3, dtype=jnp.float32)
    )

    tv = jnp.einsum("nhwca,nhwad->nhwcd", t, v)
    tvt = jnp.einsum("nhwcd,nhwcd->n", tv, t)
    return jnp.einsum("nhwc->n", q) - tvt / WIN_SIZE


def matting_loss_and_grad(image, x, eps: float = 1e-7):
    """Per-sample loss = x^T L x / HW and grad = 2 L x / HW — the exact
    contract of laplacian_loss_grad (MattingLaplacian.py:84-96)."""
    hw = x.shape[1] * x.shape[2]

    def f(xx):
        return jnp.sum(matting_laplacian_quadform(image, xx, eps)) / hw

    loss, grad = jax.value_and_grad(f)(x)
    per_sample = matting_laplacian_quadform(image, x, eps) / hw
    return per_sample, grad


def matting_grad(image, x, weight: float, clamp: float = 0.05,
                 eps: float = 1e-7):
    """The gradient the reference injects into stylized.backward
    (train.py:164-177): 2Lx/HW scaled by weight, clamped to ±clamp."""
    hw = x.shape[1] * x.shape[2]
    grad = jax.grad(
        lambda xx: jnp.sum(matting_laplacian_quadform(image, xx, eps)) / hw
    )(x)
    return jnp.clip(grad * weight, -clamp, clamp)
