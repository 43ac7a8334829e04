"""Optical-flow warping (nearest, border padding) for the temporal loss.

Replicates the reference warp (/root/reference/utils/TemporalLoss.py:13-31):
sample position = pixel_grid - flow, pushed through grid_sample with
mode='nearest', padding_mode='border', align_corners=False. With
align_corners=False the normalized->pixel mapping introduces a W/(W-1)
scale; we reproduce it exactly so warped outputs match torch bit-for-bit
(modulo round-half-even which both use).
"""

from __future__ import annotations

import jax.numpy as jnp


def flow_warp_nearest(x, flow):
    """x: (B, H, W, C); flow: (B, H, W, 2) with (dx, dy) like the reference
    flow layout (channel 0 = x displacement)."""
    b, h, w, _ = x.shape
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    vx = xx - flow[..., 0]
    vy = yy - flow[..., 1]

    # Replicate the reference's exact float sequence so tie positions
    # (x.5) round identically: normalize to [-1, 1] with /(S-1)
    # (TemporalLoss.py:27-28), then torch's align_corners=False
    # unnormalize ((g+1)*S - 1)/2. One fused p = v*S/(S-1) - 0.5 is the
    # same real number but not the same float32, and round-half-even then
    # diverges at ties (bit-parity tested vs torch in tests/test_warp.py).
    gx = 2.0 * vx / max(w - 1, 1) - 1.0
    gy = 2.0 * vy / max(h - 1, 1) - 1.0
    px = ((gx + 1.0) * w - 1.0) * 0.5
    py = ((gy + 1.0) * h - 1.0) * 0.5

    ix = jnp.clip(jnp.round(px).astype(jnp.int32), 0, w - 1)
    iy = jnp.clip(jnp.round(py).astype(jnp.int32), 0, h - 1)

    batch_idx = jnp.arange(b)[:, None, None]
    return x[batch_idx, iy, ix]


def generate_fake_flow(rng, h: int, w: int, motion_level: float = 8.0,
                       shift_level: float = 10.0):
    """Smooth random flow field, host-side numpy (matches the intent of
    TemporalLoss.GenerateFakeFlow, TemporalLoss.py:61-76: coarse normal
    noise upsampled + global shift + heavy blur). cv2 isn't in this image,
    so resize/blur use PIL-free numpy ops (bilinear via jax.image at call
    sites would also work; this stays host-side like the reference)."""
    import numpy as np

    coarse = rng.normal(0.0, motion_level, size=(max(h // 100, 1),
                                                 max(w // 100, 1), 2))
    flow = _resize_bilinear_np(coarse, h, w)
    flow[:, :, 0] += rng.integers(-int(shift_level), int(shift_level) + 1)
    flow[:, :, 1] += rng.integers(-int(shift_level), int(shift_level) + 1)
    flow = _box_blur_np(flow, min(100, h, w))
    return flow.astype(np.float32)


def _resize_bilinear_np(a, h, w):
    import numpy as np

    sh, sw = a.shape[:2]
    ys = (np.arange(h) + 0.5) * sh / h - 0.5
    xs = (np.arange(w) + 0.5) * sw / w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, sh - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, sw - 1)
    y1 = np.clip(y0 + 1, 0, sh - 1)
    x1 = np.clip(x0 + 1, 0, sw - 1)
    fy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    fx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    a00 = a[y0][:, x0]
    a01 = a[y0][:, x1]
    a10 = a[y1][:, x0]
    a11 = a[y1][:, x1]
    return (a00 * (1 - fy) * (1 - fx) + a01 * (1 - fy) * fx
            + a10 * fy * (1 - fx) + a11 * fy * fx)


def _box_blur_np(a, k: int):
    import numpy as np

    if k <= 1:
        return a
    pad = k // 2
    out = np.empty_like(a)
    for c in range(a.shape[2]):
        p = np.pad(a[:, :, c], pad, mode="edge")
        cs = np.cumsum(np.cumsum(p, axis=0), axis=1)
        cs = np.pad(cs, ((1, 0), (1, 0)))
        h, w = a.shape[:2]
        out[:, :, c] = (
            cs[k:k + h, k:k + w] - cs[0:h, k:k + w]
            - cs[k:k + h, 0:w] + cs[0:h, 0:w]
        ) / (k * k)
    return out
