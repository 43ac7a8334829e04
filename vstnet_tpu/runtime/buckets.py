"""Shape bucketing: bounded compile count under arbitrary input sizes.

The reference rebuilds its GGML graph per call for dynamic shapes
(ggml_engine.h:473-475) and stress-tests ±16 px shape jitter
(project/smoke.py:20-54). Under XLA each distinct shape is a compilation,
so the TPU-native equivalent is a small set of compiled buckets: inputs are
replicate-padded up to the next bucket (consistent with the pipeline's own
/4 padding) and outputs cropped back. With the default 64-px bucket grid, a
±16 px sweep hits at most a handful of executables.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from vstnet_tpu.ops.resize import pad_to_multiple


def bucket_hw(h: int, w: int, grid: int = 64,
              max_hw: Tuple[int, int] = (2048, 2048)) -> Tuple[int, int]:
    bh = min(-(-h // grid) * grid, max_hw[0])
    bw = min(-(-w // grid) * grid, max_hw[1])
    return bh, bw


def pad_to_bucket(x, grid: int = 64):
    """NHWC -> (padded NHWC, (orig_h, orig_w)). Replicate padding (matches
    pad_tensor semantics, project/image_style/vstnet.py:180-187)."""
    h, w = x.shape[1], x.shape[2]
    bh, bw = bucket_hw(h, w, grid)
    if (bh, bw) == (h, w):
        return x, (h, w)
    pad = [(0, 0), (0, bh - h), (0, bw - w), (0, 0)]
    return jnp.pad(x, pad, mode="edge"), (h, w)


def crop_from_bucket(y, hw: Tuple[int, int]):
    h, w = hw
    return y[:, :h, :w]


class BucketedStylizer:
    """Caches one compiled stylize per (bucket, batch) pair."""

    def __init__(self, model, grid: int = 64):
        self.model = model
        self.grid = grid

    def __call__(self, content, style):
        c, hw = pad_to_bucket(content, self.grid)
        s, _ = pad_to_bucket(style, self.grid)
        out = self.model.stylize(c, s)
        return crop_from_bucket(out, hw)
