"""ADE20K label remapping — vectorized (no per-label Python loops).

Capability parity with SegReMapping
(/root/reference/models/segmentation/SegReMapping.py:5-136) and the package
hole removal (/root/reference/project/image_style/segment.py:534-560):

  * self_remapping:   labels covering < min_ratio of the image are replaced
    by the semantically-closest label that IS well represented, using the
    150x150 ADE20K relation table (column l = closeness ranking for label l).
  * cross_remapping:  content labels absent from the style mask are replaced
    by the closest label that IS present in the style.

TPU-first formulation: for all 150 labels at once, gather the relation
table's candidate matrix, mark which candidates qualify, and take the first
qualifying row via argmax-over-boolean — one fused gather/where pipeline,
jit-safe, O(150^2) tiny.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

NUM_CLASSES = 150
_DATA_DIR = os.path.join(os.path.dirname(__file__), "..", "data")


def load_label_mapping(path: str | None = None) -> jnp.ndarray:
    """(150, 150) int32 semantic-relation table; mapping[j, l] is the j-th
    closest label to l."""
    p = path or os.path.join(_DATA_DIR, "ade20k_semantic_rel.npy")
    return jnp.asarray(np.load(p).astype(np.int32))


def ade20k_palette(path: str | None = None) -> np.ndarray:
    p = path or os.path.join(_DATA_DIR, "ade20k_palette.npy")
    return np.load(p).astype(np.uint8)


def _first_qualifying(mapping, qualifies, fallback):
    """For each label l: the first candidate in mapping[:, l] for which
    qualifies[candidate] is True; else fallback[l].

    mapping (J, L) int; qualifies (NUM_CLASSES,) bool; fallback (L,) int.
    """
    q = qualifies[mapping]                     # (J, L) bool
    found = jnp.any(q, axis=0)                 # (L,)
    first = jnp.argmax(q, axis=0)              # first True row per column
    chosen = jnp.take_along_axis(mapping, first[None, :], axis=0)[0]
    return jnp.where(found, chosen, fallback)


def label_counts(seg, num_classes: int = NUM_CLASSES):
    """Pixel count per label. seg: int array, any shape.

    Compare-and-reduce rather than scatter-add: a 150-bin scatter over a
    full-resolution frame serializes on the TPU scalar core (~2.3 ms at
    512x512 — PERF.md masked-video section), while the broadcast compare
    + sum lowers to one vectorized reduction fusion (~4x faster). Counts
    are exact either way."""
    flat = seg.reshape(-1)
    bins = jnp.arange(num_classes, dtype=flat.dtype)
    return jnp.sum(flat[:, None] == bins[None, :], axis=0,
                   dtype=jnp.int32)


def self_remapping(seg, mapping, min_ratio: float = 0.02,
                   min_pixels_floor: int = 10):
    """Merge under-represented labels into their closest well-represented
    neighbor. seg: (H, W) or (B, H, W) int.

    Mirrors SegReMapping.self_remapping semantics: a small label moves to
    the first related label whose area ratio >= min_ratio; the
    min_pixels_floor matches the package's max(H*W*ratio, 10)
    (/root/reference/project/image_style/segment.py:549).
    """
    if seg.ndim == 3:
        return jax.vmap(
            lambda s: self_remapping(s, mapping, min_ratio, min_pixels_floor)
        )(seg)

    n_pixels = seg.shape[0] * seg.shape[1]
    min_pixels = max(int(n_pixels * min_ratio), min_pixels_floor)

    counts = label_counts(seg)
    present = counts > 0
    big = counts >= min_pixels

    identity = jnp.arange(NUM_CLASSES, dtype=jnp.int32)
    remapped = _first_qualifying(mapping, big, identity)
    # only small-but-present labels move; everything else keeps itself
    new_label = jnp.where(present & ~big, remapped, identity)
    return new_label[seg]


def cross_remapping(content_seg, style_seg, mapping):
    """Map content labels that the style lacks onto the closest label the
    style has (SegReMapping.cross_remapping semantics)."""
    if content_seg.ndim == 3:
        return jax.vmap(lambda c, s: cross_remapping(c, s, mapping))(
            content_seg, style_seg
        )

    c_counts = label_counts(content_seg)
    s_counts = label_counts(style_seg)
    in_style = s_counts > 0
    missing = (c_counts > 0) & ~in_style

    identity = jnp.arange(NUM_CLASSES, dtype=jnp.int32)
    remapped = _first_qualifying(mapping, in_style, identity)
    new_label = jnp.where(missing, remapped, identity)
    return new_label[content_seg]


def video_remap_plan(smask, mapping):
    """Per-video precompute for the masked-video fast path: the style mask
    is fixed, so the style presence vector and the cross-remap candidate
    table are frame-independent. smask: (H, W) or (1, H, W) int.

    Returns (in_style (150,) bool, cross_tab (150,) int32) where
    cross_tab[l] is the label a style-missing content label l moves to."""
    s_counts = label_counts(smask)
    in_style = s_counts > 0
    identity = jnp.arange(NUM_CLASSES, dtype=jnp.int32)
    cross_tab = _first_qualifying(mapping, in_style, identity)
    return in_style, cross_tab


def video_remap(seg, in_style, cross_tab, mapping, min_ratio: float = 0.02,
                min_pixels_floor: int = 10):
    """self_remapping + cross_remapping composed into ONE 150-entry table
    and ONE per-pixel gather.

    The sequential calls cost three full-resolution histograms and two
    full-resolution gathers per frame (~16 ms/frame at 512 squared on
    v5e — PERF.md); the composition needs one of each: for a pixel with
    label l, m1 = self_map[l] is by construction present in the
    self-remapped frame (the pixel itself), so the cross step reduces to
    a pure table lookup — no second histogram. Bit-equal to
    cross_remapping(self_remapping(seg, ...), smask, ...) (tested).

    seg: (H, W) or (B, H, W); in_style/cross_tab from video_remap_plan."""
    if seg.ndim == 3:
        return jax.vmap(
            lambda s: video_remap(s, in_style, cross_tab, mapping,
                                  min_ratio, min_pixels_floor)
        )(seg)

    n_pixels = seg.shape[0] * seg.shape[1]
    min_pixels = max(int(n_pixels * min_ratio), min_pixels_floor)

    counts = label_counts(seg)
    present = counts > 0
    big = counts >= min_pixels

    identity = jnp.arange(NUM_CLASSES, dtype=jnp.int32)
    remapped = _first_qualifying(mapping, big, identity)
    self_map = jnp.where(present & ~big, remapped, identity)
    composed = jnp.where(in_style[self_map], self_map, cross_tab[self_map])
    return composed[seg]


def remove_small_holes(seg, mapping, min_ratio: float = 0.01):
    """Package-tier hole removal (segment.py:544-560) — same operation as
    self_remapping but with the guide set = labels above the pixel floor
    (no ratio requirement on the destination beyond the floor)."""
    return self_remapping(seg, mapping, min_ratio=min_ratio)
