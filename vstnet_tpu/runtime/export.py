"""Ahead-of-time export of compiled programs (StableHLO).

The TPU-native analogue of the reference's ONNX export path
(/root/reference/project/smoke.py:81-330). The reference exports three
artifacts — encoder, decoder, segmenter (smoke.py:81,148,222) — each gated
by a torch-vs-ONNX output-equivalence assert (rtol=atol=0.01, smoke.py:145,
216,280); here the same three artifacts (plus the fused full-stylize
program) are exported via jax.export, runnable by the native engine
(runtime/native.py) or any PJRT runtime, with the equivalence gate
reproduced in tests/test_runtime.py against the deserialized modules.

`platforms` picks the lowering target: ("tpu",) produces a module free of
CPU-only custom calls (e.g. Cholesky stays an HLO op instead of a LAPACK
FFI call) so a TPU PJRT plugin can compile it; pass ("cpu",) for a
CPU-plugin artifact. None lowers for the current default backend.
"""

from __future__ import annotations

import os


def _export(fn, args, platforms):
    import jax
    from jax import export as jexport

    jitted = jax.jit(fn)
    if platforms is not None:
        exp = jexport.export(jitted, platforms=list(platforms))(*args)
    else:
        exp = jexport.export(jitted)(*args)
    return exp


def export_stylize(params, cfg, h: int, w: int, batch: int = 1,
                   bake_weights: bool = True, platforms=None,
                   serialized: bool = False):
    """-> (artifact_bytes, out_shape). The full stylize program
    encode(c), encode(s), cWCT, decode at a fixed (bucketed) shape.

    serialized=False returns the raw StableHLO module text (what a PJRT
    runtime compiles); True returns the jax.export serialization (which
    jax.export.deserialize can call — used by the parity gate)."""
    import jax
    import jax.numpy as jnp

    from vstnet_tpu.models import cwct
    from vstnet_tpu.models.revresnet import decode, encode

    def stylize(p, content, style):
        z_c = encode(p, content, cfg)
        z_s = encode(p, style, cfg)
        return decode(p, cwct.transfer(z_c, z_s), cfg)

    img = jax.ShapeDtypeStruct((batch, h, w, 3), jnp.float32)
    if bake_weights:
        exp = _export(lambda c, s: stylize(params, c, s), (img, img),
                      platforms)
    else:
        p_spec = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params)
        exp = _export(stylize, (p_spec, img, img), platforms)
    blob = exp.serialize() if serialized else exp.mlir_module().encode()
    return blob, (batch, h, w, 3)


def export_encoder(params, cfg, h: int, w: int, batch: int = 1,
                   platforms=None, serialized: bool = False):
    """Encoder artifact (reference: export_vst_encoder_onnx_model,
    project/smoke.py:81-147)."""
    import jax
    import jax.numpy as jnp

    from vstnet_tpu.models.revresnet import encode, latent_shape

    img = jax.ShapeDtypeStruct((batch, h, w, 3), jnp.float32)
    exp = _export(lambda x: encode(params, x, cfg), (img,), platforms)
    lh, lw, lc = latent_shape(cfg, h, w)
    blob = exp.serialize() if serialized else exp.mlir_module().encode()
    return blob, (batch, lh, lw, lc)


def export_decoder(params, cfg, h: int, w: int, batch: int = 1,
                   platforms=None, serialized: bool = False):
    """Decoder artifact (reference: export_vst_decoder_onnx_model,
    project/smoke.py:148-219). h/w are IMAGE dims; the input signature is
    the corresponding latent."""
    import jax
    import jax.numpy as jnp

    from vstnet_tpu.models.revresnet import decode, latent_shape

    lh, lw, lc = latent_shape(cfg, h, w)
    z = jax.ShapeDtypeStruct((batch, lh, lw, lc), jnp.float32)
    exp = _export(lambda x: decode(params, x, cfg), (z,), platforms)
    blob = exp.serialize() if serialized else exp.mlir_module().encode()
    return blob, (batch, h, w, 3)


def export_segmenter(seg_params, h: int, w: int, batch: int = 1,
                     platforms=None, serialized: bool = False):
    """SegFormer-B4 mask artifact (reference native tier runs the full
    segmenter, project/ggml/src/segformer.h:858-923 driven by
    project/ggml/main.cpp:75-98; ONNX twin project/smoke.py:222-284).
    Output is the int32 ADE20K label mask (B, H, W)."""
    import jax
    import jax.numpy as jnp

    from vstnet_tpu.models.segformer import segment_mask

    img = jax.ShapeDtypeStruct((batch, h, w, 3), jnp.float32)
    exp = _export(
        lambda x: segment_mask(seg_params, x).astype(jnp.int32),
        (img,), platforms)
    blob = exp.serialize() if serialized else exp.mlir_module().encode()
    return blob, (batch, h, w)


def export_segment_render(seg_params, h: int, w: int, blend: float = 0.5,
                          min_ratio: float = 0.02, platforms=None,
                          serialized: bool = False, label_mapping=None,
                          palette=None):
    """Segment-and-render artifact: the reference native binary's whole
    job (project/ggml/main.cpp:75-98 drives SegmentModel only; its
    post-proc — segment_remove_holes + palette render + 50/50 blend —
    lives in project/ggml/src/segment.cpp:38-137 against compiled-in
    ade20k.h data tables). Here ALL of it is in-graph: segment ->
    self-remap (hole removal) -> palette gather -> blend, with the
    ADE20K palette and relation table baked as graph constants — the
    native driver stays a generic artifact runner with zero data tables.

    Output: (1, H, W, 3) f32 in [0,1] — blend * palette_color +
    (1 - blend) * input. blend=1.0 gives the pure label-color render."""
    import jax
    import jax.numpy as jnp

    from vstnet_tpu.models.remapping import (
        ade20k_palette,
        load_label_mapping,
        self_remapping,
    )
    from vstnet_tpu.models.segformer import segment_mask

    mapping = (load_label_mapping() if label_mapping is None
               else label_mapping)
    pal = jnp.asarray(
        (ade20k_palette() if palette is None else palette),
        jnp.float32) / 255.0

    def render(x):
        m = segment_mask(seg_params, x)
        m = self_remapping(m, mapping, min_ratio)
        color = pal[jnp.clip(m, 0, pal.shape[0] - 1)]
        return jnp.clip(blend * color + (1.0 - blend) * x, 0.0, 1.0)

    img = jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32)
    exp = _export(render, (img,), platforms)
    blob = exp.serialize() if serialized else exp.mlir_module().encode()
    return blob, (1, h, w, 3)


def save_exported(path: str, mlir_bytes: bytes):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(mlir_bytes)
    return path
