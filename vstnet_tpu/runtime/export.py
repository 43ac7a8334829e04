"""Ahead-of-time export of stylization programs (StableHLO).

The TPU-native analogue of the reference's ONNX export path
(/root/reference/project/smoke.py:81-330): a compiled artifact the native
engine (runtime/native.py) or any PJRT runtime can load — with the
reference's output-equivalence gate reproduced in tests.
"""

from __future__ import annotations

import os


def export_stylize(params, cfg, h: int, w: int, batch: int = 1,
                   bake_weights: bool = True):
    """-> (mlir_bytes, out_shape). The full stylize program
    encode(c), encode(s), cWCT, decode at a fixed (bucketed) shape."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from vstnet_tpu.models import cwct
    from vstnet_tpu.models.revresnet import decode, encode

    def stylize(p, content, style):
        z_c = encode(p, content, cfg)
        z_s = encode(p, style, cfg)
        return decode(p, cwct.transfer(z_c, z_s), cfg)

    img = jax.ShapeDtypeStruct((batch, h, w, 3), jnp.float32)
    if bake_weights:
        fn = jax.jit(lambda c, s: stylize(params, c, s))
        exp = jexport.export(fn)(img, img)
    else:
        fn = jax.jit(stylize)
        p_spec = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params)
        exp = jexport.export(fn)(p_spec, img, img)
    return exp.mlir_module().encode(), (batch, h, w, 3)


def export_encoder(params, cfg, h: int, w: int, batch: int = 1):
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from vstnet_tpu.models.revresnet import encode, latent_shape

    img = jax.ShapeDtypeStruct((batch, h, w, 3), jnp.float32)
    fn = jax.jit(lambda x: encode(params, x, cfg))
    exp = jexport.export(fn)(img)
    lh, lw, lc = latent_shape(cfg, h, w)
    return exp.mlir_module().encode(), (batch, lh, lw, lc)


def save_exported(path: str, mlir_bytes: bytes):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(mlir_bytes)
    return path
