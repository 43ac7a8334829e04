"""vstnet_tpu — TPU-native versatile style transfer framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of CAP-VSTNet
(delldu/VSTNet): reversible encoder/decoder stylization, Cholesky
whitening-coloring transfer (global / regional / interpolated), SegFormer
semantic guidance, photo & artistic modes, image & video pipelines, and
TPU-sharded batch execution.

Public API (mirrors the reference `image_style` package surface,
/root/reference/project/image_style/__init__.py:24-127):

    from vstnet_tpu import (
        get_vstnet_encoder_model, get_vstnet_decoder_model,
        get_segment_model,
        get_photo_style_model, get_artist_style_model,
        image_photo_predict,
    )

The encoder/decoder/segment factories return `(fn, device)` like the
reference's `(scripted_module, device)` pairs; `fn` is a jit-compiled
pure function with the weights closed over (the torch.jit.script
analogue), taking/returning NHWC float arrays.
"""

__version__ = "0.1.0"

from vstnet_tpu.runtime.cache import enable_persistent_cache as _epc

_epc()  # persistent XLA compile cache: first-run compiles become disk hits

from vstnet_tpu.config import (  # noqa: F401
    RevResNetConfig,
    PHOTO_CONFIG,
    ARTISTIC_CONFIG,
)


def get_vstnet_encoder_model(checkpoint=None, mode: str = "photorealistic"):
    """(encode_fn, device) — reference __init__.py:24-37. encode_fn:
    NHWC image [0,1] -> latent."""
    import functools

    import jax

    from vstnet_tpu.models.pipeline import StyleModel
    from vstnet_tpu.models.revresnet import encode

    model = (StyleModel.from_checkpoint(checkpoint, mode=mode)
             if checkpoint else StyleModel.random_init(mode=mode))
    device = jax.devices()[0]
    print(f"Running on {device} ...")
    fn = jax.jit(functools.partial(encode, model.params, cfg=model.cfg))
    return fn, device


def get_vstnet_decoder_model(checkpoint=None, mode: str = "photorealistic"):
    """(decode_fn, device) — reference __init__.py:40-53. decode_fn:
    latent -> NHWC image, clamped to [0,1] (vstnet.py:322 clamps
    in-model)."""
    import functools

    import jax
    import jax.numpy as jnp

    from vstnet_tpu.models.pipeline import StyleModel
    from vstnet_tpu.models.revresnet import decode

    model = (StyleModel.from_checkpoint(checkpoint, mode=mode)
             if checkpoint else StyleModel.random_init(mode=mode))
    device = jax.devices()[0]
    print(f"Running on {device} ...")
    dec = functools.partial(decode, model.params, cfg=model.cfg)
    fn = jax.jit(lambda z: jnp.clip(dec(z), 0.0, 1.0))
    return fn, device


def get_segment_model(checkpoint=None):
    """(segment_fn, device) — reference __init__.py:56-69. segment_fn:
    NHWC image [0,1] -> (B, H, W) int32 ADE20K mask with small holes
    removed (SegmentModel's in-model post-processing)."""
    import jax

    from vstnet_tpu.models.segformer import Segmenter

    seg = Segmenter.load(checkpoint)
    device = jax.devices()[0]
    print(f"Running on {device} ...")
    return seg.segment, device


def get_photo_style_model(*args, **kwargs):
    from vstnet_tpu.models.pipeline import create_photo_style_model

    return create_photo_style_model(*args, **kwargs)


def get_artist_style_model(*args, **kwargs):
    from vstnet_tpu.models.pipeline import create_artist_style_model

    return create_artist_style_model(*args, **kwargs)


def image_photo_predict(*args, **kwargs):
    from vstnet_tpu.models.pipeline import image_photo_predict

    return image_photo_predict(*args, **kwargs)
