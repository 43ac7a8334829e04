"""vstnet_tpu — TPU-native versatile style transfer framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of CAP-VSTNet
(delldu/VSTNet): reversible encoder/decoder stylization, Cholesky
whitening-coloring transfer (global / regional / interpolated), SegFormer
semantic guidance, photo & artistic modes, image & video pipelines, and
TPU-sharded batch execution.

Public API (mirrors the reference `image_style` package surface,
/root/reference/project/image_style/__init__.py:24-127):

    from vstnet_tpu import (
        get_photo_style_model, get_artist_style_model,
        image_photo_predict,
    )
"""

__version__ = "0.1.0"

from vstnet_tpu.runtime.cache import enable_persistent_cache as _epc

_epc()  # persistent XLA compile cache: first-run compiles become disk hits

from vstnet_tpu.config import (  # noqa: F401
    RevResNetConfig,
    PHOTO_CONFIG,
    ARTISTIC_CONFIG,
)


def get_photo_style_model(*args, **kwargs):
    from vstnet_tpu.models.pipeline import create_photo_style_model

    return create_photo_style_model(*args, **kwargs)


def get_artist_style_model(*args, **kwargs):
    from vstnet_tpu.models.pipeline import create_artist_style_model

    return create_artist_style_model(*args, **kwargs)


def image_photo_predict(*args, **kwargs):
    from vstnet_tpu.models.pipeline import image_photo_predict

    return image_photo_predict(*args, **kwargs)
