from vstnet_tpu.ops.coupling import (  # noqa: F401
    channel_split,
    channel_merge,
    injective_pad,
    injective_unpad,
    pixel_unshuffle,
    pixel_shuffle,
)
from vstnet_tpu.ops.pad_conv import reflect_conv  # noqa: F401
