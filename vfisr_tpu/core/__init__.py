"""Core tensor/frame layer: layout conventions and resampling kernels."""

from vfisr_tpu.core.frames import (
    to_float,
    to_uint8,
    to_batched,
    from_batched,
    pad_to_multiple,
    unpad,
    get_default_timestamps,
)
from vfisr_tpu.core.color import rgb_to_gray, bgr_to_gray, rgb_to_bgr
from vfisr_tpu.core.resize import resize, crop_16_9
from vfisr_tpu.core.warp import flow_warp, remap_bilinear

__all__ = [
    "to_float",
    "to_uint8",
    "to_batched",
    "from_batched",
    "pad_to_multiple",
    "unpad",
    "get_default_timestamps",
    "rgb_to_gray",
    "bgr_to_gray",
    "rgb_to_bgr",
    "resize",
    "crop_16_9",
    "flow_warp",
    "remap_bilinear",
]
