"""Classical vision kernels (batched, jit-compiled, NHWC).

These re-implement the OpenCV primitives the reference leans on
(GaussianBlur, Sobel, Laplacian, Canny, morphology, Farneback flow) as XLA
programs so the router/metrics run on-device without host round-trips.
"""

from vfisr_tpu.ops.conv import (
    gaussian_kernel1d,
    gaussian_blur,
    sep_filter2d,
    filter2d,
    box_filter,
    sobel,
    laplacian,
)
from vfisr_tpu.ops.ssim import ssim, ssim_global
from vfisr_tpu.ops.morphology import dilate, erode, morph_close, morph_open
from vfisr_tpu.ops.edges import canny

__all__ = [
    "gaussian_kernel1d",
    "gaussian_blur",
    "sep_filter2d",
    "filter2d",
    "box_filter",
    "sobel",
    "laplacian",
    "ssim",
    "ssim_global",
    "dilate",
    "erode",
    "morph_close",
    "morph_open",
    "canny",
]
