"""Pallas TPU kernels for the hot ops."""

from vfisr_tpu.ops.pallas.warp import warp_windowed

__all__ = ["warp_windowed"]
