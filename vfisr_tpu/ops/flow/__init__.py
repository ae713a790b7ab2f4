"""Dense optical flow kernels."""

from vfisr_tpu.ops.flow.farneback import farneback_flow, flow_magnitude

__all__ = ["farneback_flow", "flow_magnitude"]
