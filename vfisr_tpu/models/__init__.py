"""Model zoo behind the reference BaseModel contract.

Sub-packages mirror the reference layout (models/{base,traditional,sota,
novel}) with TPU-native internals: every model's compute path is a jitted
batched NHWC program; the numpy list API is a host-boundary adapter.
"""

from vfisr_tpu.models.base import (
    ModelInfo,
    InferenceResult,
    BaseModel,
    JointModel,
    TwoStageModel,
)

__all__ = ["ModelInfo", "InferenceResult", "BaseModel", "JointModel", "TwoStageModel"]
