from vfisr_tpu.models.traditional.baselines import (
    BicubicBaseline,
    LanczosBaseline,
    OpticalFlowVFI,
    get_traditional_models,
)

__all__ = [
    "BicubicBaseline",
    "LanczosBaseline",
    "OpticalFlowVFI",
    "get_traditional_models",
]
