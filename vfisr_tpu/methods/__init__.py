from vfisr_tpu.methods.inline import (
    linear_blend,
    frame_dup,
    edge_enhance,
    flow_interpolate,
    detect_ui_mask,
    ui_aware_interpolate,
    estimate_motion_complexity,
    mcar_interpolate_cached,
    estimate_uncertainty,
    ughi_interpolate,
    calc_motion,
)

__all__ = [
    "linear_blend",
    "frame_dup",
    "edge_enhance",
    "flow_interpolate",
    "detect_ui_mask",
    "ui_aware_interpolate",
    "estimate_motion_complexity",
    "mcar_interpolate_cached",
    "estimate_uncertainty",
    "ughi_interpolate",
    "calc_motion",
]
