"""Traditional (non-deep-learning) baseline models.

Rebuild of reference models/traditional/baselines.py (Bicubic/Lanczos
crossfade+SR and Farneback-flow VFI) with the pixel math on device:

- VFI "interpolation" for Bicubic/Lanczos is a linear crossfade
  ``(1-t)·f0 + t·f1`` (reference baselines.py:55-70; note the reference
  truncates the float blend to uint8 — reproduced here).
- SR uses the cv2-parity resize kernels (INTER_CUBIC / INTER_LANCZOS4,
  baselines.py:71-75,120-125).
- OpticalFlowVFI: bidirectional Farneback (0.5/3/15/3/5/1.2), scale flows
  by t and (1-t), warp both frames with BORDER_REFLECT, distance-weighted
  blend (baselines.py:128-248).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vfisr_tpu.core.color import rgb_to_gray
from vfisr_tpu.core.frames import from_batched, to_batched
from vfisr_tpu.core.resize import resize, scale_size
from vfisr_tpu.core.warp import flow_warp
from vfisr_tpu.models.base import BaseModel, ModelInfo
from vfisr_tpu.ops.flow import farneback_flow


@functools.partial(jax.jit, static_argnames=("timestamps",))
def _crossfade_batch(
    x0: jnp.ndarray, x1: jnp.ndarray, timestamps: Tuple[float, ...]
) -> jnp.ndarray:
    """[N,H,W,3] pair → [N,T,H,W,3] linear blends.

    Matches the reference's float-blend-then-uint8-truncate by flooring at
    the 1/255 grid (baselines.py:58-64 does float32 addWeighted then
    .astype(np.uint8), which truncates).
    """
    ts = jnp.asarray(timestamps, x0.dtype).reshape(1, -1, 1, 1, 1)
    blend = x0[:, None] * (1.0 - ts) + x1[:, None] * ts
    return jnp.floor(blend * 255.0) / 255.0


class BicubicBaseline(BaseModel):
    """Crossfade VFI + bicubic SR (reference baselines.py:16-75)."""

    SR_METHOD = "cubic"
    NAME = "Bicubic"
    DESC = "Bicubic interpolation - simplest baseline"

    @property
    def info(self) -> ModelInfo:
        return ModelInfo(
            name=self.NAME,
            type="traditional",
            supports_vfi=False,  # only blending, not true VFI
            supports_sr=True,
            supports_joint=False,
            parameters=0,
            requires_gpu=False,
            description=self.DESC,
        )

    def load(self) -> None:
        self._loaded = True

    def interpolate_batch(self, x0, x1, timestamps):
        return _crossfade_batch(x0, x1, timestamps)

    def upscale_batch(self, x, scale: float = 1.333):
        h, w = x.shape[-3:-1]
        return resize(x, scale_size(h, w, scale), self.SR_METHOD)

    def upscale(self, frame: np.ndarray, scale: float = 1.333) -> np.ndarray:
        h, w = frame.shape[:2]
        return np.asarray(resize(frame, scale_size(h, w, scale), self.SR_METHOD))


class LanczosBaseline(BicubicBaseline):
    """Crossfade VFI + Lanczos4 SR (reference baselines.py:78-125)."""

    SR_METHOD = "lanczos4"
    NAME = "Lanczos"
    DESC = "Lanczos interpolation - higher quality traditional SR"


@functools.partial(jax.jit, static_argnames=("timestamps",))
def _flow_vfi_batch(
    x0: jnp.ndarray, x1: jnp.ndarray, timestamps: Tuple[float, ...]
) -> jnp.ndarray:
    """Bidirectional-Farneback VFI core: [N,H,W,3] → [N,T,H,W,3]."""
    g0 = rgb_to_gray(x0 * 255.0)
    g1 = rgb_to_gray(x1 * 255.0)
    flow_fwd = farneback_flow(g0, g1, 0.5, 3, 15, 3, 5, 1.2)
    flow_bwd = farneback_flow(g1, g0, 0.5, 3, 15, 3, 5, 1.2)
    outs = []
    for t in timestamps:
        warped0 = flow_warp(x0, flow_fwd, t, border="reflect")
        warped1 = flow_warp(x1, flow_bwd, 1.0 - t, border="reflect")
        blend = warped0 * (1.0 - t) + warped1 * t
        outs.append(jnp.floor(blend * 255.0) / 255.0)
    return jnp.stack(outs, axis=1)


class OpticalFlowVFI(BaseModel):
    """Farneback optical-flow VFI (reference baselines.py:128-248)."""

    @property
    def info(self) -> ModelInfo:
        return ModelInfo(
            name="OpticalFlow_Farneback",
            type="traditional",
            supports_vfi=True,
            supports_sr=True,
            supports_joint=False,
            parameters=0,
            requires_gpu=False,
            description="Farneback optical flow - traditional VFI",
        )

    def load(self) -> None:
        self._loaded = True

    def interpolate_batch(self, x0, x1, timestamps):
        return _flow_vfi_batch(x0, x1, timestamps)

    def upscale_batch(self, x, scale: float = 1.333):
        h, w = x.shape[-3:-1]
        return resize(x, scale_size(h, w, scale), "lanczos4")

    def upscale(self, frame: np.ndarray, scale: float = 1.333) -> np.ndarray:
        h, w = frame.shape[:2]
        return np.asarray(resize(frame, scale_size(h, w, scale), "lanczos4"))


def get_traditional_models() -> dict:
    """name → class mapping (reference baselines.py:252-258)."""
    return {
        "bicubic": BicubicBaseline,
        "lanczos": LanczosBaseline,
        "optical_flow": OpticalFlowVFI,
    }
