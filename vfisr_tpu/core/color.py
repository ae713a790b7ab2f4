"""Color conversions matching OpenCV's Rec.601 coefficients.

The reference uses ``cv2.cvtColor(..., cv2.COLOR_BGR2GRAY)`` throughout its
router/metrics (e.g. reference models/novel/adaptive_pipeline.py:140-160,
evaluation/metrics.py:367-382). OpenCV gray = 0.299 R + 0.587 G + 0.114 B.
"""

from __future__ import annotations

import jax.numpy as jnp

# Rec.601 luma weights, as used by OpenCV cvtColor.
_R, _G, _B = 0.299, 0.587, 0.114


def rgb_to_gray(x: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W, 3] RGB → [..., H, W] gray (same dtype family as input).

    Float in → float out (unclamped); uint8 in → uint8 out with OpenCV
    rounding.
    """
    xf = x.astype(jnp.float32)
    g = _R * xf[..., 0] + _G * xf[..., 1] + _B * xf[..., 2]
    if jnp.issubdtype(x.dtype, jnp.integer):
        return jnp.clip(jnp.floor(g + 0.5), 0, 255).astype(x.dtype)
    return g.astype(x.dtype)


def bgr_to_gray(x: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W, 3] BGR → gray."""
    return rgb_to_gray(x[..., ::-1])


def rgb_to_bgr(x: jnp.ndarray) -> jnp.ndarray:
    """Swap channel order (self-inverse)."""
    return x[..., ::-1]
