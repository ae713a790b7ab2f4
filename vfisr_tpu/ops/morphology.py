"""Binary/grayscale morphology via reduce_window (cv2 morphologyEx analogs).

Used by: UI-region cleanup (reference evaluation/metrics.py:568-571), HUD
mask cleanup (adaptive_pipeline.py:222-228), UAFI mask cleanup
(run_experiments.py:420-430), edge-wobble dilation (metrics.py:645-652).
Rectangular all-ones structuring elements only (all the reference uses).

Inputs are [..., H, W]: the last two axes are always spatial; any leading
axes are batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _window_reduce(x: jnp.ndarray, ksize: int, init, op) -> jnp.ndarray:
    shape = x.shape
    h, w = shape[-2:]
    x4 = x.reshape((-1, h, w))
    out = jax.lax.reduce_window(
        x4,
        init,
        op,
        window_dimensions=(1, ksize, ksize),
        window_strides=(1, 1, 1),
        padding="SAME",
    )
    return out.reshape(shape)


def dilate(x: jnp.ndarray, ksize: int = 3) -> jnp.ndarray:
    """cv2.dilate with a ksize×ksize all-ones element over [..., H, W]."""
    xf = x.astype(jnp.float32)
    return _window_reduce(xf, ksize, -jnp.inf, jax.lax.max).astype(x.dtype)


def erode(x: jnp.ndarray, ksize: int = 3) -> jnp.ndarray:
    """cv2.erode. SAME padding contributes the +inf init value at borders,
    matching cv2's non-shrinking default border for erosion."""
    xf = x.astype(jnp.float32)
    return _window_reduce(xf, ksize, jnp.inf, jax.lax.min).astype(x.dtype)


def morph_close(x: jnp.ndarray, ksize: int = 5) -> jnp.ndarray:
    """Dilate then erode (cv2.MORPH_CLOSE)."""
    return erode(dilate(x, ksize), ksize)


def morph_open(x: jnp.ndarray, ksize: int = 5) -> jnp.ndarray:
    """Erode then dilate (cv2.MORPH_OPEN)."""
    return dilate(erode(x, ksize), ksize)
