"""Frame layout/dtype conventions.

Mirrors the reference model-abstraction helpers (reference models/base.py:
``to_tensor`` :175-186, ``to_numpy`` :188-201, ``pad_to_multiple`` :203-225,
``unpad`` :227-229, ``get_default_timestamps`` :231-233) with TPU-first
conventions: batched NHWC float arrays in [0, 1] on device, numpy uint8 HWC
RGB at the host boundary.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np


def to_float(frame: jnp.ndarray | np.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """uint8 [0, 255] → float [0, 1]. Accepts any leading dims."""
    return jnp.asarray(frame, dtype=dtype) / jnp.asarray(255.0, dtype=dtype)


def to_uint8(frame: jnp.ndarray) -> jnp.ndarray:
    """float [0, 1] → uint8 [0, 255].

    Matches the reference's ``(x * 255).clip(0, 255).astype(uint8)``
    truncation-free path by rounding half away from zero, which is how
    OpenCV's ``saturate_cast<uchar>`` behaves (reference to_numpy truncates;
    we round — strictly more accurate, and within the reference's own
    metric tolerance).
    """
    x = frame.astype(jnp.float32) * 255.0
    return jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0).astype(jnp.uint8)


def to_batched(frame: np.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """HWC uint8 → 1HWC float [0,1] (device). Reference to_tensor analog
    (NHWC, not NCHW — TPU convs prefer channels-last)."""
    arr = jnp.asarray(frame)
    if arr.ndim == 2:
        arr = arr[..., None]
    return to_float(arr, dtype)[None, ...]


def from_batched(x: jnp.ndarray) -> np.ndarray:
    """1HWC/NHWC float [0,1] → HWC uint8 numpy. Reference to_numpy analog."""
    if x.ndim == 4:
        x = x[0]
    return np.asarray(to_uint8(x))


def pad_to_multiple(
    x: jnp.ndarray, multiple: int = 32
) -> Tuple[jnp.ndarray, Tuple[int, int, int, int]]:
    """Reflect-pad NHWC (or HWC) tensor so H, W are multiples of `multiple`.

    Pads on the bottom/right only, mirroring reference models/base.py:203-225
    (torch F.pad(..., (0, pad_w, 0, pad_h), mode='reflect')).

    Returns (padded, (left, right, top, bottom)).
    """
    h_axis = x.ndim - 3
    w_axis = x.ndim - 2
    h, w = x.shape[h_axis], x.shape[w_axis]
    pad_h = (multiple - h % multiple) % multiple
    pad_w = (multiple - w % multiple) % multiple
    if pad_h == 0 and pad_w == 0:
        return x, (0, 0, 0, 0)
    pads = [(0, 0)] * x.ndim
    pads[h_axis] = (0, pad_h)
    pads[w_axis] = (0, pad_w)
    # torch 'reflect' == numpy 'reflect' (edge not repeated)
    padded = jnp.pad(x, pads, mode="reflect")
    return padded, (0, pad_w, 0, pad_h)


def unpad(x: jnp.ndarray, original_h: int, original_w: int) -> jnp.ndarray:
    """Crop NHWC/HWC back to the original spatial size (reference :227-229)."""
    h_axis = x.ndim - 3
    idx = [slice(None)] * x.ndim
    idx[h_axis] = slice(0, original_h)
    idx[h_axis + 1] = slice(0, original_w)
    return x[tuple(idx)]


def get_default_timestamps(num_frames: int) -> List[float]:
    """Evenly spaced timestamps in (0, 1): [(i+1)/(n+1)] (reference :231-233)."""
    return [(i + 1) / (num_frames + 1) for i in range(num_frames)]
