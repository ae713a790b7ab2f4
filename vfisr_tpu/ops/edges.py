"""Canny edge detection as a branchless JAX program.

Mirrors cv2.Canny(gray, lo, hi) with aperture 3 and the default L1 gradient
norm (|gx| + |gy|), as used by the reference's UI detection
(evaluation/metrics.py:549-551), edge-wobble (metrics.py:636-640), and
MCAR's edge-density term (run_experiments.py:449-476).

Hysteresis (cv2's stack-based flood fill) is realized as a fixed-point
iteration: strong edges dilate through weak-edge pixels until convergence —
bounded-iteration `lax.while_loop`, fully on device. Output is {0, 255}
uint8 like cv2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vfisr_tpu.ops.conv import sobel
from vfisr_tpu.ops.morphology import dilate


@functools.partial(jax.jit, static_argnames=("max_iters",))
def _canny_impl(gray: jnp.ndarray, lo: float, hi: float, max_iters: int) -> jnp.ndarray:
    x = gray.astype(jnp.float32)[..., None]  # [N,H,W,1]
    gx = sobel(x, "x")[..., 0]
    gy = sobel(x, "y")[..., 0]
    mag = jnp.abs(gx) + jnp.abs(gy)  # cv2 default L2gradient=False

    # --- non-maximum suppression with cv2's sector quantization ---
    # cv2 compares tan(22.5°)≈0.4142 and tan(67.5°)≈2.4142 scaled boundaries.
    TG22 = 0.4142135623730950488016887242097
    ax = jnp.abs(gx)
    ay = jnp.abs(gy)
    horizontal = ay < ax * TG22  # sector 0: compare left/right
    vertical = ay > ax * (1.0 / TG22)  # sector 2: compare up/down
    diag = ~horizontal & ~vertical
    same_sign = (gx * gy) >= 0  # sector 1 (135°→\ when signs same) vs 3

    def shift(a, dy, dx):
        return jnp.roll(jnp.roll(a, dy, axis=-2), dx, axis=-1)

    m_l, m_r = shift(mag, 0, 1), shift(mag, 0, -1)
    m_u, m_d = shift(mag, 1, 0), shift(mag, -1, 0)
    m_ul, m_dr = shift(mag, 1, 1), shift(mag, -1, -1)
    m_ur, m_dl = shift(mag, 1, -1), shift(mag, -1, 1)

    n1 = jnp.where(horizontal, m_l, jnp.where(vertical, m_u, jnp.where(same_sign, m_ul, m_ur)))
    n2 = jnp.where(horizontal, m_r, jnp.where(vertical, m_d, jnp.where(same_sign, m_dr, m_dl)))
    # cv2 keeps if mag > n1 && mag >= n2 (asymmetric tie-break)
    is_max = (mag > n1) & (mag >= n2)

    # border pixels are never edges in cv2
    h, w = mag.shape[-2:]
    ys = jax.lax.broadcasted_iota(jnp.int32, mag.shape, mag.ndim - 2)
    xs = jax.lax.broadcasted_iota(jnp.int32, mag.shape, mag.ndim - 1)
    interior = (ys > 0) & (ys < h - 1) & (xs > 0) & (xs < w - 1)

    strong = is_max & (mag > hi) & interior
    weak = is_max & (mag > lo) & interior

    # --- hysteresis: grow strong through weak until fixed point ---
    def body(state):
        cur, _ = state
        grown = dilate(cur.astype(jnp.float32), 3) > 0
        new = grown & weak | cur
        changed = jnp.any(new != cur)
        return new, changed

    def cond(state):
        return state[1]

    edges, _ = jax.lax.while_loop(
        cond, lambda s: body(s), (strong, jnp.asarray(True))
    )
    return (edges * 255).astype(jnp.uint8)


def canny(gray: jnp.ndarray, lo: float, hi: float, max_iters: int = 64) -> jnp.ndarray:
    """gray: [..., H, W] uint8/float in [0,255] → {0,255} uint8 edge map."""
    squeeze = gray.ndim == 2
    g = gray[None] if squeeze else gray
    out = _canny_impl(g, float(lo), float(hi), max_iters)
    return out[0] if squeeze else out
