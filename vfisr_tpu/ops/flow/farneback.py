"""Farneback dense optical flow as a batched JAX/XLA program.

Re-implements the Farnebäck 2003 polynomial-expansion algorithm with
OpenCV's exact numerical recipe (pyramid schedule, poly-expansion basis
inverse, matrix update with border damping, box-blurred 2x2 solve), so that
downstream statistics (mean/max/std magnitude, difficulty classes) match
``cv2.calcOpticalFlowFarneback`` within tolerance.

Reference call sites replicated:
- evaluation/metrics.py:377-381  (0.5, 3, 15, 3, 5, 1.2, 0)
- models/traditional/baselines.py:177-198 (same params, bidirectional VFI)
- scripts/run_experiments.py calc_motion: (0.5, 1, 15, 1, 5, 1.1, 0)
- models/novel/adaptive_pipeline.py:108-138 (router motion analysis)

Everything is static-shaped per pyramid level and jit-compiled; the
per-level Python loop unrolls at trace time (each level has a different
static shape, as XLA requires).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vfisr_tpu.core.resize import resize
from vfisr_tpu.ops.conv import box_filter, gaussian_blur, sep_filter2d


@functools.lru_cache(maxsize=16)
def _poly_exp_tables(n: int, sigma: float):
    """Per-(n, sigma) constants: 1-D kernels g, xg, xxg and the inverse-basis
    scalars ig11, ig03, ig33, ig55 (Farnebäck's G^-1 entries)."""
    x = np.arange(-n, n + 1, dtype=np.float64)
    g = np.exp(-(x * x) / (2.0 * sigma * sigma))
    g /= g.sum()
    xg = x * g
    xxg = x * x * g

    # Weighted basis Gram matrix over the separable window, basis
    # [1, x, y, x^2, y^2, xy] with weights g(x)g(y).
    xs, ys = np.meshgrid(x, x)
    w = np.outer(g, g)
    basis = np.stack(
        [np.ones_like(xs), xs, ys, xs * xs, ys * ys, xs * ys], axis=-1
    ).reshape(-1, 6)
    G = (basis * w.reshape(-1, 1)).T @ basis
    invG = np.linalg.inv(G)
    ig11 = invG[1, 1]
    ig03 = invG[0, 3]
    ig33 = invG[3, 3]
    ig55 = invG[5, 5]
    return (
        g.astype(np.float32),
        xg.astype(np.float32),
        xxg.astype(np.float32),
        float(ig11),
        float(ig03),
        float(ig33),
        float(ig55),
    )


def _poly_exp(img: jnp.ndarray, n: int, sigma: float) -> jnp.ndarray:
    """img [N,H,W] → R [N,H,W,5]: (b_y, b_x, A_yy, A_xx, A_xy') per pixel,
    matching OpenCV FarnebackPolyExp channel layout."""
    g, xg, xxg, ig11, ig03, ig33, ig55 = _poly_exp_tables(n, sigma)
    f = img[..., None]  # NHWC, C=1

    def corr(kr, kc):
        return sep_filter2d(f, kr, kc, border="replicate")[..., 0]

    b1 = corr(g, g)
    b2 = corr(xg, g)  # horizontal x-derivative basis
    b3 = corr(g, xg)  # vertical
    b4 = corr(xxg, g)
    b5 = corr(g, xxg)
    b6 = corr(xg, xg)

    r0 = b3 * ig11  # y-linear
    r1 = b2 * ig11  # x-linear
    r2 = b1 * ig03 + b5 * ig33  # y^2 coeff
    r3 = b1 * ig03 + b4 * ig33  # x^2 coeff
    r4 = b6 * ig55  # xy coeff
    return jnp.stack([r0, r1, r2, r3, r4], axis=-1)


def _border_scale_map(h: int, w: int) -> np.ndarray:
    """OpenCV's 5-pixel border damping weights for UpdateMatrices."""
    BORDER = 5
    wts = np.array([0.14, 0.14, 0.4472, 0.4472, 0.4472], np.float32)
    sy = np.ones(h, np.float32)
    sx = np.ones(w, np.float32)
    for i in range(min(BORDER, h)):
        sy[i] *= wts[i]
        sy[h - 1 - i] *= wts[i]
    for i in range(min(BORDER, w)):
        sx[i] *= wts[i]
        sx[w - 1 - i] *= wts[i]
    return np.outer(sy, sx)


def _update_matrices(R0: jnp.ndarray, R1: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Build M [N,H,W,5] = (G11, G12, G22, h1, h2) from poly coeffs + flow."""
    n, h, w, _ = R0.shape
    dx = flow[..., 0]
    dy = flow[..., 1]
    ys = jax.lax.broadcasted_iota(jnp.float32, (n, h, w), 1)
    xs = jax.lax.broadcasted_iota(jnp.float32, (n, h, w), 2)
    fx = xs + dx
    fy = ys + dy
    x1 = jnp.floor(fx)
    y1 = jnp.floor(fy)
    ffx = fx - x1
    ffy = fy - y1
    x1i = x1.astype(jnp.int32)
    y1i = y1.astype(jnp.int32)
    inb = (x1i >= 0) & (x1i < w - 1) & (y1i >= 0) & (y1i < h - 1)

    # Bilinear fetch of R1 at x+flow via the dispatched warp (Pallas
    # windowed kernel on TPU, gather elsewhere). Out-of-bounds pixels are
    # fully overridden by the `inb` masking below, so only in-bounds
    # samples need to be exact (replicate border matches the reference's
    # corner clipping for those).
    from vfisr_tpu.core.warp import backward_warp

    R1w = backward_warp(R1, flow, 1.0, border="replicate")

    inbf = inb[..., None].astype(R0.dtype)
    # In-bounds: average A with warped; out-of-bounds: keep R0's A (and the
    # xy term gets only the 0.5 factor), linear terms of R1 treated as 0.
    r4 = jnp.where(inb, (R0[..., 2] + R1w[..., 2]) * 0.5, R0[..., 2])
    r5 = jnp.where(inb, (R0[..., 3] + R1w[..., 3]) * 0.5, R0[..., 3])
    r6 = jnp.where(inb, (R0[..., 4] + R1w[..., 4]) * 0.25, R0[..., 4] * 0.5)
    r2 = (R0[..., 0] - jnp.where(inb, R1w[..., 0], 0.0)) * 0.5
    r3 = (R0[..., 1] - jnp.where(inb, R1w[..., 1], 0.0)) * 0.5
    r2 = r2 + r4 * dy + r6 * dx
    r3 = r3 + r6 * dy + r5 * dx
    del inbf

    scale = jnp.asarray(_border_scale_map(h, w))[None]
    r2, r3, r4, r5, r6 = (v * scale for v in (r2, r3, r4, r5, r6))

    return jnp.stack(
        [
            r4 * r4 + r6 * r6,  # G11
            (r4 + r5) * r6,  # G12
            r5 * r5 + r6 * r6,  # G22
            r4 * r2 + r6 * r3,  # h1
            r6 * r2 + r5 * r3,  # h2
        ],
        axis=-1,
    )


def _solve_flow(M_blurred: jnp.ndarray) -> jnp.ndarray:
    g11 = M_blurred[..., 0]
    g12 = M_blurred[..., 1]
    g22 = M_blurred[..., 2]
    h1 = M_blurred[..., 3]
    h2 = M_blurred[..., 4]
    idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)
    u = (g11 * h2 - g12 * h1) * idet
    v = (g22 * h1 - g12 * h2) * idet
    return jnp.stack([u, v], axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("pyr_scale", "levels", "winsize", "iterations", "poly_n", "poly_sigma"),
)
def farneback_flow(
    f0: jnp.ndarray,
    f1: jnp.ndarray,
    pyr_scale: float = 0.5,
    levels: int = 3,
    winsize: int = 15,
    iterations: int = 3,
    poly_n: int = 5,
    poly_sigma: float = 1.2,
) -> jnp.ndarray:
    """cv2.calcOpticalFlowFarneback analog.

    f0, f1: [N, H, W] grayscale float/uint8 in [0, 255] (or [H, W]).
    Returns flow [N, H, W, 2] (u=dx, v=dy), float32.
    """
    squeeze = f0.ndim == 2
    if squeeze:
        f0 = f0[None]
        f1 = f1[None]
    f0 = f0.astype(jnp.float32)
    f1 = f1.astype(jnp.float32)
    n, h, w = f0.shape

    # OpenCV clamps the pyramid so the smallest level stays usable.
    k = 0
    scale = 1.0
    while k < levels:
        scale *= pyr_scale
        if min(h, w) * scale < 16:
            break
        k += 1
    levels = k

    flow = None
    for k in range(levels, -1, -1):
        scale = pyr_scale**k
        lh, lw = int(round(h * scale)), int(round(w * scale))
        sigma = (1.0 / scale - 1.0) * 0.5
        smooth_sz = max(int(round(sigma * 5)) | 1, 3)

        def prep(img):
            blurred = gaussian_blur(img[..., None], smooth_sz, sigma)[..., 0]
            if (lh, lw) != (h, w):
                blurred = resize(blurred[..., None], (lh, lw), "linear")[..., 0]
            return blurred

        I0 = prep(f0)
        I1 = prep(f1)

        if flow is None:
            flow = jnp.zeros((n, lh, lw, 2), jnp.float32)
        else:
            flow = resize(flow, (lh, lw), "linear") * (1.0 / pyr_scale)

        R0 = _poly_exp(I0, poly_n, poly_sigma)
        R1 = _poly_exp(I1, poly_n, poly_sigma)
        M = _update_matrices(R0, R1, flow)
        for i in range(iterations):
            Mb = box_filter(M, winsize, border="replicate")
            flow = _solve_flow(Mb)
            if i < iterations - 1:
                M = _update_matrices(R0, R1, flow)

    return flow[0] if squeeze else flow


def flow_magnitude(flow: jnp.ndarray) -> jnp.ndarray:
    """‖flow‖₂ per pixel: [..., 2] → [...]."""
    return jnp.sqrt(flow[..., 0] ** 2 + flow[..., 1] ** 2)
