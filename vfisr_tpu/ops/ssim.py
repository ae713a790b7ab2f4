"""SSIM variants matching the reference's two definitions.

1. ``ssim`` — windowed SSIM with skimage ``structural_similarity`` defaults
   (7x7 uniform window, K1=0.01, K2=0.03, unbiased covariance normalization
   N/(N-1), border crop) — the reference's ``compute_ssim_simple``
   (evaluation/metrics.py:318-335) and the router's scene-cut gate
   (adaptive_pipeline.py:140-160) use this via skimage.
2. ``ssim_global`` — single-window global-statistics SSIM from
   run_experiments.py:304-312 (clamped to [0, 1]).

Both operate on [..., H, W] grayscale float arrays in [0, 255].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vfisr_tpu.ops.conv import _depthwise_conv


@functools.partial(jax.jit, static_argnames=("win_size", "data_range"))
def ssim(
    x: jnp.ndarray,
    y: jnp.ndarray,
    win_size: int = 7,
    data_range: float = 255.0,
) -> jnp.ndarray:
    """Mean SSIM over valid windows. x, y: [..., H, W] gray. Returns [...]
    (scalar per batch element)."""
    orig_batch = x.shape[:-2]
    h, w = x.shape[-2:]
    xf = x.reshape((-1, h, w, 1)).astype(jnp.float32)
    yf = y.reshape((-1, h, w, 1)).astype(jnp.float32)

    import numpy as np

    win = np.full((win_size, win_size), 1.0 / (win_size * win_size), np.float32)

    def f(a):
        return _depthwise_conv(a, jnp.asarray(win))

    np_win = win_size * win_size
    cov_norm = np_win / (np_win - 1.0)  # skimage unbiased estimate

    ux = f(xf)
    uy = f(yf)
    uxx = f(xf * xf)
    uyy = f(yf * yf)
    uxy = f(xf * yf)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    a1 = 2.0 * ux * uy + c1
    a2 = 2.0 * vxy + c2
    b1 = ux * ux + uy * uy + c1
    b2 = vx + vy + c2
    s = (a1 * a2) / (b1 * b2)
    # VALID conv already cropped (win-1)//2 per side... skimage crops pad
    # pixels from the *filtered* (same-size) map; VALID conv is equivalent.
    out = jnp.mean(s, axis=(1, 2, 3))
    return out.reshape(orig_batch)


@functools.partial(jax.jit, static_argnames=("win_size", "data_range", "levels"))
def ms_ssim(
    x: jnp.ndarray,
    y: jnp.ndarray,
    win_size: int = 7,
    data_range: float = 255.0,
    levels: int = 5,
) -> jnp.ndarray:
    """Multi-scale SSIM (Wang et al. 2003): contrast/structure terms at 5
    dyadic scales with the standard weights, luminance at the coarsest.
    x, y: [..., H, W] gray in [0, 255]."""
    weights = jnp.asarray([0.0448, 0.2856, 0.3001, 0.2363, 0.1333][:levels])
    weights = weights / jnp.sum(weights)

    orig_batch = x.shape[:-2]
    h, w = x.shape[-2:]
    a = x.reshape((-1, h, w, 1)).astype(jnp.float32)
    b = y.reshape((-1, h, w, 1)).astype(jnp.float32)

    import numpy as _np

    win = _np.full((win_size, win_size), 1.0 / (win_size * win_size), _np.float32)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    np_win = win_size * win_size
    cov_norm = np_win / (np_win - 1.0)

    def stats(aa, bb):
        f = lambda z: _depthwise_conv(z, jnp.asarray(win))
        ux, uy = f(aa), f(bb)
        vx = cov_norm * (f(aa * aa) - ux * ux)
        vy = cov_norm * (f(bb * bb) - uy * uy)
        vxy = cov_norm * (f(aa * bb) - ux * uy)
        lum = (2 * ux * uy + c1) / (ux * ux + uy * uy + c1)
        cs = (2 * vxy + c2) / (vx + vy + c2)
        return jnp.mean(lum, axis=(1, 2, 3)), jnp.mean(cs, axis=(1, 2, 3))

    total = jnp.ones((a.shape[0],))
    for lvl in range(levels):
        lum, cs = stats(a, b)
        if lvl == levels - 1:
            total = total * jnp.abs(lum * cs) ** weights[lvl]
        else:
            total = total * jnp.abs(cs) ** weights[lvl]
            # 2x2 average-pool downsample
            def pool(z):
                n_, hh, ww, _ = z.shape
                hh2, ww2 = hh // 2, ww // 2
                return z[:, : hh2 * 2, : ww2 * 2].reshape(n_, hh2, 2, ww2, 2, 1).mean((2, 4))
            a, b = pool(a), pool(b)
    return total.reshape(orig_batch)


@jax.jit
def ssim_global(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Global-statistics SSIM (run_experiments.py:304-312), clamped to [0,1].

    Operates over all trailing axes; returns a scalar (or batch of scalars
    if inputs are [N, ...] with N preserved... the reference computes one
    global value; batched callers vmap).
    """
    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    mu1 = jnp.mean(xf)
    mu2 = jnp.mean(yf)
    s1 = jnp.mean((xf - mu1) ** 2)
    s2 = jnp.mean((yf - mu2) ** 2)
    s12 = jnp.mean((xf - mu1) * (yf - mu2))
    v = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1**2 + mu2**2 + c1) * (s1 + s2 + c2)
    )
    return jnp.clip(v, 0.0, 1.0)
