"""Separable resampling kernels with OpenCV-compatible tap definitions.

The reference delegates all resizing to ``cv2.resize`` with INTER_CUBIC /
INTER_LANCZOS4 / INTER_LINEAR / INTER_AREA / INTER_NEAREST (reference
models/traditional/baselines.py:74,124, scripts/run_experiments.py:818-826,
models/novel/adaptive_pipeline.py:231). On TPU we express resize as two
separable 1-D weighted gathers (H then W): tap indices and weights are
precomputed on the host per (in_size, out_size, method) — static under jit —
and applied as `take`+`einsum`, which XLA fuses into a bandwidth-bound
kernel. Weight definitions replicate OpenCV:

- coordinate map: ``src = (dst + 0.5) * in/out - 0.5`` (area: pixel-footprint
  coverage; nearest: ``floor(dst * in/out)``)
- cubic kernel with A = -0.75 (OpenCV's value, not the common -0.5)
- Lanczos4: 8 taps, ``sinc(d) * sinc(d/4)``, weights normalized to 1
- border: clamp tap indices into range (replicate semantics)

Golden-tested against cv2.resize in tests/test_resize.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_METHODS = ("nearest", "linear", "cubic", "lanczos4", "area")


def _kernel_cubic(d: np.ndarray) -> np.ndarray:
    # OpenCV interpolateCubic: A = -0.75
    A = -0.75
    ad = np.abs(d)
    w = np.where(
        ad <= 1.0,
        ((A + 2.0) * ad - (A + 3.0)) * ad * ad + 1.0,
        np.where(ad < 2.0, ((A * ad - 5.0 * A) * ad + 8.0 * A) * ad - 4.0 * A, 0.0),
    )
    return w


def _kernel_lanczos4(d: np.ndarray) -> np.ndarray:
    w = np.sinc(d) * np.sinc(d / 4.0)
    w[np.abs(d) >= 4.0] = 0.0
    return w


def _tap_table(in_size: int, out_size: int, method: str) -> Tuple[np.ndarray, np.ndarray]:
    """Return (idx [out, k] int32, w [out, k] float32) for one axis."""
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)

    if method == "nearest":
        # OpenCV INTER_NEAREST: sx = floor(dx * scale)
        idx = np.floor(dst * scale).astype(np.int64)
        idx = np.clip(idx, 0, in_size - 1)
        return idx[:, None].astype(np.int32), np.ones((out_size, 1), np.float32)

    if method == "area" and scale > 1.0:
        # Downscale: exact fractional pixel-footprint coverage average,
        # matching OpenCV's INTER_AREA decimation.
        k = int(np.ceil(scale)) + 1
        idx = np.zeros((out_size, k), np.int64)
        w = np.zeros((out_size, k), np.float64)
        for i in range(out_size):
            lo, hi = i * scale, (i + 1) * scale
            first = int(np.floor(lo))
            for j in range(k):
                p = first + j
                cov = min(hi, p + 1) - max(lo, p)
                if p < in_size and cov > 0:
                    idx[i, j] = p
                    w[i, j] = cov
                else:
                    idx[i, j] = min(max(p, 0), in_size - 1)
                    w[i, j] = 0.0
            w[i] /= w[i].sum()
        return idx.astype(np.int32), w.astype(np.float32)

    # Convolution-style kernels share the half-pixel coordinate map.
    src = (dst + 0.5) * scale - 0.5
    base = np.floor(src).astype(np.int64)
    frac = src - base

    if method in ("linear", "area"):  # INTER_AREA upscale ≈ bilinear in OpenCV
        offs = np.array([0, 1])
        d = frac[:, None] - offs[None, :]
        w = np.where(np.abs(d) < 1.0, 1.0 - np.abs(d), 0.0)
    elif method == "cubic":
        offs = np.array([-1, 0, 1, 2])
        d = frac[:, None] - offs[None, :]
        w = _kernel_cubic(d)
    elif method == "lanczos4":
        offs = np.array([-3, -2, -1, 0, 1, 2, 3, 4])
        d = frac[:, None] - offs[None, :]
        w = _kernel_lanczos4(d)
        w = w / w.sum(axis=1, keepdims=True)
    else:
        raise ValueError(f"unknown resize method {method!r}; pick from {_METHODS}")

    idx = np.clip(base[:, None] + offs[None, :], 0, in_size - 1)
    return idx.astype(np.int32), w.astype(np.float32)


@functools.lru_cache(maxsize=256)
def _tap_table_cached(in_size: int, out_size: int, method: str):
    idx, w = _tap_table(in_size, out_size, method)
    return idx, w


def _apply_axis(x: jnp.ndarray, idx: np.ndarray, w: np.ndarray, axis: int) -> jnp.ndarray:
    """Weighted gather along `axis`: out[..., o, ...] = Σ_k w[o,k] x[..., idx[o,k], ...]."""
    taps = jnp.take(x, jnp.asarray(idx), axis=axis)  # axis → (out, k)
    wj = jnp.asarray(w, dtype=taps.dtype)
    # Move the tap axis (axis+1) weights in via tensordot-free einsum.
    # Build einsum dynamically for arbitrary rank.
    letters = "abcdefghij"
    in_sub = letters[: x.ndim + 1]
    o, k = in_sub[axis], in_sub[axis + 1]
    out_sub = in_sub.replace(k, "")
    return jnp.einsum(
        f"{in_sub},{o}{k}->{out_sub}", taps, wj, precision=jax.lax.Precision.HIGHEST
    )


@functools.lru_cache(maxsize=256)
def _dense_matrix_cached(in_size: int, out_size: int, method: str):
    """Dense (out, in) resampling matrix — the MXU formulation."""
    idx, w = _tap_table_cached(in_size, out_size, method)
    import numpy as _np

    dense = _np.zeros((out_size, in_size), _np.float32)
    for o in range(out_size):
        for k in range(idx.shape[1]):
            dense[o, idx[o, k]] += w[o, k]
    return dense


@functools.lru_cache(maxsize=256)
def _banded_matrices_cached(
    in_size: int, out_size: int, method: str, block_out: int = 128
):
    """Block-banded resampling matrices: (starts, mats [B, BO, BI], BI).

    A resize kernel has tiny support (≤8 taps; area-downscale ≤⌈scale⌉+1),
    so the dense (out, in) matrix is ≥99% zeros at 1080p sizes — the MXU
    multiplies them anyway. Blocking the output axis into BO-row tiles
    makes each tile touch only a contiguous input band of
    ~BO·in/out + taps rows: per-block (BO, BI) matrices + per-block input
    offsets cut resize FLOPs ~10x at the pipeline's 1080p→1440p shapes.
    Identical weights to the dense form — parity is exact up to matmul
    accumulation order.
    """
    idx, w = _tap_table_cached(in_size, out_size, method)
    bo = block_out
    nb = -(-out_size // bo)
    spans = []
    for b in range(nb):
        sl = idx[b * bo : min(out_size, (b + 1) * bo)]
        spans.append((int(sl.min()), int(sl.max()) + 1))
    bi = max(hi - lo for lo, hi in spans)
    bi = min(-(-bi // 8) * 8, in_size)  # sublane-align the contraction dim
    starts = []
    mats = np.zeros((nb, bo, bi), np.float32)
    for b, (lo, hi) in enumerate(spans):
        start = max(0, min(lo, in_size - bi))
        starts.append(start)
        o0 = b * bo
        for o in range(o0, min(out_size, o0 + bo)):
            for k in range(idx.shape[1]):
                mats[b, o - o0, idx[o, k] - start] += w[o, k]
    return tuple(starts), mats, bi


def _apply_axis_matmul(
    x: jnp.ndarray, in_size: int, out_size: int, method: str, axis: int, prec
) -> jnp.ndarray:
    """Resample one axis on the MXU: block-banded when the band is narrow,
    dense otherwise (banded degenerates to dense at extreme scale ratios)."""
    letters = "abcdefghij"
    sub = letters[: x.ndim]
    ax = sub[axis]
    starts, mats, bi = _banded_matrices_cached(in_size, out_size, method)
    nb, bo = mats.shape[0], mats.shape[1]
    if nb * bo * bi < out_size * in_size * 0.75:
        blocks = jnp.stack(
            [jax.lax.slice_in_dim(x, s, s + bi, axis=axis) for s in starts]
        )  # [B, ..., BI@axis+1, ...]
        y = jnp.einsum(
            f"ZO{ax},Z{sub}->Z{sub.replace(ax, 'O')}",
            jnp.asarray(mats), blocks, precision=prec,
        )
        y = jnp.moveaxis(y, 0, axis)  # [..., B, BO, ...]
        y = y.reshape(y.shape[:axis] + (nb * bo,) + y.shape[axis + 2 :])
        return jax.lax.slice_in_dim(y, 0, out_size, axis=axis)
    m = jnp.asarray(_dense_matrix_cached(in_size, out_size, method))
    return jnp.einsum(
        f"O{ax},{sub}->{sub.replace(ax, 'O')}", m, x, precision=prec
    )


@functools.lru_cache(maxsize=1)
def _use_matmul_resize() -> bool:
    """On TPU, resize as dense matmuls: the MXU runs the (mostly-zero)
    dense formulation ~5-10x faster than the serial-gather tap path."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


@functools.partial(
    jax.jit, static_argnames=("out_h", "out_w", "method", "precision")
)
def _resize_f(
    x: jnp.ndarray, out_h: int, out_w: int, method: str, precision: str = "high"
) -> jnp.ndarray:
    h_axis = x.ndim - 3
    w_axis = x.ndim - 2
    in_h, in_w = x.shape[h_axis], x.shape[w_axis]
    if _use_matmul_resize():
        # HIGH = 3-pass bf16 (~f24 mantissa): exact for 8-bit content at
        # ~2x the speed of HIGHEST; DEFAULT single-pass bf16 costs up to
        # ~1 uint8 LSB — the deployment-throughput setting (the TPU analog
        # of the reference's fp16 TensorRT engines, README.md:335-348).
        prec = _PRECISIONS[precision]
        if in_h != out_h:
            x = _apply_axis_matmul(x, in_h, out_h, method, h_axis, prec)
        if in_w != out_w:
            x = _apply_axis_matmul(x, in_w, out_w, method, w_axis, prec)
        return x
    if in_h != out_h:
        idx, w = _tap_table_cached(in_h, out_h, method)
        x = _apply_axis(x, idx, w, h_axis)
    if in_w != out_w:
        idx, w = _tap_table_cached(in_w, out_w, method)
        x = _apply_axis(x, idx, w, w_axis)
    return x


def resize(
    x: jnp.ndarray,
    size: Tuple[int, int],
    method: str = "lanczos4",
    antialias_consistent: bool = True,
    precision: str = "high",
) -> jnp.ndarray:
    """Resize [..., H, W, C] to (out_h, out_w) with an OpenCV-compatible kernel.

    method ∈ {nearest, linear, cubic, lanczos4, area}. uint8 in → uint8 out
    (OpenCV saturate rounding); float passes through in float.
    precision: matmul-path precision — 'high' (3-pass bf16, exact for 8-bit
    content) for cv2-parity paths, 'default' (single-pass bf16, ≤1 uint8
    LSB) for deployment throughput.
    """
    out_h, out_w = size
    is_int = jnp.issubdtype(x.dtype, jnp.integer)
    xf = x.astype(jnp.float32)
    y = _resize_f(xf, out_h, out_w, method, precision)
    if is_int:
        y = jnp.clip(jnp.floor(y + 0.5), 0, 255).astype(x.dtype)
    else:
        y = y.astype(x.dtype)
    return y


def scale_size(h: int, w: int, scale: float) -> Tuple[int, int]:
    """Reference size math: ``int(h*scale), int(w*scale)`` (baselines.py:73)."""
    return int(h * scale), int(w * scale)


def crop_16_9(x: jnp.ndarray) -> jnp.ndarray:
    """Center-crop [..., H, W, C] to 16:9, mirroring reference
    scripts/extract_intervals.py:26-41 / run_experiments.py crop16_9."""
    h_axis = x.ndim - 3
    h, w = x.shape[h_axis], x.shape[h_axis + 1]
    target_w = int(h * 16 / 9)
    if target_w <= w:
        x0 = (w - target_w) // 2
        idx = [slice(None)] * x.ndim
        idx[h_axis + 1] = slice(x0, x0 + target_w)
        return x[tuple(idx)]
    target_h = int(w * 9 / 16)
    y0 = (h - target_h) // 2
    idx = [slice(None)] * x.ndim
    idx[h_axis] = slice(y0, y0 + target_h)
    return x[tuple(idx)]
