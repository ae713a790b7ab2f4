"""Backward warping (cv2.remap equivalent) as gather-based JAX kernels.

The reference warps frames by optical flow via ``cv2.remap(img, x+u, y+v,
INTER_LINEAR)`` with the default BORDER_CONSTANT=0 (reference
models/traditional/baselines.py:217-228, scripts/run_experiments.py:420-444,
560-593). Here the warp is a batched bilinear gather over NHWC tensors —
four clamped `take`s blended by fractional weights, with an in-bounds mask
reproducing the zero border. XLA lowers this to vectorized dynamic-gathers;
for the fused warp+blend hot path see ops/pallas.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_hw(img: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """img [N,H,W,C], iy/ix [N,h,w] int32 → [N,h,w,C] (indices must be in range)."""
    n, h, w, c = img.shape
    flat = img.reshape(n, h * w, c)
    lin = iy * w + ix
    return jnp.take_along_axis(flat, lin.reshape(n, -1, 1), axis=1).reshape(
        n, iy.shape[1], iy.shape[2], c
    )


def _reflect_index(i: jnp.ndarray, n: int) -> jnp.ndarray:
    """cv2 BORDER_REFLECT (edge repeated: ...cba|abcd|dcb...) index folding."""
    period = 2 * n
    m = jnp.mod(jnp.mod(i, period) + period, period)
    return jnp.where(m < n, m, period - 1 - m)


def remap_bilinear(
    img: jnp.ndarray,
    map_x: jnp.ndarray,
    map_y: jnp.ndarray,
    border: str = "constant",
) -> jnp.ndarray:
    """cv2.remap(img, map_x, map_y, INTER_LINEAR) analog.

    img: [N, H, W, C] float; map_x/map_y: [N, H', W'] absolute source coords.
    border='constant' (cv2 default): out-of-range taps contribute 0.
    border='reflect' (BORDER_REFLECT): taps fold back into the image.
    """
    n, h, w, c = img.shape
    x0 = jnp.floor(map_x)
    y0 = jnp.floor(map_y)
    fx = (map_x - x0)[..., None]
    fy = (map_y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    if border == "reflect":

        def tap(yi, xi):
            return _gather_hw(img, _reflect_index(yi, h), _reflect_index(xi, w))

    elif border == "replicate":

        def tap(yi, xi):
            return _gather_hw(img, jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1))

    elif border == "constant":

        def tap(yi, xi):
            valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            yc = jnp.clip(yi, 0, h - 1)
            xc = jnp.clip(xi, 0, w - 1)
            v = _gather_hw(img, yc, xc)
            return v * valid[..., None].astype(img.dtype)

    else:
        raise ValueError(f"unknown border {border!r}")

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def _base_grid(n: int, h: int, w: int, dtype) -> tuple[jnp.ndarray, jnp.ndarray]:
    ys = jax.lax.broadcasted_iota(dtype, (n, h, w), 1)
    xs = jax.lax.broadcasted_iota(dtype, (n, h, w), 2)
    return ys, xs


import functools
import os


@functools.lru_cache(maxsize=1)
def default_warp_backend() -> str:
    """'pallas' on TPU (gathers are ~50ms/Mpx there), 'gather' elsewhere.

    Override with VFISR_WARP_BACKEND=gather|pallas.
    """
    env = os.environ.get("VFISR_WARP_BACKEND")
    if env in ("gather", "pallas"):
        return env
    try:
        import jax

        if jax.devices()[0].platform == "tpu":
            return "pallas"
    except Exception:
        pass
    return "gather"


def backward_warp(
    img: jnp.ndarray,
    flow: jnp.ndarray,
    t: float | jnp.ndarray = 1.0,
    border: str = "constant",
    backend: str | None = None,
    radius: int = 8,
    compute_dtype: jnp.dtype = jnp.float32,
    img_grad: str = "gather",
) -> jnp.ndarray:
    """Backend-dispatched backward warp: exact gather or the Pallas
    windowed kernel (ops/pallas/warp.py) — numerically equal for flows
    whose intra-tile deviation stays within the kernel's residual radius.
    compute_dtype=bfloat16 halves the Pallas kernel's DMA/roll volume at a
    ~2-ulp (≈56 dB) noise floor — for model-internal warps only.

    img_grad selects the image-cotangent path of the Pallas VJP:
    'gather' (exact; DCE'd when the warped operand isn't differentiated —
    every IFNet site; lowers to a serial scatter otherwise) or
    'shifted:<R>' (warp_transpose_shifted dense adjoint, exact for
    |t·flow| ≤ R — for trainable FEATURE warps, e.g. SAFA, whose flows
    the caller clamps to ±R)."""
    backend = backend or default_warp_backend()
    if border == "reflect":  # pallas kernel supports replicate/constant only
        backend = "gather"
    if backend == "pallas":
        return _pallas_warp_diff(img, flow, t, border, radius, compute_dtype,
                                 img_grad)
    return flow_warp(img, flow, t, border=border)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _pallas_warp_diff(img, flow, t, border, radius=8,
                      compute_dtype=jnp.float32, img_grad="gather"):
    """Pallas forward with a gather-free backward for the flow (two more
    windowed passes with derivative hat weights) and a selectable image-
    cotangent path (see backward_warp)."""
    from vfisr_tpu.ops.pallas.warp import warp_windowed

    return warp_windowed(
        img, flow, t, r=radius, border=border, compute_dtype=compute_dtype
    )


def _pallas_warp_fwd(img, flow, t, border, radius=8,
                     compute_dtype=jnp.float32, img_grad="gather"):
    return (
        _pallas_warp_diff(img, flow, t, border, radius, compute_dtype,
                          img_grad),
        (img, flow, t),
    )


def _pallas_warp_bwd(border, radius, compute_dtype, img_grad, residuals, ct):
    """Gather-free backward: the flow gradient is per-pixel LOCAL
    (out[p] depends on flow[p] only), so it is two more windowed Pallas
    passes with derivative hat weights — no scatter anywhere. The image
    cotangent (the transpose warp) goes through the gather formulation's
    VJP by default — it only materializes when the warped operand is
    itself differentiated (feature warps, e.g. SAFA; every IFNet site has
    it DCE'd) — or through the dense shifted adjoint for clamped-flow
    feature warps (img_grad='shifted:<R>'; the scatter lowering of the
    gather VJP stalls the TPU compiler at training shapes).
    """
    from vfisr_tpu.ops.pallas.warp import warp_windowed

    img, flow, t = residuals
    gy = warp_windowed(img, flow, t, r=radius, border=border,
                       compute_dtype=compute_dtype, weight_mode="grad_y")
    gx = warp_windowed(img, flow, t, r=radius, border=border,
                       compute_dtype=compute_dtype, weight_mode="grad_x")
    cg_y = jnp.sum(ct * gy, axis=-1)  # [n, h, w] = d loss/d sy
    cg_x = jnp.sum(ct * gx, axis=-1)
    t_arr = jnp.asarray(t, cg_y.dtype)
    t_b = t_arr[:, None, None] if t_arr.ndim == 1 else t_arr
    # sample position is (x + t·u, y + t·v): chain factors
    gflow = jnp.stack([cg_x * t_b, cg_y * t_b], axis=-1).astype(flow.dtype)
    per_batch_gt = jnp.sum(
        cg_x * flow[..., 0] + cg_y * flow[..., 1], axis=(1, 2)
    )
    gt = (per_batch_gt if t_arr.ndim == 1 else jnp.sum(per_batch_gt)).astype(
        t_arr.dtype
    )
    if img_grad.startswith("shifted"):
        disp = int(img_grad.split(":")[1]) if ":" in img_grad else 8
        gimg = warp_transpose_shifted(ct, flow, t, border=border,
                                      max_disp=disp).astype(img.dtype)
    else:
        _, img_vjp = jax.vjp(
            lambda i: flow_warp(i, flow, t, border=border), img
        )
        (gimg,) = img_vjp(ct)
    return gimg, gflow, gt


_pallas_warp_diff.defvjp(_pallas_warp_fwd, _pallas_warp_bwd)


def warp_transpose_shifted(
    ct: jnp.ndarray,
    flow: jnp.ndarray,
    t: float | jnp.ndarray = 1.0,
    border: str = "replicate",
    max_disp: int = 8,
) -> jnp.ndarray:
    """Adjoint (transpose) of the bilinear backward warp, gather/scatter-free.

    The warp's image cotangent is gimg[q] = Σ_p w(p→q)·ct[p] — a SCATTER in
    the gather formulation, which TPU lowers serially (it stalled the SAFA
    train-step compile entirely). For flows bounded by ±max_disp, every
    output pixel p that samples q satisfies |p−q| ≤ max_disp+1, so the
    adjoint is a dense sum over (2·max_disp+3)² shifted FMAs:

        gimg[q] = Σ_o ct[q−o] · hat(sy[q−o] − q_y) · hat(sx[q−o] − q_x)

    (hat = bilinear weight; vanishes except at the two integer neighbours,
    so the true 4-tap adjoint is recovered). Exact vs the gather VJP
    wherever |t·flow| ≤ max_disp — callers must clamp the flow they warp
    with (e.g. SAFA clamps feature flows). Used by the warp VJP for
    feature warps, where the image operand needs gradients.

    ct/flow: [N,H,W,C]/[N,H,W,2] (u=dx, v=dy). Cost scales with max_disp²
    — meant for training-crop feature maps, not full-res frames.
    """
    n, h, w, c = ct.shape
    R = int(max_disp) + 1
    dt = jnp.promote_types(ct.dtype, jnp.float32)
    t_arr = jnp.asarray(t, dt)
    if t_arr.ndim == 1:
        t_arr = t_arr[:, None, None]
    ys = jax.lax.broadcasted_iota(dt, (n, h, w), 1)
    xs = jax.lax.broadcasted_iota(dt, (n, h, w), 2)
    sy = ys + flow[..., 1].astype(dt) * t_arr
    sx = xs + flow[..., 0].astype(dt) * t_arr
    if border == "replicate":
        sy = jnp.clip(sy, 0.0, h - 1.0)
        sx = jnp.clip(sx, 0.0, w - 1.0)
    pad3 = ((0, 0), (R, R), (R, R))
    # out-of-range p contribute nothing: zero-pad ct and the coords (the
    # padded coords' hats vanish against in-range q because ct is 0 there)
    ctp = jnp.pad(ct.astype(dt), pad3 + ((0, 0),))
    syp = jnp.pad(sy, pad3, constant_values=-1e6)
    sxp = jnp.pad(sx, pad3, constant_values=-1e6)
    acc = jnp.zeros((n, h, w, c), dt)
    for oy in range(2 * R + 1):
        for ox in range(2 * R + 1):
            # index q - o in padded space: [oy: oy+h, ox: ox+w] covers
            # p = q + (R - oy, R - ox)
            ct_s = ctp[:, oy : oy + h, ox : ox + w]
            sy_s = syp[:, oy : oy + h, ox : ox + w]
            sx_s = sxp[:, oy : oy + h, ox : ox + w]
            wgt = jnp.maximum(0.0, 1.0 - jnp.abs(sy_s - ys)) * jnp.maximum(
                0.0, 1.0 - jnp.abs(sx_s - xs)
            )
            acc = acc + ct_s * wgt[..., None]
    return acc.astype(ct.dtype)


def flow_warp(
    img: jnp.ndarray,
    flow: jnp.ndarray,
    t: float | jnp.ndarray = 1.0,
    border: str = "constant",
) -> jnp.ndarray:
    """Backward-warp img by ``t × flow``.

    img: [N, H, W, C]; flow: [N, H, W, 2] with (u, v) = (dx, dy), the
    cv2.calcOpticalFlowFarneback channel order. Sample position is
    (x + t·u, y + t·v) — identical to the reference's
    ``cv2.remap(prev, x + flow[...,0]*t, y + flow[...,1]*t)`` pattern.
    """
    n, h, w, _ = img.shape
    ys, xs = _base_grid(n, h, w, img.dtype)
    return remap_bilinear(img, xs + flow[..., 0] * t, ys + flow[..., 1] * t, border=border)
