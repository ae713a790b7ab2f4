"""Inline "innovative" benchmark methods (reference scripts/run_experiments.py).

These are first-class experiment methods in the reference (CHANGELOG.md:
9-28): UAFI (UI-aware FI, run_experiments.py:393-446), MCAR
(motion-complexity adaptive routing, :449-533), UGHI (uncertainty-guided
hybrid, :536-593), plus linear blend / frame duplication / edge enhance /
plain flow warp. Each is one jitted batched device program; the numpy
adapters mirror the reference call signatures (uint8 HWC in/out).

Known reference behavior preserved: MCAR's complexity formula
(0.5·min(mean/20,1) + 0.3·min(std/15,1) + 0.2·2·edge_density, capped at 1)
rarely exceeds the 0.7 RIFE threshold — the documented "RIFE tier never
triggered" routing bug (COMPREHENSIVE_REPORT.md:126-130). The formula is
reproduced verbatim; fixing it is a config knob (thresholds are arguments).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vfisr_tpu.core.color import rgb_to_gray
from vfisr_tpu.core.warp import flow_warp, remap_bilinear
from vfisr_tpu.ops.conv import gaussian_blur
from vfisr_tpu.ops.edges import canny
from vfisr_tpu.ops.flow import farneback_flow, flow_magnitude
from vfisr_tpu.ops.morphology import morph_close, morph_open


def _as_batch_f32(frame: np.ndarray) -> jnp.ndarray:
    x = jnp.asarray(frame).astype(jnp.float32)
    if x.ndim == 3:
        x = x[None]
    return x


def _to_u8(x: jnp.ndarray) -> np.ndarray:
    out = np.asarray(jnp.clip(jnp.floor(x + 0.5), 0, 255).astype(jnp.uint8))
    return out[0] if out.shape[0] == 1 else out


# ---------------------------------------------------------------- simple ----


def linear_blend(prev: np.ndarray, curr: np.ndarray, t: float) -> np.ndarray:
    """cv2.addWeighted(prev, 1-t, curr, t) (run_experiments linear_blend)."""
    x = _as_batch_f32(prev) * (1 - t) + _as_batch_f32(curr) * t
    return _to_u8(x)


def frame_dup(prev: np.ndarray, curr: np.ndarray, t: float) -> np.ndarray:
    """Worst-case baseline: duplicate the previous frame (run_experiments.py:836-846)."""
    return prev.copy()


@functools.partial(jax.jit, static_argnames=("strength",))
def _edge_enhance_core(x: jnp.ndarray, strength: float) -> jnp.ndarray:
    blur = gaussian_blur(x, 0, 2.0)
    sharp = x * strength + blur * (1 - strength)
    return jnp.clip(sharp, 0, 255)


def edge_enhance(img: np.ndarray, strength: float = 1.3) -> np.ndarray:
    """Unsharp mask (run_experiments.py:351-356)."""
    if strength <= 0:
        return img
    return _to_u8(_edge_enhance_core(_as_batch_f32(img), strength) - 0.5 + 0.5)


def calc_motion(prev_gray: np.ndarray, curr_gray: np.ndarray) -> float:
    """Mean flow magnitude with the fast params (run_experiments.py:359-363)."""
    flow = farneback_flow(
        jnp.asarray(prev_gray, jnp.float32), jnp.asarray(curr_gray, jnp.float32),
        pyr_scale=0.5, levels=1, winsize=15, iterations=1, poly_n=5, poly_sigma=1.1,
    )
    return float(jnp.mean(flow_magnitude(flow)))


# ---------------------------------------------------------------- flow VFI --


@functools.partial(jax.jit, static_argnames=("t",))
def _flow_interp_core(x0: jnp.ndarray, x1: jnp.ndarray, t: float) -> jnp.ndarray:
    g0 = rgb_to_gray(x0)
    g1 = rgb_to_gray(x1)
    flow = farneback_flow(g0, g1, 0.5, 3, 15, 3, 5, 1.2)
    warped = flow_warp(x0, flow, t)
    return jnp.clip(warped * (1 - t) + x1 * t, 0, 255)


def flow_interpolate(prev: np.ndarray, curr: np.ndarray, t: float) -> np.ndarray:
    """Single-direction flow warp + blend (run_experiments 'optical_flow' method)."""
    return _to_u8(_flow_interp_core(_as_batch_f32(prev), _as_batch_f32(curr), float(t)))


# ---------------------------------------------------------------- UAFI ------


@jax.jit
def _ui_mask_core(x0: jnp.ndarray, x1: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """High recon-error AND low motion → UI (run_experiments.py:393-418)."""
    warped = flow_warp(x0, flow, 0.5)
    recon_error = jnp.mean(jnp.abs(warped - x1), axis=-1)
    mag = flow_magnitude(flow)
    ui = (recon_error > 30) & (mag < 2)
    ui = morph_open(morph_close(ui.astype(jnp.uint8), 5), 5)
    return ui


def detect_ui_mask(frame_0: np.ndarray, frame_1: np.ndarray, flow: np.ndarray) -> np.ndarray:
    out = np.asarray(
        _ui_mask_core(_as_batch_f32(frame_0), _as_batch_f32(frame_1), jnp.asarray(flow)[None])
    )
    return out[0]


@functools.partial(jax.jit, static_argnames=("t",))
def _uafi_core(x0: jnp.ndarray, x1: jnp.ndarray, t: float) -> jnp.ndarray:
    g0 = rgb_to_gray(x0)
    g1 = rgb_to_gray(x1)
    flow = farneback_flow(g0, g1, 0.5, 3, 15, 3, 5, 1.2)
    ui = _ui_mask_core(x0, x1, flow)
    warped = flow_warp(x0, flow, t)
    blended = warped * (1 - t) + x1 * t
    ui_source = x0 if t < 0.5 else x1
    out = jnp.where((ui > 0)[..., None], ui_source, blended)
    return jnp.clip(out, 0, 255)


def ui_aware_interpolate(prev: np.ndarray, curr: np.ndarray, t: float) -> np.ndarray:
    """UAFI (run_experiments.py:421-446)."""
    return _to_u8(_uafi_core(_as_batch_f32(prev), _as_batch_f32(curr), float(t)))


# ---------------------------------------------------------------- MCAR ------


@jax.jit
def _complexity_core(g0: jnp.ndarray, g1: jnp.ndarray):
    flow = farneback_flow(g0, g1, 0.5, 1, 15, 1, 5, 1.1)
    mag = flow_magnitude(flow)
    mean_motion = jnp.minimum(1.0, jnp.mean(mag, axis=(-2, -1)) / 20.0)
    motion_var = jnp.minimum(1.0, jnp.std(mag, axis=(-2, -1)) / 15.0)
    edges = canny(g1, 100, 200)
    edge_density = jnp.mean((edges > 0).astype(jnp.float32), axis=(-2, -1)) * 2.0
    complexity = jnp.minimum(1.0, 0.5 * mean_motion + 0.3 * motion_var + 0.2 * edge_density)
    return complexity, flow


def estimate_motion_complexity(prev_gray: np.ndarray, curr_gray: np.ndarray):
    """Complexity score 0-1 + flow (run_experiments.py:449-476)."""
    c, flow = _complexity_core(
        jnp.asarray(prev_gray, jnp.float32)[None], jnp.asarray(curr_gray, jnp.float32)[None]
    )
    return float(c[0]), np.asarray(flow[0])


def mcar_interpolate_cached(
    prev: np.ndarray,
    curr: np.ndarray,
    t: float,
    complexity: float,
    flow: np.ndarray,
    rife_model=None,
    threshold_low: float = 0.3,
    threshold_high: float = 0.7,
) -> Tuple[np.ndarray, str]:
    """3-tier routed interpolation with precomputed flow
    (run_experiments.py:511-533)."""
    if complexity < threshold_low:
        return linear_blend(prev, curr, t), "linear"
    if complexity < threshold_high or rife_model is None:
        x0 = _as_batch_f32(prev)
        warped = flow_warp(x0, jnp.asarray(flow)[None], t)
        out = warped * (1 - t) + _as_batch_f32(curr) * t
        return _to_u8(jnp.clip(out, 0, 255)), "flow"
    mid = rife_model.interpolate(prev, curr, num_frames=1, timestamps=[t])[0]
    return mid, "rife"


# ---------------------------------------------------------------- UGHI ------


@jax.jit
def _uncertainty_core(flow_fwd: jnp.ndarray, flow_bwd: jnp.ndarray) -> jnp.ndarray:
    n, h, w, _ = flow_fwd.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (n, h, w), 1)
    xs = jax.lax.broadcasted_iota(jnp.float32, (n, h, w), 2)
    bwd_warped = remap_bilinear(
        flow_bwd, xs + flow_fwd[..., 0], ys + flow_fwd[..., 1]
    )
    err = jnp.sqrt(
        (flow_fwd[..., 0] + bwd_warped[..., 0]) ** 2
        + (flow_fwd[..., 1] + bwd_warped[..., 1]) ** 2
    )
    uncertainty = jnp.clip(err / 10.0, 0, 1)
    motion_unc = jnp.clip(flow_magnitude(flow_fwd) / 50.0, 0, 1)
    return jnp.maximum(uncertainty, motion_unc * 0.5)


def estimate_uncertainty(prev, curr, flow_fwd: np.ndarray, flow_bwd: np.ndarray) -> np.ndarray:
    """Per-pixel uncertainty via flow consistency (run_experiments.py:536-557)."""
    return np.asarray(
        _uncertainty_core(jnp.asarray(flow_fwd)[None], jnp.asarray(flow_bwd)[None])
    )[0]


@functools.partial(jax.jit, static_argnames=("t",))
def _ughi_core(x0: jnp.ndarray, x1: jnp.ndarray, t: float):
    g0 = rgb_to_gray(x0)
    g1 = rgb_to_gray(x1)
    flow_fwd = farneback_flow(g0, g1, 0.5, 3, 15, 3, 5, 1.2)
    flow_bwd = farneback_flow(g1, g0, 0.5, 3, 15, 3, 5, 1.2)
    unc = _uncertainty_core(flow_fwd, flow_bwd)
    warped_fwd = flow_warp(x0, flow_fwd, t)
    warped_bwd = flow_warp(x1, flow_bwd, -(1 - t))  # x - bwd·(1-t)
    base = warped_fwd * (1 - t) + warped_bwd * t
    simple = x0 * (1 - t) + x1 * t
    u3 = unc[..., None]
    out = base * (1 - u3) + simple * u3
    return jnp.clip(out, 0, 255), jnp.mean(unc, axis=(-2, -1))


def ughi_interpolate(prev: np.ndarray, curr: np.ndarray, t: float):
    """UGHI (run_experiments.py:560-593). Returns (frame, mean_uncertainty)."""
    out, u = _ughi_core(_as_batch_f32(prev), _as_batch_f32(curr), float(t))
    return _to_u8(out), float(u[0])
