"""Comprehensive quality metrics for VFI+SR evaluation (TPU-native).

API-compatible rebuild of reference evaluation/metrics.py (882 LoC):
the same dataclasses, free functions, ``QualityEvaluator`` and
``run_comprehensive_benchmark`` entry points, with all pixel math executed
as batched jit-compiled JAX programs instead of cv2/skimage/pyiqa calls.

Formula provenance (reference file:lines):
- compute_psnr_simple: metrics.py:299-315
- compute_ssim_simple (skimage windowed, grayscale): metrics.py:318-335
- calc_psnr / calc_ssim (global-stats): run_experiments.py:292-312
- MotionDifficulty thresholds: metrics.py:34-41, 342-364
- compute_optical_flow params (0.5,3,15,3,5,1.2): metrics.py:377-381
- tOF / flicker / flow-consistency: metrics.py:385-483
- UI region / ghosting / edge wobble: metrics.py:530-662
- stratified + comprehensive: metrics.py:689-745, 752-882
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from enum import Enum
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vfisr_tpu.core.color import rgb_to_gray
from vfisr_tpu.core.resize import resize
from vfisr_tpu.core.warp import remap_bilinear
from vfisr_tpu.ops.conv import laplacian
from vfisr_tpu.ops.edges import canny
from vfisr_tpu.ops.morphology import dilate, morph_close
from vfisr_tpu.ops.ssim import ssim as ssim_windowed
from vfisr_tpu.ops.ssim import ssim_global
from vfisr_tpu.ops.flow import farneback_flow, flow_magnitude


class MotionDifficulty(Enum):
    """Motion difficulty levels for stratified reporting (metrics.py:34-41)."""

    STATIC = "static"  # < 1 px mean flow
    EASY = "easy"  # 1-5 px
    MEDIUM = "medium"  # 5-15 px
    HARD = "hard"  # 15-30 px
    EXTREME = "extreme"  # > 30 px


@dataclass
class TemporalMetrics:
    tof_smoothness: float
    flicker_score: float
    flow_consistency: float
    motion_variance: float

    def to_dict(self) -> dict:
        return {
            "tof_smoothness": self.tof_smoothness,
            "flicker_score": self.flicker_score,
            "flow_consistency": self.flow_consistency,
            "motion_variance": self.motion_variance,
        }


@dataclass
class StratifiedMetrics:
    by_difficulty: Dict[str, Dict[str, float]] = field(default_factory=dict)
    frame_counts: Dict[str, int] = field(default_factory=dict)

    def to_dict(self) -> dict:
        return {"by_difficulty": self.by_difficulty, "frame_counts": self.frame_counts}


@dataclass
class GamingMetrics:
    ui_ghosting_score: float
    edge_wobble_score: float

    def to_dict(self) -> dict:
        return {
            "ui_ghosting_score": self.ui_ghosting_score,
            "edge_wobble_score": self.edge_wobble_score,
        }


@dataclass
class QualityResults:
    psnr: float
    ssim: float
    lpips: float
    ms_ssim: Optional[float] = None
    flolpips: Optional[float] = None
    psnr_per_frame: Optional[List[float]] = None
    lpips_per_frame: Optional[List[float]] = None

    def to_dict(self) -> dict:
        return {
            "psnr": self.psnr,
            "ssim": self.ssim,
            "lpips": self.lpips,
            "ms_ssim": self.ms_ssim,
            "flolpips": self.flolpips,
        }


# =============================================================================
# Simple per-pair metrics
# =============================================================================


def _match_size(pred: np.ndarray, gt: np.ndarray) -> np.ndarray:
    if pred.shape != gt.shape:
        pred = np.asarray(resize(pred, gt.shape[:2], "linear"))
    return pred


def compute_psnr_simple(pred: np.ndarray, gt: np.ndarray) -> float:
    """10·log10(255²/MSE); inf for identical (metrics.py:299-315)."""
    pred = _match_size(pred, gt)
    mse = np.mean((pred.astype(float) - gt.astype(float)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10 * np.log10(255.0**2 / mse))


def compute_ssim_simple(pred: np.ndarray, gt: np.ndarray) -> float:
    """Windowed grayscale SSIM, skimage-default parameters (metrics.py:318-335)."""
    pred = _match_size(pred, gt)
    if pred.ndim == 3:
        pg = np.asarray(rgb_to_gray(pred)).astype(np.float32)
        gg = np.asarray(rgb_to_gray(gt)).astype(np.float32)
    else:
        pg = pred.astype(np.float32)
        gg = gt.astype(np.float32)
    return float(ssim_windowed(pg, gg))


def calc_psnr(img1: np.ndarray, img2: np.ndarray) -> float:
    """run_experiments.py:292-301 variant (identical formula, uncapped)."""
    return compute_psnr_simple(img1, img2)


def calc_ssim(img1: np.ndarray, img2: np.ndarray) -> float:
    """Global-statistics SSIM, clamped [0,1] (run_experiments.py:304-312)."""
    return float(ssim_global(jnp.asarray(img1), jnp.asarray(img2)))


def safe_round(value, decimals: int = 2):
    """inf/NaN-safe rounding for JSON (run_experiments.py:341-348)."""
    if value is None:
        return None
    if math.isinf(value):
        return "inf" if value > 0 else "-inf"
    if math.isnan(value):
        return None
    return round(value, decimals)


# =============================================================================
# Optical flow + difficulty
# =============================================================================


def compute_optical_flow(frame1: np.ndarray, frame2: np.ndarray) -> np.ndarray:
    """Farneback flow with the reference's parameters (metrics.py:367-382)."""
    g1 = _to_gray(frame1)
    g2 = _to_gray(frame2)
    return np.asarray(
        farneback_flow(g1, g2, pyr_scale=0.5, levels=3, winsize=15, iterations=3,
                       poly_n=5, poly_sigma=1.2)
    )


def _to_gray(frame: np.ndarray) -> np.ndarray:
    if frame.ndim == 3:
        # reference uses cv2.COLOR_BGR2GRAY on (usually) RGB arrays; weights
        # differ only in R/B order — we follow the array's declared RGB order.
        return np.asarray(rgb_to_gray(frame)).astype(np.float32)
    return frame.astype(np.float32)


def classify_motion_difficulty(flow: np.ndarray) -> MotionDifficulty:
    """Thresholds 1/5/15/30 px mean magnitude (metrics.py:342-364)."""
    mean_motion = float(np.mean(np.sqrt(flow[..., 0] ** 2 + flow[..., 1] ** 2)))
    if mean_motion < 1:
        return MotionDifficulty.STATIC
    if mean_motion < 5:
        return MotionDifficulty.EASY
    if mean_motion < 15:
        return MotionDifficulty.MEDIUM
    if mean_motion < 30:
        return MotionDifficulty.HARD
    return MotionDifficulty.EXTREME


# =============================================================================
# Temporal consistency
# =============================================================================


def compute_tof_smoothness(flows: List[np.ndarray]) -> float:
    """Mean |Δflow| between consecutive flows (metrics.py:385-410)."""
    if len(flows) < 2:
        return 0.0
    diffs = []
    for i in range(len(flows) - 1):
        d = flows[i + 1] - flows[i]
        diffs.append(float(np.mean(np.sqrt(d[..., 0] ** 2 + d[..., 1] ** 2))))
    return float(np.mean(diffs))


def compute_flicker_score(frames: List[np.ndarray]) -> float:
    """Mean |f(t+1) - 2f(t) + f(t-1)| luminance (metrics.py:413-447)."""
    if len(frames) < 3:
        return 0.0
    lum = [_to_gray(f).astype(float) for f in frames]
    scores = [
        float(np.mean(np.abs(lum[i + 1] - 2 * lum[i] + lum[i - 1])))
        for i in range(1, len(lum) - 1)
    ]
    return float(np.mean(scores))


def compute_flow_consistency(
    flows_fwd: List[np.ndarray], flows_bwd: List[np.ndarray]
) -> float:
    """‖fwd + bwd∘fwd‖ mean (metrics.py:450-483)."""
    if not flows_fwd or not flows_bwd:
        return 0.0
    errors = []
    for fwd, bwd in zip(flows_fwd, flows_bwd):
        h, w = fwd.shape[:2]
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        bwd_warped = np.asarray(
            remap_bilinear(
                jnp.asarray(bwd, jnp.float32)[None],
                jnp.asarray(xs + fwd[..., 0])[None],
                jnp.asarray(ys + fwd[..., 1])[None],
            )
        )[0]
        err = np.sqrt(
            (fwd[..., 0] + bwd_warped[..., 0]) ** 2
            + (fwd[..., 1] + bwd_warped[..., 1]) ** 2
        )
        errors.append(float(np.mean(err)))
    return float(np.mean(errors))


def compute_temporal_metrics(frames: List[np.ndarray]) -> TemporalMetrics:
    """All temporal metrics for a frame sequence (metrics.py:486-523)."""
    if len(frames) < 3:
        return TemporalMetrics(0.0, 0.0, 0.0, 0.0)
    flows_fwd, flows_bwd, mags = [], [], []
    for i in range(len(frames) - 1):
        fwd = compute_optical_flow(frames[i], frames[i + 1])
        bwd = compute_optical_flow(frames[i + 1], frames[i])
        flows_fwd.append(fwd)
        flows_bwd.append(bwd)
        mags.append(float(np.mean(np.sqrt(fwd[..., 0] ** 2 + fwd[..., 1] ** 2))))
    return TemporalMetrics(
        tof_smoothness=compute_tof_smoothness(flows_fwd),
        flicker_score=compute_flicker_score(frames),
        flow_consistency=compute_flow_consistency(flows_fwd, flows_bwd),
        motion_variance=float(np.var(mags)) if mags else 0.0,
    )


# =============================================================================
# Gaming-specific
# =============================================================================


@jax.jit
def _ui_score_map(gray: jnp.ndarray) -> jnp.ndarray:
    """Edge×0.4 + flat-Laplacian×0.3 + border-position×0.3 (metrics.py:546-566)."""
    h, w = gray.shape[-2:]
    edges = canny(gray, 100, 200) > 0
    lap = laplacian(gray.astype(jnp.float32)[..., None])[..., 0]
    flat = jnp.abs(lap) < 5
    ys = jax.lax.broadcasted_iota(jnp.float32, gray.shape, gray.ndim - 2)
    xs = jax.lax.broadcasted_iota(jnp.float32, gray.shape, gray.ndim - 1)
    edge_weight = (
        jnp.minimum(jnp.minimum(ys, h - ys), jnp.minimum(xs, w - xs))
        / min(h, w)
        * 4.0
    )
    edge_weight = jnp.clip(1.0 - edge_weight, 0.0, 1.0)
    score = edges.astype(jnp.float32) * 0.4 + flat.astype(jnp.float32) * 0.3 + edge_weight * 0.3
    return morph_close((score > 0.5).astype(jnp.uint8), 5)


def detect_ui_regions(frame: np.ndarray) -> np.ndarray:
    """Binary HUD/UI mask (metrics.py:530-572)."""
    return np.asarray(_ui_score_map(jnp.asarray(_to_gray(frame))))


def compute_ui_ghosting_score(
    pred_frames: List[np.ndarray], gt_frames: List[np.ndarray]
) -> float:
    """Mean |pred-gt| restricted to GT UI mask (metrics.py:575-616)."""
    if len(pred_frames) != len(gt_frames):
        return 0.0
    scores = []
    for pred, gt in zip(pred_frames, gt_frames):
        ui_mask = detect_ui_regions(gt)
        if np.sum(ui_mask) < 100:
            continue
        pred = _match_size(pred, gt)
        error = np.abs(pred.astype(float) - gt.astype(float))
        if error.ndim == 3:
            error = np.mean(error, axis=2)
        ui_error = error * ui_mask
        scores.append(float(np.mean(ui_error[ui_mask > 0])))
    return float(np.mean(scores)) if scores else 0.0


def compute_edge_wobble_score(frames: List[np.ndarray]) -> float:
    """Edges present now but absent in dilated prev∧next (metrics.py:619-662)."""
    if len(frames) < 3:
        return 0.0
    edge_maps = [
        np.asarray(canny(jnp.asarray(_to_gray(f)), 50, 150)).astype(float) / 255.0
        for f in frames
    ]
    scores = []
    for i in range(1, len(edge_maps) - 1):
        prev_d = np.asarray(dilate(jnp.asarray(edge_maps[i - 1]), 3))
        next_d = np.asarray(dilate(jnp.asarray(edge_maps[i + 1]), 3))
        wobbly = edge_maps[i] * (1 - prev_d * next_d)
        scores.append(float(np.mean(wobbly)))
    return float(np.mean(scores)) if scores else 0.0


def compute_gaming_metrics(
    pred_frames: List[np.ndarray], gt_frames: List[np.ndarray]
) -> GamingMetrics:
    return GamingMetrics(
        ui_ghosting_score=compute_ui_ghosting_score(pred_frames, gt_frames),
        edge_wobble_score=compute_edge_wobble_score(pred_frames),
    )


# =============================================================================
# Stratified metrics
# =============================================================================


def compute_stratified_metrics(
    pred_frames: List[np.ndarray], gt_frames: List[np.ndarray]
) -> StratifiedMetrics:
    """Per-difficulty PSNR/SSIM buckets (metrics.py:689-745)."""
    if len(pred_frames) != len(gt_frames) or len(pred_frames) < 2:
        return StratifiedMetrics()
    buckets = {d.value: {"psnr": [], "ssim": []} for d in MotionDifficulty}
    counts = {d.value: 0 for d in MotionDifficulty}
    for i in range(len(gt_frames) - 1):
        flow = compute_optical_flow(gt_frames[i], gt_frames[i + 1])
        difficulty = classify_motion_difficulty(flow)
        pred = _match_size(pred_frames[i], gt_frames[i])
        buckets[difficulty.value]["psnr"].append(compute_psnr_simple(pred, gt_frames[i]))
        buckets[difficulty.value]["ssim"].append(compute_ssim_simple(pred, gt_frames[i]))
        counts[difficulty.value] += 1
    by_difficulty = {
        d.value: {
            "psnr": float(np.mean(buckets[d.value]["psnr"])),
            "ssim": float(np.mean(buckets[d.value]["ssim"])),
        }
        for d in MotionDifficulty
        if counts[d.value] > 0
    }
    return StratifiedMetrics(
        by_difficulty=by_difficulty,
        frame_counts={k: v for k, v in counts.items() if v > 0},
    )


# =============================================================================
# QualityEvaluator (pyiqa-equivalent, JAX-backed)
# =============================================================================


class QualityEvaluator:
    """Evaluate generated frames vs ground truth (metrics.py:111-296 analog).

    Batched JAX replaces pyiqa: PSNR/SSIM are exact reimplementations;
    LPIPS uses the native AlexNet-LPIPS graph (evaluation/lpips.py) —
    official weights when available, deterministic random features
    otherwise (mode recorded in ``lpips_mode``).
    """

    def __init__(self, device: str = "tpu"):
        self.device = device
        self._initialized = False
        self._lpips = None

    def _ensure_initialized(self):
        if self._initialized:
            return
        from vfisr_tpu.evaluation.lpips import default_lpips

        self._lpips = default_lpips()
        self._initialized = True

    @property
    def lpips_mode(self) -> str:
        self._ensure_initialized()
        return self._lpips.mode

    def evaluate_pair(self, pred: np.ndarray, gt: np.ndarray) -> Dict[str, float]:
        self._ensure_initialized()
        pred = _match_size(pred, gt)
        results = {
            "psnr": compute_psnr_simple(pred, gt),
            "ssim": compute_ssim_simple(pred, gt),
            "lpips": float(self._lpips(pred, gt)[0]),
        }
        try:
            from vfisr_tpu.ops.ssim import ms_ssim

            pg = _to_gray(pred)
            gg = _to_gray(gt)
            if min(pg.shape[-2:]) >= 7 * 2**4:  # 5 dyadic scales need >=112px
                results["ms_ssim"] = float(ms_ssim(jnp.asarray(pg), jnp.asarray(gg)))
        except Exception:
            pass
        return results

    def evaluate_flolpips(
        self, pred_frames: List[np.ndarray], gt_frames: List[np.ndarray]
    ) -> Optional[float]:
        """FloLPIPS over a sequence: LPIPS spatial maps weighted by GT motion
        magnitude (the reference exposes this as an optional pyiqa metric,
        metrics.py:146-150)."""
        self._ensure_initialized()
        if len(pred_frames) < 2 or len(pred_frames) != len(gt_frames):
            return None
        vals = []
        for i in range(len(gt_frames) - 1):
            flow = compute_optical_flow(gt_frames[i], gt_frames[i + 1])
            mag = np.sqrt(flow[..., 0] ** 2 + flow[..., 1] ** 2)
            vals.append(float(self._lpips.flow_weighted(pred_frames[i], gt_frames[i], mag)[0]))
        return float(np.mean(vals))

    def evaluate(
        self, pred_frames: List[np.ndarray], gt_frames: List[np.ndarray]
    ) -> QualityResults:
        self._ensure_initialized()
        if len(pred_frames) != len(gt_frames):
            raise ValueError(
                f"Number of predicted frames ({len(pred_frames)}) "
                f"doesn't match ground truth ({len(gt_frames)})"
            )
        psnr_values, ssim_values, lpips_values, ms_values = [], [], [], []
        for pred, gt in zip(pred_frames, gt_frames):
            m = self.evaluate_pair(pred, gt)
            psnr_values.append(m["psnr"])
            ssim_values.append(m["ssim"])
            lpips_values.append(m["lpips"])
            if "ms_ssim" in m:
                ms_values.append(m["ms_ssim"])
        return QualityResults(
            psnr=float(np.mean(psnr_values)),
            ssim=float(np.mean(ssim_values)),
            lpips=float(np.mean(lpips_values)),
            ms_ssim=float(np.mean(ms_values)) if ms_values else None,
            psnr_per_frame=psnr_values,
            lpips_per_frame=lpips_values,
        )

    def evaluate_temporal_consistency(
        self, frames: List[np.ndarray]
    ) -> Dict[str, float]:
        """LPIPS between consecutive frames (metrics.py:259-296)."""
        self._ensure_initialized()
        if len(frames) < 2:
            return {"temporal_lpips_mean": 0, "temporal_lpips_std": 0}
        diffs = [
            float(self._lpips(frames[i], frames[i + 1])[0])
            for i in range(len(frames) - 1)
        ]
        return {
            "temporal_lpips_mean": float(np.mean(diffs)),
            "temporal_lpips_std": float(np.std(diffs)),
            "temporal_lpips_max": float(np.max(diffs)),
            "temporal_lpips_min": float(np.min(diffs)),
        }


# =============================================================================
# Comprehensive benchmark
# =============================================================================


@dataclass
class ComprehensiveBenchmarkResults:
    psnr: float
    ssim: float
    temporal: TemporalMetrics
    gaming: GamingMetrics
    stratified: StratifiedMetrics
    total_frames: int

    def to_dict(self) -> dict:
        return {
            "reconstruction": {"psnr": self.psnr, "ssim": self.ssim},
            "temporal": self.temporal.to_dict(),
            "gaming": self.gaming.to_dict(),
            "stratified": self.stratified.to_dict(),
            "total_frames": self.total_frames,
        }

    def summary_table(self) -> str:
        lines = [
            "=" * 60,
            "COMPREHENSIVE VFI BENCHMARK RESULTS",
            "=" * 60,
            "",
            "## Reconstruction Accuracy",
            f"  PSNR: {self.psnr:.2f} dB",
            f"  SSIM: {self.ssim:.4f}",
            "",
            "## Temporal Consistency (lower is better)",
            f"  tOF Smoothness: {self.temporal.tof_smoothness:.4f}",
            f"  Flicker Score: {self.temporal.flicker_score:.4f}",
            f"  Flow Consistency: {self.temporal.flow_consistency:.4f}",
            "",
            "## Gaming-Specific (lower is better)",
            f"  UI Ghosting: {self.gaming.ui_ghosting_score:.2f}",
            f"  Edge Wobble: {self.gaming.edge_wobble_score:.4f}",
            "",
            "## By Motion Difficulty",
        ]
        for diff, m in self.stratified.by_difficulty.items():
            count = self.stratified.frame_counts.get(diff, 0)
            lines.append(
                f"  {diff.upper()}: PSNR={m['psnr']:.2f}dB, "
                f"SSIM={m['ssim']:.4f} (n={count})"
            )
        lines += ["", f"Total Frames: {self.total_frames}", "=" * 60]
        return "\n".join(lines)


def run_comprehensive_benchmark(
    pred_frames: List[np.ndarray],
    gt_frames: List[np.ndarray],
    verbose: bool = True,
) -> ComprehensiveBenchmarkResults:
    """THE complete-evaluation entry point (metrics.py:818-882)."""
    if verbose:
        print("Running comprehensive VFI benchmark...")
    n_frames = min(len(pred_frames), len(gt_frames))
    pred_frames = pred_frames[:n_frames]
    gt_frames = gt_frames[:n_frames]

    if verbose:
        print("  Computing reconstruction metrics...")
    psnr_values, ssim_values = [], []
    for pred, gt in zip(pred_frames, gt_frames):
        pred = _match_size(pred, gt)
        psnr_values.append(compute_psnr_simple(pred, gt))
        ssim_values.append(compute_ssim_simple(pred, gt))

    if verbose:
        print("  Computing temporal consistency metrics...")
    temporal = compute_temporal_metrics(pred_frames)
    if verbose:
        print("  Computing gaming-specific metrics...")
    gaming = compute_gaming_metrics(pred_frames, gt_frames)
    if verbose:
        print("  Computing stratified metrics...")
    stratified = compute_stratified_metrics(pred_frames, gt_frames)

    results = ComprehensiveBenchmarkResults(
        psnr=float(np.mean(psnr_values)),
        ssim=float(np.mean(ssim_values)),
        temporal=temporal,
        gaming=gaming,
        stratified=stratified,
        total_frames=n_frames,
    )
    if verbose:
        print(results.summary_table())
    return results
