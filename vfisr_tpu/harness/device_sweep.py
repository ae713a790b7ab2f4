"""Device-batched experiment path: chunked jitted programs per K frame pairs.

The reference's hot loop is strictly per-frame host OpenCV + one model call
per frame (run_experiments.py:811-1009). The TPU-first formulation keeps
the whole interval resident in HBM as uint8 and runs degrade → SR → edge →
VFI → metrics for K pairs per dispatch inside one jitted program; the host
reads back only metric scalars (and frames when a video is written —
through this environment's ~44 MB/s tunnel that readback, not compute,
bounds video-producing runs).

Identical metric semantics to harness.experiments.run_experiment:
keyframe PSNR/SSIM on the PRE-edge-enhance SR frame vs the reference frame
(run_experiments.py:983-995), VFI PSNR/SSIM on the t=0.5 frame vs the GT
midpoint (:736-758), LPIPS every 10th evaluated VFI frame (:735),
overall = 0.25·KF + 0.75·VFI (:1021-1038).

Supported vfi methods: all of them — none/control, frame_dup,
linear_blend, rife, adaptive, optical_flow, ui_aware (UAFI), ughi, mcar.
The flow-heavy innovative methods compute Farneback ONCE per pair (the
host path recomputes identical flow per timestep) and warp through the
windowed Pallas kernel instead of the serial TPU gather.
"""

from __future__ import annotations

import functools
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vfisr_tpu.core.color import rgb_to_gray
from vfisr_tpu.core.resize import resize
from vfisr_tpu.evaluation.metrics import safe_round
from vfisr_tpu.methods.inline import _edge_enhance_core
from vfisr_tpu.ops.flow import farneback_flow
from vfisr_tpu.ops.ssim import ssim_global

DEVICE_METHODS = {"none", "frame_dup", "linear_blend", "rife", "adaptive",
                  "optical_flow", "ui_aware", "ughi", "mcar"}
# these run full-res Farneback per pair — keep chunks small
_HEAVY_FLOW_METHODS = {"ui_aware", "ughi", "mcar"}

INPUT_W, INPUT_H = 960, 540  # reference degradation target


class DeviceInterval:
    """Interval frames resident on device, uploaded once per sweep.

    keyframes/midpoints/ref_frames: lists of HWC uint8 RGB (host). The
    uint8 stacks live in HBM; every experiment in the sweep slices them
    on device instead of re-uploading per frame (the reference re-reads
    PNGs and re-uploads tensors per frame, run_experiments.py:811-830).
    """

    def __init__(self, keyframes: List[np.ndarray],
                 midpoints: Optional[List[np.ndarray]],
                 ref_frames: Optional[List[np.ndarray]] = None):
        self.kf = jnp.asarray(np.stack(keyframes))
        self.mid = jnp.asarray(np.stack(midpoints)) if midpoints else None
        self.ref = (jnp.asarray(np.stack(ref_frames))
                    if ref_frames is not None else self.kf)
        self.n_kf = self.kf.shape[0]


def _psnr_per_frame(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[N,...]x2 -> [N] PSNR (inf-safe; calc_psnr formula)."""
    mse = jnp.mean(
        (a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2,
        axis=tuple(range(1, a.ndim)),
    )
    return jnp.where(
        mse == 0, jnp.inf, 10.0 * jnp.log10(255.0**2 / jnp.maximum(mse, 1e-12))
    )


_ssim_batch = jax.vmap(ssim_global)


def _qu8(x: jnp.ndarray) -> jnp.ndarray:
    """Snap float 0..255 to the uint8 grid (round-half-away, stay float).

    The host loop materializes uint8 after every cv2 step; metrics must see
    the same quantization or high-PSNR comparisons drift."""
    return jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0)


@functools.partial(
    jax.jit,
    static_argnames=("vfi", "interp", "edge", "out_hw", "is_control",
                     "motion_thresh", "mcar_low", "mcar_high",
                     "want_frames"),
)
def _chunk_program(
    src: jnp.ndarray,   # [K+1, H, W, 3] uint8 source keyframes
    ref: jnp.ndarray,   # [K+1, H, W, 3] uint8 reference frames
    gt: jnp.ndarray,    # [K, Hg, Wg, 3] uint8 GT midpoints
    rife_mids: jnp.ndarray,  # [K, 3, oh, ow, 3] float SR-res RIFE mids (or zeros)
    *,
    vfi: str,
    interp: str,
    edge: float,
    out_hw: tuple,
    is_control: bool,
    motion_thresh: float,
    mcar_low: float,
    mcar_high: float,
    want_frames: bool,
):
    oh, ow = out_hw
    k = src.shape[0] - 1
    srcf = src.astype(jnp.float32)

    if is_control:
        out = _qu8(resize(srcf, out_hw, "lanczos4"))
        out_m = out
    else:
        degraded = _qu8(resize(srcf, (INPUT_H, INPUT_W), "area"))
        out_m = _qu8(resize(degraded, out_hw, interp))  # pre-edge, for metrics
        out = _qu8(_edge_enhance_core(out_m, edge)) if edge > 0 else out_m

    # ---- keyframe metrics vs reference (per keyframe) ----
    ref_r = _qu8(resize(ref.astype(jnp.float32), out_hw, "lanczos4"))
    kf_psnr = _psnr_per_frame(out_m, ref_r)
    kf_ssim = _ssim_batch(rgb_to_gray(out_m), rgb_to_gray(ref_r))

    prev = out[:-1]   # [K, oh, ow, 3]
    curr = out[1:]

    # ---- VFI mids [K, 3, oh, ow, 3] ----
    ts = jnp.asarray([0.25, 0.5, 0.75], jnp.float32)[None, :, None, None, None]
    rife_used = jnp.zeros((k,), bool)
    if vfi in ("none", "frame_dup"):
        mids = jnp.broadcast_to(prev[:, None], (k, 3, oh, ow, 3))
    elif vfi == "linear_blend":
        mids = prev[:, None] * (1 - ts) + curr[:, None] * ts
    elif vfi == "optical_flow":
        from vfisr_tpu.core.warp import backward_warp

        g0 = rgb_to_gray(resize(prev, (oh // 2, ow // 2), "linear"))
        g1 = rgb_to_gray(resize(curr, (oh // 2, ow // 2), "linear"))
        fl = farneback_flow(g0, g1)
        fl = resize(fl, out_hw, "linear") * 2.0
        t_fac = jnp.repeat(jnp.asarray([0.25, 0.5, 0.75]), k)[:, None, None, None]
        # border="constant" matches the host loop's remap_bilinear default
        # (cv2 zero taps at border-exiting motion)
        warped = backward_warp(
            jnp.tile(prev, (3, 1, 1, 1)),
            jnp.tile(fl, (3, 1, 1, 1)) * t_fac,
            1.0,
            border="constant",
        )  # [3K, oh, ow, 3], timestep-major
        warped = warped.reshape(3, k, oh, ow, 3).transpose(1, 0, 2, 3, 4)
        mids = warped * (1 - ts) + curr[:, None] * ts
    elif vfi == "ui_aware":
        # UAFI (methods/inline.py::_uafi_core; run_experiments.py:393-446).
        # Flow is computed ONCE per pair and reused for all timesteps (the
        # per-t host call recomputes identical flow 3x); warps go through
        # the windowed Pallas kernel instead of the serial TPU gather.
        from vfisr_tpu.core.warp import backward_warp
        from vfisr_tpu.ops.morphology import morph_close, morph_open

        g0 = rgb_to_gray(prev)
        g1 = rgb_to_gray(curr)
        flow = farneback_flow(g0, g1, 0.5, 3, 15, 3, 5, 1.2)
        t_all = jnp.asarray([0.5, 0.25, 0.5, 0.75])  # mask warp + 3 mids
        warped_all = backward_warp(
            jnp.tile(prev, (4, 1, 1, 1)),
            jnp.tile(flow, (4, 1, 1, 1))
            * jnp.repeat(t_all, k)[:, None, None, None],
            1.0, border="constant", radius=(4, 6),
        ).reshape(4, k, oh, ow, 3)
        recon_err = jnp.mean(jnp.abs(warped_all[0] - curr), axis=-1)
        mag = jnp.sqrt(flow[..., 0] ** 2 + flow[..., 1] ** 2)
        ui = (recon_err > 30) & (mag < 2)
        ui = morph_open(morph_close(ui.astype(jnp.uint8), 5), 5) > 0
        blended = (warped_all[1:].transpose(1, 0, 2, 3, 4) * (1 - ts)
                   + curr[:, None] * ts)
        # host rule: x0 if t < 0.5 else x1 -> t=0.25:prev, t=0.5:curr, t=0.75:curr
        ui_src = jnp.stack([prev, curr, curr], axis=1)
        mids = jnp.where(ui[:, None, :, :, None], ui_src, blended)
    elif vfi == "ughi":
        # UGHI (methods/inline.py::_ughi_core; run_experiments.py:536-593):
        # bidirectional flow once per pair; fwd/bwd consistency ->
        # per-pixel uncertainty lerps warped blend toward plain blend.
        from vfisr_tpu.core.warp import backward_warp

        g0 = rgb_to_gray(prev)
        g1 = rgb_to_gray(curr)
        flow_fwd = farneback_flow(g0, g1, 0.5, 3, 15, 3, 5, 1.2)
        flow_bwd = farneback_flow(g1, g0, 0.5, 3, 15, 3, 5, 1.2)
        bwd_warped = backward_warp(flow_bwd, flow_fwd, 1.0,
                                   border="constant", radius=(4, 6))
        err = jnp.sqrt((flow_fwd[..., 0] + bwd_warped[..., 0]) ** 2
                       + (flow_fwd[..., 1] + bwd_warped[..., 1]) ** 2)
        unc = jnp.clip(err / 10.0, 0, 1)
        motion_unc = jnp.clip(
            jnp.sqrt(flow_fwd[..., 0] ** 2 + flow_fwd[..., 1] ** 2) / 50.0,
            0, 1)
        unc = jnp.maximum(unc, motion_unc * 0.5)
        t_list = jnp.asarray([0.25, 0.5, 0.75])
        imgs = jnp.concatenate([jnp.tile(prev, (3, 1, 1, 1)),
                                jnp.tile(curr, (3, 1, 1, 1))], axis=0)
        t_f = jnp.repeat(t_list, k)[:, None, None, None]
        flows = jnp.concatenate(
            [jnp.tile(flow_fwd, (3, 1, 1, 1)) * t_f,
             jnp.tile(flow_bwd, (3, 1, 1, 1)) * -(1 - t_f)], axis=0)
        warped = backward_warp(imgs, flows, 1.0, border="constant",
                               radius=(4, 6)).reshape(2, 3, k, oh, ow, 3)
        w_fwd = warped[0].transpose(1, 0, 2, 3, 4)  # [K,3,oh,ow,3]
        w_bwd = warped[1].transpose(1, 0, 2, 3, 4)
        base = w_fwd * (1 - ts) + w_bwd * ts
        simple = prev[:, None] * (1 - ts) + curr[:, None] * ts
        u5 = unc[:, None, :, :, None]
        mids = base * (1 - u5) + simple * u5
    elif vfi == "mcar":
        # MCAR 3-tier routing (methods/inline.py; run_experiments.py:
        # 449-533, incl. the preserved 0%-RIFE routing bug): complexity
        # from fast Farneback + Canny edge density, flow precomputed once.
        from vfisr_tpu.core.warp import backward_warp
        from vfisr_tpu.ops.edges import canny

        g0 = rgb_to_gray(prev)
        g1 = rgb_to_gray(curr)
        flow = farneback_flow(g0, g1, 0.5, 1, 15, 1, 5, 1.1)
        mag = jnp.sqrt(flow[..., 0] ** 2 + flow[..., 1] ** 2)
        mean_motion = jnp.minimum(1.0, jnp.mean(mag, axis=(1, 2)) / 20.0)
        motion_var = jnp.minimum(1.0, jnp.std(mag, axis=(1, 2)) / 15.0)
        edges = canny(g1, 100, 200)
        edge_density = jnp.mean((edges > 0).astype(jnp.float32),
                                axis=(-2, -1)) * 2.0
        complexity = jnp.minimum(
            1.0, 0.5 * mean_motion + 0.3 * motion_var + 0.2 * edge_density)
        t_f = jnp.repeat(jnp.asarray([0.25, 0.5, 0.75]), k)[:, None, None, None]
        warped = backward_warp(
            jnp.tile(prev, (3, 1, 1, 1)),
            jnp.tile(flow, (3, 1, 1, 1)) * t_f,
            1.0, border="constant", radius=(4, 6),
        ).reshape(3, k, oh, ow, 3).transpose(1, 0, 2, 3, 4)
        flow_mids = warped * (1 - ts) + curr[:, None] * ts
        blend = prev[:, None] * (1 - ts) + curr[:, None] * ts
        low = complexity < mcar_low
        high = (complexity >= mcar_high)
        rife_used = high  # tier counter (known-bug: effectively never)
        mids = jnp.where(low[:, None, None, None, None], blend, flow_mids)
        mids = jnp.where(high[:, None, None, None, None], rife_mids, mids)
    elif vfi == "rife":
        mids = rife_mids
        rife_used = jnp.ones((k,), bool)
    elif vfi == "adaptive":
        # motion at 480x270 with the fast Farneback params
        # (run_experiments.py:848-874, methods.inline.calc_motion)
        ga = rgb_to_gray(resize(prev, (270, 480), "linear"))
        gb = rgb_to_gray(resize(curr, (270, 480), "linear"))
        fl = farneback_flow(ga, gb, 0.5, 1, 15, 1, 5, 1.1)
        motion = jnp.mean(
            jnp.sqrt(fl[..., 0] ** 2 + fl[..., 1] ** 2), axis=(1, 2)
        )
        rife_used = motion > motion_thresh
        blend = prev[:, None] * (1 - ts) + curr[:, None] * ts
        mids = jnp.where(rife_used[:, None, None, None, None], rife_mids, blend)
    else:
        raise ValueError(f"unsupported device vfi method {vfi}")
    mids = _qu8(mids)

    # ---- VFI metrics: t=0.5 vs GT midpoint ----
    mid_half = mids[:, 1]
    gt_r = _qu8(resize(gt.astype(jnp.float32), out_hw, "lanczos4"))
    vfi_psnr = _psnr_per_frame(mid_half, gt_r)
    vfi_ssim = _ssim_batch(rgb_to_gray(mid_half), rgb_to_gray(gt_r))

    metrics = {
        "kf_psnr": kf_psnr, "kf_ssim": kf_ssim,
        "vfi_psnr": vfi_psnr, "vfi_ssim": vfi_ssim,
        "rife_used": rife_used,
        "mid_half_u8": jnp.clip(mid_half + 0.5, 0, 255).astype(jnp.uint8),
    }
    if want_frames:
        # written order per pair: mid1 mid2 mid3 kf_{i+1}
        seq = jnp.concatenate([mids, curr[:, None]], axis=1)
        metrics["frames_u8"] = jnp.clip(seq + 0.5, 0, 255).astype(jnp.uint8)
        metrics["first_kf_u8"] = jnp.clip(out[0] + 0.5, 0, 255).astype(jnp.uint8)
    return metrics


@jax.jit
def _motion_chunk(prev: jnp.ndarray, curr: jnp.ndarray) -> jnp.ndarray:
    """Per-pair adaptive-router motion (mean 480x270 fast-Farneback flow),
    the same signal _chunk_program's adaptive branch thresholds on —
    read back host-side so the quality-aware tier can pick each pair's
    neural expert from the calibrated 'sweep' bins."""
    ga = rgb_to_gray(resize(prev, (270, 480), "linear"))
    gb = rgb_to_gray(resize(curr, (270, 480), "linear"))
    fl = farneback_flow(ga, gb, 0.5, 1, 15, 1, 5, 1.1)
    return jnp.mean(jnp.sqrt(fl[..., 0] ** 2 + fl[..., 1] ** 2), axis=(1, 2))


def _vfimamba_chunk(prev_u8: jnp.ndarray, curr_u8: jnp.ndarray) -> jnp.ndarray:
    """[K,oh,ow,3] float 0..255 x2 -> [K,3,oh,ow,3] float 0..255 VFIMamba
    midpoints (the quality-aware heavy expert; loaded once).

    One timestamp per apply: interpolate_batch repeats the batch per
    timestamp, and the S6 activations of a 3x batch at the sweep's 1440p
    operating point need ~45 GB HBM (~3x the 15.75 GB chip) — while the
    batch-1 single-t program is exactly what the calibration ran (and
    compiled) at this resolution. The timestamp is a traced argument, so
    the three calls share that one compiled program. Even single-t 1440p
    (~15 GB) only fits an otherwise-empty chip; alongside the sweep's
    resident frame stacks the model's MAX_INTERNAL_AREA cap kicks in
    (trunk at 1920x1080, midpoints Lanczos-upscaled — the content's true
    detail is the 960x540 degraded source, so the cap sits 2x above it;
    cost measured in outputs/train_r5/expert_downscale_check.json)."""
    from vfisr_tpu.harness.experiments import _VFIMambaSingleton

    m = _VFIMambaSingleton.get()
    x0, x1 = prev_u8 / 255.0, curr_u8 / 255.0
    outs = [m.interpolate_batch(x0, x1, (t,)) for t in (0.25, 0.5, 0.75)]
    return jnp.concatenate(outs, axis=1) * 255.0


def _rife_chunk(prev_u8: jnp.ndarray, curr_u8: jnp.ndarray,
                scale: float = 0.5) -> jnp.ndarray:
    """[K,oh,ow,3] uint8 x2 -> [K,3,oh,ow,3] float 0..255 RIFE midpoints.

    ``scale`` is the reference's rife_scale (run_experiments.py:704:
    default 0.5, rife_fast 0.25) — translated to the native model's
    pyramid units (see experiments._rife_native_scale)."""
    from vfisr_tpu.harness.experiments import _RIFESingleton, _rife_native_scale

    m = _RIFESingleton.get()
    out = m.interpolate_batch(
        prev_u8.astype(jnp.float32) / 255.0,
        curr_u8.astype(jnp.float32) / 255.0,
        (0.25, 0.5, 0.75),
        scale=_rife_native_scale(scale),
    )  # [K, 3, oh, ow, 3] in [0,1]
    return out * 255.0


def run_experiment_batched(
    interval: DeviceInterval,
    experiment: dict,
    output_path: Optional[str] = None,
    out_fps: Optional[float] = None,
    lpips_fn=None,
    lpips_mode: Optional[str] = None,
    chunk_pairs: int = 8,
    rife_chunk_pairs: int = 2,
    verbose: bool = True,
) -> dict:
    """Batched-device equivalent of harness.experiments.run_experiment.

    Same result schema; per-chunk device dispatches instead of per-frame
    host work. Emits `device_batched: True` in the result.
    """
    from vfisr_tpu.harness.experiments import QUALITY_LEVELS, DEFAULT_QUALITY
    from vfisr_tpu.data.video_io import VideoWriter

    name = experiment["name"]
    vfi = experiment.get("vfi", "linear_blend")
    sr_method = experiment.get("sr", "lanczos")
    edge = float(experiment.get("edge", 0))
    rife_scale = float(experiment.get("rife_scale", 0.5))
    motion_thresh = float(experiment.get("motion_thresh", 3.0))
    quality_aware = bool(experiment.get("quality_aware", False))
    qa_bins = None
    if quality_aware:
        # quality-priority adaptive tier: the blend route is additionally
        # bounded by the MEASURED blend-vs-RIFE crossover (held-out
        # calibration, weights/router_gate.json) — same gate as the host
        # loop in harness/experiments.py
        from vfisr_tpu.utils.router_gate import blend_crossover_px, expert_bins

        _cx = blend_crossover_px()
        if _cx is not None:
            motion_thresh = min(motion_thresh, _cx)
        if vfi == "adaptive":
            # per-motion-bin neural-expert choice (rife@0.5 / rife@0.25 /
            # vfimamba — harness.experiments.route_neural_expert)
            qa_bins = expert_bins("sweep")
    expert_counts = {"blend": 0, "rife": 0, "rife_fast": 0, "vfimamba": 0}
    mcar_low = float(experiment.get("mcar_low", 0.3))
    mcar_high = float(experiment.get("mcar_high", 0.7))
    exp_fps = experiment.get("quality_fps", QUALITY_LEVELS[DEFAULT_QUALITY]["fps"])
    out_w, out_h = experiment.get(
        "quality_resolution", QUALITY_LEVELS[DEFAULT_QUALITY]["resolution"]
    )
    is_control = name == "control" or name.startswith("control_")
    interp = "cubic" if sr_method == "bicubic" else "lanczos4"
    if vfi not in DEVICE_METHODS:
        raise ValueError(f"{vfi} has no device-batched path")
    needs_rife = vfi in ("rife", "adaptive", "mcar")
    if vfi in _HEAVY_FLOW_METHODS:
        chunk_pairs = min(chunk_pairs, 4)  # full-res Farneback per pair
    if needs_rife:
        # a chunk is 3*(K+1) IFNet frames at output res — keep the compiled
        # program inside the remote compiler's size envelope (CLAUDE.md)
        chunk_pairs = min(chunk_pairs, rife_chunk_pairs)

    writer = (VideoWriter(output_path, out_w, out_h, out_fps or exp_fps)
              if output_path else None)

    n_pairs = interval.n_kf - 1
    # Pad the device stacks with repeats of the last frame so every chunk is
    # a contiguous static-shape dynamic_slice — no advanced-indexing gather
    # on the hot path (serial on TPU; CLAUDE.md). The repeated-tail padding
    # reproduces the old per-index clamp exactly; padded entries are masked
    # out host-side below.
    def _pad_tail(x, n):
        return jnp.concatenate([x, jnp.repeat(x[-1:], n, axis=0)], axis=0)

    kf_pad = _pad_tail(interval.kf, chunk_pairs)
    ref_pad = _pad_tail(interval.ref, chunk_pairs + 1)
    mid_pad = (_pad_tail(interval.mid, chunk_pairs)
               if interval.mid is not None else None)
    kf_psnr_all, kf_ssim_all = [], []
    vfi_psnr_all, vfi_ssim_all, rife_used_all = [], [], []
    lpips_vals = []
    cnt = 0
    t0 = time.time()

    for start in range(0, n_pairs, chunk_pairs):
        k_real = min(chunk_pairs, n_pairs - start)
        # contiguous static-shape windows; tail chunks read the repeated
        # padding frames (masked out host-side)
        src = jax.lax.dynamic_slice_in_dim(kf_pad, start, chunk_pairs + 1)
        ref = jax.lax.dynamic_slice_in_dim(ref_pad, start, chunk_pairs + 1)
        gt = (jax.lax.dynamic_slice_in_dim(mid_pad, start, chunk_pairs)
              if mid_pad is not None
              else jnp.broadcast_to(interval.kf[0], (chunk_pairs,)
                                    + interval.kf.shape[1:]))

        rife_mids = jnp.zeros((chunk_pairs, 3, out_h, out_w, 3), jnp.float32)
        chunk_labels = None
        if needs_rife:
            # SR first (reference interpolates the upscaled frames)
            srcf = src.astype(jnp.float32)
            if is_control:
                up = resize(srcf, (out_h, out_w), "lanczos4")
            else:
                degraded = resize(srcf, (INPUT_H, INPUT_W), "area")
                up = resize(degraded, (out_h, out_w), interp)
                if edge > 0:
                    up = _edge_enhance_core(up, edge)
            if qa_bins is not None:
                # quality-aware: per-pair neural expert from calibrated
                # bins; rife_mids becomes the SELECTED expert's midpoints
                # (the blend-vs-neural select stays in _chunk_program)
                from vfisr_tpu.harness.experiments import route_neural_expert

                upq = _qu8(up)  # match _chunk_program's quantized analysis
                motion = np.asarray(_motion_chunk(upq[:-1], upq[1:]))
                chunk_labels = []
                for m in motion:
                    e, so = route_neural_expert(float(m), True)
                    chunk_labels.append(
                        "vfimamba" if e == "vfimamba"
                        else ("rife_fast" if so == 0.25 else "rife"))
                mids_by = {}
                if any(l == "rife" for l in chunk_labels):
                    mids_by["rife"] = _rife_chunk(upq[:-1], upq[1:], 0.5)
                if any(l == "rife_fast" for l in chunk_labels):
                    mids_by["rife_fast"] = _rife_chunk(upq[:-1], upq[1:], 0.25)
                parts = []
                for j, lab in enumerate(chunk_labels):
                    if lab == "vfimamba":
                        try:
                            parts.append(_vfimamba_chunk(
                                upq[j:j + 1].astype(jnp.float32),
                                upq[j + 1:j + 2].astype(jnp.float32)))
                            continue
                        except Exception as me:  # degrade, don't fail
                            print(f"  [vfimamba expert failed, rife@0.5] {me}")
                            if "RESOURCE_EXHAUSTED" in str(me):
                                # free the wedged expert's HBM before the
                                # fallback touches the device (r5d: the OOM
                                # cascaded into every later device_put)
                                from vfisr_tpu.harness.experiments import (
                                    _VFIMambaSingleton)

                                _VFIMambaSingleton.release()
                                jax.clear_caches()
                            chunk_labels[j] = "rife"
                            if "rife" not in mids_by:
                                mids_by["rife"] = _rife_chunk(
                                    upq[:-1], upq[1:], 0.5)
                    parts.append(mids_by[chunk_labels[j]][j:j + 1])
                rife_mids = (parts[0] if len(parts) == 1
                             else jnp.concatenate(parts, axis=0))
            else:
                rife_mids = _rife_chunk(up[:-1], up[1:], rife_scale)

        res = _chunk_program(
            src, ref, gt, rife_mids,
            vfi=vfi, interp=interp, edge=edge, out_hw=(out_h, out_w),
            is_control=is_control, motion_thresh=motion_thresh,
            mcar_low=mcar_low, mcar_high=mcar_high,
            want_frames=writer is not None,
        )
        first_chunk = start == 0
        kf_lo = 0 if first_chunk else 1
        kf_psnr_all.extend(np.asarray(res["kf_psnr"])[kf_lo:k_real + 1])
        kf_ssim_all.extend(np.asarray(res["kf_ssim"])[kf_lo:k_real + 1])
        if interval.mid is not None and vfi != "none" and not is_control:
            # host loop stops evaluating once midpoints run out
            # (run_experiments.py:736-758)
            k_eval = max(0, min(k_real, interval.mid.shape[0] - start))
            vfi_psnr_all.extend(np.asarray(res["vfi_psnr"])[:k_eval])
            vfi_ssim_all.extend(np.asarray(res["vfi_ssim"])[:k_eval])
            ru_chunk = np.asarray(res["rife_used"])[:k_eval]
            rife_used_all.extend(ru_chunk)
            if vfi == "adaptive":
                for j, used in enumerate(ru_chunk):
                    if not used:
                        expert_counts["blend"] += 1
                    else:
                        expert_counts[
                            chunk_labels[j] if chunk_labels else "rife"] += 1
            if lpips_fn is not None:
                # every 10th evaluated VFI frame (run_experiments.py:735)
                base = start
                for j in range(k_eval):
                    if (base + j + 1) % 10 == 0:
                        pred = np.asarray(res["mid_half_u8"][j])
                        gt_j = np.asarray(gt[j])
                        if gt_j.shape[:2] != pred.shape[:2]:
                            # host loop resizes GT to the VFI frame first
                            # (run_experiments.py:744-748)
                            gt_j = np.asarray(_qu8(resize(
                                jnp.asarray(gt_j, jnp.float32),
                                pred.shape[:2], "lanczos4"))).astype(np.uint8)
                        lpips_vals.append(lpips_fn(pred, gt_j))
        if writer is not None:
            if first_chunk:
                writer.write(np.asarray(res["first_kf_u8"]))
                cnt += 1
            frames = np.asarray(res["frames_u8"][:k_real])
            for pair in frames:
                for f in pair:
                    writer.write(f)
                cnt += 4
        else:
            cnt += k_real * 4 + (1 if first_chunk else 0)

    if writer is not None:
        writer.close()
    elapsed = time.time() - t0

    def _avg(v):
        # host sums calc_psnr directly, so identical frames make the mean
        # inf (reported as "inf" via safe_round) — keep that semantics
        return float(np.mean(v)) if len(v) else 0.0

    avg_kf_psnr = _avg(kf_psnr_all)
    avg_kf_ssim = float(np.mean(kf_ssim_all)) if kf_ssim_all else 0.0
    avg_vfi_psnr = _avg(vfi_psnr_all)
    avg_vfi_ssim = float(np.mean(vfi_ssim_all)) if vfi_ssim_all else 0.0
    avg_lpips = float(np.mean(lpips_vals)) if lpips_vals else None
    have_vfi = bool(vfi_psnr_all)
    if have_vfi:
        overall_psnr = 0.25 * avg_kf_psnr + 0.75 * avg_vfi_psnr
        overall_ssim = 0.25 * avg_kf_ssim + 0.75 * avg_vfi_ssim
    else:
        overall_psnr, overall_ssim = avg_kf_psnr, avg_kf_ssim
    rife_pct = (100.0 * float(np.mean(rife_used_all))
                if rife_used_all and vfi in ("adaptive", "mcar")
                else (100.0 if vfi == "rife" else 0.0))

    return {
        "name": name,
        "config": experiment,
        "frames": cnt,
        "time_s": round(elapsed, 2),
        "fps_achieved": round(cnt / elapsed, 1) if elapsed > 0 else 0,
        "keyframe_psnr_db": safe_round(avg_kf_psnr, 2),
        "keyframe_ssim": round(avg_kf_ssim, 4),
        "vfi_psnr_db": safe_round(avg_vfi_psnr, 2),
        "vfi_ssim": round(avg_vfi_ssim, 4),
        "vfi_lpips": round(avg_lpips, 4) if avg_lpips is not None else None,
        "lpips_mode": lpips_mode if avg_lpips is not None else None,
        "overall_psnr_db": safe_round(overall_psnr, 2),
        "overall_ssim": round(overall_ssim, 4),
        "psnr_db": safe_round(overall_psnr, 2),
        "ssim": round(overall_ssim, 4),
        "keyframes_evaluated": len(kf_psnr_all),
        "vfi_frames_evaluated": len(vfi_psnr_all),
        "lpips_frames_sampled": len(lpips_vals),
        "rife_frames_pct": round(rife_pct, 1),
        "realtime_x": round((cnt / exp_fps) / elapsed, 2) if elapsed > 0 else 0,
        "used_rife": vfi in ("rife", "adaptive", "mcar"),
        "output_video": str(output_path) if output_path else None,
        "quality_level": experiment.get("quality_level", "default"),
        "target_fps": exp_fps,
        "target_resolution": f"{out_w}x{out_h}",
        "vfi_method": vfi,
        "sr_method": sr_method,
        "edge_strength": edge,
        "quality_aware": quality_aware,
        "blend_thresh_effective": (round(motion_thresh, 3)
                                   if vfi == "adaptive" else None),
        "vfimamba_frames_pct": (
            round(100.0 * expert_counts["vfimamba"]
                  / max(len(rife_used_all), 1), 1)
            if vfi == "adaptive" else None),
        "expert_mix": expert_counts if vfi == "adaptive" else None,
        "device_batched": True,
    }
