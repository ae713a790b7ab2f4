#!/usr/bin/env python
"""Calibrate the adaptive router's quality gate on held-out scenes.

The reference routes by hardcoded thresholds that ASSUME each expert's
quality (reference adaptive_pipeline.py:81-96: particles/motion>25px ->
VFIMamba; reference run_experiments.py:848-874: motion<=thresh -> linear
blend). This script MEASURES those assumptions for the experts actually
shipped in this repo and writes ``weights/router_gate.json``:

1. ``experts``: held-out midpoint PSNR for rife and vfimamba on hard
   synthetic scenes (same generator as training gates, different seed) —
   consumed by AdaptivePipeline's heavy-expert gate.
2. ``blend_vs_rife_crossover_px``: over the held-out calibration clip
   (``data/raw/synth_calib.mp4``, a hard-preset world the benchmark
   corpora never see), simulate the sweep's exact operating point
   (degrade 960x540 -> lanczos SR to the quality resolution; motion =
   calc_motion on 480x270 grays, vfisr_tpu/harness/experiments.py:306),
   score blend-vs-RIFE t=0.5 midpoints against GT, and find the motion
   level below which blend wins. Consumed by the quality_aware sweep
   variant (adaptive_aggressive).

Usage:
    python scripts/calibrate_router.py --pairs 60 \
        --clip data/raw/synth_calib.mp4 --out weights/router_gate.json
"""

from __future__ import annotations

import argparse
import json
import sys
from datetime import datetime, timezone
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _measure_rows(clip: str, pairs: int, width: int, height: int,
                  rife_scale: float = 0.5, stride: int = 1,
                  with_experts: bool = False) -> list:
    import cv2
    import numpy as np

    from vfisr_tpu.harness.experiments import INPUT_H, INPUT_W, _rife_interpolate
    from vfisr_tpu.methods.inline import calc_motion, linear_blend
    from vfisr_tpu.evaluation.metrics import compute_psnr_simple

    cap = cv2.VideoCapture(clip)
    if not cap.isOpened():
        raise SystemExit(f"cannot open {clip}")

    def read_rgb():
        ok, f = cap.read()
        return cv2.cvtColor(f, cv2.COLOR_BGR2RGB) if ok else None

    def degrade_sr(frame):
        d = cv2.resize(frame, (INPUT_W, INPUT_H), interpolation=cv2.INTER_AREA)
        return cv2.resize(d, (width, height), interpolation=cv2.INTER_LANCZOS4)

    rows = []
    prev = prev_gray = prev_gt = None
    pair_idx = 0
    while len(rows) < pairs:
        # even frame -> keyframe, odd frame -> GT midpoint (the corpus
        # contract, extract_intervals even/odd split)
        kf = read_rgb()
        gt = read_rgb()
        if kf is None or gt is None:
            break
        out = degrade_sr(kf)
        gray = cv2.cvtColor(out, cv2.COLOR_RGB2GRAY)
        pair_idx += 1
        # stride samples the whole speed profile, not just the opening
        # ramp; prev stays the true consecutive keyframe
        if prev is not None and (pair_idx % stride == 0):
            motion = calc_motion(cv2.resize(prev_gray, (480, 270)),
                                 cv2.resize(gray, (480, 270)))
            gt_up = cv2.resize(prev_gt, (width, height),
                               interpolation=cv2.INTER_LANCZOS4)
            blend = linear_blend(prev, out, 0.5)
            rife = _rife_interpolate(prev, out, 0.5, rife_scale)
            row = {
                "motion": round(float(motion), 4),
                "psnr_blend": round(compute_psnr_simple(blend, gt_up), 4),
                "psnr_rife": round(compute_psnr_simple(rife, gt_up), 4),
            }
            if with_experts:
                # the other neural experts the quality-aware router can
                # pick per motion bin (route_neural_expert)
                rife_fast = _rife_interpolate(prev, out, 0.5, 0.25)
                row["psnr_rife_fast"] = round(
                    compute_psnr_simple(rife_fast, gt_up), 4)
                try:
                    from vfisr_tpu.harness.experiments import (
                        _vfimamba_interpolate)

                    mamba = _vfimamba_interpolate(prev, out, 0.5)
                    row["psnr_vfimamba"] = round(
                        compute_psnr_simple(mamba, gt_up), 4)
                except Exception as e:  # degrade: bins just lack the expert
                    print(f"  vfimamba unmeasurable on pair: {e}")
            rows.append(row)
        prev, prev_gray, prev_gt = out, gray, gt
    cap.release()
    return rows


def _bins_from_rows(rows: list, experts: tuple, n_bins: int = 5,
                    min_count: int = 5) -> list:
    """Quantile motion bins with per-expert mean PSNR.

    Bin edges come from motion quantiles over the calibration rows (equal
    occupancy); each bin stores the mean PSNR of every measurable expert.
    Consumed by vfisr_tpu.utils.router_gate.bin_winner."""
    import numpy as np

    rows = sorted(rows, key=lambda r: r["motion"])
    n = len(rows)
    n_bins = max(1, min(n_bins, n // max(min_count, 1)))
    bins = []
    for b in range(n_bins):
        lo_i = b * n // n_bins
        hi_i = (b + 1) * n // n_bins
        chunk = rows[lo_i:hi_i]
        if not chunk:
            continue
        entry = {
            "motion_lo": 0.0 if b == 0 else float(rows[lo_i]["motion"]),
            "motion_hi": (1e9 if b == n_bins - 1
                          else float(rows[hi_i]["motion"])),
            "count": len(chunk),
        }
        for e in experts:
            vals = [r.get(f"psnr_{e}") for r in chunk
                    if r.get(f"psnr_{e}") is not None]
            if vals:
                entry[e] = round(float(np.mean(vals)), 4)
        bins.append(entry)
    return bins


def measure_native_rows(clips: str, pairs: int, stride: int = 2) -> list:
    """Expert quality at the TRIPLET BENCHMARK operating point: native
    full-res consecutive keyframes (no degrade/SR), scored at t=0.5
    against the true midpoint. Motion key = the AdaptiveRouter's full-res
    Farneback motion_mean (vfisr_tpu/models/novel/adaptive_pipeline.py
    _analyze_core), the signal the pipeline routes on."""
    import cv2
    import jax.numpy as jnp
    import numpy as np

    from vfisr_tpu.harness.experiments import (
        _rife_interpolate, _vfimamba_interpolate)
    from vfisr_tpu.evaluation.metrics import compute_psnr_simple
    from vfisr_tpu.ops.flow import farneback_flow
    from vfisr_tpu.core.color import rgb_to_gray

    import jax

    @jax.jit
    def _motion_full(f0, f1):
        g0 = rgb_to_gray(f0.astype(jnp.float32))
        g1 = rgb_to_gray(f1.astype(jnp.float32))
        fl = farneback_flow(g0[None], g1[None], 0.5, 3, 15, 3, 5, 1.2)
        return jnp.mean(jnp.sqrt(fl[..., 0] ** 2 + fl[..., 1] ** 2))

    rows = []
    for clip in clips.split(","):
        cap = cv2.VideoCapture(clip.strip())
        if not cap.isOpened():
            raise SystemExit(f"cannot open {clip}")
        prev = prev_gt = None
        pair_idx = 0
        taken = 0
        while taken < pairs:
            ok0, kf = cap.read()
            ok1, gt = cap.read()
            if not ok0 or not ok1:
                break
            kf = cv2.cvtColor(kf, cv2.COLOR_BGR2RGB)
            gt = cv2.cvtColor(gt, cv2.COLOR_BGR2RGB)
            pair_idx += 1
            if prev is not None and (pair_idx % stride == 0):
                motion = float(_motion_full(jnp.asarray(prev),
                                            jnp.asarray(kf)))
                rife = _rife_interpolate(prev, kf, 0.5, 0.5)
                row = {
                    "motion": round(motion, 4),
                    "psnr_rife": round(
                        compute_psnr_simple(rife, prev_gt), 4),
                }
                try:
                    mamba = _vfimamba_interpolate(prev, kf, 0.5)
                    row["psnr_vfimamba"] = round(
                        compute_psnr_simple(mamba, prev_gt), 4)
                except Exception as e:
                    print(f"  vfimamba unmeasurable on pair: {e}")
                rows.append(row)
                taken += 1
            prev, prev_gt = kf, gt
        cap.release()
    return rows


def measure_scene_gate(extra_worlds: int = 2, seconds: float = 6.0,
                       ssim_thr: float = 0.65) -> dict:
    """Calibrate the flow-compensated scene-cut gate on LABELED pairs.

    The synthetic worlds know their own cut frames (make_synthetic_clip:
    hard/routing presets cut at 45%/80% of the clip, smooth at 62%), so
    cut/non-cut labels are exact. Positives additionally include
    cross-world pairs (frames from different worlds — the definition of a
    cut). For every labeled pair the gate's two signals are computed
    through BOTH runtime paths (flagship analysis-res flow and the
    AdaptiveRouter's full-res flow downsampled) and pooled; the chosen
    ``warped_ssim_threshold`` is the largest value with ZERO false holds
    on ordinary pairs (holding a real pair scores below frame-dup —
    round-4 verdict Missing #1), nudged toward the cut side when the
    classes separate cleanly."""
    import sys as _sys
    import tempfile

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vfisr_tpu.core.color import rgb_to_gray
    from vfisr_tpu.core.resize import resize
    from vfisr_tpu.models.novel.adaptive_pipeline import scene_cut_signals
    from vfisr_tpu.ops.flow import farneback_flow

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    import make_synthetic_clip as msc

    @jax.jit
    def _signals_small(f0u8, f1u8):
        """Flagship path: analysis-res gray + analysis-res flow."""
        g0 = rgb_to_gray(resize(f0u8.astype(jnp.float32), (270, 480),
                                "linear"))
        g1 = rgb_to_gray(resize(f1u8.astype(jnp.float32), (270, 480),
                                "linear"))
        flow = farneback_flow(g0, g1, 0.5, 3, 15, 3, 5, 1.2)
        _, s, w = scene_cut_signals(g0, g1, flow, ssim_thr, 1.0)
        return s, w

    @jax.jit
    def _signals_full(f0u8, f1u8):
        """AdaptiveRouter path: full-res flow downsampled to 0.25x."""
        g0 = rgb_to_gray(f0u8.astype(jnp.float32))
        g1 = rgb_to_gray(f1u8.astype(jnp.float32))
        h, w = g0.shape[-2:]
        sh, sw = h // 4, w // 4
        flow = farneback_flow(g0, g1, 0.5, 3, 15, 3, 5, 1.2)
        s0 = resize(g0[..., None], (sh, sw), "linear")[..., 0]
        s1 = resize(g1[..., None], (sh, sw), "linear")[..., 0]
        fl_small = resize(flow, (sh, sw), "linear") * jnp.asarray(
            [sw / w, sh / h], flow.dtype)
        _, s, wr = scene_cut_signals(s0, s1, fl_small, ssim_thr, 1.0)
        return s, wr

    # ---- build labeled pairs from worlds with KNOWN cuts ----
    tmp = Path(tempfile.mkdtemp(prefix="scene_gate_"))
    worlds = []  # (path, cut_fractions, n_frames)
    for k in range(extra_worlds):
        p = tmp / f"world_hard_{k}.mp4"
        n = msc.render_hard_clip(str(p), seconds=seconds, seed=520 + k,
                                 profile="routing" if k % 2 else "v1")
        worlds.append((p, (0.45, 0.80), n))
    p = tmp / "world_smooth.mp4"
    n = msc.render_clip(str(p), seconds=seconds, seed=530)
    worlds.append((p, (0.62,), n))

    labeled = []  # (is_cut, frame0, frame1)
    first_frames = []
    for path, fracs, n_frames in worlds:
        cuts = [int(n_frames * f) for f in fracs]

        def scene_of(a):
            return sum(1 for c in cuts if c <= a)

        cap = cv2.VideoCapture(str(path))
        frames = []
        while True:
            ok, f = cap.read()
            if not ok:
                break
            frames.append(cv2.cvtColor(f, cv2.COLOR_BGR2RGB))
        cap.release()
        first_frames.append(frames[0])
        # consecutive keyframe pairs (even frames), stride 2 pairs
        for i in range(2, len(frames) - 1, 4):
            a, b = i - 2, i
            labeled.append((scene_of(a) != scene_of(b), frames[a], frames[b]))
    # cross-world positives
    for i in range(len(first_frames)):
        for j in range(len(first_frames)):
            if i != j:
                labeled.append((True, first_frames[i], first_frames[j]))

    rows = []
    for is_cut, f0, f1 in labeled:
        x0 = jnp.asarray(f0)[None]
        x1 = jnp.asarray(f1)[None]
        for fn, path_name in ((_signals_small, "flagship"),
                              (_signals_full, "router")):
            s, w = fn(x0, x1)
            rows.append({"cut": bool(is_cut), "path": path_name,
                         "ssim": round(float(s[0]), 4),
                         "warped_ssim": round(float(w[0]), 4)})

    noncut_confusable = [r["warped_ssim"] for r in rows
                         if not r["cut"] and r["ssim"] < ssim_thr]
    cut_w = [r["warped_ssim"] for r in rows if r["cut"]]
    w_noncut_min = min(noncut_confusable) if noncut_confusable else 1.0
    w_cut_max = max(cut_w) if cut_w else 0.0
    if w_cut_max < w_noncut_min:
        thr = w_cut_max + 0.25 * (w_noncut_min - w_cut_max)
    else:
        thr = w_noncut_min  # zero false holds; some cuts may be missed
    false_holds = sum(1 for r in rows if not r["cut"]
                      and r["ssim"] < ssim_thr and r["warped_ssim"] < thr)
    missed = sum(1 for r in rows if r["cut"]
                 and not (r["ssim"] < ssim_thr and r["warped_ssim"] < thr))
    return {
        "ssim_threshold": ssim_thr,
        "warped_ssim_threshold": round(float(thr), 4),
        "cut_pairs": sum(1 for r in rows if r["cut"]),
        "noncut_pairs": sum(1 for r in rows if not r["cut"]),
        "noncut_confusable_pairs": len(noncut_confusable),
        "cut_warped_ssim_max": round(w_cut_max, 4),
        "noncut_confusable_warped_ssim_min": round(w_noncut_min, 4),
        "false_holds": false_holds,
        "missed_cuts": missed,
    }


def measure_crossover(clips: str, pairs: int, width: int, height: int,
                      rife_scale: float = 0.5, stride: int = 1,
                      with_experts: bool = False) -> dict:
    """Pool pairs from every clip in the comma list (the gate must see
    both the textured-hard regime AND frozen-world static pairs — the
    routing profile's static blocks are where blend actually wins)."""
    rows = []
    for clip in clips.split(","):
        rows.extend(_measure_rows(clip.strip(), pairs, width, height,
                                  rife_scale, stride=stride,
                                  with_experts=with_experts))
    if not rows:
        raise SystemExit("no pairs measured")

    # crossover: the threshold that MAXIMIZES total expected gain on the
    # calibration pairs — walk motion-sorted pairs accumulating
    # (blend - rife) dB; the gate is the motion at the prefix-sum argmax
    # (0 when blend never helps: the quality-aware variant then routes
    # everything to RIFE).
    rows.sort(key=lambda r: r["motion"])
    crossover = 0.0
    gain_sum = best_sum = 0.0
    for r in rows:
        gain_sum += r["psnr_blend"] - r["psnr_rife"]
        if gain_sum > best_sum:
            best_sum = gain_sum
            crossover = r["motion"]
    wins = sum(1 for r in rows if r["psnr_blend"] > r["psnr_rife"])
    return {
        "blend_vs_rife_crossover_px": round(crossover, 4),
        "pairs_measured": len(rows),
        "blend_win_pairs": wins,
        "motion_range": [rows[0]["motion"], rows[-1]["motion"]],
        "rows": rows,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--clip",
        default="data/raw/synth_calib.mp4,data/raw/synth_calib_routing.mp4",
        help="comma list of held-out clips; pairs are pooled so the gate "
        "sees textured-hard AND frozen-static regimes")
    ap.add_argument("--pairs", type=int, default=60)
    ap.add_argument("--samples", type=int, default=24,
                    help="held-out synthetic scenes for the expert PSNRs")
    ap.add_argument("--crop", type=int, default=192)
    ap.add_argument("--seed", type=int, default=417,
                    help="held-out seed (training gates use other seeds)")
    ap.add_argument("--width", type=int, default=2560)
    ap.add_argument("--height", type=int, default=1440)
    ap.add_argument("--out", default="weights/router_gate.json")
    ap.add_argument("--skip-experts", action="store_true")
    ap.add_argument("--skip-crossover", action="store_true")
    ap.add_argument("--skip-scene-gate", action="store_true")
    ap.add_argument("--skip-bins", action="store_true",
                    help="skip the per-motion-bin expert calibration "
                    "(sweep + native regimes)")
    ap.add_argument("--stride", type=int, default=4,
                    help="evaluate every Nth pair so every speed stratum "
                    "is sampled, not just the opening ramp")
    ap.add_argument(
        "--native-clips",
        default="data/raw/synth_calib.mp4,data/raw/synth_calib_routing.mp4",
        help="held-out clips for the NATIVE (triplet benchmark) regime "
        "bins — full-res pairs, no degrade/SR")
    ap.add_argument("--native-pairs", type=int, default=40)
    ap.add_argument("--platform", default="auto", choices=["auto", "cpu"],
                    help="force JAX to CPU (sitecustomize pins "
                    "JAX_PLATFORMS=axon; scene-gate calibration needs no "
                    "neural nets and can run while the chip trains)")
    ap.add_argument("--scene-worlds", type=int, default=2)
    ap.add_argument("--scene-seconds", type=float, default=4.0)
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "gate_checkpoint", Path(__file__).resolve().parent / "gate_checkpoint.py")
    gate_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gate_mod)
    heldout_psnr = gate_mod.heldout_psnr

    record: dict = {
        "calibrated_at": datetime.now(timezone.utc).isoformat(),
        "clip": args.clip,
        "quality_resolution": f"{args.width}x{args.height}",
    }
    prev = {}
    out_path = Path(args.out)
    if out_path.exists():
        try:
            prev = json.loads(out_path.read_text())
        except (OSError, json.JSONDecodeError):
            prev = {}

    if args.skip_experts:
        record["experts"] = prev.get("experts", {})
    else:
        experts = {}
        for name in ("rife", "vfimamba"):
            try:
                experts[name] = round(
                    heldout_psnr(name, args.samples, args.crop, args.seed), 3)
                print(f"expert {name}: {experts[name]} dB held-out")
            except Exception as e:  # noqa: BLE001 — absent weights etc.
                print(f"expert {name}: unmeasurable ({e})")
        record["experts"] = experts

    if args.skip_crossover:
        for k in ("blend_vs_rife_crossover_px", "pairs_measured",
                  "blend_win_pairs", "motion_range", "rows"):
            if k in prev:
                record[k] = prev[k]
    else:
        record.update(measure_crossover(
            args.clip, args.pairs, args.width, args.height,
            stride=args.stride, with_experts=not args.skip_bins))
        print(f"blend-vs-rife crossover: "
              f"{record['blend_vs_rife_crossover_px']} px "
              f"({record['blend_win_pairs']}/{record['pairs_measured']} "
              f"blend wins)")

    if args.skip_bins:
        if "expert_bins" in prev:
            record["expert_bins"] = prev["expert_bins"]
    else:
        sweep_rows = record.get("rows") or prev.get("rows") or []
        sweep_bins = _bins_from_rows(
            sweep_rows, ("blend", "rife", "rife_fast", "vfimamba"))
        print("measuring native-regime expert rows "
              f"({args.native_clips}, {args.native_pairs}/clip)...")
        native_rows = measure_native_rows(
            args.native_clips, args.native_pairs, stride=2)
        native_bins = _bins_from_rows(native_rows, ("rife", "vfimamba"))
        record["expert_bins"] = {
            "units": {
                "sweep": "calc_motion px @480x270 (degraded-SR grays)",
                "native": "AdaptiveRouter full-res Farneback motion_mean px",
            },
            "sweep": sweep_bins,
            "native": native_bins,
        }
        record["native_rows"] = native_rows
        for regime, bins in (("sweep", sweep_bins), ("native", native_bins)):
            for b in bins:
                experts = {k: v for k, v in b.items()
                           if k not in ("motion_lo", "motion_hi", "count")}
                print(f"  [{regime}] motion {b['motion_lo']:.3f}.."
                      f"{b['motion_hi']:.3f} (n={b['count']}): {experts}")

    if args.skip_scene_gate:
        if "scene_gate" in prev:
            record["scene_gate"] = prev["scene_gate"]
    else:
        print("calibrating scene-cut gate on labeled worlds...")
        record["scene_gate"] = measure_scene_gate(
            extra_worlds=args.scene_worlds, seconds=args.scene_seconds)
        sg = record["scene_gate"]
        print(f"scene gate: warped_ssim_threshold "
              f"{sg['warped_ssim_threshold']} (cuts {sg['cut_pairs']}, "
              f"non-cuts {sg['noncut_pairs']}, false holds "
              f"{sg['false_holds']}, missed {sg['missed_cuts']})")

    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(record, indent=2))
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
