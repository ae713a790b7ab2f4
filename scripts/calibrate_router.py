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
                  rife_scale: float = 0.5) -> list:
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
    prev = prev_gray = None
    while len(rows) < pairs:
        # even frame -> keyframe, odd frame -> GT midpoint (the corpus
        # contract, extract_intervals even/odd split)
        kf = read_rgb()
        gt = read_rgb()
        if kf is None or gt is None:
            break
        out = degrade_sr(kf)
        gray = cv2.cvtColor(out, cv2.COLOR_RGB2GRAY)
        if prev is not None:
            motion = calc_motion(cv2.resize(prev_gray, (480, 270)),
                                 cv2.resize(gray, (480, 270)))
            gt_up = cv2.resize(prev_gt, (width, height),
                               interpolation=cv2.INTER_LANCZOS4)
            blend = linear_blend(prev, out, 0.5)
            rife = _rife_interpolate(prev, out, 0.5, rife_scale)
            rows.append({
                "motion": round(float(motion), 4),
                "psnr_blend": round(compute_psnr_simple(blend, gt_up), 4),
                "psnr_rife": round(compute_psnr_simple(rife, gt_up), 4),
            })
        prev, prev_gray, prev_gt = out, gray, gt
    cap.release()
    return rows


def measure_crossover(clips: str, pairs: int, width: int, height: int,
                      rife_scale: float = 0.5) -> dict:
    """Pool pairs from every clip in the comma list (the gate must see
    both the textured-hard regime AND frozen-world static pairs — the
    routing profile's static blocks are where blend actually wins)."""
    rows = []
    for clip in clips.split(","):
        rows.extend(_measure_rows(clip.strip(), pairs, width, height,
                                  rife_scale))
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
    args = ap.parse_args()

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
            args.clip, args.pairs, args.width, args.height))
        print(f"blend-vs-rife crossover: "
              f"{record['blend_vs_rife_crossover_px']} px "
              f"({record['blend_win_pairs']}/{record['pairs_measured']} "
              f"blend wins)")

    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(record, indent=2))
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
