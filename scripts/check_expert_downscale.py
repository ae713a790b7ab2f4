#!/usr/bin/env python
"""Measure the PSNR cost of VFIMamba's MAX_INTERNAL_AREA HBM guard.

The sweep's quality-aware tier routes motion >= ~1 px (sweep regime) pairs
to VFIMamba on the strength of the calibrated bins in
weights/router_gate.json — bins measured with the NATIVE 1440p trunk
(scripts/calibrate_router.py). Deployment now runs the trunk at <=
1920x1080 internally (models/sota/vfimamba.py MAX_INTERNAL_AREA, the
degrade-don't-fail answer to the r5d sweep OOM). This script scores the
SAME pairs both ways so the routing decision rests on the deployed
expert's measured quality, not the native one's:

  per pair: psnr_native (cap off), psnr_capped (cap on), psnr_rife (the
  fast expert it displaces), at the sweep operating point (degraded
  960x540 -> Lanczos 2560x1440, GT midpoint Lanczos-upscaled).

Writes a JSON verdict consumed by tests/test_adaptive.py (bins stay valid
iff mean capped-vs-native delta is small against the bin margins).
"""

import argparse
import json
import sys
from datetime import datetime, timezone
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips",
                    default="data/raw/synth_calib.mp4,"
                            "data/raw/synth_calib_routing.mp4")
    ap.add_argument("--pairs", type=int, default=12,
                    help="qualifying pairs per clip")
    ap.add_argument("--stride", type=int, default=4,
                    help="sample every Nth pair (speed-profile coverage)")
    ap.add_argument("--motion-min", type=float, default=0.9,
                    help="sweep-regime motion floor — the region "
                    "bin_winner routes to vfimamba")
    ap.add_argument("--width", type=int, default=2560)
    ap.add_argument("--height", type=int, default=1440)
    ap.add_argument("--out", default="outputs/train_r5/expert_downscale_check.json")
    ap.add_argument("--platform", default="auto", choices=["auto", "cpu"])
    args = ap.parse_args()
    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import cv2
    import numpy as np

    from vfisr_tpu.harness.experiments import INPUT_H, INPUT_W, _rife_interpolate
    from vfisr_tpu.methods.inline import calc_motion
    from vfisr_tpu.evaluation.metrics import compute_psnr_simple
    from vfisr_tpu.models.registry import get_model

    mamba = get_model("vfimamba", load=True)
    width, height = args.width, args.height

    def degrade_sr(frame):
        d = cv2.resize(frame, (INPUT_W, INPUT_H), interpolation=cv2.INTER_AREA)
        return cv2.resize(d, (width, height), interpolation=cv2.INTER_LANCZOS4)

    def mamba_mid(prev, curr, cap):
        old = mamba.max_internal_area
        mamba.max_internal_area = cap
        try:
            return mamba.interpolate(prev, curr, num_frames=1,
                                     timestamps=[0.5])[0]
        finally:
            mamba.max_internal_area = old

    rows = []
    for clip in args.clips.split(","):
        cap_v = cv2.VideoCapture(clip)
        if not cap_v.isOpened():
            print(f"  cannot open {clip} — skipped")
            continue

        def read_rgb():
            ok, f = cap_v.read()
            return cv2.cvtColor(f, cv2.COLOR_BGR2RGB) if ok else None

        prev = prev_gray = prev_gt = None
        pair_idx = taken = 0
        while taken < args.pairs:
            kf = read_rgb()
            gt = read_rgb()
            if kf is None or gt is None:
                break
            out = degrade_sr(kf)
            gray = cv2.cvtColor(out, cv2.COLOR_RGB2GRAY)
            pair_idx += 1
            if prev is not None and (pair_idx % args.stride == 0):
                motion = float(calc_motion(cv2.resize(prev_gray, (480, 270)),
                                           cv2.resize(gray, (480, 270))))
                if motion >= args.motion_min:
                    gt_up = cv2.resize(prev_gt, (width, height),
                                       interpolation=cv2.INTER_LANCZOS4)
                    capped = mamba_mid(prev, out, 1920 * 1080)
                    native = mamba_mid(prev, out, None)
                    rife = _rife_interpolate(prev, out, 0.5, 0.5)
                    rows.append({
                        "clip": clip,
                        "motion": round(motion, 4),
                        "psnr_capped": round(
                            compute_psnr_simple(capped, gt_up), 4),
                        "psnr_native": round(
                            compute_psnr_simple(native, gt_up), 4),
                        "psnr_rife": round(
                            compute_psnr_simple(rife, gt_up), 4),
                    })
                    taken += 1
                    print(f"  {clip} pair {pair_idx} motion {motion:.3f}: "
                          f"capped {rows[-1]['psnr_capped']} native "
                          f"{rows[-1]['psnr_native']} rife "
                          f"{rows[-1]['psnr_rife']}")
            prev, prev_gray, prev_gt = out, gray, gt
        cap_v.release()

    if not rows:
        print("no qualifying pairs measured")
        return 1
    mean = lambda k: float(np.mean([r[k] for r in rows]))  # noqa: E731
    result = {
        "created": datetime.now(timezone.utc).isoformat(),
        "clips": args.clips,
        "motion_min": args.motion_min,
        "pairs": len(rows),
        "mean_psnr_capped": round(mean("psnr_capped"), 4),
        "mean_psnr_native": round(mean("psnr_native"), 4),
        "mean_psnr_rife": round(mean("psnr_rife"), 4),
        "capped_minus_native_db": round(
            mean("psnr_capped") - mean("psnr_native"), 4),
        "capped_minus_rife_db": round(
            mean("psnr_capped") - mean("psnr_rife"), 4),
        "rows": rows,
    }
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(result, indent=2))
    print(json.dumps({k: v for k, v in result.items() if k != "rows"},
                     indent=2))
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
