#!/usr/bin/env python
"""Standalone quality evaluation of generated frames vs GT (documented
scripts/evaluate_quality.py, README project structure)."""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser(
        description="Evaluate predicted frames against ground truth"
    )
    parser.add_argument("--pred-dir", required=True, help="Directory of predicted frames")
    parser.add_argument("--gt-dir", required=True, help="Directory of GT frames")
    parser.add_argument("--output", default=None, help="JSON output path")
    parser.add_argument("--comprehensive", action="store_true",
                        help="Also run temporal/gaming/stratified metrics")
    args = parser.parse_args()

    import cv2

    def load_dir(d):
        frames = []
        for p in sorted(Path(d).glob("*.png")) or sorted(Path(d).glob("*.jpg")):
            frames.append(cv2.cvtColor(cv2.imread(str(p)), cv2.COLOR_BGR2RGB))
        return frames

    pred = load_dir(args.pred_dir)
    gt = load_dir(args.gt_dir)
    if not pred or not gt:
        raise SystemExit("no frames found")
    n = min(len(pred), len(gt))
    pred, gt = pred[:n], gt[:n]

    from vfisr_tpu.evaluation import QualityEvaluator, run_comprehensive_benchmark

    ev = QualityEvaluator()
    res = ev.evaluate(pred, gt)
    out = {"psnr": res.psnr, "ssim": res.ssim, "lpips": res.lpips,
           "lpips_mode": ev.lpips_mode, "frames": n}
    print(f"PSNR {res.psnr:.2f} dB | SSIM {res.ssim:.4f} | LPIPS {res.lpips:.4f} "
          f"({ev.lpips_mode}) over {n} frames")
    if args.comprehensive:
        comp = run_comprehensive_benchmark(pred, gt, verbose=True)
        out["comprehensive"] = comp.to_dict()
    if args.output:
        Path(args.output).write_text(json.dumps(out, indent=2, default=float))
        print(f"Wrote {args.output}")


if __name__ == "__main__":
    main()
