#!/usr/bin/env python
"""7-method comprehensive video benchmark (reference gui/benchmark_all.py).

Same video-producing pattern as benchmark_proper but over the full method
set (reference :263-275): bicubic, lanczos, optical_flow, rife_bicubic,
rife_lanczos, lanczos_edge, adaptive_vfi — with per-method failure
resilience (:282-293) and quality/speed-sorted summaries (:298-300).
Videos + metrics land in the shared ``clips_metadata.json``.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gui.benchmark_proper import run_method  # noqa: E402

METHODS = [
    "bicubic",        # traditional SR + linear VFI
    "lanczos",
    "optical_flow",   # CPU-class VFI in the reference; device flow here
    "rife_bicubic",   # neural VFI
    "rife_lanczos",
    "lanczos_edge",   # edge-enhanced SR (novel)
    "adaptive_vfi",   # motion-aware RIFE routing (novel)
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--clip", required=True, help="Registered clip id")
    parser.add_argument("--interval", type=int, default=0)
    parser.add_argument("--data-dir", default="data")
    parser.add_argument("--output-dir", default="outputs/benchmark")
    parser.add_argument("--methods", default=",".join(METHODS))
    parser.add_argument("--resolution", default="2560x1440")
    parser.add_argument("--fps", type=float, default=120.0)
    parser.add_argument("--max-frames", type=int, default=None)
    args = parser.parse_args()

    from vfisr_tpu.data.extract_intervals import load_interval

    out_w, out_h = map(int, args.resolution.split("x"))
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    keyframes, _, _meta = load_interval(args.clip, args.interval,
                                        args.data_dir,
                                        max_frames=args.max_frames)
    print(f"VFI+SR comprehensive benchmark: {args.clip} interval "
          f"{args.interval}, {len(keyframes)} keyframes -> "
          f"{out_w}x{out_h}@{args.fps:g}")

    meta_path = out_dir / "clips_metadata.json"
    metadata = (json.loads(meta_path.read_text())
                if meta_path.exists() else {"clips": {}})
    clip_entry = metadata["clips"].setdefault(
        args.clip, {"videos": {}, "metrics": {}, "interval": args.interval}
    )

    results, failed = [], []
    for method in args.methods.split(","):
        method = method.strip()
        t0 = time.time()
        out_path = out_dir / f"{method}.mp4"
        try:
            stats = run_method(method, keyframes, str(out_path),
                               out_w, out_h, args.fps)
        except Exception as e:  # keep benchmarking the rest (ref :282-293)
            print(f"  [{method}] FAILED: {e}")
            failed.append((method, str(e)))
            continue
        stats["time_s"] = round(time.time() - t0, 1)
        clip_entry["videos"][method] = str(out_path)
        clip_entry["metrics"][method] = stats
        meta_path.write_text(json.dumps(metadata, indent=2))
        results.append({"method": method, **stats})
        print(f"  [{method}] psnr={stats['psnr']} time={stats['time_s']}s")

    if failed:
        print(f"\n{len(failed)} methods failed: {[f[0] for f in failed]}")
    if results:
        print("\nBy quality (psnr, ssim):")
        for r in sorted(results, key=lambda x: (x["psnr"] or 0, x["ssim"] or 0),
                        reverse=True):
            # psnr/ssim are None when every frame matched exactly (control)
            psnr = "inf " if r["psnr"] is None else f"{r['psnr']:.2f}"
            ssim = "1.0000" if r["ssim"] is None else f"{r['ssim']:.4f}"
            print(f"  {r['method']:<14} {psnr} dB  {ssim}")
        print("By speed:")
        for r in sorted(results, key=lambda x: x["time_s"]):
            print(f"  {r['method']:<14} {r['time_s']:.1f} s")
    print(f"Wrote {meta_path}")


if __name__ == "__main__":
    main()
