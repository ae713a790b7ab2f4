#!/usr/bin/env python
"""Extract keyframe/midpoint intervals (reference scripts/extract_intervals.py CLI)."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser(description="Extract intervals from a registered clip")
    parser.add_argument("--clip-id", required=True)
    parser.add_argument("--count", type=int, default=10, help="Number of intervals")
    parser.add_argument("--duration", type=float, default=10.0, help="Interval length (s)")
    parser.add_argument("--start", type=float, default=None,
                        help="Explicit start (s) for a single interval")
    parser.add_argument("--auto-difficulty", action="store_true",
                        help="Spread intervals over linspace(0.1, 0.9) of the clip")
    parser.add_argument("--resolution", default="1920x1080")
    parser.add_argument("--data-dir", default="data")
    parser.add_argument("--platform", default="auto", choices=["cpu", "auto"],
                        help="force JAX to CPU for the per-pair motion stats "
                        "(a sitecustomize pins JAX_PLATFORMS, so an env var "
                        "cannot; 'auto' keeps the environment default)")
    args = parser.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from vfisr_tpu.data.extract_intervals import IntervalExtractor

    w, h = map(int, args.resolution.split("x"))
    results = IntervalExtractor(args.data_dir).extract_intervals(
        clip_id=args.clip_id,
        count=args.count,
        duration=args.duration,
        start=args.start,
        auto_difficulty=args.auto_difficulty,
        output_resolution=(w, h),
    )
    print(f"\nExtracted {len(results)} interval(s):")
    for r in results:
        print(f"  {r['interval_id']}: {r['keyframe_count']} kf / {r['midpoint_count']} gt, "
              f"difficulty={r['difficulty']}")


if __name__ == "__main__":
    main()
