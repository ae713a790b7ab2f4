#!/usr/bin/env python
"""Experiment sweep CLI (reference scripts/run_experiments.py surface)."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser(description="Run VFI+SR experiments on cached intervals")
    parser.add_argument("--clip", required=True, help="Registered clip id")
    parser.add_argument("--intervals", default="0",
                        help="Comma-separated interval indices (default: 0)")
    parser.add_argument("--experiment", default=None,
                        help="Single experiment name (default: all light)")
    parser.add_argument("--heavy", action="store_true", help="Include heavy (RIFE) experiments")
    parser.add_argument("--quality-test", action="store_true",
                        help="Run core experiments across all quality levels")
    parser.add_argument("--resume", action="store_true",
                        help="Skip (name, interval) pairs already in the checkpoint")
    parser.add_argument("--write-videos", action="store_true", help="Write output videos")
    parser.add_argument("--max-frames", type=int, default=None,
                        help="Cap keyframes per interval (quick tests)")
    parser.add_argument("--no-lpips", action="store_true", help="Skip LPIPS sampling")
    parser.add_argument("--data-dir", default="data")
    parser.add_argument("--output-dir", default="outputs")
    args = parser.parse_args()

    from vfisr_tpu.harness.experiments import (
        CORE_HEAVY,
        CORE_LIGHT,
        EXPERIMENTS,
        HEAVY_EXPERIMENTS,
        LIGHT_EXPERIMENTS,
        generate_quality_experiments,
        run_experiment_sweep,
        summarize,
    )

    if args.quality_test:
        experiments = generate_quality_experiments(CORE_LIGHT + (CORE_HEAVY if args.heavy else []))
    elif args.experiment:
        experiments = [e for e in EXPERIMENTS if e["name"] == args.experiment]
        if not experiments:
            raise SystemExit(
                f"Unknown experiment {args.experiment!r}; "
                f"known: {', '.join(e['name'] for e in EXPERIMENTS)}"
            )
    else:
        experiments = LIGHT_EXPERIMENTS + (HEAVY_EXPERIMENTS if args.heavy else [])

    intervals = [int(i) for i in args.intervals.split(",")]
    results = run_experiment_sweep(
        clip_id=args.clip,
        intervals=intervals,
        experiments=experiments,
        data_dir=args.data_dir,
        output_dir=args.output_dir,
        resume=args.resume,
        write_videos=args.write_videos,
        max_frames=args.max_frames,
        use_lpips=not args.no_lpips,
    )
    print("\n" + summarize(results))


if __name__ == "__main__":
    main()
