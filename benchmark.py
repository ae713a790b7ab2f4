#!/usr/bin/env python
"""benchmark.py — triplet-based model benchmark CLI.

Realizes the CLI documented in the reference README.md:64-86 (the file the
reference documents but never ships); behavior follows the de-facto
implementation scripts/run_benchmarks.py:253-454.

Usage:
    python benchmark.py --data-dir data/processed --output-dir outputs/benchmarks
    python benchmark.py -d data/processed -o out -m lanczos,optical_flow --max-triplets 5
"""

import argparse


def main():
    parser = argparse.ArgumentParser(
        description="Run VFI+SR benchmarks",
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    parser.add_argument("--data-dir", "-d", required=True,
                        help="Directory containing preprocessed clips")
    parser.add_argument("--output-dir", "-o", required=True,
                        help="Output directory for results")
    parser.add_argument("--models", "-m", default="all",
                        help='Comma-separated model names or "all" (default: all)')
    parser.add_argument("--clips", "-c", default="all",
                        help='Comma-separated clip names or "all" (default: all)')
    parser.add_argument("--max-triplets", type=int, default=None,
                        help="Maximum triplets per clip (for quick testing)")
    parser.add_argument("--save-outputs", action="store_true",
                        help="Save model outputs (uses more disk space)")
    parser.add_argument("--warmup", type=int, default=3,
                        help="Warmup iterations before timing (absorbs XLA compile)")
    parser.add_argument("--merge", action="store_true",
                        help="Merge the selected models' rows into an existing "
                             "benchmark_results.json (targeted re-run) instead "
                             "of replacing the file")
    args = parser.parse_args()

    from vfisr_tpu.harness.triplet import run_benchmarks

    run_benchmarks(
        data_dir=args.data_dir,
        output_dir=args.output_dir,
        models=args.models,
        clips=args.clips,
        max_triplets=args.max_triplets,
        save_outputs=args.save_outputs,
        warmup=args.warmup,
        merge=args.merge,
    )


if __name__ == "__main__":
    main()
