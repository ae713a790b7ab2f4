#!/usr/bin/env python
"""Statistical report CLI (reference scripts/analyze_statistics.py)."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser(description="Statistical analysis of experiment results")
    parser.add_argument("--results", default="outputs/experiment_results.json")
    parser.add_argument("--output-dir", default="outputs")
    args = parser.parse_args()

    from vfisr_tpu.analysis.statistical_analysis import run

    report = run(args.results, args.output_dir)
    print(f"Wrote statistical_analysis.json + statistical_summary.md to {args.output_dir}")
    for m, v in report["novel_verdicts"].items():
        mg = v["mean_gain_db"]
        print(f"  {m}: {mg:+.2f} dB ({v['confidence']})" if mg is not None else f"  {m}: no data")


if __name__ == "__main__":
    main()
