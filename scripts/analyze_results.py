#!/usr/bin/env python
"""Console ranking of experiment results (reference scripts/analyze_results.py)."""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--results", default="outputs/experiment_results.json")
    args = parser.parse_args()

    from vfisr_tpu.analysis.data_analysis import load_results, rankings

    df = load_results(args.results)
    if df.empty:
        print("No experiments found.")
        return
    ranked = rankings(df)["by_vfi_psnr"]
    print(f"{'method':<28}{'VFI PSNR':>10}{'SSIM':>8}{'time s':>8}{'n':>4}")
    print("-" * 58)
    for _, r in ranked.iterrows():
        print(f"{r['name']:<28}{r['vfi_psnr']:>10.2f}{r['vfi_ssim']:>8.4f}"
              f"{r['time_s']:>8.1f}{r['n']:>4}")


if __name__ == "__main__":
    main()
