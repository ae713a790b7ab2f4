#!/usr/bin/env python
"""Figures + LaTeX tables (reference scripts/generate_visualizations.py)."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--results", default="outputs/experiment_results.json")
    parser.add_argument("--output-dir", default="outputs/figures")
    args = parser.parse_args()

    import numpy as np

    from vfisr_tpu.analysis.data_analysis import generate_figures, load_results, rankings

    df = load_results(args.results)
    if df.empty:
        raise SystemExit("No experiments found.")
    written = generate_figures(df, args.output_dir)
    for p in written:
        print(f"  wrote {p}")

    # LaTeX summary table (paper_table.tex analog)
    ranked = rankings(df)["by_vfi_psnr"]
    lines = [
        r"\begin{tabular}{lrrrr}",
        r"\toprule",
        r"Method & VFI PSNR (dB) & VFI SSIM & KF PSNR (dB) & Time (s) \\",
        r"\midrule",
    ]
    for _, r in ranked.iterrows():
        def fmt(v, d=2):
            return f"{v:.{d}f}" if v is not None and np.isfinite(v) else "--"
        lines.append(
            f"{r['name'].replace('_', r'\\_')} & {fmt(r['vfi_psnr'])} & "
            f"{fmt(r['vfi_ssim'], 4)} & {fmt(r['keyframe_psnr'])} & {fmt(r['time_s'], 1)} \\\\"
        )
    lines += [r"\bottomrule", r"\end{tabular}"]
    tex = Path(args.output_dir).parent / "paper_table.tex"
    tex.write_text("\n".join(lines) + "\n")
    print(f"  wrote {tex}")


if __name__ == "__main__":
    main()
