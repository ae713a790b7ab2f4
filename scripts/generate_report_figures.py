#!/usr/bin/env python
"""Publication figures 1-4 + results table (reference
scripts/generate_report_figures.py)."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--results", default="outputs/experiment_results.json")
    parser.add_argument("--output-dir", default="outputs/report_figures")
    args = parser.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from vfisr_tpu.analysis.data_analysis import load_results, rankings

    df = load_results(args.results)
    if df.empty:
        raise SystemExit("No experiments found.")
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    agg = rankings(df)["by_vfi_psnr"]

    # Fig 1: VFI quality bars
    fig, ax = plt.subplots(figsize=(9, 5))
    ax.barh(agg["name"], agg["vfi_psnr"], color="steelblue")
    ax.set_xlabel("VFI PSNR (dB)")
    ax.set_title("Figure 1: VFI quality by method")
    fig.tight_layout()
    fig.savefig(out / "fig1_vfi_quality.png", dpi=150)
    plt.close(fig)

    # Fig 2: quality vs speed scatter
    fig, ax = plt.subplots(figsize=(7, 5))
    ax.scatter(agg["time_s"], agg["vfi_psnr"], c="darkorange")
    for _, r in agg.iterrows():
        if np.isfinite(r["vfi_psnr"]):
            ax.annotate(r["name"], (r["time_s"], r["vfi_psnr"]), fontsize=7)
    ax.set_xscale("log")
    ax.set_xlabel("Time (s)")
    ax.set_ylabel("VFI PSNR (dB)")
    ax.set_title("Figure 2: Quality vs speed")
    fig.tight_layout()
    fig.savefig(out / "fig2_quality_speed.png", dpi=150)
    plt.close(fig)

    # Fig 3: category comparison
    cats = df.groupby("category")["vfi_psnr"].mean().sort_values(ascending=False)
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.bar(cats.index, cats.values, color="seagreen")
    ax.set_ylabel("VFI PSNR (dB)")
    ax.set_title("Figure 3: Category comparison")
    plt.xticks(rotation=30)
    fig.tight_layout()
    fig.savefig(out / "fig3_categories.png", dpi=150)
    plt.close(fig)

    # Fig 4: RIFE-usage impact (adaptive/mcar rows)
    routed = df[df["rife_pct"].notna() & df["name"].str.contains("adaptive|mcar|rife")]
    if not routed.empty:
        fig, ax = plt.subplots(figsize=(7, 4))
        ax.scatter(routed["rife_pct"], routed["vfi_psnr"], c="crimson")
        for _, r in routed.iterrows():
            ax.annotate(r["name"], (r["rife_pct"], r["vfi_psnr"]), fontsize=7)
        ax.set_xlabel("RIFE usage (%)")
        ax.set_ylabel("VFI PSNR (dB)")
        ax.set_title("Figure 4: RIFE-usage impact")
        fig.tight_layout()
        fig.savefig(out / "fig4_rife_usage.png", dpi=150)
        plt.close(fig)

    # table1_results.tex
    lines = [r"\begin{tabular}{lrr}", r"\toprule",
             r"Method & VFI PSNR (dB) & Time (s) \\", r"\midrule"]
    for _, r in agg.iterrows():
        if np.isfinite(r["vfi_psnr"]):
            lines.append(f"{r['name'].replace('_', r'\\_')} & {r['vfi_psnr']:.2f} & "
                         f"{r['time_s']:.1f} \\\\")
    lines += [r"\bottomrule", r"\end{tabular}"]
    (out / "table1_results.tex").write_text("\n".join(lines) + "\n")
    print(f"Wrote 4 figures + table1_results.tex to {out}")


if __name__ == "__main__":
    main()
