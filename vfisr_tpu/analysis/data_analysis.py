"""Experiment-result analysis (reference analysis/data_analysis.py, 724 LoC).

Pandas pipeline over ``outputs/experiment_results.json``: method
categorization (data_analysis.py:93-115), rankings by VFI PSNR / LPIPS /
efficiency, category statistics, RIFE-vs-rest comparison, Pareto-frontier
sweep (:233-242), figure generation (dark style) and a markdown
``analysis_report.md`` (:493-690).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

from vfisr_tpu.evaluation.statistics import pareto_frontier

CATEGORY_RULES = [
    ("RIFE", lambda n: n.startswith("rife")),
    ("Adaptive", lambda n: n.startswith("adaptive")),
    ("MCAR", lambda n: n.startswith("mcar")),
    ("UAFI", lambda n: n.startswith("uafi")),
    ("UGHI", lambda n: n.startswith("ughi")),
    ("OpticalFlow", lambda n: n.startswith("optical_flow")),
    ("LinearBlend", lambda n: "blend" in n),
    ("Degraded", lambda n: n.startswith("degraded") or n.startswith("frame_dup")),
    ("Control", lambda n: n.startswith("control")),
]


def categorize_method(name: str) -> str:
    """Method → category (data_analysis.py:93-115)."""
    for cat, rule in CATEGORY_RULES:
        if rule(name):
            return cat
    return "Other"


def load_results(path: str | Path) -> pd.DataFrame:
    """Load experiment_results.json into a tidy frame."""
    with open(path) as f:
        data = json.load(f)
    rows = []
    for e in data.get("experiments", []):
        row = {
            "name": e.get("name"),
            "category": categorize_method(e.get("name", "")),
            "interval_idx": e.get("interval_idx", 0),
            "vfi_psnr": _num(e.get("vfi_psnr_db")),
            "vfi_ssim": _num(e.get("vfi_ssim")),
            "vfi_lpips": _num(e.get("vfi_lpips")),
            "keyframe_psnr": _num(e.get("keyframe_psnr_db")),
            "overall_psnr": _num(e.get("overall_psnr_db")),
            "time_s": _num(e.get("time_s")),
            "fps_achieved": _num(e.get("fps_achieved")),
            "rife_pct": _num(e.get("rife_frames_pct")),
            "quality_level": e.get("quality_level", "default"),
        }
        rows.append(row)
    return pd.DataFrame(rows)


def _num(v):
    if v is None or v == "inf" or v == "-inf":
        return np.nan
    return float(v)


def rankings(df: pd.DataFrame) -> Dict[str, pd.DataFrame]:
    """Per-method aggregate rankings."""
    agg = (
        df.groupby("name")
        .agg(
            vfi_psnr=("vfi_psnr", "mean"),
            vfi_ssim=("vfi_ssim", "mean"),
            vfi_lpips=("vfi_lpips", "mean"),
            keyframe_psnr=("keyframe_psnr", "mean"),
            time_s=("time_s", "mean"),
            n=("name", "count"),
            category=("category", "first"),
        )
        .reset_index()
    )
    agg["efficiency"] = agg["vfi_psnr"] / agg["time_s"].clip(lower=1e-9)
    return {
        "by_vfi_psnr": agg.sort_values("vfi_psnr", ascending=False),
        "by_lpips": agg.sort_values("vfi_lpips", ascending=True),
        "by_efficiency": agg.sort_values("efficiency", ascending=False),
    }


def category_stats(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df.groupby("category")
        .agg(vfi_psnr=("vfi_psnr", "mean"), time_s=("time_s", "mean"), n=("name", "count"))
        .reset_index()
        .sort_values("vfi_psnr", ascending=False)
    )


def compute_pareto(df: pd.DataFrame) -> List[str]:
    agg = rankings(df)["by_vfi_psnr"]
    pts = [
        (r["name"], r["vfi_psnr"], r["time_s"])
        for _, r in agg.iterrows()
        if np.isfinite(r["vfi_psnr"]) and np.isfinite(r["time_s"])
    ]
    return pareto_frontier(pts)


def generate_figures(df: pd.DataFrame, out_dir: str | Path) -> List[str]:
    """Quality/speed figures (dark style, data_analysis.py figures 1-5)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    plt.style.use("dark_background")
    written = []

    agg = rankings(df)["by_vfi_psnr"]
    fig, ax = plt.subplots(figsize=(10, 5))
    ax.barh(agg["name"], agg["vfi_psnr"], color="#4cc9f0")
    ax.set_xlabel("VFI PSNR (dB)")
    ax.set_title("VFI quality by method")
    fig.tight_layout()
    p = out_dir / "vfi_quality.png"
    fig.savefig(p, dpi=120)
    plt.close(fig)
    written.append(str(p))

    fig, ax = plt.subplots(figsize=(8, 6))
    pareto = set(compute_pareto(df))
    for _, r in agg.iterrows():
        if not (np.isfinite(r["vfi_psnr"]) and np.isfinite(r["time_s"])):
            continue
        on = r["name"] in pareto
        ax.scatter(r["time_s"], r["vfi_psnr"], c="#f72585" if on else "#4cc9f0",
                   s=60 if on else 30)
        ax.annotate(r["name"], (r["time_s"], r["vfi_psnr"]), fontsize=7)
    ax.set_xscale("log")
    ax.set_xlabel("time (s)")
    ax.set_ylabel("VFI PSNR (dB)")
    ax.set_title("Quality vs speed (Pareto frontier highlighted)")
    fig.tight_layout()
    p = out_dir / "pareto_frontier.png"
    fig.savefig(p, dpi=120)
    plt.close(fig)
    written.append(str(p))

    cs = category_stats(df)
    fig, ax = plt.subplots(figsize=(8, 4))
    ax.bar(cs["category"], cs["vfi_psnr"], color="#b5179e")
    ax.set_ylabel("VFI PSNR (dB)")
    ax.set_title("Category comparison")
    plt.xticks(rotation=30)
    fig.tight_layout()
    p = out_dir / "category_comparison.png"
    fig.savefig(p, dpi=120)
    plt.close(fig)
    written.append(str(p))

    # 4) PSNR-vs-SSIM correlation (reference data_analysis.py psnr_ssim_
    # correlation figure): do the two quality axes agree, and where not?
    sub = agg[np.isfinite(agg["vfi_psnr"]) & np.isfinite(agg["vfi_ssim"])]
    if len(sub) >= 2:
        fig, ax = plt.subplots(figsize=(7, 6))
        ax.scatter(sub["vfi_psnr"], sub["vfi_ssim"], c="#4cc9f0", s=40)
        for _, r in sub.iterrows():
            ax.annotate(r["name"], (r["vfi_psnr"], r["vfi_ssim"]), fontsize=7)
        corr = float(np.corrcoef(sub["vfi_psnr"], sub["vfi_ssim"])[0, 1])
        ax.set_xlabel("VFI PSNR (dB)")
        ax.set_ylabel("VFI SSIM")
        ax.set_title(f"PSNR vs SSIM (r = {corr:.3f})")
        fig.tight_layout()
        p = out_dir / "psnr_ssim_correlation.png"
        fig.savefig(p, dpi=120)
        plt.close(fig)
        written.append(str(p))

    # 5) Innovative-methods comparison (reference data_analysis.py
    # innovative_comparison): the novel methods vs their baselines
    inno = agg[agg["name"].map(categorize_method).isin(
        ["UAFI", "MCAR", "UGHI", "Adaptive"])]
    base = agg[agg["name"].map(categorize_method).isin(
        ["RIFE", "LinearBlend", "Degraded"])]
    if len(inno) and len(base):
        both = pd.concat([inno.assign(group="innovative"),
                          base.assign(group="baseline")])
        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(12, 5))
        colors = {"innovative": "#f72585", "baseline": "#4cc9f0"}
        for ax, col, label in ((ax1, "vfi_psnr", "VFI PSNR (dB)"),
                               (ax2, "time_s", "time (s)")):
            sub2 = both[np.isfinite(both[col])]
            ax.barh(sub2["name"], sub2[col],
                    color=[colors[g] for g in sub2["group"]])
            ax.set_xlabel(label)
        ax2.set_xscale("log")
        fig.suptitle("Innovative methods vs baselines")
        fig.tight_layout()
        p = out_dir / "innovative_comparison.png"
        fig.savefig(p, dpi=120)
        plt.close(fig)
        written.append(str(p))
    return written


def generate_report(df: pd.DataFrame, out_path: str | Path) -> str:
    """Markdown analysis report (data_analysis.py:493-690)."""
    ranks = rankings(df)
    pareto = compute_pareto(df)
    lines = ["# Analysis Report", ""]
    lines.append(f"Experiments: {len(df)} rows, {df['name'].nunique()} methods, "
                 f"{df['interval_idx'].nunique()} interval(s)")
    lines += ["", "## Ranking by VFI PSNR", ""]
    lines.append("| method | VFI PSNR | VFI SSIM | LPIPS | KF PSNR | time s |")
    lines.append("|---|---|---|---|---|---|")
    for _, r in ranks["by_vfi_psnr"].iterrows():
        lines.append(
            f"| {r['name']} | {r['vfi_psnr']:.2f} | {r['vfi_ssim']:.4f} | "
            f"{_fmt(r['vfi_lpips'])} | {_fmt(r['keyframe_psnr'])} | {r['time_s']:.1f} |"
        )
    lines += ["", "## Pareto frontier (quality vs time)", ""]
    for name in pareto:
        lines.append(f"- {name}")
    lines += ["", "## Category stats", ""]
    for _, r in category_stats(df).iterrows():
        lines.append(f"- {r['category']}: {r['vfi_psnr']:.2f} dB mean over {r['n']} runs")
    rife = df[df["category"] == "RIFE"]["vfi_psnr"].mean()
    rest = df[~df["category"].isin(["RIFE", "Control"])]["vfi_psnr"].mean()
    if np.isfinite(rife) and np.isfinite(rest):
        lines += ["", f"RIFE vs rest: {rife:.2f} dB vs {rest:.2f} dB "
                      f"({rife - rest:+.2f} dB)"]
    report = "\n".join(lines) + "\n"
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(report)
    return report


def _fmt(v):
    return f"{v:.4f}" if v is not None and np.isfinite(v) else "—"
