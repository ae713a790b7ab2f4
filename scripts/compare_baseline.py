#!/usr/bin/env python
"""Generate docs/BASELINE_COMPARISON.md: reference numbers vs this repo.

Reads outputs/experiment_results.json (our measured sweep) and the latest
BENCH_r*.json, and tabulates them against the reference's Phase-1 numbers
(BASELINE.md, sourced from its outputs/COMPREHENSIVE_REPORT.md). Content
differs (the reference measured captured Arc Raiders footage; we measure
synthetic gaming clips — no real footage ships in either snapshot), so
the comparable quantities are per-method ORDERINGS and deltas vs the
degraded baseline, not absolute PSNR.

Per-clip sections: the hard synthetic clip (`synth_hard_001`, difficulty-
matched to the reference interval: mean_flow ~12.5 px vs ref 12.9, hard_pct
27.5% vs ref 31.4 — ref meta.json) is the headline comparison; the smooth
clip (`synth_001`) is kept as a secondary, explicitly easier corpus.
Discordant ordering pairs are listed per clip; hand-written attributions
live in docs/concordance_notes.md and are appended verbatim when present.
"""

from __future__ import annotations

import glob
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Reference Phase-1 measured rows (BASELINE.md / COMPREHENSIVE_REPORT.md:58-74)
REFERENCE = {
    "adaptive_aggressive": {"vfi_psnr": 25.82, "vfi_ssim": 0.9382, "time_s": 71.6},
    "rife_default": {"vfi_psnr": 25.80, "vfi_ssim": 0.9382, "time_s": 70.1},
    "ughi_default": {"vfi_psnr": 24.02, "time_s": 424.8},
    "lanczos_blend": {"vfi_psnr": 24.01, "time_s": 29.7},
    "bicubic_blend": {"vfi_psnr": 24.00, "time_s": 23.4},
    "adaptive_default": {"vfi_psnr": 23.92, "time_s": 26.4},
    "mcar_default": {"vfi_psnr": 23.79, "time_s": 65.8},
    "uafi_default": {"vfi_psnr": 22.71, "time_s": 269.5},
    "optical_flow_basic": {"vfi_psnr": 22.28},
    "degraded": {"vfi_psnr": 22.28, "vfi_ssim": 0.8718},
}
REF_BASELINE = "degraded"
REF_INTERP_FPS = 6.29  # 441 frames / 70.1 s (rife_default)
NOTES = Path("docs/concordance_notes.md")


def merge_results(paths) -> dict:
    """Merge experiment rows from several corpora into one dict.

    Earlier paths win on duplicate (name, clip_id, interval_idx) keys;
    later paths only fill gaps — so the on-chip corpus stays authoritative
    and the CPU-fallback corpus (captured during TPU-tunnel outages; same
    code path, parity-pinned kernels) only contributes rows the chip never
    measured. Each row is tagged with its ``_source`` path.
    """
    merged, seen = [], set()
    for p in paths:
        try:
            data = json.loads(Path(p).read_text())
        except (OSError, json.JSONDecodeError):
            continue
        for e in data.get("experiments", []):
            key = (e.get("name"), e.get("clip_id"), e.get("interval_idx", 0))
            if key in seen:
                continue
            seen.add(key)
            merged.append(dict(e, _source=str(p)))
    return {"experiments": merged}


def load_ours(results_path: str, clip_id: str | None = None):
    """Aggregate rows by method, optionally restricted to one clip.

    Methods are averaged ONLY over the interval indices every compared
    method has (their intersection): mixing a method averaged over easy
    intervals with one averaged over easy+hard intervals makes orderings
    meaningless (the round-2 comparison did exactly that — bicubic_blend
    covered intervals 0,1 while rife_default also covered the hard
    interval 2, so the blend "beat" RIFE purely by coverage)."""
    data = (results_path if isinstance(results_path, dict)
            else json.loads(Path(results_path).read_text()))
    rows = [e for e in data.get("experiments", [])
            if clip_id is None or e.get("clip_id") == clip_id]
    compared = [n for n in REFERENCE
                if any(e["name"] == n for e in rows)]
    coverage = {
        n: {e.get("interval_idx", 0) for e in rows if e["name"] == n}
        for n in compared
    }

    def _intersection(names):
        sets = [coverage[n] for n in names]
        return set.intersection(*sets) if sets else set()

    common = _intersection(compared) if compared else None
    # A method covering a disjoint interval slice (e.g. rife_default ran
    # only the hard interval 2 on the smooth clip) must not blank the
    # whole comparison: greedily exclude the method whose removal grows
    # the common set the most, and report the exclusion, rather than
    # emitting a table of dashes.
    excluded = []
    kept = list(compared)
    while common is not None and not common and len(kept) > 2:
        victim = max(kept, key=lambda n: len(_intersection(
            [m for m in kept if m != n])))
        kept.remove(victim)
        excluded.append(victim)
        common = _intersection(kept)
    by_name = {}
    for e in rows:
        name = e["name"]
        if name in excluded:
            continue
        if (name in REFERENCE and common is not None
                and e.get("interval_idx", 0) not in common):
            continue
        agg = by_name.setdefault(name, {"vfi_psnr": [], "vfi_ssim": [],
                                        "time_s": []})
        for src, dst in (("vfi_psnr_db", "vfi_psnr"), ("vfi_ssim", "vfi_ssim"),
                         ("time_s", "time_s")):
            v = e.get(src)
            if isinstance(v, (int, float)):
                agg[dst].append(v)
    out = {
        n: {k: (sum(v) / len(v) if v else None) for k, v in a.items()}
        for n, a in by_name.items()
    }
    if common is not None:
        out["_common_intervals"] = sorted(common)
    if excluded:
        out["_excluded_no_coverage"] = sorted(excluded)
    sources = {e.get("_source") for e in rows if e.get("_source")}
    if sources:
        out["_sources"] = sorted(sources)
    return out


def concordance(ours: dict):
    """(concordant, total, discordant_pairs) vs the reference ordering."""
    common = [n for n in REFERENCE if ours.get(n, {}).get("vfi_psnr") is not None]
    conc = tot = 0
    discords = []
    for i, a in enumerate(common):
        for b in common[i + 1:]:
            r = REFERENCE[a]["vfi_psnr"] - REFERENCE[b]["vfi_psnr"]
            u = ours[a]["vfi_psnr"] - ours[b]["vfi_psnr"]
            if abs(r) < 0.05:
                continue
            tot += 1
            if (r > 0) == (u > 0):
                conc += 1
            else:
                discords.append((a, b, r, u))
    return conc, tot, discords, len(common)


def section(title: str, blurb: str, ours: dict) -> list[str]:
    lines = [f"## {title}", ""]
    if blurb:
        lines += [blurb, ""]
    common = ours.get("_common_intervals")
    if common is not None:
        lines += [
            f"Compared methods averaged over their common interval set "
            f"{common} (rows on other intervals excluded to keep the "
            f"ordering apples-to-apples).",
            "",
        ]
    excluded = ours.get("_excluded_no_coverage")
    if excluded:
        lines += [
            f"Excluded for disjoint interval coverage (would blank the "
            f"common set): {', '.join(excluded)}.",
            "",
        ]
    if any("cpu_fallback" in s for s in ours.get("_sources", ())):
        lines += [
            "Some rows here come from `outputs/cpu_fallback/` — measured "
            "on the CPU path during a TPU-tunnel outage (identical code; "
            "the classical kernels are precision-pinned for parity, so "
            "quality numbers are comparable while `time s` is not).",
            "",
        ]
    lines += [
        "| method | ref VFI PSNR | ref Δ vs degraded | ours VFI PSNR | "
        "ours Δ vs degraded | ours time s |",
        "|---|---|---|---|---|---|",
    ]
    ref_base = REFERENCE[REF_BASELINE]["vfi_psnr"]
    our_base = (ours.get(REF_BASELINE, {}) or {}).get("vfi_psnr")
    for name, ref in REFERENCE.items():
        o = ours.get(name, {})
        ov = o.get("vfi_psnr")
        lines.append(
            "| {} | {:.2f} | {:+.2f} | {} | {} | {} |".format(
                name,
                ref["vfi_psnr"],
                ref["vfi_psnr"] - ref_base,
                f"{ov:.2f}" if ov is not None else "—",
                f"{ov - our_base:+.2f}" if (ov is not None and our_base) else "—",
                f"{o.get('time_s'):.1f}" if o.get("time_s") else "—",
            )
        )
    aa = (ours.get("adaptive_aggressive", {}) or {}).get("vfi_psnr")
    rd = (ours.get("rife_default", {}) or {}).get("vfi_psnr")
    if aa is not None and rd is not None:
        verdict = ("matches the reference's adaptive>=rife result"
                   if aa >= rd else
                   "INVERTED vs the reference's adaptive>=rife result")
        lines += [
            "",
            f"Novel-method headline: adaptive_aggressive {aa:.2f} vs "
            f"rife_default {rd:.2f} dB ({aa - rd:+.2f}) — {verdict} "
            "(ref gap +0.02, COMPREHENSIVE_REPORT.md:58-59; the pair is "
            "excluded from the concordance tally because the ref gap is "
            "<0.05 dB).",
        ]
    conc, tot, discords, n_common = concordance(ours)
    if tot:
        lines += ["",
                  f"Ordering agreement on {tot} method pairs with a "
                  f"reference gap ≥0.05 dB: **{conc}/{tot} concordant** "
                  f"({n_common} comparable methods)."]
    if discords:
        lines += ["", "Discordant pairs (ref says A>B, we measured A<B):", ""]
        lines += ["| A | B | ref Δ(A−B) | ours Δ(A−B) |", "|---|---|---|---|"]
        for a, b, r, u in sorted(discords, key=lambda d: d[2], reverse=True):
            if r < 0:  # normalize so ref Δ is positive
                a, b, r, u = b, a, -r, -u
            lines.append(f"| {a} | {b} | {r:+.2f} | {u:+.2f} |")
    return lines + [""]


def main():
    results_paths = (sys.argv[1].split(",") if len(sys.argv) > 1 else
                     ["outputs/experiment_results.json",
                      "outputs/cpu_fallback/experiment_results.json"])
    out_path = Path(sys.argv[2] if len(sys.argv) > 2 else "docs/BASELINE_COMPARISON.md")

    data = merge_results(results_paths)
    clips = sorted({e.get("clip_id") for e in data.get("experiments", [])
                    if e.get("clip_id")})

    # Latest PARSEABLE bench record: driver rounds (BENCH_r*.json) plus any
    # local bench.py run saved to outputs/bench_latest.json — newest mtime
    # first, skipping failed captures (driver wrapper rc!=0 -> parsed null;
    # that skip is what keeps a dead-tunnel round from blanking this section).
    bench = None
    for p in sorted(
        glob.glob("BENCH_r*.json") + glob.glob("outputs/bench_latest.json"),
        key=lambda p: Path(p).stat().st_mtime,
        reverse=True,
    ):
        try:
            rec = json.loads(Path(p).read_text())
        except (OSError, json.JSONDecodeError):
            continue
        if "metric" not in rec:
            # driver wrapper schema: the bench line lives under "parsed"
            rec = rec.get("parsed")
        if isinstance(rec, dict) and "value" in rec:
            bench = rec
            break

    lines = [
        "# Reference baseline vs this framework",
        "",
        "Reference: RTX 3090, captured Arc Raiders 1080p59 content "
        "(BASELINE.md / reference outputs/COMPREHENSIVE_REPORT.md:58-74). "
        "Ours: one TPU v5e chip, synthetic gaming clips "
        "(`scripts/make_synthetic_clip.py`) — neither snapshot ships real "
        "footage, so compare per-method ORDERING and Δ vs the degraded "
        "baseline, not absolute dB (different content).",
        "",
    ]
    blurbs = {
        "synth_hard_001": (
            "Difficulty-matched corpus (mean_flow 12.2 px / hard_pct up to "
            "27.5% vs the reference interval's 12.9 px / 31.4% — ref "
            "data/clips/arc_raiders_001/.../meta.json): high-frequency "
            "texture, particles, occlusion, HUD overlays, scene cuts. "
            "**Headline comparison.**"),
        "synth_001": (
            "Smooth-motion corpus (EASY/MEDIUM intervals): motion is "
            "near-linear, so blend baselines are unusually strong here; "
            "kept as the secondary, explicitly easier corpus."),
    }
    order = [c for c in ("synth_hard_001", "synth_001") if c in clips]
    order += [c for c in clips if c not in order]
    for clip in order:
        ours = load_ours(data, clip)
        if not ours:
            continue
        lines += section(f"Per-method VFI quality — `{clip}`",
                         blurbs.get(clip, ""), ours)

    if NOTES.exists():
        lines += [NOTES.read_text().rstrip(), ""]

    lines += ["## Throughput", ""]
    if bench:
        stale = " (stale record)" if bench.get("stale") else ""
        lines += [
            f"- Reference rife_default: **{REF_INTERP_FPS:.2f} interpolated "
            "fps** (441 frames / 70.1 s, RTX 3090).",
            f"- Ours ({bench['metric']}): **{bench['value']} {bench['unit']}"
            f"**{stale} — {bench['vs_baseline']}× the reference, vs the "
            "≥120 fps north-star (BASELINE.md).",
        ]
    out_path.parent.mkdir(exist_ok=True)
    out_path.write_text("\n".join(lines) + "\n")
    print(f"Wrote {out_path} ({len(order)} clip sections)")


if __name__ == "__main__":
    main()
