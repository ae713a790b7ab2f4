"""Analysis layer (vfisr_tpu/analysis/): categorization, rankings, Pareto
frontier, normalization vs the degraded baseline, and report generation —
the reference's pandas pipeline semantics (data_analysis.py:93-242,
statistical_analysis.py:121-210, normalize_data.py, final_analysis.py).
"""

import json

import numpy as np
import pytest


def _results(tmp_path):
    """Two intervals x four methods with a known ordering."""
    exps = []
    table = {
        # name: (vfi_psnr per interval, time_s)
        "degraded": ((22.0, 20.0), 10.0),
        "lanczos_blend": ((24.0, 21.5), 20.0),
        "rife_default": ((26.0, 24.0), 60.0),
        "adaptive_default": ((25.5, 23.8), 30.0),
    }
    table["slow_bad"] = ((21.0, 19.5), 100.0)  # dominated by everything
    for ivl in (0, 1):
        for name, (psnrs, t) in table.items():
            exps.append({
                "name": name, "interval_idx": ivl,
                "vfi_psnr_db": psnrs[ivl], "vfi_ssim": 0.9,
                "keyframe_psnr_db": 35.0, "overall_psnr_db": psnrs[ivl],
                "time_s": t, "fps_achieved": 1.0, "rife_frames_pct": 0.0,
            })
    path = tmp_path / "experiment_results.json"
    path.write_text(json.dumps({"experiments": exps, "created": "t"}))
    return path


class TestDataAnalysis:
    def test_categorize(self):
        from vfisr_tpu.analysis.data_analysis import categorize_method

        assert categorize_method("rife_default") == "RIFE"
        assert categorize_method("adaptive_aggressive") == "Adaptive"
        assert categorize_method("uafi_default") == "UAFI"
        assert categorize_method("degraded") == "Degraded"

    def test_rankings_and_pareto(self, tmp_path):
        from vfisr_tpu.analysis.data_analysis import (
            compute_pareto, load_results, rankings)

        df = load_results(_results(tmp_path))
        assert len(df) == 10
        by_q = rankings(df)["by_vfi_psnr"]
        assert by_q.iloc[0]["name"] == "rife_default"  # highest mean PSNR
        assert by_q.iloc[-1]["name"] == "slow_bad"
        # quality/time trade-off: every method here is non-dominated
        # except slow_bad (worse AND slower than all)
        frontier = compute_pareto(df)
        assert "slow_bad" not in frontier
        for name in ("degraded", "lanczos_blend", "adaptive_default",
                     "rife_default"):
            assert name in frontier, name

    def test_inf_psnr_loads_as_nan(self, tmp_path):
        from vfisr_tpu.analysis.data_analysis import load_results

        p = tmp_path / "r.json"
        p.write_text(json.dumps({"experiments": [{
            "name": "control", "interval_idx": 0, "vfi_psnr_db": "inf",
            "time_s": 1.0}]}))
        df = load_results(p)
        assert np.isnan(df.iloc[0]["vfi_psnr"])

    def test_report_generation(self, tmp_path):
        from vfisr_tpu.analysis.data_analysis import (
            generate_report, load_results)

        df = load_results(_results(tmp_path))
        out = tmp_path / "analysis_report.md"
        text = generate_report(df, out)
        assert out.exists()
        assert "rife_default" in text and "Pareto" in text


class TestNormalization:
    def test_gains_vs_degraded(self, tmp_path):
        from vfisr_tpu.analysis.normalize_data import normalize

        results = json.loads(_results(tmp_path).read_text())
        out = normalize(results)
        rife = out["methods"]["rife_default"]
        # per-interval gains vs degraded: 26-22=4.0 and 24-20=4.0
        assert rife["mean_gain_db"] == pytest.approx(4.0)
        assert rife["per_interval_gains"] == [4.0, 4.0]
        assert rife["time_ratio"] == pytest.approx(6.0)  # 60s vs 10s
        assert out["baseline"] == "degraded"
        assert "degraded" not in out["methods"]

    def test_statistical_analysis_runs(self, tmp_path):
        from vfisr_tpu.analysis.statistical_analysis import run

        path = _results(tmp_path)
        out = run(path, tmp_path)
        assert (tmp_path / "statistical_summary.md").exists()
        assert (tmp_path / "statistical_analysis.json").exists()

    def test_final_analysis_runs(self, tmp_path):
        from vfisr_tpu.analysis.final_analysis import run

        path = _results(tmp_path)
        out = run(path, tmp_path)
        assert (tmp_path / "final_analysis.json").exists()


class TestBaselineComparison:
    """Concordance math of scripts/compare_baseline.py (round-3 rebuild)."""

    def _load(self):
        import importlib.util
        from pathlib import Path

        spec = importlib.util.spec_from_file_location(
            "compare_baseline",
            Path(__file__).resolve().parent.parent / "scripts" / "compare_baseline.py",
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_concordance_counts_and_discords(self):
        mod = self._load()
        # ours agrees with the reference ordering except it flips
        # rife_default vs degraded (ref gap +3.52 -> discordant)
        ours = {n: {"vfi_psnr": r["vfi_psnr"]} for n, r in mod.REFERENCE.items()}
        conc, tot, discords, n_common = mod.concordance(ours)
        assert n_common == len(mod.REFERENCE)
        assert conc == tot and not discords  # identical ordering
        ours["rife_default"]["vfi_psnr"] = ours["degraded"]["vfi_psnr"] - 1.0
        conc2, tot2, discords2, _ = mod.concordance(ours)
        assert tot2 == tot
        assert conc2 < conc
        flipped = {(a, b) for a, b, _, _ in discords2}
        assert ("rife_default", "degraded") in flipped

    def test_near_ties_excluded(self):
        mod = self._load()
        # adaptive_aggressive vs rife_default ref gap is 0.02 (<0.05):
        # flipping it must not count as discordant
        ours = {n: {"vfi_psnr": r["vfi_psnr"]} for n, r in mod.REFERENCE.items()}
        ours["adaptive_aggressive"]["vfi_psnr"] = (
            ours["rife_default"]["vfi_psnr"] - 0.01)
        conc, tot, discords, _ = mod.concordance(ours)
        assert conc == tot

    def test_per_clip_sections(self, tmp_path):
        mod = self._load()
        rows = []
        for clip, bump in (("synth_hard_001", 0.0), ("synth_001", 5.0)):
            for name, ref in mod.REFERENCE.items():
                rows.append({"name": name, "clip_id": clip, "interval_idx": 0,
                             "vfi_psnr_db": ref["vfi_psnr"] + bump,
                             "vfi_ssim": 0.9, "time_s": 10.0})
        p = tmp_path / "res.json"
        p.write_text(json.dumps({"experiments": rows}))
        hard = mod.load_ours(str(p), "synth_hard_001")
        smooth = mod.load_ours(str(p), "synth_001")
        assert hard["degraded"]["vfi_psnr"] != smooth["degraded"]["vfi_psnr"]
        assert mod.concordance(hard)[0] == mod.concordance(hard)[1]

    def test_merge_results_gap_fill(self, tmp_path):
        # Device corpus is authoritative; the fallback corpus only fills
        # (name, clip, interval) combos the chip never measured.
        mod = self._load()
        dev = {"experiments": [
            {"name": "rife_default", "clip_id": "c", "interval_idx": 0,
             "vfi_psnr_db": 30.0},
        ]}
        fb = {"experiments": [
            {"name": "rife_default", "clip_id": "c", "interval_idx": 0,
             "vfi_psnr_db": 10.0},   # duplicate: must lose
            {"name": "rife_default", "clip_id": "c", "interval_idx": 1,
             "vfi_psnr_db": 28.0},   # gap: must fill
        ]}
        p1 = tmp_path / "dev.json"; p1.write_text(json.dumps(dev))
        p2 = tmp_path / "fb.json"; p2.write_text(json.dumps(fb))
        merged = mod.merge_results([str(p1), str(p2), str(tmp_path / "nope.json")])
        rows = merged["experiments"]
        assert len(rows) == 2
        by_ival = {r["interval_idx"]: r for r in rows}
        assert by_ival[0]["vfi_psnr_db"] == 30.0
        assert by_ival[0]["_source"] == str(p1)
        assert by_ival[1]["_source"] == str(p2)
        # load_ours accepts the merged dict directly and reports sources
        ours = mod.load_ours(merged, "c")
        assert ours["rife_default"]["vfi_psnr"] == 29.0
        assert str(p2) in ours["_sources"]
