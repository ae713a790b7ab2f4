"""Consistency floors for the committed triplet-benchmark artifact.

Round-4 shipped a benchmark where the novel adaptive/flagship models
scored BELOW bicubic on the hard corpus (scene-gate misfire -> frame-dup
output) while the README celebrated the opposite — and nothing failed.
These tests make that class of artifact impossible to land silently
(scripts/chip_queue/gate_suite.sh runs them after every refresh).
"""

import json
from datetime import datetime
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent
ARTIFACT = ROOT / "outputs" / "benchmarks" / "benchmark_results.json"

# Artifacts produced before the round-5 scene-gate fix are known bad
# (the misfire is the bug being fixed); the queue replaces them.
SCENE_GATE_FIX = datetime.fromisoformat("2026-08-19T19:00:00")


def _load():
    if not ARTIFACT.exists():
        pytest.skip("no committed benchmark artifact")
    data = json.loads(ARTIFACT.read_text())
    ts = datetime.fromisoformat(data["timestamp"])
    if ts < SCENE_GATE_FIX:
        pytest.skip("artifact predates the round-5 scene-gate fix")
    return data


def _psnr(rows, model):
    r = rows.get(model)
    if not r or "error" in r:
        return None
    return r["quality_summary"]["psnr"]["mean"]


@pytest.mark.parametrize("novel", ["adaptive", "flagship"])
def test_novel_models_never_lose_to_naive_baselines(novel):
    data = _load()
    for clip, rows in data["results"].items():
        np_ = _psnr(rows, novel)
        base = _psnr(rows, "bicubic")
        if np_ is None or base is None:
            continue
        # a router that loses to a linear crossfade is routing to a
        # destructive branch (round-4: 16.72 dB vs bicubic 18.34)
        assert np_ >= base - 0.25, (clip, novel, np_, base)


ADAPTIVE_ROUTES_BINS = datetime.fromisoformat("2026-08-20T05:50:00")


def test_adaptive_beats_its_fast_expert():
    """The novel router must ADD value over always-RIFE (round-4 verdict
    Missing #2: adaptive only ever tied rife as 100%-RIFE routing while
    vfimamba measurably won every hard triplet). With the per-motion-bin
    gate, adaptive >= rife_default on every clip in this harness."""
    data = _load()
    stamp = data.get("merged_at") or data["timestamp"]
    if datetime.fromisoformat(stamp) < ADAPTIVE_ROUTES_BINS:
        pytest.skip("artifact predates the per-bin expert gate")
    for clip, rows in data["results"].items():
        ad, rf = _psnr(rows, "adaptive"), _psnr(rows, "rife")
        if ad is None or rf is None:
            continue
        assert ad >= rf - 0.05, (clip, ad, rf)


def test_safa_has_a_real_row():
    data = _load()
    for clip, rows in data["results"].items():
        r = rows.get("safa")
        if r is None:
            continue
        assert "error" not in r, (clip, r.get("error"))
        assert r["quality_summary"]["psnr"]["mean"] > 10.0


def test_merge_benchmark_outputs():
    """A targeted re-run (--merge) replaces only its own (clip, model)
    rows; everything else — and the bulk run's timestamp — survives."""
    from vfisr_tpu.harness.triplet import merge_benchmark_outputs

    prev = {
        "timestamp": "2026-08-20T03:00:00",
        "models": ["bicubic", "adaptive"],
        "lpips_mode": "calibrated_heads",
        "results": {
            "clip_a": {"bicubic": {"q": 1}, "adaptive": {"q": 2}},
            "clip_b": {"bicubic": {"q": 3}},
        },
    }
    fresh = {
        "timestamp": "2026-08-20T06:00:00",
        "models": ["adaptive", "flagship"],
        "lpips_mode": "calibrated_heads",
        "results": {"clip_a": {"adaptive": {"q": 20}, "flagship": {"q": 30}}},
    }
    out = merge_benchmark_outputs(prev, fresh)
    assert out["results"]["clip_a"]["adaptive"] == {"q": 20}
    assert out["results"]["clip_a"]["bicubic"] == {"q": 1}
    assert out["results"]["clip_a"]["flagship"] == {"q": 30}
    assert out["results"]["clip_b"]["bicubic"] == {"q": 3}
    assert out["timestamp"] == "2026-08-20T03:00:00"
    assert out["merged_at"] == "2026-08-20T06:00:00"
    assert out["merged_models"] == ["adaptive", "flagship"]
    assert set(out["models"]) == {"bicubic", "adaptive", "flagship"}
    # absent/corrupt prev -> fresh passes through
    assert merge_benchmark_outputs(None, fresh) is fresh
    assert merge_benchmark_outputs({"results": 3}, fresh) is fresh


def test_vram_peaks_are_per_model():
    """The live-array peak must not be one process-global high-water
    stamped on every row (round-4: all 13 models reported 101.9 MB)."""
    data = _load()
    for clip, rows in data["results"].items():
        peaks = [r["speed_summary"]["vram_mb"]["max"] for r in rows.values()
                 if "error" not in r and "speed_summary" in r]
        nonzero = [p for p in peaks if p and p > 0]
        if len(nonzero) >= 4:
            assert len(set(round(p, 1) for p in nonzero)) > 1, nonzero
