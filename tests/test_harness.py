"""Harness tests: experiment runner semantics + checkpoint/resume."""

import json

import numpy as np
import pytest

from vfisr_tpu.harness.experiments import (
    EXPERIMENTS,
    ExperimentCheckpoint,
    LIGHT_EXPERIMENTS,
    QUALITY_LEVELS,
    generate_quality_experiments,
    run_experiment,
)


@pytest.fixture(scope="module")
def tiny_interval():
    import cv2

    rng = np.random.default_rng(2)
    base = cv2.resize(rng.integers(0, 256, (18, 32, 3), np.uint8), (256, 144),
                      interpolation=cv2.INTER_CUBIC)
    keyframes = [np.roll(base, 2 * i, axis=1) for i in range(4)]
    midpoints = [np.roll(base, 2 * i + 1, axis=1) for i in range(3)]
    return keyframes, midpoints


def _tiny_exp(name="lanczos_blend", **over):
    exp = next(e for e in EXPERIMENTS if e["name"] == name).copy()
    exp["quality_resolution"] = (320, 180)
    exp["quality_fps"] = 60
    exp.update(over)
    return exp


class TestRunExperiment:
    def test_linear_blend_result_schema(self, tiny_interval):
        kf, mids = tiny_interval
        result = run_experiment(kf, mids, _tiny_exp(), verbose=False)
        # reference result-dict keys (run_experiments.py:1042-1079)
        for key in ("name", "frames", "time_s", "keyframe_psnr_db", "vfi_psnr_db",
                    "overall_psnr_db", "rife_frames_pct", "realtime_x",
                    "vfi_frames_evaluated", "quality_level", "vfi_method"):
            assert key in result, key
        # 4 keyframes + 3 pairs x 3 mids = 13 frames
        assert result["frames"] == 13
        assert result["vfi_frames_evaluated"] == 3
        assert isinstance(result["vfi_psnr_db"], (int, float))

    def test_overall_weighting(self, tiny_interval):
        kf, mids = tiny_interval
        r = run_experiment(kf, mids, _tiny_exp(), verbose=False)
        expected = 0.25 * r["keyframe_psnr_db"] + 0.75 * r["vfi_psnr_db"]
        assert r["overall_psnr_db"] == pytest.approx(expected, abs=0.02)

    def test_control_skips_vfi_eval(self, tiny_interval):
        kf, mids = tiny_interval
        r = run_experiment(kf, mids, _tiny_exp("control"), verbose=False)
        assert r["vfi_frames_evaluated"] == 0
        assert r["keyframe_psnr_db"] == "inf"  # control == reference

    def test_frame_dup_is_worst(self, tiny_interval):
        kf, mids = tiny_interval
        blend = run_experiment(kf, mids, _tiny_exp("lanczos_blend"), verbose=False)
        dup = run_experiment(kf, mids, _tiny_exp("degraded"), verbose=False)
        assert blend["vfi_psnr_db"] >= dup["vfi_psnr_db"]


def test_quality_matrix():
    exps = generate_quality_experiments(LIGHT_EXPERIMENTS[:2])
    assert len(exps) == 2 * len(QUALITY_LEVELS)
    assert any(e["name"].endswith("_4K@120") for e in exps)


def test_checkpoint_resume(tmp_path):
    path = tmp_path / "experiment_results.json"
    ck = ExperimentCheckpoint(path)
    ck.append({"name": "a", "interval_idx": 0, "clip_id": "clip_x"})
    ck.append({"name": "b", "interval_idx": 1})  # legacy row, no clip
    # reload from disk
    ck2 = ExperimentCheckpoint(path)
    # keys are clip-scoped: the same (name, interval) on another clip
    # must NOT be considered done (CPU-fallback v4 regression). Legacy
    # rows (no clip_id) migrate to LEGACY_CLIP_ID instead of acting as
    # a cross-clip wildcard.
    from vfisr_tpu.harness.experiments import LEGACY_CLIP_ID

    assert ck2.completed_keys() == {
        ("clip_x", "a", 0), (LEGACY_CLIP_ID, "b", 1)}
    data = json.loads(path.read_text())
    assert len(data["experiments"]) == 2


def test_drop_rows_targeted_refresh():
    # --replace semantics: only the selected (name, interval) cells fall
    # out; every other row survives (round-3 stale-row refresh path)
    from vfisr_tpu.harness.experiments import drop_rows

    rows = [
        {"name": "optical_flow_basic", "interval_idx": 0},
        {"name": "optical_flow_basic", "interval_idx": 1},
        {"name": "uafi_default", "interval_idx": 0},
        {"name": "rife_default", "interval_idx": 0},
        {"name": "control"},  # legacy row without interval_idx -> 0
    ]
    kept = drop_rows(rows, ["optical_flow_basic", "uafi_default"], [0])
    assert {(r["name"], r.get("interval_idx", 0)) for r in kept} == {
        ("optical_flow_basic", 1),
        ("rife_default", 0),
        ("control", 0),
    }


def test_drop_rows_clip_scoped():
    # --replace on one clip must not evict the same cells on other clips
    from vfisr_tpu.harness.experiments import drop_rows

    rows = [
        {"name": "adaptive_default", "interval_idx": 0, "clip_id": "synth_001"},
        {"name": "adaptive_default", "interval_idx": 0, "clip_id": "synth_hard_001"},
        {"name": "adaptive_default", "interval_idx": 0},  # legacy: no clip
    ]
    kept = drop_rows(rows, ["adaptive_default"], [0], clip_id="synth_001")
    # synth_001 and the legacy row drop; the other clip's row survives
    assert [r.get("clip_id") for r in kept] == ["synth_hard_001"]
    # unscoped drop clears all three
    assert drop_rows(rows, ["adaptive_default"], [0]) == []
    # legacy rows are LEGACY_CLIP_ID (synth_001) measurements, NOT a
    # wildcard: a drop scoped to another clip must leave them alone
    kept_hard = drop_rows(rows, ["adaptive_default"], [0],
                          clip_id="synth_hard_001")
    assert [r.get("clip_id") for r in kept_hard] == ["synth_001", None]
