"""Metric property tests, mirroring reference tests/test_metrics.py plus
golden/temporal/gaming coverage the reference lacks."""

import numpy as np
import pytest

from vfisr_tpu.evaluation import (
    MotionDifficulty,
    QualityEvaluator,
    calc_ssim,
    classify_motion_difficulty,
    compute_edge_wobble_score,
    compute_flicker_score,
    compute_psnr_simple,
    compute_ssim_simple,
    compute_stratified_metrics,
    compute_temporal_metrics,
    compute_ui_ghosting_score,
    detect_ui_regions,
    run_comprehensive_benchmark,
    safe_round,
)


class TestPSNR:
    def test_identical_inf(self, sample_rgb_frame):
        assert compute_psnr_simple(sample_rgb_frame, sample_rgb_frame) == float("inf")

    def test_noise_band(self, sample_rgb_frame, rng):
        noisy = np.clip(
            sample_rgb_frame.astype(int) + rng.integers(-10, 11, sample_rgb_frame.shape),
            0, 255,
        ).astype(np.uint8)
        psnr = compute_psnr_simple(noisy, sample_rgb_frame)
        assert 20 < psnr < 50

    def test_opposite_low(self):
        a = np.zeros((64, 64, 3), np.uint8)
        b = np.full((64, 64, 3), 255, np.uint8)
        assert compute_psnr_simple(a, b) < 10

    def test_symmetry(self, sample_rgb_frame, rng):
        other = rng.integers(0, 256, sample_rgb_frame.shape, dtype=np.uint8)
        assert compute_psnr_simple(sample_rgb_frame, other) == pytest.approx(
            compute_psnr_simple(other, sample_rgb_frame), abs=1e-6
        )

    def test_auto_resize(self, sample_rgb_frame):
        small = sample_rgb_frame[::2, ::2]
        psnr = compute_psnr_simple(small, sample_rgb_frame)
        assert np.isfinite(psnr)

    def test_golden_value(self):
        """Exact formula check: constant offset of 5 → known MSE=25."""
        a = np.full((32, 32, 3), 100, np.uint8)
        b = np.full((32, 32, 3), 105, np.uint8)
        assert compute_psnr_simple(a, b) == pytest.approx(
            10 * np.log10(255.0**2 / 25.0), abs=1e-9
        )


class TestSSIM:
    def test_identical_one(self, smooth_rgb_frame):
        assert compute_ssim_simple(smooth_rgb_frame, smooth_rgb_frame) == pytest.approx(
            1.0, abs=1e-5
        )

    def test_range(self, sample_rgb_frame, rng):
        other = rng.integers(0, 256, sample_rgb_frame.shape, dtype=np.uint8)
        s = compute_ssim_simple(sample_rgb_frame, other)
        assert -1.0 <= s <= 1.0

    def test_similar_high(self, smooth_rgb_frame, rng):
        noisy = np.clip(
            smooth_rgb_frame.astype(int) + rng.integers(-3, 4, smooth_rgb_frame.shape),
            0, 255,
        ).astype(np.uint8)
        assert compute_ssim_simple(noisy, smooth_rgb_frame) > 0.9

    def test_symmetry(self, smooth_rgb_frame, rng):
        other = rng.integers(0, 256, smooth_rgb_frame.shape, dtype=np.uint8)
        assert compute_ssim_simple(smooth_rgb_frame, other) == pytest.approx(
            compute_ssim_simple(other, smooth_rgb_frame), abs=1e-5
        )

    def test_global_variant_clamped(self, sample_rgb_frame):
        inv = (255 - sample_rgb_frame).astype(np.uint8)
        s = calc_ssim(sample_rgb_frame, inv)
        assert 0.0 <= s <= 1.0


class TestDifficulty:
    @pytest.mark.parametrize(
        "mag,expected",
        [
            (0.5, MotionDifficulty.STATIC),
            (3.0, MotionDifficulty.EASY),
            (10.0, MotionDifficulty.MEDIUM),
            (20.0, MotionDifficulty.HARD),
            (40.0, MotionDifficulty.EXTREME),
        ],
    )
    def test_thresholds(self, mag, expected):
        flow = np.zeros((16, 16, 2), np.float32)
        flow[..., 0] = mag
        assert classify_motion_difficulty(flow) is expected


class TestTemporal:
    def test_static_sequence_zero(self, smooth_rgb_frame):
        frames = [smooth_rgb_frame] * 4
        tm = compute_temporal_metrics(frames)
        assert tm.flicker_score == pytest.approx(0.0, abs=1e-3)
        assert tm.tof_smoothness < 0.05
        assert tm.motion_variance < 1e-3

    def test_linear_motion_smooth(self, smooth_rgb_frame):
        frames = [np.roll(smooth_rgb_frame, 3 * i, axis=1) for i in range(4)]
        jitter = [smooth_rgb_frame, np.roll(smooth_rgb_frame, 6, axis=1),
                  np.roll(smooth_rgb_frame, 2, axis=1),
                  np.roll(smooth_rgb_frame, 9, axis=1)]
        smooth_tof = compute_temporal_metrics(frames).tof_smoothness
        jitter_tof = compute_temporal_metrics(jitter).tof_smoothness
        assert smooth_tof < jitter_tof

    def test_flicker_detects_brightness_pumping(self, smooth_rgb_frame):
        bright = np.clip(smooth_rgb_frame.astype(int) + 40, 0, 255).astype(np.uint8)
        flicker = [smooth_rgb_frame, bright, smooth_rgb_frame, bright]
        steady = [smooth_rgb_frame] * 4
        assert compute_flicker_score(flicker) > compute_flicker_score(steady) + 10

    def test_short_sequence(self, smooth_rgb_frame):
        tm = compute_temporal_metrics([smooth_rgb_frame])
        assert tm.tof_smoothness == 0.0


class TestGaming:
    def test_ui_detection_finds_hud(self):
        import cv2

        frame = np.random.default_rng(3).integers(60, 200, (270, 480, 3), np.uint8)
        cv2.rectangle(frame, (10, 230), (130, 260), (255, 255, 255), -1)
        cv2.putText(frame, "HP 100", (15, 252), cv2.FONT_HERSHEY_SIMPLEX, 0.7, (0, 0, 0), 2)
        mask = detect_ui_regions(frame)
        hud = mask[230:260, 10:130]
        assert hud.mean() > 0.3  # HUD box mostly detected

    def test_ghosting_zero_when_perfect(self, smooth_rgb_frame):
        score = compute_ui_ghosting_score([smooth_rgb_frame], [smooth_rgb_frame])
        assert score == pytest.approx(0.0, abs=1e-6)

    def test_edge_wobble_stable_vs_flicker(self, smooth_rgb_frame, rng):
        stable = [smooth_rgb_frame] * 4
        wobbly = [
            np.clip(smooth_rgb_frame.astype(int) + rng.integers(-60, 61, smooth_rgb_frame.shape),
                    0, 255).astype(np.uint8)
            for _ in range(4)
        ]
        assert compute_edge_wobble_score(wobbly) > compute_edge_wobble_score(stable)


class TestEvaluator:
    def test_evaluate_pair(self, smooth_rgb_frame, rng):
        ev = QualityEvaluator()
        noisy = np.clip(
            smooth_rgb_frame.astype(int) + rng.integers(-8, 9, smooth_rgb_frame.shape),
            0, 255,
        ).astype(np.uint8)
        m = ev.evaluate_pair(noisy, smooth_rgb_frame)
        assert set(m) >= {"psnr", "ssim", "lpips"}
        assert m["lpips"] >= 0
        ident = ev.evaluate_pair(smooth_rgb_frame, smooth_rgb_frame)
        assert ident["lpips"] == pytest.approx(0.0, abs=1e-5)
        assert m["lpips"] > ident["lpips"]

    def test_evaluate_list_and_mismatch(self, smooth_rgb_frame):
        ev = QualityEvaluator()
        with pytest.raises(ValueError):
            ev.evaluate([smooth_rgb_frame], [smooth_rgb_frame] * 2)
        res = ev.evaluate([smooth_rgb_frame] * 2, [smooth_rgb_frame] * 2)
        assert res.ssim == pytest.approx(1.0, abs=1e-4)
        assert len(res.psnr_per_frame) == 2


def test_safe_round():
    assert safe_round(float("inf")) == "inf"
    assert safe_round(float("-inf")) == "-inf"
    assert safe_round(float("nan")) is None
    assert safe_round(1.23456, 2) == 1.23


def test_comprehensive_benchmark_runs(smooth_rgb_frame):
    frames = [np.roll(smooth_rgb_frame, i, axis=1) for i in range(3)]
    res = run_comprehensive_benchmark(frames, frames, verbose=False)
    assert res.total_frames == 3
    assert res.psnr == float("inf")
    assert "COMPREHENSIVE" in res.summary_table()
    d = res.to_dict()
    assert "temporal" in d and "gaming" in d and "stratified" in d
