"""Calibrated scene-cut gate + regime-conditional expert bins.

Round-4 verdict Missing #1/#2: the SSIM-only scene gate (reference
adaptive_pipeline.py:140-160) misread 100% of ordinary hard-corpus pairs
as cuts (fast motion over high-frequency texture → low SSIM), and one
global expert boolean routed hard pairs — where vfimamba measurably wins —
to rife. These tests pin the fixes: flow-compensated matchability
separates cuts from motion, and the per-motion-bin gate routes by the
measured winner at each pair's motion.
"""

import json

import numpy as np
import pytest


def _textured(seed=11, h=144, w=192):
    import cv2

    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h // 4, w // 4, 3), np.uint8)
    return cv2.resize(base, (w, h), interpolation=cv2.INTER_CUBIC)


class TestSceneCutSignals:
    def _signals(self, f0, f1):
        import jax.numpy as jnp

        from vfisr_tpu.core.color import rgb_to_gray
        from vfisr_tpu.models.novel.adaptive_pipeline import scene_cut_signals
        from vfisr_tpu.ops.flow import farneback_flow

        g0 = rgb_to_gray(jnp.asarray(f0, jnp.float32)[None])
        g1 = rgb_to_gray(jnp.asarray(f1, jnp.float32)[None])
        flow = farneback_flow(g0, g1, 0.5, 3, 15, 3, 5, 1.2)
        _, ssim, warped = scene_cut_signals(g0, g1, flow, 0.65, 1.0)
        return float(ssim[0]), float(warped[0])

    def test_fast_pan_realigns_under_flow(self):
        """Large translation on sharp texture: raw SSIM may collapse but
        flow-compensated SSIM recovers — NOT a cut."""
        f0 = _textured(21)
        f1 = np.roll(f0, 14, axis=1)
        ssim, warped = self._signals(f0, f1)
        assert warped > ssim + 0.15, (ssim, warped)
        assert warped > 0.6, warped

    def test_true_cut_stays_unalignable(self):
        """Unrelated worlds: no flow explains the change — warped SSIM
        stays low, the gate holds."""
        f0 = _textured(21)
        f1 = _textured(99)
        ssim, warped = self._signals(f0, f1)
        assert ssim < 0.65, ssim
        assert warped < 0.5, warped

    def test_calibrated_threshold_separates_when_present(self):
        """The committed calibration (weights/router_gate.json) must put
        its threshold between the two regimes measured here."""
        from vfisr_tpu.utils.router_gate import scene_warp_threshold

        thr = scene_warp_threshold()
        if thr is None:
            pytest.skip("scene gate not calibrated yet")
        f0 = _textured(21)
        _, warped_pan = self._signals(f0, np.roll(f0, 14, axis=1))
        _, warped_cut = self._signals(f0, _textured(99))
        assert warped_cut < thr <= 1.0, (warped_cut, thr)
        assert warped_pan > thr, (warped_pan, thr)

    def test_router_does_not_hold_fast_pan_when_calibrated(self):
        from vfisr_tpu.models.novel.adaptive_pipeline import AdaptiveRouter
        from vfisr_tpu.utils.router_gate import scene_warp_threshold

        if scene_warp_threshold() is None:
            pytest.skip("scene gate not calibrated yet")
        router = AdaptiveRouter()
        f0 = _textured(21)
        analysis = router.analyze(f0, np.roll(f0, 14, axis=1))
        assert not analysis.is_scene_change
        analysis = router.analyze(f0, _textured(99))
        assert analysis.is_scene_change


class TestExpertBins:
    def _write_gate(self, tmp_path, monkeypatch, payload):
        import vfisr_tpu.utils.router_gate as rg

        p = tmp_path / "router_gate.json"
        p.write_text(json.dumps(payload))
        monkeypatch.setattr(rg, "DEFAULT_PATH", p)
        rg.clear_cache()
        return rg

    BINS = {
        "expert_bins": {
            "native": [
                {"motion_lo": 0.0, "motion_hi": 2.0, "count": 10,
                 "rife": 33.0, "vfimamba": 31.0},
                {"motion_lo": 2.0, "motion_hi": 8.0, "count": 10,
                 "rife": 24.0, "vfimamba": 24.5},
                {"motion_lo": 8.0, "motion_hi": 1e9, "count": 10,
                 "rife": 22.0, "vfimamba": 23.5},
            ],
            "sweep": [
                {"motion_lo": 0.0, "motion_hi": 0.5, "count": 10,
                 "blend": 23.5, "rife": 23.4, "rife_fast": 23.4},
                {"motion_lo": 0.5, "motion_hi": 1e9, "count": 10,
                 "blend": 18.0, "rife": 19.9, "rife_fast": 20.1,
                 "vfimamba": 20.4},
            ],
        },
    }

    def test_bin_winner_lookup(self, tmp_path, monkeypatch):
        rg = self._write_gate(tmp_path, monkeypatch, self.BINS)
        assert rg.bin_winner("native", 0.5) == "rife"
        assert rg.bin_winner("native", 5.0) == "vfimamba"
        assert rg.bin_winner("native", 50.0) == "vfimamba"  # beyond last edge
        assert rg.bin_winner(
            "sweep", 2.0, experts=("rife", "rife_fast", "vfimamba")
        ) == "vfimamba"
        assert rg.bin_winner("nonexistent", 1.0) is None

    def test_bin_winner_margin_and_static_eps(self, tmp_path, monkeypatch):
        """Cost-aware semantics: a heavier expert must win its bin by
        margin_db (bin means carry noise), and below static_eps_px the
        bin average — dominated by the bin's real-motion pairs — does not
        extrapolate to zero motion, so the fast expert is returned even
        when the lowest bin favors the heavy one."""
        rg = self._write_gate(tmp_path, monkeypatch, {
            "expert_bins": {
                "native": [
                    # heavy wins the lowest bin by a LOT (real calibration
                    # shape: vfimamba +0.99 dB on 0..1.2px pairs)
                    {"motion_lo": 0.0, "motion_hi": 2.0, "count": 10,
                     "rife": 33.0, "vfimamba": 34.0},
                    # heavy wins by less than the margin -> not predictable
                    {"motion_lo": 2.0, "motion_hi": 8.0, "count": 10,
                     "rife": 24.0, "vfimamba": 24.1},
                    {"motion_lo": 8.0, "motion_hi": 1e9, "count": 10,
                     "rife": 22.0, "vfimamba": 23.5},
                ],
            },
        })
        assert rg.bin_winner("native", 0.0) == "rife"    # static eps
        assert rg.bin_winner("native", 0.2) == "rife"    # static eps
        assert rg.bin_winner("native", 1.0) == "vfimamba"  # real low-motion win
        assert rg.bin_winner("native", 5.0) == "rife"    # sub-margin win
        assert rg.bin_winner("native", 12.0) == "vfimamba"

    def test_committed_gate_routes_static_fast_and_hard_heavy(self):
        """The shipped calibration must keep static pairs on the fast
        expert while opening the heavy expert at hard-corpus motion
        (round-4 verdict Missing #2: vfimamba won every hard 1080p triplet
        yet a global boolean kept it closed)."""
        import vfisr_tpu.utils.router_gate as rg

        rg.clear_cache()
        if rg.expert_bins("native") is None:
            pytest.skip("expert bins not calibrated yet")
        assert rg.bin_winner("native", 0.0) == "rife"
        assert rg.bin_winner("native", 8.0) == "vfimamba"
        assert rg.bin_winner("native", 20.0) == "vfimamba"
        assert rg.bin_winner(
            "sweep", 2.5, experts=("rife", "rife_fast", "vfimamba")
        ) == "vfimamba"

    def test_bin_winner_uncalibrated(self, tmp_path, monkeypatch):
        import vfisr_tpu.utils.router_gate as rg

        monkeypatch.setattr(rg, "DEFAULT_PATH", tmp_path / "absent.json")
        rg.clear_cache()
        assert rg.bin_winner("native", 5.0) is None

    def test_routing_masks_follow_native_bins(self, tmp_path, monkeypatch):
        import jax.numpy as jnp

        self._write_gate(tmp_path, monkeypatch, self.BINS)
        from vfisr_tpu.models.novel.adaptive_pipeline import AdaptiveRouter

        router = AdaptiveRouter(quality_aware=True)
        sig = {
            "has_particles": jnp.asarray([False, False]),
            "motion_max": jnp.asarray([3.0, 30.0]),
            "motion_mean": jnp.asarray([0.5, 12.0]),
            "is_scene_change": jnp.asarray([False, False]),
        }
        masks = router.routing_masks(sig)
        got = np.asarray(masks["vfimamba"])
        # low-motion pair: bin says rife (even though nothing triggers);
        # high-motion pair: bin says vfimamba
        assert got.tolist() == [False, True]
        # reference behavior when not quality-aware: motion_max>25 triggers
        router_ref = AdaptiveRouter(quality_aware=False)
        got_ref = np.asarray(router_ref.routing_masks(sig)["vfimamba"])
        assert got_ref.tolist() == [False, True]

    def test_route_neural_expert_sweep(self, tmp_path, monkeypatch):
        self._write_gate(tmp_path, monkeypatch, self.BINS)
        from vfisr_tpu.harness.experiments import route_neural_expert

        assert route_neural_expert(2.0, True) == ("vfimamba", None)
        assert route_neural_expert(0.1, True)[0] == "rife"
        assert route_neural_expert(2.0, False) == ("rife", None)

    def test_pipeline_load_keeps_heavy_expert_when_bins_say_it_wins(
            self, tmp_path, monkeypatch):
        self._write_gate(tmp_path, monkeypatch, {
            "experts": {"rife": 33.0, "vfimamba": 30.7},  # global: inverted
            **self.BINS,
        })
        from vfisr_tpu.models.novel.adaptive_pipeline import AdaptivePipeline

        pipe = AdaptivePipeline(enable_vfimamba=True, quality_aware=True)
        pipe.load()
        # bins show vfimamba winning high-motion bins -> stays enabled
        # despite the inverted GLOBAL ranking
        assert pipe.enable_vfimamba is True

    def test_pipeline_load_disables_when_bins_never_favor_heavy(
            self, tmp_path, monkeypatch):
        bins = {
            "expert_bins": {
                "native": [
                    {"motion_lo": 0.0, "motion_hi": 1e9, "count": 20,
                     "rife": 30.0, "vfimamba": 28.0},
                ],
            },
        }
        self._write_gate(tmp_path, monkeypatch, bins)
        from vfisr_tpu.models.novel.adaptive_pipeline import AdaptivePipeline

        pipe = AdaptivePipeline(enable_vfimamba=True, quality_aware=True)
        pipe.load()
        assert pipe.enable_vfimamba is False
