"""LPIPS honesty: mode reporting, torch-checkpoint conversion round-trip,
and a correlation sanity check of random-features LPIPS against PSNR/SSIM
orderings on synthetic distortions (reference metric sources:
run_experiments.py:315-338, evaluation/metrics.py:129-159)."""

import numpy as np
import pytest

from vfisr_tpu.evaluation.lpips import (
    _ALEX_CFG,
    LPIPS,
    convert_torch_weights,
)
from vfisr_tpu.evaluation.metrics import compute_psnr_simple, compute_ssim_simple


def _smooth_frame(rng, h=96, w=128):
    base = rng.random((h // 8, w // 8, 3)).astype(np.float32)
    import cv2

    img = cv2.resize(base, (w, h), interpolation=cv2.INTER_CUBIC)
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


class TestMode:
    def test_random_features_mode_reported_without_weights(
        self, tmp_path, monkeypatch
    ):
        # with neither official weights nor calibrated heads on disk the
        # mode must say so (never silently conflated with real LPIPS)
        import vfisr_tpu.evaluation.lpips as lpips_mod

        monkeypatch.setattr(lpips_mod, "DEFAULT_WEIGHTS_PATH",
                            str(tmp_path / "lpips_alex.npz"))
        lp = LPIPS()
        assert lp.mode == "random_features"

    def test_calibrated_heads_mode_when_shipped(self, tmp_path):
        # the shipped lpips_heads.npz upgrades missing-official-weights
        # runs to calibrated_heads mode
        from vfisr_tpu.utils.paths import REPO_ROOT

        if not (REPO_ROOT / "weights" / "lpips_heads.npz").exists():
            import pytest

            pytest.skip("no calibrated heads shipped")
        lp = LPIPS(weights_path=str(tmp_path / "missing.npz"))
        assert lp.mode == "calibrated_heads"

    def test_sweep_results_carry_lpips_mode(self):
        # the per-experiment result dict must identify the LPIPS flavor
        import inspect

        from vfisr_tpu.harness.experiments import run_experiment

        assert "lpips_mode" in inspect.signature(run_experiment).parameters


class TestConversionRoundTrip:
    def test_convert_torch_layout_loads_as_official(self, tmp_path):
        rng = np.random.default_rng(0)
        # fabricate torch-layout state dicts (OIHW convs, lin1x1 heads)
        feat_idx = [0, 3, 6, 8, 10]  # torchvision AlexNet features indices
        alex_sd, lpips_sd = {}, {}
        in_ch = 3
        for i, (out_ch, k, _, _) in enumerate(_ALEX_CFG):
            alex_sd[f"features.{feat_idx[i]}.weight"] = rng.normal(
                0, 0.1, (out_ch, in_ch, k, k)
            ).astype(np.float32)
            alex_sd[f"features.{feat_idx[i]}.bias"] = np.zeros(out_ch, np.float32)
            lpips_sd[f"lin{i}.model.1.weight"] = rng.random(
                (1, out_ch, 1, 1)
            ).astype(np.float32)
            in_ch = out_ch
        out = tmp_path / "lpips_alex.npz"
        convert_torch_weights(lpips_sd, alex_sd, str(out))

        lp = LPIPS(weights_path=str(out))
        assert lp.mode == "official_weights"
        # converted OIHW -> HWIO exactly
        w0 = np.load(out)["conv0_w"]
        assert w0.shape == (
            _ALEX_CFG[0][1], _ALEX_CFG[0][1], 3, _ALEX_CFG[0][0]
        )
        np.testing.assert_allclose(
            w0, np.transpose(alex_sd["features.0.weight"], (2, 3, 1, 0))
        )
        a = _smooth_frame(np.random.default_rng(1))
        b = _smooth_frame(np.random.default_rng(2))
        d = float(lp(a, b)[0])
        assert np.isfinite(d) and d > 0
        assert float(lp(a, a)[0]) == pytest.approx(0.0, abs=1e-5)


class TestCorrelationSanity:
    def test_orders_noise_levels_like_psnr_ssim(self):
        """Random-features LPIPS must rank increasing distortion the same
        way PSNR/SSIM do — the property that makes it a usable proxy."""
        rng = np.random.default_rng(3)
        ref = _smooth_frame(rng)
        lp = LPIPS(weights_path="/nonexistent.npz")  # random_features
        lpips_vals, psnr_vals, ssim_vals = [], [], []
        for sigma in (2.0, 10.0, 40.0):
            noisy = np.clip(
                ref.astype(np.float32) + rng.normal(0, sigma, ref.shape), 0, 255
            ).astype(np.uint8)
            lpips_vals.append(float(lp(noisy, ref)[0]))
            psnr_vals.append(compute_psnr_simple(noisy, ref))
            ssim_vals.append(compute_ssim_simple(noisy, ref))
        assert lpips_vals == sorted(lpips_vals)  # increasing with distortion
        assert psnr_vals == sorted(psnr_vals, reverse=True)
        assert ssim_vals == sorted(ssim_vals, reverse=True)
        assert float(lp(ref, ref)[0]) == pytest.approx(0.0, abs=1e-5)
