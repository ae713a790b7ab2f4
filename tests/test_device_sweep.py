"""Device-batched experiment path (harness/device_sweep.py): metric parity
with the per-frame host loop (harness/experiments.py::run_experiment) on
small synthetic intervals — same semantics, chunked device dispatches."""

import numpy as np
import pytest

from vfisr_tpu.harness.device_sweep import (
    DEVICE_METHODS,
    DeviceInterval,
    run_experiment_batched,
)
from vfisr_tpu.harness.experiments import run_experiment


def _interval(n_kf=7, h=144, w=256, seed=0):
    import cv2

    rng = np.random.default_rng(seed)
    base = (cv2.resize(rng.random((h // 8, w // 8, 3)).astype(np.float32),
                       (w, h), interpolation=cv2.INTER_CUBIC) * 255)
    kfs, mids = [], []
    for i in range(n_kf):
        f = np.roll(base, 3 * i, axis=1)
        kfs.append(np.clip(f, 0, 255).astype(np.uint8))
        if i < n_kf - 1:
            m = np.roll(base, 3 * i + 1, axis=1)  # between-frame content
            mids.append(np.clip(m, 0, 255).astype(np.uint8))
    return kfs, mids


EXP = {
    "linear_blend": {"name": "lanczos_blend", "vfi": "linear_blend",
                     "sr": "lanczos", "edge": 0,
                     "quality_resolution": (192, 108), "quality_fps": 60},
    "frame_dup": {"name": "degraded", "vfi": "frame_dup", "sr": "bicubic",
                  "edge": 0, "quality_resolution": (192, 108),
                  "quality_fps": 60},
    "control": {"name": "control", "vfi": "none", "sr": "lanczos", "edge": 0,
                "quality_resolution": (192, 108), "quality_fps": 60},
    "edge": {"name": "lanczos_blend_edge", "vfi": "linear_blend",
             "sr": "lanczos", "edge": 1.3,
             "quality_resolution": (192, 108), "quality_fps": 60},
    "optical_flow": {"name": "optical_flow_basic", "vfi": "optical_flow",
                     "sr": "lanczos", "edge": 0,
                     "quality_resolution": (192, 108), "quality_fps": 60},
}


@pytest.fixture(autouse=True)
def _small_degrade(monkeypatch):
    """cv2's INTER_AREA upscale is a special non-linear path; production
    degrades 1080p DOWN to 960x540. Keep the test in the downscale regime
    with small shapes by shrinking the degrade target in both modules."""
    import vfisr_tpu.harness.device_sweep as ds
    import vfisr_tpu.harness.experiments as ex

    for mod in (ds, ex):
        monkeypatch.setattr(mod, "INPUT_W", 128)
        monkeypatch.setattr(mod, "INPUT_H", 72)


class TestParityWithHostLoop:
    @pytest.mark.parametrize("case", ["linear_blend", "frame_dup", "control",
                                      "edge"])
    def test_metrics_match_host_loop(self, case):
        kfs, mids = _interval()
        exp = EXP[case]
        host = run_experiment(kfs, mids, exp, verbose=False)
        dev = run_experiment_batched(DeviceInterval(kfs, mids), exp,
                                     chunk_pairs=4)
        assert dev["device_batched"] is True
        assert dev["frames"] == host["frames"]
        assert dev["keyframes_evaluated"] == host["keyframes_evaluated"]
        assert dev["vfi_frames_evaluated"] == host["vfi_frames_evaluated"]
        for key in ("keyframe_psnr_db", "vfi_psnr_db", "overall_psnr_db"):
            if host[key] in (0, "inf"):
                assert dev[key] == host[key]
            else:
                assert dev[key] == pytest.approx(host[key], abs=0.35), key
        for key in ("keyframe_ssim", "vfi_ssim"):
            assert dev[key] == pytest.approx(host[key], abs=0.01), key

    def test_optical_flow_close_to_host(self):
        kfs, mids = _interval()
        exp = EXP["optical_flow"]
        host = run_experiment(kfs, mids, exp, verbose=False)
        dev = run_experiment_batched(DeviceInterval(kfs, mids), exp,
                                     chunk_pairs=4)
        # same flow, same warp math — small numeric drift allowed
        assert dev["vfi_psnr_db"] == pytest.approx(host["vfi_psnr_db"], abs=1.0)

    def test_video_output_and_schema(self, tmp_path):
        kfs, mids = _interval()
        out = tmp_path / "v.mp4"
        dev = run_experiment_batched(
            DeviceInterval(kfs, mids), EXP["linear_blend"],
            output_path=str(out), chunk_pairs=4)
        assert out.exists() and out.stat().st_size > 0
        for k in ("name", "frames", "time_s", "realtime_x", "rife_frames_pct",
                  "lpips_mode", "vfi_lpips", "overall_ssim"):
            assert k in dev

    def test_quality_aware_adaptive_routes_by_bins(self, monkeypatch,
                                                   tmp_path):
        """Per-motion-bin expert choice (round-4 verdict Missing #2):
        quality-aware adaptive must pick the measured bin winner per pair
        and report the expert mix. Experts are faked (no model loads) —
        this pins the routing plumbing, not expert quality."""
        import json

        import jax.numpy as jnp

        import vfisr_tpu.harness.device_sweep as ds
        import vfisr_tpu.utils.router_gate as rg

        gate = {
            "blend_vs_rife_crossover_px": 0.0,  # blend route closed
            "expert_bins": {"sweep": [
                {"motion_lo": 0.0, "motion_hi": 1e9, "count": 8,
                 "rife": 20.0, "rife_fast": 21.0, "vfimamba": 22.0},
            ]},
        }
        p = tmp_path / "gate.json"
        p.write_text(json.dumps(gate))
        monkeypatch.setattr(rg, "DEFAULT_PATH", p)
        rg.clear_cache()

        calls = []

        def _blend_mids(prev, curr):
            ts = jnp.asarray([0.25, 0.5, 0.75])[None, :, None, None, None]
            pf = prev.astype(jnp.float32)[:, None]
            cf = curr.astype(jnp.float32)[:, None]
            return pf * (1 - ts) + cf * ts

        def fake_rife(prev, curr, scale=0.5):
            calls.append(("rife", scale))
            return _blend_mids(prev, curr)

        def fake_mamba(prev, curr):
            calls.append(("vfimamba", None))
            return _blend_mids(prev, curr)

        monkeypatch.setattr(ds, "_rife_chunk", fake_rife)
        monkeypatch.setattr(ds, "_vfimamba_chunk", fake_mamba)

        kfs, mids = _interval()
        exp = {"name": "adaptive_aggressive", "vfi": "adaptive",
               "sr": "lanczos", "edge": 0, "motion_thresh": 1.5,
               "quality_aware": True,
               "quality_resolution": (192, 108), "quality_fps": 60}
        res = run_experiment_batched(DeviceInterval(kfs, mids), exp,
                                     chunk_pairs=4)
        mix = res["expert_mix"]
        assert sum(mix.values()) == res["vfi_frames_evaluated"]
        # the single bin says vfimamba wins everywhere -> every neural
        # pair routed to the heavy expert, none to plain rife
        assert mix["vfimamba"] == res["vfi_frames_evaluated"] - mix["blend"]
        assert mix["rife"] == 0 and mix["rife_fast"] == 0
        assert any(c[0] == "vfimamba" for c in calls)
        rg.clear_cache()

    def test_unsupported_method_raises(self):
        kfs, mids = _interval(n_kf=3)
        with pytest.raises(ValueError):
            run_experiment_batched(
                DeviceInterval(kfs, mids),
                {"name": "x", "vfi": "no_such_method",
                 "quality_resolution": (64, 64), "quality_fps": 60})
        assert "no_such_method" not in DEVICE_METHODS
        assert "ughi" in DEVICE_METHODS  # innovative methods are on-device


@pytest.mark.slow
class TestInnovativeMethodsDevicePath:
    """UAFI/UGHI/MCAR batched device branches vs the per-frame host loop.

    The device path computes flow once per pair and uses the windowed warp
    (vs the host's per-t gather warp), so tolerances are looser than the
    blend methods' — same algorithm, different warp kernel + f32 path.
    """

    @pytest.mark.parametrize("vfi,name", [("ui_aware", "uafi_default"),
                                          ("ughi", "ughi_default"),
                                          ("mcar", "mcar_default")])
    def test_close_to_host_loop(self, vfi, name):
        kfs, mids = _interval()
        exp = {"name": name, "vfi": vfi, "sr": "lanczos", "edge": 1.3,
               "mcar_low": 0.25, "mcar_high": 0.6,
               "quality_resolution": (192, 108), "quality_fps": 60}
        host = run_experiment(kfs, mids, exp, verbose=False)
        dev = run_experiment_batched(DeviceInterval(kfs, mids), exp,
                                     chunk_pairs=4)
        assert dev["device_batched"] is True
        assert dev["vfi_frames_evaluated"] == host["vfi_frames_evaluated"]
        assert dev["vfi_psnr_db"] == pytest.approx(host["vfi_psnr_db"], abs=1.5)
        assert dev["vfi_ssim"] == pytest.approx(host["vfi_ssim"], abs=0.02)
        if vfi == "mcar":
            assert dev["rife_frames_pct"] == pytest.approx(
                host["rife_frames_pct"], abs=1e-6)

    def test_uafi_ui_source_is_curr_at_half(self):
        """Regression: the UI-region source at t=0.5 must be the CURRENT
        frame (host rule x0 if t < 0.5 else x1) — a blinking HUD element
        (content change, near-zero flow) must show its curr value in the
        evaluated midpoint, not its prev value."""
        import jax.numpy as jnp

        from vfisr_tpu.harness import device_sweep as ds

        kfs, _ = _interval(n_kf=3)
        h, w = kfs[0].shape[:2]
        # static background (zero flow -> mag < 2 everywhere) + blinking
        # HUD box (recon_err > 30 inside) -> UI mask == the box
        kfs = [kfs[0].copy() for _ in kfs]
        for i, f in enumerate(kfs):
            f[h // 2 - 24:h // 2 + 24, w // 2 - 40:w // 2 + 40] = (
                60 if i % 2 == 0 else 200)
        src = jnp.asarray(np.stack(kfs))
        out_hw = (h, w)  # SR identity keeps the box addressable
        res = ds._chunk_program(
            src, src, src[1:][:, :, :, :], jnp.zeros((2, 3, h, w, 3)),
            vfi="ui_aware", interp="lanczos4", edge=0.0, out_hw=out_hw,
            is_control=True, motion_thresh=3.0, mcar_low=0.3, mcar_high=0.7,
            want_frames=False,
        )
        mid_half = np.asarray(res["mid_half_u8"])  # [K=2, h, w, 3]
        box = mid_half[0, h // 2 - 12:h // 2 + 12, w // 2 - 20:w // 2 + 20]
        # pair 0: prev box = 60, curr box = 200, blend = 130. Farneback
        # reads the blink as motion so only part of the box passes the
        # mag<2 gate — but every masked pixel must come verbatim from
        # CURR (200), never PREV (60).
        frac_curr = (box == 200).mean()
        frac_prev = (box == 60).mean()
        assert frac_curr > 0.05, f"UI mask never composited curr ({frac_curr})"
        assert frac_prev < 0.01, f"UI pixels sourced from prev ({frac_prev})"
