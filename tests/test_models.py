"""Model contract tests, mirroring reference tests/test_models.py plus
neural-model coverage the reference lacks (it skips all GPU models)."""

import numpy as np
import pytest

from vfisr_tpu.models.registry import get_model, list_models
from vfisr_tpu.models.traditional.baselines import (
    BicubicBaseline,
    LanczosBaseline,
    OpticalFlowVFI,
    get_traditional_models,
)


@pytest.fixture(scope="module")
def small_pair():
    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, (24, 32, 3), np.uint8)
    import cv2

    f0 = cv2.resize(base, (128, 96), interpolation=cv2.INTER_CUBIC)
    f1 = np.roll(f0, 5, axis=1)
    return f0, f1


class TestTraditional:
    def test_metadata(self):
        b = BicubicBaseline()
        assert b.info.name == "Bicubic"
        assert b.info.type == "traditional"
        assert not b.info.supports_vfi
        assert b.info.supports_sr
        assert b.info.parameters == 0
        assert OpticalFlowVFI().info.supports_vfi

    @pytest.mark.parametrize("scale", [1.0, 1.333, 1.5, 2.0])
    def test_upscale_dims(self, small_pair, scale):
        f0, _ = small_pair
        for cls in (BicubicBaseline, LanczosBaseline):
            m = cls()
            m.load()
            out = m.upscale(f0, scale)
            assert out.shape == (int(96 * scale), int(128 * scale), 3)
            assert out.dtype == np.uint8

    def test_interpolation_count(self, small_pair):
        f0, f1 = small_pair
        for n in (1, 3, 5):
            m = BicubicBaseline()
            m.load()
            frames = m.interpolate(f0, f1, num_frames=n)
            assert len(frames) == n
            assert all(f.shape == f0.shape and f.dtype == np.uint8 for f in frames)

    def test_blend_midpoint_matches_cv2(self, small_pair):
        import cv2

        f0, f1 = small_pair
        m = BicubicBaseline()
        m.load()
        mid = m.interpolate(f0, f1, num_frames=1)[0]
        ref = cv2.addWeighted(f0.astype(np.float32), 0.5, f1.astype(np.float32), 0.5, 0).astype(
            np.uint8
        )
        assert np.abs(mid.astype(int) - ref.astype(int)).max() <= 1

    def test_lanczos_differs_from_bicubic(self, small_pair):
        f0, _ = small_pair
        b = BicubicBaseline(); b.load()
        l = LanczosBaseline(); l.load()
        assert not np.array_equal(b.upscale(f0, 1.5), l.upscale(f0, 1.5))

    def test_optical_flow_moves_content(self):
        """Moving white square: flow VFI should track it (reference
        test_models.py:105-113)."""
        f0 = np.zeros((96, 128, 3), np.uint8)
        f1 = np.zeros((96, 128, 3), np.uint8)
        f0[40:56, 30:46] = 255
        f1[40:56, 46:62] = 255
        m = OpticalFlowVFI()
        m.load()
        mid = m.interpolate(f0, f1, num_frames=1)[0]
        # the midpoint must keep the square's mass inside the motion
        # corridor (flow on featureless content is ambiguous, so only the
        # corridor — not the exact position — is asserted)
        mid_gray = mid.mean(axis=2)
        assert mid_gray[38:58, 24:70].mean() > 20
        assert mid_gray[0:20, :].mean() < 5
        assert mid_gray.sum() > 0.5 * f0.mean(axis=2).sum()

    def test_process_pair(self, small_pair):
        f0, f1 = small_pair
        m = LanczosBaseline()
        m.load()
        res = m.process_pair(f0, f1, num_intermediate=3, target_scale=1.333)
        assert len(res.frames) == 5  # f0 + 3 mids + f1
        assert res.frames[0].shape == (int(96 * 1.333), int(128 * 1.333), 3)
        assert res.inference_time_ms > 0
        assert res.model_used == "Lanczos"

    def test_unloaded_raises(self, small_pair):
        f0, f1 = small_pair
        with pytest.raises(RuntimeError):
            BicubicBaseline().process_pair(f0, f1)

    def test_factory(self):
        models = get_traditional_models()
        assert set(models) == {"bicubic", "lanczos", "optical_flow"}


class TestRegistry:
    def test_list(self):
        names = list_models()
        for expected in ("bicubic", "lanczos", "optical_flow", "rife", "vfimamba",
                         "span", "safa", "adaptive", "rife_span"):
            assert expected in names

    def test_unknown_raises(self):
        with pytest.raises(KeyError):
            get_model("nope")


class TestNeural:
    """Neural models on tiny inputs (the reference has NO such tests —
    its wrappers cannot run without external clones)."""

    def test_rife_lite_forward(self, small_pair):
        f0, f1 = small_pair
        m = get_model("rife_lite")
        m.load()
        assert m.info.parameters > 1_000_000
        frames = m.interpolate(f0, f1, num_frames=3)
        assert len(frames) == 3
        assert frames[0].shape == f0.shape and frames[0].dtype == np.uint8
        # deterministic across instances with same seed
        m2 = get_model("rife_lite")
        m2.load()
        frames2 = m2.interpolate(f0, f1, num_frames=3)
        assert np.array_equal(frames[1], frames2[1])

    def test_span_upscale(self, small_pair):
        f0, _ = small_pair
        m = get_model("span")
        m.load()
        info = m.info
        assert 300_000 < info.parameters < 600_000, f"SPAN params {info.parameters}"
        out = m.upscale(f0, 1.333)
        assert out.shape == (int(96 * 1.333), int(128 * 1.333), 3)
        out2x = m.upscale(f0, 2.0)
        assert out2x.shape == (192, 256, 3)

    @pytest.mark.slow
    def test_vfimamba_small_forward(self, small_pair):
        f0, f1 = small_pair
        m = get_model("vfimamba_s")
        m.load()
        assert m.info.parameters > 3_000_000
        frames = m.interpolate(f0, f1, num_frames=1)
        assert frames[0].shape == f0.shape

    @pytest.mark.slow
    def test_vfimamba_internal_area_cap(self, small_pair):
        """Above MAX_INTERNAL_AREA the trunk runs downscaled and the
        midpoints come back at full resolution (the r5d OOM guard) —
        and near the static limit the capped output still ≈ the inputs."""
        f0, f1 = small_pair  # 96x128
        m = get_model("vfimamba_s")
        m.max_internal_area = 64 * 64  # force the guard at test shapes
        m.load()
        frames = m.interpolate(f0, f0, num_frames=1)
        assert frames[0].shape == f0.shape
        # static pair: interpolation ≈ identity survives the down/up trip
        err = np.abs(frames[0].astype(np.float32) - f0.astype(np.float32))
        assert err.mean() < 16.0, f"capped static-pair drift {err.mean():.1f}"

    def test_safa_joint(self, small_pair):
        f0, f1 = small_pair
        m = get_model("safa")
        m.load()
        assert m.info.supports_joint
        frames = m.joint_process(f0, f1, num_intermediate=3, target_scale=1.333)
        assert len(frames) == 5
        assert frames[0].shape == (int(96 * 1.333), int(128 * 1.333), 3)
        vfi_only = m.interpolate(f0, f1, num_frames=1)
        assert vfi_only[0].shape == f0.shape

    @pytest.mark.slow
    def test_safa_tiled_matches_direct(self, small_pair):
        """Tiled overlap-blend joint forward (the 1080p HBM-fit path) must
        agree with the single-dispatch forward away from seam context."""
        import jax.numpy as jnp
        import numpy as np

        f0, f1 = small_pair  # 96x128
        m = get_model("safa")
        m.load()
        x0 = jnp.asarray(f0, jnp.float32)[None] / 255.0
        x1 = jnp.asarray(f1, jnp.float32)[None] / 255.0
        ts = jnp.asarray([0.5], jnp.float32)
        direct = np.asarray(m._apply(m.params, x0, x1, ts))
        tiled = np.asarray(
            m._joint_2x_tiled(x0, x1, ts, tile_hw=(48, 64), overlap=16))
        assert tiled.shape == direct.shape == (1, 192, 256, 3)
        mse = float(np.mean((tiled - direct) ** 2))
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        # tiles see different flow context; overlap blending keeps the
        # disagreement at a noise-floor level, not a visible seam
        assert psnr > 30.0, psnr

    def test_safa_large_input_uses_tiling(self, small_pair):
        f0, f1 = small_pair
        m = get_model("safa", tile_px_budget=96 * 128 - 1)
        m.load()
        frames = m.joint_process(f0, f1, num_intermediate=1, target_scale=2.0)
        assert len(frames) == 3
        assert frames[0].shape == (192, 256, 3)


class TestRIFEScale:
    """Reference Model.inference(..., scale=) knob (rife_wrapper.py:146)."""

    def test_scale_variants_differ_and_share_params(self):
        import numpy as np

        from vfisr_tpu.models.sota.rife import RIFELiteModel

        m = RIFELiteModel(device="cpu")
        m.load()
        rng = np.random.default_rng(0)
        f0 = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        f1 = np.roll(f0, 3, axis=1)
        full = m.interpolate(f0, f1, 1, [0.5], scale=1.0)[0]
        half = m.interpolate(f0, f1, 1, [0.5], scale=0.5)[0]
        assert full.shape == half.shape == f0.shape
        assert full.dtype == half.dtype
        # coarser pyramid -> different flow -> different output
        assert np.abs(full.astype(int) - half.astype(int)).max() > 0
        # variant cache: same params object, one cached program per scale
        assert 0.5 in m._apply_variants
        _, cfg = m._apply_variants[0.5]
        assert cfg.scales == tuple(s * 2 for s in m.CONFIG.scales)

    def test_harness_scale_translation(self):
        from vfisr_tpu.harness.experiments import _rife_native_scale

        assert _rife_native_scale(0.5) == 1.0   # reference default = trained point
        assert _rife_native_scale(0.25) == 0.5  # fast mode: one level coarser
        assert _rife_native_scale(1.0) == 1.0   # capped at full pyramid


class TestVramPeakReporting:
    """vram_peak_mb must be real (reference base.py:140-156 reports CUDA
    peak per run; VERDICT r3 found every committed row at 0.0)."""

    def test_process_pair_reports_nonzero_peak(self):
        from vfisr_tpu.models.traditional.baselines import LanczosBaseline

        m = LanczosBaseline(device="cpu")
        m.load()
        rng = np.random.default_rng(0)
        f0 = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        f1 = np.roll(f0, 2, axis=1)
        res = m.process_pair(f0, f1, num_intermediate=1, target_scale=1.333)
        assert res.vram_peak_mb > 0, res.vram_peak_mb

    def test_peak_is_monotone_high_water(self):
        from vfisr_tpu.models.base import device_peak_mb

        a = device_peak_mb()
        b = device_peak_mb()
        assert b >= a >= 0
