"""Synthetic data generators: hard eval clip + detail training scenes.

Round-2 finding: smooth synthetic content let linear blends tie neural VFI
and gave SR nothing to learn (span_x2 == Lanczos). These tests pin the
fixed generators' contracts: the hard renderer's difficulty-bearing
structure, and the SR scene generator's reconstruction headroom over a
fixed resampler.
"""

import numpy as np
import pytest


class TestDeviceDetailScenes:
    def test_detail_changes_scene(self):
        import jax

        from vfisr_tpu.train.device_data import device_synthetic_batch

        key = jax.random.PRNGKey(0)
        b1 = device_synthetic_batch(key, 2, 96, detail=0.9)
        b0 = device_synthetic_batch(key, 2, 96, detail=0.0)
        assert not np.allclose(np.asarray(b1["gt"]), np.asarray(b0["gt"]))
        for k in ("img0", "img1", "gt"):
            arr = np.asarray(b1[k])
            assert arr.shape == (2, 96, 96, 3)
            assert arr.min() >= 0.0 and arr.max() <= 1.0

    def test_sr_scenes_have_lanczos_headroom(self):
        """Crisp SR scenes must contain detail a fixed Lanczos resampler
        cannot reconstruct (else an SR net has nothing to learn)."""
        import jax
        import jax.numpy as jnp

        from vfisr_tpu.core.resize import resize
        from vfisr_tpu.train.device_data import device_sr_batch

        def recon_psnr(hr):
            lr = resize(hr, (hr.shape[1] // 2, hr.shape[2] // 2), "area")
            rec = resize(lr, hr.shape[1:3], "lanczos4")
            return 10 * np.log10(1.0 / float(jnp.mean((rec - hr) ** 2)))

        key = jax.random.PRNGKey(0)
        crisp = device_sr_batch(key, 4, 96, detail=0.6)["gt"]
        smooth = device_sr_batch(key, 4, 96, detail=0.0)["gt"]
        assert recon_psnr(smooth) - recon_psnr(crisp) >= 2.0

    def test_sr_batch_range_and_determinism(self):
        import jax

        from vfisr_tpu.train.device_data import device_sr_batch

        a = np.asarray(device_sr_batch(jax.random.PRNGKey(5), 2, 64)["gt"])
        b = np.asarray(device_sr_batch(jax.random.PRNGKey(5), 2, 64)["gt"])
        assert np.array_equal(a, b)
        assert a.min() >= 0.0 and a.max() <= 1.0


class TestHardClipRenderer:
    def test_speed_profile_difficulty_mix(self):
        """Pair-flow distribution of the scripted camera path must land in
        the reference interval's regime (mean ~13 px, hard fraction ~1/3;
        arc_raiders meta.json: 12.9 px / 31.4%)."""
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
        from make_synthetic_clip import _speed_profile

        rng = np.random.default_rng(0)
        fps = 60
        v = _speed_profile(720, fps, 0.45, 0.80, rng)
        pair_flow = np.abs(v) / (fps / 2.0)
        assert 10.0 <= pair_flow.mean() <= 16.0, pair_flow.mean()
        hard = float((pair_flow >= 15.0).mean())
        assert 0.2 <= hard <= 0.45, hard

    def test_routing_profile_strata(self):
        """The routing preset must contain TRUE static pairs (frozen world)
        plus a reference-regime moving mix, interleaved so any 2 s prefix
        spans static+medium+hard (the --max-frames window)."""
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
        from make_synthetic_clip import _routing_speed_profile

        fps = 60
        v, adv = _routing_speed_profile(720, fps)
        pair_flow = np.abs(v) / (fps / 2.0)
        static = float((pair_flow < 1.0).mean())
        assert 0.08 <= static <= 0.18, static
        # frozen world exactly where speed is zero
        assert np.array_equal(adv, pair_flow > 0)
        assert 11.0 <= pair_flow.mean() <= 16.0, pair_flow.mean()
        hard = float((pair_flow >= 15.0).mean())
        assert 0.25 <= hard <= 0.45, hard
        # first 2 s (one --max-frames 60 source window) is representative
        head = pair_flow[: 2 * fps]
        assert (head < 1.0).any() and (head >= 15.0).any() and (
            (head >= 5.0) & (head < 15.0)).any()
        # pan direction alternates between cycles (reversal coverage)
        assert (v > 0).any() and (v < 0).any()

    def test_render_tiny_routing_clip(self, tmp_path):
        import cv2

        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
        from make_synthetic_clip import render_hard_clip

        out = tmp_path / "routing.mp4"
        n = render_hard_clip(str(out), seconds=0.3, fps=30, width=480,
                             height=400, seed=3, profile="routing")
        assert n == 9
        cap = cv2.VideoCapture(str(out))
        frames = []
        while True:
            ok, f = cap.read()
            if not ok:
                break
            frames.append(f.astype(np.float32))
        cap.release()
        assert len(frames) == 9
        # 0.3 s at 30 fps sits inside the first static block: the world is
        # frozen, only the HUD spinner animates -> consecutive frames are
        # near-identical outside the spinner box but NOT bitwise-identical
        d = np.abs(frames[1] - frames[0])
        assert d.max() > 0  # spinner moved (finite PSNR guaranteed)
        h, w = d.shape[:2]
        spinner = d[: h // 3, 2 * w // 3:]
        outside = d.copy()
        outside[: h // 3, 2 * w // 3:] = 0
        # only mp4v codec noise outside the spinner (lossy on detailed
        # texture, ~2-3 mean abs — same as real captured footage), while
        # the spinner region has true motion (high-contrast line moved)
        assert outside.mean() < 4.0, outside.mean()
        assert spinner.max() > 50.0, spinner.max()

    def test_render_tiny_hard_clip(self, tmp_path):
        import cv2

        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
        from make_synthetic_clip import render_hard_clip

        out = tmp_path / "hard.mp4"
        n = render_hard_clip(str(out), seconds=0.3, fps=30, width=480,
                             height=400, seed=3)
        assert n == 9
        cap = cv2.VideoCapture(str(out))
        ok, frame = cap.read()
        cap.release()
        assert ok and frame.shape == (400, 480, 3)
        # high-frequency content: mean abs horizontal gradient well above
        # a blurred-noise scene's (~6 at uint8 scale on the smooth preset)
        grad = np.abs(np.diff(frame.astype(np.float32), axis=1)).mean()
        assert grad > 8.0, grad
