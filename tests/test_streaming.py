"""Streaming pipeline (pipeline/streaming.py — the process.py engine):
fused flagship path, generic batched path, and decode-failure resilience.

Reference pipeline semantics: run_experiments.py:760-806 (ffmpeg-stdin
streaming with backpressure); here: decode thread + bounded queue +
double-buffered device dispatch.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_clip(tmp_path_factory):
    import cv2

    path = str(tmp_path_factory.mktemp("clips") / "in.mp4")
    rng = np.random.default_rng(3)
    base = cv2.resize(rng.integers(0, 256, (12, 16, 3), np.uint8), (128, 96),
                      interpolation=cv2.INTER_CUBIC)
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (128, 96))
    for i in range(8):
        vw.write(np.roll(base, 4 * i, axis=1))
    vw.release()
    return path


def _frame_count_and_size(path):
    import cv2

    cap = cv2.VideoCapture(path)
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    cap.release()
    return n, w, h


class TestStreaming:
    def test_generic_batched_path(self, tiny_clip, tmp_path):
        from vfisr_tpu.pipeline.streaming import process_video

        out = str(tmp_path / "out.mp4")
        stats = process_video(tiny_clip, out, method="lanczos",
                              target_fps=120, target_resolution=(170, 128),
                              max_frames=6)
        assert stats["pipeline"] == "writer_thread"
        # 5 pairs x (1 endpoint + 3 mids) + final endpoint = 21
        assert stats["output_frames"] == 21
        n, w, h = _frame_count_and_size(out)
        # every written frame must be fit() to the target size
        assert (n, w, h) == (21, 170, 128)
        assert stats["device_busy_fraction"] >= 0

    @pytest.mark.slow
    def test_flagship_uses_fused_step(self, tiny_clip, tmp_path):
        from vfisr_tpu.pipeline.streaming import process_video

        out = str(tmp_path / "out_flag.mp4")
        stats = process_video(tiny_clip, out, method="flagship",
                              target_fps=120, target_resolution=(170, 128),
                              max_frames=6)
        # the flagship must stream through its fused program (analysis +
        # scene/HUD composite + SR in one dispatch), not bare RIFE
        assert stats["pipeline"] == "fused_writer_thread"
        assert stats["output_frames"] == 21
        assert _frame_count_and_size(out) == (21, 170, 128)

    def test_i420_pack_matches_cv2(self):
        """Device-side I420 packing must agree with cv2's BT.601 video-range
        conversion (cv2.COLOR_RGB2YUV_I420), so the host-side
        cv2.COLOR_YUV2BGR_I420 decode reconstructs the true colors."""
        import cv2

        from vfisr_tpu.pipeline.streaming import _get_pack_i420

        # smooth gradient: isolates the matrix constants from chroma
        # subsampling differences
        y, x = np.mgrid[0:64, 0:96].astype(np.float32)
        rgb = np.stack([x * 2, y * 3, (x + y)], axis=-1)
        rgb = np.clip(rgb, 0, 255).astype(np.uint8)
        ours = np.asarray(_get_pack_i420()(rgb[None]))[0]
        ref = cv2.cvtColor(rgb, cv2.COLOR_RGB2YUV_I420)
        assert ours.shape == ref.shape
        assert np.max(np.abs(ours.astype(int) - ref.astype(int))) <= 2

    def test_i420_roundtrip_preserves_colors(self):
        import cv2

        from vfisr_tpu.pipeline.streaming import _get_pack_i420

        rng = np.random.default_rng(7)
        small = rng.integers(0, 256, (8, 12, 3), np.uint8)
        rgb = cv2.resize(small, (96, 64), interpolation=cv2.INTER_CUBIC)
        packed = np.asarray(_get_pack_i420()(rgb[None]))[0]
        bgr = cv2.cvtColor(packed, cv2.COLOR_YUV2BGR_I420)
        direct = cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR)
        mse = np.mean((bgr.astype(np.float32) - direct.astype(np.float32)) ** 2)
        psnr = 10 * np.log10(255.0**2 / max(mse, 1e-9))
        # chroma subsampling bounds fidelity; the encoder is 4:2:0 anyway
        assert psnr > 30, psnr

    def test_readback_format_forced_rgb(self, tiny_clip, tmp_path):
        from vfisr_tpu.pipeline.streaming import process_video

        out = str(tmp_path / "out_rgb.mp4")
        stats = process_video(tiny_clip, out, method="lanczos",
                              target_fps=120, target_resolution=(170, 128),
                              max_frames=4, readback="rgb")
        assert stats["readback_format"] == "rgb"
        assert stats["output_frames"] == 13

    def test_readback_auto_picks_yuv(self, tiny_clip, tmp_path):
        from vfisr_tpu.pipeline.streaming import process_video

        out = str(tmp_path / "out_yuv.mp4")
        stats = process_video(tiny_clip, out, method="lanczos",
                              target_fps=120, target_resolution=(170, 128),
                              max_frames=4)
        assert stats["readback_format"] == "yuv420"
        # I420 is 1.5 bytes/px vs RGB's 3: readback halves
        assert stats["readback_mb"] > 0
        assert _frame_count_and_size(out) == (13, 170, 128)

    @pytest.mark.filterwarnings(
        "ignore::pytest.PytestUnhandledThreadExceptionWarning")
    def test_decode_failure_does_not_deadlock(self, tiny_clip, tmp_path,
                                              monkeypatch):
        """A reader that dies mid-stream must still deliver the EOF
        sentinel — process_video finishes with the frames read so far
        instead of blocking forever on the queue."""
        from vfisr_tpu.data.video_io import VideoReader
        from vfisr_tpu.pipeline.streaming import process_video

        real_read = VideoReader.read
        calls = {"n": 0}

        def flaky_read(self):
            calls["n"] += 1
            if calls["n"] > 3:
                raise RuntimeError("simulated corrupt stream")
            return real_read(self)

        monkeypatch.setattr(VideoReader, "read", flaky_read)
        out = str(tmp_path / "out_flaky.mp4")
        stats = process_video(tiny_clip, out, method="lanczos",
                              target_fps=120, target_resolution=(170, 128))
        assert stats["input_frames"] == 3
        # 2 pairs x 4 + final endpoint
        assert stats["output_frames"] == 9
