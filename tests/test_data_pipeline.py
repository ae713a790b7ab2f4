"""Dataset pipeline contract tests (registry, intervals, triplets, video IO)."""

import json

import numpy as np
import pytest

from vfisr_tpu.data.preprocess_video import VideoPreprocessor
from vfisr_tpu.data.registry import ClipRegistry
from vfisr_tpu.data.video_io import VideoReader, VideoWriter, probe_video


@pytest.fixture(scope="module")
def tiny_clip(tmp_path_factory):
    """Synthetic 1080p@120fps clip (0.5 s) + data dir."""
    import cv2

    root = tmp_path_factory.mktemp("dataset")
    path = root / "clip.mp4"
    rng = np.random.default_rng(0)
    tex = cv2.resize(rng.integers(0, 256, (34, 60, 3), np.uint8), (2120, 1080),
                     interpolation=cv2.INTER_CUBIC)
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 120, (1920, 1080))
    for i in range(60):
        w.write(tex[:, (i * 2) % 200 : (i * 2) % 200 + 1920])
    w.release()
    return root, path


def test_video_io_roundtrip(tmp_path):
    path = tmp_path / "t.mp4"
    frames = [np.full((48, 64, 3), i * 25, np.uint8) for i in range(8)]
    with VideoWriter(str(path), 64, 48, 30) as w:
        for f in frames:
            w.write(f)
    meta = probe_video(str(path))
    assert (meta.width, meta.height) == (64, 48)
    assert meta.frame_count == 8
    with VideoReader(str(path)) as r:
        out = list(r)
    assert len(out) == 8
    # lossy codec: just check brightness ordering preserved
    assert out[0].mean() < out[-1].mean()


def test_register_validates(tiny_clip, tmp_path):
    root, path = tiny_clip
    reg = ClipRegistry(tmp_path / "data")
    entry = reg.register(path, "clip_a")
    assert entry["fps"] == 120.0
    assert reg.get_clip("clip_a")["clip_id"] == "clip_a"
    with pytest.raises(ValueError):
        reg.register(path, "clip_a")  # duplicate without force
    reg.register(path, "clip_a", force=True)
    assert len(reg.list_clips()) == 1


def test_extract_intervals_layout(tiny_clip, tmp_path):
    from vfisr_tpu.data.extract_intervals import IntervalExtractor, load_interval

    root, path = tiny_clip
    data_dir = tmp_path / "data"
    ClipRegistry(data_dir).register(path, "clip_b")
    ex = IntervalExtractor(data_dir)
    results = ex.extract_intervals("clip_b", count=1, duration=0.2,
                                  output_resolution=(320, 180), verbose=False)
    assert len(results) == 1
    meta = results[0]
    assert meta["keyframe_count"] >= 8
    assert abs(meta["keyframe_count"] - meta["midpoint_count"]) <= 1
    # on-disk contract
    idir = data_dir / "clips" / "clip_b" / "intervals" / "interval_0000"
    assert (idir / "keyframes" / "kf_0000.png").exists()
    assert (idir / "midpoints" / "gt_0000.png").exists()
    assert (idir / "motion" / "flow_stats.json").exists()
    assert (data_dir / "clips" / "clip_b" / "difficulty_index.json").exists()
    kf, mid, m2 = load_interval("clip_b", 0, data_dir)
    assert len(kf) == meta["keyframe_count"]
    assert kf[0].shape == (180, 320, 3)


def test_triplet_index_math(tiny_clip, tmp_path):
    root, path = tiny_clip
    pre = VideoPreprocessor(
        input_resolution=(320, 180), input_fps=30,
        target_resolution=(640, 360), target_fps=120,
        output_dir=tmp_path / "processed",
    )
    result = pre.process(str(path), clip_name="t")
    meta = result["metadata"]
    assert meta["temporal_scale"] == 4.0
    triplets = json.loads((tmp_path / "processed" / "t" / "triplets.json").read_text())
    assert triplets, "no triplets"
    t0 = triplets[0]
    # exact reference math: gt_start=round(i*4), 3 intermediates, positions k/4
    assert t0["gt_start_idx"] == 0 and t0["gt_end_idx"] == 4
    assert t0["gt_intermediate_indices"] == [1, 2, 3]
    assert t0["temporal_positions"] == [0.25, 0.5, 0.75]


def test_preprocess_refuses_fps_upsample(tiny_clip, tmp_path):
    root, path = tiny_clip
    pre = VideoPreprocessor(target_fps=240.0, output_dir=tmp_path / "p2")
    with pytest.raises(ValueError):
        pre.process(str(path))
