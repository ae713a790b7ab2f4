"""Tests for the perceptual-study GUIs (gui/web_app.py, gui/video_blind_study.py)
and the clip-cutting reuse surface (gui/benchmark_proper.py:33-43).

The reference ships these as Flask apps with no tests (SURVEY.md §2.8, §4);
here the study flow — pair building, side shuffling, ranking-based scoring,
JPEG frame serving, Range-request video streaming, quiz tokens, result
persistence — is covered against tiny synthetic clips so the suite stays
CPU-cheap and hermetic.
"""

import json
import sys
import threading
import urllib.error
import urllib.request
from pathlib import Path

import cv2
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "gui"))

import web_app  # noqa: E402
import video_blind_study as vbs  # noqa: E402
import benchmark_proper  # noqa: E402


# ---------------------------------------------------------------- fixtures
@pytest.fixture
def processed_clip(tmp_path):
    """Tiny data/processed-layout clip: 4 input frames, 3 GT frames."""
    clip = tmp_path / "processed" / "mini"
    in_dir = clip / "input_1080p30" / "frames"
    gt_dir = clip / "ground_truth" / "frames"
    in_dir.mkdir(parents=True)
    gt_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
    triplets = []
    for i in range(4):
        frame = np.roll(base, i * 3, axis=1)
        cv2.imwrite(str(in_dir / f"frame_{i:05d}.png"), frame)
    for i in range(3):
        frame = np.roll(base, i * 3 + 1, axis=1)
        cv2.imwrite(str(gt_dir / f"frame_{i:05d}.png"), frame)
    for i in range(2):
        triplets.append({
            "triplet_id": i,
            "input_frame_0": f"frame_{i:05d}.png",
            "input_frame_1": f"frame_{i + 1:05d}.png",
            "gt_intermediate": [f"frame_{i:05d}.png"],
        })
    (clip / "triplets.json").write_text(json.dumps(triplets))
    (clip / "metadata.json").write_text(json.dumps({"clip_id": "mini"}))
    return tmp_path / "processed"


@pytest.fixture
def tiny_mp4(tmp_path):
    """~1s 8fps mp4 written through cv2 (the repo's video backend)."""
    path = tmp_path / "vid" / "control.mp4"
    path.parent.mkdir(parents=True)
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 8.0,
                        (96, 64))
    assert w.isOpened()
    for i in range(8):
        frame = np.full((64, 96, 3), i * 30 % 255, dtype=np.uint8)
        w.write(frame)
    w.release()
    return path


def _serve(handler_cls):
    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer(("127.0.0.1", 0), handler_cls)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server, f"http://127.0.0.1:{server.server_address[1]}"


def _get(url, headers=None):
    req = urllib.request.Request(url, headers=headers or {})
    with urllib.request.urlopen(req) as r:
        return r.status, dict(r.headers), r.read()


def _post(url, obj=None):
    body = json.dumps(obj or {}).encode()
    req = urllib.request.Request(url, data=body,
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        return r.status, json.loads(r.read())


# ---------------------------------------------------------- web_app (image)
def test_study_state_pairs_and_scoring(processed_clip, tmp_path):
    state = web_app.StudyState(
        data_dir=processed_clip, out_dir=tmp_path / "out",
        methods=["degraded", "lanczos_blend"], num_pairs=2, seed=7)
    assert state.clips() == ["mini"]
    state.set_clip("mini")
    assert len(state.pairs) == 2
    # ranking: lanczos_blend(9) > degraded(1) — correct side must win
    p = state.pairs[0]
    better = "left" if p["model_a"] == "lanczos_blend" else "right"
    res, code = state.guess(p["idx"], better)
    assert code == 200 and res["correct"] and res["score"] == 1
    res, _ = state.guess(state.pairs[1]["idx"], "same")
    assert not res["correct"]  # ranks differ, "same" is wrong
    summary = state.results()
    assert summary["total"] == 2 and summary["score"] == 1
    saved = state.save()
    data = json.loads(Path(saved["path"]).read_text())
    assert data["sessions"][0]["score"] == 1


def test_study_state_shuffle_resets_score(processed_clip, tmp_path):
    state = web_app.StudyState(
        data_dir=processed_clip, out_dir=tmp_path / "out",
        methods=["degraded", "lanczos_blend"], num_pairs=2, seed=3)
    state.set_clip("mini")
    state.guess(state.pairs[0]["idx"], "left")
    assert state.total == 1
    state.shuffle()
    assert state.total == 0 and state.score == 0


def test_web_app_http_flow(processed_clip, tmp_path):
    state = web_app.StudyState(
        data_dir=processed_clip, out_dir=tmp_path / "out",
        methods=["degraded", "lanczos_blend"], num_pairs=2, seed=1)
    server, base = _serve(web_app.make_handler(state))
    try:
        status, _, body = _get(base + "/")
        assert status == 200 and b"blind study" in body.lower()
        _, clips = _post(base + "/api/clip", {"clip": "mini"})
        assert clips["pairs"] == 2
        status, _, body = _get(base + "/api/pairs")
        pairs = json.loads(body)["pairs"]
        assert {p["model_a"] for p in pairs} <= {"degraded", "lanczos_blend"}
        # frame endpoint serves JPEGs for both sides + ground truth
        for pos in ("left", "right", "gt"):
            status, headers, body = _get(f"{base}/api/frame/0/{pos}")
            assert status == 200
            assert headers["Content-Type"] == "image/jpeg"
            assert body[:2] == b"\xff\xd8"  # JPEG SOI
        _, res = _post(base + "/api/guess",
                       {"pair_idx": 0, "choice": "left"})
        assert res["total"] == 1
        _, saved = _post(base + "/api/save")
        assert Path(saved["path"]).exists()
    finally:
        server.shutdown()


# ------------------------------------------------- video_blind_study (video)
def test_video_study_quiz_and_range_streaming(tiny_mp4, tmp_path):
    bench_dir = tiny_mp4.parent
    meta = {"clips": {"mini": {"videos": {"control": str(tiny_mp4)},
                               "metrics": {}, "interval": 0}}}
    (bench_dir / "clips_metadata.json").write_text(json.dumps(meta))
    state = vbs.AppState(benchmark_dir=bench_dir,
                         results_path=tmp_path / "absent.json",
                         full_dir=tmp_path / "nofull",
                         out_dir=tmp_path / "out")
    assert state.models() == ["control"]

    server, base = _serve(vbs.make_handler(state))
    try:
        status, _, body = _get(base + "/api/metadata")
        assert status == 200 and "mini" in json.loads(body)["clips"]
        # full fetch then a Range request (reference streams via 206 chunks)
        size = tiny_mp4.stat().st_size
        status, headers, body = _get(base + "/api/video/control")
        assert status == 200 and len(body) == size
        status, headers, body = _get(base + "/api/video/control",
                                     {"Range": "bytes=0-99"})
        assert status == 206 and len(body) == 100
        assert headers["Content-Range"] == f"bytes 0-99/{size}"
        with pytest.raises(urllib.error.HTTPError) as exc:
            _get(base + "/api/video/missing_model")
        assert exc.value.code == 404
    finally:
        server.shutdown()

    # quiz flow: token -> answer -> score (single model, so always correct)
    token = state.quiz_start()
    assert token in state.quiz
    res, code = state.quiz_guess(token, "control")
    assert code == 200 and res["correct"] and res["score"] == 1
    res, code = state.quiz_guess(token, "control")  # token consumed
    assert code == 400
    saved = state.quiz_save()
    assert json.loads(Path(saved["path"]).read_text())["sessions"]


def test_video_study_reprocess_guard(tmp_path):
    state = vbs.AppState(benchmark_dir=tmp_path, out_dir=tmp_path / "out")
    state.processing = {"active": True, "progress": 50, "message": "busy"}
    # 409 semantics (reference video_blind_study.py:1915-1925)
    assert state.start_reprocess([]) is False


# --------------------------------------------- benchmark_proper clip utils
def test_video_duration_and_extract_clip(tiny_mp4, tmp_path):
    duration = benchmark_proper.get_full_video_duration(tiny_mp4)
    assert duration == pytest.approx(1.0, abs=0.3)
    out = tmp_path / "cut.mp4"
    ok = benchmark_proper.extract_clip(tiny_mp4, None, 0.25, 0.5, out)
    assert ok and out.exists()
    cut = benchmark_proper.get_full_video_duration(out)
    assert 0 < cut <= duration
