"""Video decode/encode abstraction.

The reference shells out to ffmpeg/ffprobe for all codec work
(register_clip.py:15-52 probe; run_experiments.py:788-806 streaming encode
pipe; preprocess_video.py:211-325 transcode). This module provides the same
roles behind one interface with two backends:

- ``ffmpeg`` subprocess (used automatically when the binary exists —
  preserves the reference's exact encoder settings), and
- OpenCV ``VideoCapture``/``VideoWriter`` (always available in this image,
  which has no ffmpeg binary).

The writer is *streaming* — frames go out as they are produced, preserving
the reference's "never buffer the output video in RAM" design
(run_experiments.py:760-766).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
from dataclasses import dataclass
from typing import Iterator, Optional, Tuple

import cv2
import numpy as np

FFMPEG = shutil.which("ffmpeg")
FFPROBE = shutil.which("ffprobe")


@dataclass
class VideoMeta:
    width: int
    height: int
    fps: float
    frame_count: int
    duration_s: float
    codec: str = "unknown"

    def to_dict(self) -> dict:
        return {
            "width": self.width,
            "height": self.height,
            "fps": self.fps,
            "frame_count": self.frame_count,
            "duration_s": self.duration_s,
            "codec": self.codec,
        }


def probe_video(path: str) -> VideoMeta:
    """ffprobe-equivalent metadata probe (register_clip.py:15-52 semantics,
    incl. fractional-fps handling)."""
    if FFPROBE:
        cmd = [
            FFPROBE, "-v", "quiet", "-print_format", "json",
            "-show_format", "-show_streams", str(path),
        ]
        result = subprocess.run(cmd, capture_output=True, text=True)
        if result.returncode == 0:
            data = json.loads(result.stdout)
            vs = next(
                (s for s in data.get("streams", []) if s.get("codec_type") == "video"),
                None,
            )
            if vs:
                fps_str = vs.get("r_frame_rate", "30/1")
                if "/" in fps_str:
                    num, den = map(int, fps_str.split("/"))
                    fps = num / den if den else 30.0
                else:
                    fps = float(fps_str)
                duration = float(data.get("format", {}).get("duration", 0))
                return VideoMeta(
                    width=int(vs.get("width", 0)),
                    height=int(vs.get("height", 0)),
                    fps=round(fps, 2),
                    frame_count=int(vs.get("nb_frames", 0)) or int(fps * duration),
                    duration_s=duration,
                    codec=vs.get("codec_name", "unknown"),
                )
    cap = cv2.VideoCapture(str(path))
    if not cap.isOpened():
        raise RuntimeError(f"cannot open video: {path}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    count = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    meta = VideoMeta(
        width=int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
        height=int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
        fps=round(fps, 2),
        frame_count=count,
        duration_s=count / fps if fps else 0.0,
        codec="unknown",
    )
    cap.release()
    return meta


class VideoReader:
    """Sequential RGB frame reader with seek-by-frame."""

    def __init__(self, path: str, start_frame: int = 0):
        self.path = str(path)
        self.cap = cv2.VideoCapture(self.path)
        if not self.cap.isOpened():
            raise RuntimeError(f"cannot open video: {path}")
        if start_frame:
            self.cap.set(cv2.CAP_PROP_POS_FRAMES, start_frame)

    @property
    def fps(self) -> float:
        return self.cap.get(cv2.CAP_PROP_FPS) or 30.0

    @property
    def frame_count(self) -> int:
        return int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))

    def read(self) -> Optional[np.ndarray]:
        """Next frame as HWC uint8 RGB, or None at EOF."""
        ok, frame = self.cap.read()
        if not ok:
            return None
        return cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            f = self.read()
            if f is None:
                return
            yield f

    def close(self):
        self.cap.release()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


class VideoWriter:
    """Streaming RGB frame writer.

    ffmpeg backend reproduces the reference's encoder invocation
    (libx264 -crf 18 -preset fast, run_experiments.py:788-806); cv2
    backend uses mp4v (the only encoder in this image).
    """

    def __init__(self, path: str, width: int, height: int, fps: float, crf: int = 18):
        self.path = str(path)
        self.size = (width, height)
        self.fps = fps
        self._proc = None
        self._writer = None
        os.makedirs(os.path.dirname(os.path.abspath(self.path)), exist_ok=True)
        if FFMPEG:
            cmd = [
                FFMPEG, "-y", "-f", "rawvideo", "-vcodec", "rawvideo",
                "-s", f"{width}x{height}", "-pix_fmt", "rgb24", "-r", str(fps),
                "-i", "-", "-an", "-vcodec", "libx264", "-preset", "fast",
                "-crf", str(crf), "-pix_fmt", "yuv420p", self.path,
            ]
            self._proc = subprocess.Popen(
                cmd, stdin=subprocess.PIPE,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
        else:
            self._writer = cv2.VideoWriter(
                self.path, cv2.VideoWriter_fourcc(*"mp4v"), fps, self.size
            )
            if not self._writer.isOpened():
                raise RuntimeError(f"cannot open VideoWriter for {path}")

    def write(self, frame_rgb: np.ndarray):
        """Write one HWC uint8 RGB frame (streams immediately)."""
        if self._proc is not None:
            self._proc.stdin.write(frame_rgb.astype(np.uint8).tobytes())
        else:
            self._writer.write(cv2.cvtColor(frame_rgb, cv2.COLOR_RGB2BGR))

    def write_bgr(self, frame_bgr: np.ndarray):
        """Write one HWC uint8 BGR frame (skips the RGB->BGR convert for
        callers that already hold BGR, e.g. the I420-readback pipeline)."""
        if self._proc is not None:
            self._proc.stdin.write(
                cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2RGB)
                .astype(np.uint8).tobytes())
        else:
            self._writer.write(frame_bgr)

    def close(self, timeout: float = 120.0):
        """Finalize (reference guards ffmpeg wait with a 120 s timeout,
        run_experiments.py:1005-1009)."""
        if self._proc is not None:
            self._proc.stdin.close()
            self._proc.wait(timeout=timeout)
            self._proc = None
        if self._writer is not None:
            self._writer.release()
            self._writer = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


# =============================================================================
# Segment extraction + audio passthrough
# =============================================================================


def get_video_duration(path: str) -> float:
    """Duration in seconds (reference benchmark_proper.py:167-175)."""
    cap = cv2.VideoCapture(str(path))
    if not cap.isOpened():
        return 0.0
    fps = cap.get(cv2.CAP_PROP_FPS)
    frames = cap.get(cv2.CAP_PROP_FRAME_COUNT)
    cap.release()
    return frames / fps if fps > 0 else 0.0


def extract_audio(src: str, out_path: str, start: float = 0.0,
                  duration: Optional[float] = None) -> bool:
    """Extract the audio track of ``src`` to ``out_path`` (AAC copy).

    Reference run_experiments.py:770-781 / benchmark_proper.py:150-155.
    ffmpeg-only; returns False (graceful skip) when ffmpeg is absent or the
    source has no audio.
    """
    if not FFMPEG:
        return False
    cmd = [FFMPEG, "-y", "-ss", str(start), "-i", str(src)]
    if duration is not None:
        cmd += ["-t", str(duration)]
    cmd += ["-vn", "-acodec", "copy", str(out_path)]
    r = subprocess.run(cmd, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    return r.returncode == 0 and os.path.exists(out_path) and os.path.getsize(out_path) > 0


def mux_audio(video_path: str, audio_path: str, output_path: str) -> bool:
    """Mux ``audio_path`` into ``video_path`` -> ``output_path`` (copy video,
    AAC audio, -shortest — reference benchmark_proper.py:394-409). Returns
    False (graceful skip, video left as-is) when ffmpeg is absent."""
    if not FFMPEG or not os.path.exists(audio_path):
        return False
    cmd = [
        FFMPEG, "-y", "-i", str(video_path), "-i", str(audio_path),
        "-c:v", "copy", "-c:a", "aac", "-shortest", str(output_path),
    ]
    r = subprocess.run(cmd, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    return r.returncode == 0 and os.path.exists(output_path)


def extract_clip(full_video: str, raw_video: Optional[str], start_time: float,
                 duration: float, output: str) -> bool:
    """Cut [start_time, start_time+duration) out of a pre-generated video,
    carrying audio from ``raw_video`` when possible (the fast new-interval
    path, reference benchmark_proper.py:138-165).

    ffmpeg: stream-copy cut + audio mux (fast, no re-encode). Without
    ffmpeg: cv2 re-encode of the segment (no audio — cv2 has no audio API).
    """
    output = str(output)
    os.makedirs(os.path.dirname(os.path.abspath(output)) or ".", exist_ok=True)
    if FFMPEG:
        tmp_v = output + ".video.mp4"
        r = subprocess.run(
            [FFMPEG, "-y", "-ss", str(start_time), "-i", str(full_video),
             "-t", str(duration), "-c", "copy", tmp_v],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        if r.returncode != 0 or not os.path.exists(tmp_v):
            return False
        tmp_a = output + ".audio.aac"
        if raw_video and extract_audio(raw_video, tmp_a, start_time, duration):
            ok = mux_audio(tmp_v, tmp_a, output)
            for t in (tmp_v, tmp_a):
                if os.path.exists(t):
                    os.remove(t)
            if ok:
                return True
            # mux failed: fall through to video-only
        if os.path.exists(output):
            os.remove(output)
        os.replace(tmp_v, output)
        return True
    # cv2 fallback: decode + re-encode the segment
    cap = cv2.VideoCapture(str(full_video))
    if not cap.isOpened():
        return False
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    cap.set(cv2.CAP_PROP_POS_FRAMES, int(round(start_time * fps)))
    writer = cv2.VideoWriter(output, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    if not writer.isOpened():
        cap.release()
        return False
    need = int(round(duration * fps))
    got = 0
    while got < need:
        ok, frame = cap.read()
        if not ok:
            break
        writer.write(frame)
        got += 1
    cap.release()
    writer.release()
    return got > 0 and os.path.exists(output)
