"""Triplet dataset preprocessing (reference scripts/preprocess_video.py).

Pipeline per source clip: analyze → validate → degrade to input (1080p@30,
the "what the user has") → ground truth at target res/fps (refusing to
upsample fps, preprocess_video.py:283-286) → extract PNG frames → triplet
index with the exact reference math (preprocess_video.py:349-426):

    gt_start = round(i · scale); gt_end = round((i+1) · scale)
    intermediates = (gt_start, gt_end) exclusive
    temporal_positions = (idx - gt_start) / (gt_end - gt_start)

Output layout: data/processed/<clip>/{input_1080p30/frames/frame_*.png,
ground_truth/frames/frame_*.png, metadata.json, triplets.json}.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass
from datetime import datetime
from pathlib import Path
from typing import List, Optional, Tuple

import cv2
import numpy as np

from vfisr_tpu.data.video_io import VideoMeta, probe_video


@dataclass
class VideoMetadata:
    """Processed-clip metadata (reference preprocess_video.py:39-61)."""

    clip_name: str
    source_path: str
    source_width: int
    source_height: int
    source_fps: float
    input_width: int
    input_height: int
    input_fps: float
    target_width: int
    target_height: int
    target_fps: float
    temporal_scale: float
    spatial_scale: float
    num_input_frames: int
    num_gt_frames: int
    num_triplets: int
    processed_at: str

    def to_dict(self):
        return asdict(self)


class VideoPreprocessor:
    def __init__(
        self,
        input_resolution: Tuple[int, int] = (1920, 1080),
        input_fps: float = 30.0,
        target_resolution: Tuple[int, int] = (2560, 1440),
        target_fps: float = 120.0,
        output_dir: str | Path = "data/processed",
    ):
        self.input_resolution = input_resolution
        self.input_fps = input_fps
        self.target_resolution = target_resolution
        self.target_fps = target_fps
        self.output_dir = Path(output_dir)

    # ---- analyze / validate (reference :109-192) ----
    def analyze(self, video_path: str) -> VideoMeta:
        return probe_video(video_path)

    def validate(self, meta: VideoMeta) -> List[str]:
        problems = []
        if meta.height < self.target_resolution[1]:
            problems.append(
                f"source height {meta.height} < target {self.target_resolution[1]} "
                "(GT would be upsampled)"
            )
        if meta.fps < self.target_fps:
            # reference refuses to upsample fps (:283-286)
            problems.append(
                f"source fps {meta.fps} < target {self.target_fps} (cannot create GT)"
            )
        return problems

    # ---- processing ----
    def process(self, video_path: str, clip_name: Optional[str] = None, max_frames: int = 0) -> dict:
        video_path = str(video_path)
        clip_name = clip_name or Path(video_path).stem
        meta = self.analyze(video_path)
        problems = self.validate(meta)
        if problems:
            raise ValueError("; ".join(problems))

        clip_dir = self.output_dir / clip_name
        input_frames_dir = clip_dir / "input_1080p30" / "frames"
        gt_frames_dir = clip_dir / "ground_truth" / "frames"
        input_frames_dir.mkdir(parents=True, exist_ok=True)
        gt_frames_dir.mkdir(parents=True, exist_ok=True)

        # frame-accurate decimation: keep source frame k when it crosses the
        # target timestamp grid (replaces the reference's ffmpeg fps filter)
        cap = cv2.VideoCapture(video_path)
        src_fps = meta.fps
        n_in = n_gt = 0
        next_in_t = 0.0
        next_gt_t = 0.0
        frame_idx = 0
        while True:
            ret, frame = cap.read()
            if not ret:
                break
            t = frame_idx / src_fps
            wrote = False
            if t >= next_gt_t - 1e-9:
                gt = self._fit(frame, self.target_resolution)
                cv2.imwrite(str(gt_frames_dir / f"frame_{n_gt:05d}.png"), gt)
                n_gt += 1
                next_gt_t = n_gt / self.target_fps
                wrote = True
            if t >= next_in_t - 1e-9:
                inp = self._fit(frame, self.input_resolution)
                cv2.imwrite(str(input_frames_dir / f"frame_{n_in:05d}.png"), inp)
                n_in += 1
                next_in_t = n_in / self.input_fps
                wrote = True
            frame_idx += 1
            if max_frames and n_in >= max_frames:
                break

        cap.release()

        dirs = {"input_frames": input_frames_dir, "gt_frames": gt_frames_dir}
        triplets = self.create_triplet_index(dirs)
        metadata = VideoMetadata(
            clip_name=clip_name,
            source_path=str(Path(video_path).resolve()),
            source_width=meta.width,
            source_height=meta.height,
            source_fps=meta.fps,
            input_width=self.input_resolution[0],
            input_height=self.input_resolution[1],
            input_fps=self.input_fps,
            target_width=self.target_resolution[0],
            target_height=self.target_resolution[1],
            target_fps=self.target_fps,
            temporal_scale=self.target_fps / self.input_fps,
            spatial_scale=self.target_resolution[1] / self.input_resolution[1],
            num_input_frames=n_in,
            num_gt_frames=n_gt,
            num_triplets=len(triplets),
            processed_at=datetime.now().isoformat(),
        )
        with open(clip_dir / "metadata.json", "w") as f:
            json.dump(metadata.to_dict(), f, indent=2)
        with open(clip_dir / "triplets.json", "w") as f:
            json.dump(triplets, f, indent=2)
        return {"metadata": metadata.to_dict(), "triplets": len(triplets), "dir": str(clip_dir)}

    def _fit(self, frame_bgr: np.ndarray, resolution: Tuple[int, int]) -> np.ndarray:
        from vfisr_tpu.data.extract_intervals import crop16_9

        frame = crop16_9(frame_bgr)
        if (frame.shape[1], frame.shape[0]) != resolution:
            frame = cv2.resize(frame, resolution, interpolation=cv2.INTER_LANCZOS4)
        return frame

    # ---- triplet index: exact reference math (:349-426) ----
    def create_triplet_index(self, dirs: dict) -> List[dict]:
        input_frames = sorted(Path(dirs["input_frames"]).glob("frame_*.png"))
        gt_frames = sorted(Path(dirs["gt_frames"]).glob("frame_*.png"))
        if not input_frames:
            raise ValueError("No input frames found")
        if not gt_frames:
            raise ValueError("No ground truth frames found")

        temporal_scale = self.target_fps / self.input_fps
        triplets = []
        for i in range(len(input_frames) - 1):
            gt_start = int(round(i * temporal_scale))
            gt_end = int(round((i + 1) * temporal_scale))
            gt_intermediate_indices = list(range(gt_start + 1, gt_end))
            if not gt_intermediate_indices:
                continue
            if gt_end >= len(gt_frames):
                continue
            temporal_positions = [
                (idx - gt_start) / (gt_end - gt_start) for idx in gt_intermediate_indices
            ]
            triplets.append(
                {
                    "triplet_id": len(triplets),
                    "input_frame_0": input_frames[i].name,
                    "input_frame_1": input_frames[i + 1].name,
                    "input_idx_0": i,
                    "input_idx_1": i + 1,
                    "gt_frame_start": gt_frames[gt_start].name,
                    "gt_frame_end": gt_frames[gt_end].name,
                    "gt_start_idx": gt_start,
                    "gt_end_idx": gt_end,
                    "gt_intermediate": [
                        gt_frames[idx].name
                        for idx in gt_intermediate_indices
                        if idx < len(gt_frames)
                    ],
                    "gt_intermediate_indices": [
                        idx for idx in gt_intermediate_indices if idx < len(gt_frames)
                    ],
                    "temporal_positions": temporal_positions,
                    "num_intermediate": len(gt_intermediate_indices),
                }
            )
        return triplets


def load_clip_data(clip_dir: str | Path) -> Tuple[dict, List[dict]]:
    """Load metadata.json + triplets.json (run_benchmarks.py:44-64)."""
    clip_dir = Path(clip_dir)
    with open(clip_dir / "metadata.json") as f:
        metadata = json.load(f)
    with open(clip_dir / "triplets.json") as f:
        triplets = json.load(f)
    return metadata, triplets
