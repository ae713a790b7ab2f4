"""Interval extraction (reference scripts/extract_intervals.py semantics).

Per interval: crop 16:9 center → Lanczos 1920×1080; **even frames →
keyframes/kf_%04d.png, odd frames → midpoints/gt_%04d.png**
(extract_intervals.py:163-188); per keyframe-pair Farneback motion stats at
half resolution scaled back ×2 (:67-91); difficulty classification with
thresholds 1/5/15/30 px (:94-105); aggregate flow_stats.json,
complexity.json, meta.json; placement evenly-spaced / auto-difficulty
linspace(0.1, 0.9) / explicit start (:260-275); registry +
difficulty_index.json updates (:296-327).

Motion analysis runs on-device (batched Farneback), pairs batched per
interval instead of one cv2 call per pair.
"""

from __future__ import annotations

import json
from datetime import datetime
from pathlib import Path
from typing import List, Optional, Tuple

import cv2
import numpy as np

from vfisr_tpu.data.registry import ClipRegistry
from vfisr_tpu.ops.flow import farneback_flow

DIFFICULTY_THRESHOLDS = {"STATIC": 1, "EASY": 5, "MEDIUM": 15, "HARD": 30, "EXTREME": float("inf")}


def classify_difficulty(mean_flow: float) -> str:
    if mean_flow < DIFFICULTY_THRESHOLDS["STATIC"]:
        return "STATIC"
    if mean_flow < DIFFICULTY_THRESHOLDS["EASY"]:
        return "EASY"
    if mean_flow < DIFFICULTY_THRESHOLDS["MEDIUM"]:
        return "MEDIUM"
    if mean_flow < DIFFICULTY_THRESHOLDS["HARD"]:
        return "HARD"
    return "EXTREME"


def crop16_9(frame: np.ndarray) -> np.ndarray:
    h, w = frame.shape[:2]
    target_w = int(h * 16 / 9)
    if target_w <= w:
        x0 = (w - target_w) // 2
        return frame[:, x0 : x0 + target_w]
    target_h = int(w * 9 / 16)
    y0 = (h - target_h) // 2
    return frame[y0 : y0 + target_h]


def compute_motion_stats(frame1_bgr: np.ndarray, frame2_bgr: np.ndarray) -> dict:
    """Half-res Farneback, magnitudes scaled back ×2 (reference :67-91)."""
    g1 = cv2.cvtColor(frame1_bgr, cv2.COLOR_BGR2GRAY)
    g2 = cv2.cvtColor(frame2_bgr, cv2.COLOR_BGR2GRAY)
    h, w = g1.shape
    s1 = cv2.resize(g1, (w // 2, h // 2))
    s2 = cv2.resize(g2, (w // 2, h // 2))
    flow = np.asarray(farneback_flow(s1.astype(np.float32), s2.astype(np.float32)))
    mag = np.sqrt(flow[..., 0] ** 2 + flow[..., 1] ** 2) * 2
    return {
        "mean_flow": float(np.mean(mag)),
        "max_flow": float(np.max(mag)),
        "std_flow": float(np.std(mag)),
        "median_flow": float(np.median(mag)),
    }


class IntervalExtractor:
    def __init__(self, data_dir: str | Path = "data"):
        self.registry = ClipRegistry(data_dir)

    def extract_single_interval(
        self,
        video_path: str,
        clip_id: str,
        interval_id: str,
        start_s: float,
        duration_s: float,
        output_resolution: Tuple[int, int] = (1920, 1080),
        verbose: bool = True,
    ) -> dict:
        clip_dir = self.registry.clips_dir / clip_id
        interval_dir = clip_dir / "intervals" / interval_id
        keyframes_dir = interval_dir / "keyframes"
        midpoints_dir = interval_dir / "midpoints"
        motion_dir = interval_dir / "motion"
        for d in (keyframes_dir, midpoints_dir, motion_dir):
            d.mkdir(parents=True, exist_ok=True)

        cap = cv2.VideoCapture(str(video_path))
        fps = cap.get(cv2.CAP_PROP_FPS)
        total_frames = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        start_frame = int(start_s * fps)
        end_frame = min(int((start_s + duration_s) * fps), total_frames)
        cap.set(cv2.CAP_PROP_POS_FRAMES, start_frame)

        keyframes: List[str] = []
        midpoints: List[str] = []
        motion_data: List[dict] = []
        difficulty_counts = {k: 0 for k in DIFFICULTY_THRESHOLDS}
        prev_keyframe = None
        frame_idx = 0
        kf_idx = 0

        if verbose:
            print(f"  Extracting {interval_id}: {start_s:.1f}s - {start_s + duration_s:.1f}s")

        while cap.get(cv2.CAP_PROP_POS_FRAMES) < end_frame:
            ret, frame = cap.read()
            if not ret:
                break
            frame = crop16_9(frame)
            if frame.shape[1] != output_resolution[0] or frame.shape[0] != output_resolution[1]:
                frame = cv2.resize(frame, output_resolution, interpolation=cv2.INTER_LANCZOS4)

            if frame_idx % 2 == 0:
                kf_path = keyframes_dir / f"kf_{kf_idx:04d}.png"
                cv2.imwrite(str(kf_path), frame)
                keyframes.append(kf_path.name)
                if prev_keyframe is not None:
                    stats = compute_motion_stats(prev_keyframe, frame)
                    motion_data.append({"pair_idx": kf_idx - 1, **stats})
                    difficulty_counts[classify_difficulty(stats["mean_flow"])] += 1
                prev_keyframe = frame.copy()
                kf_idx += 1
            else:
                gt_path = midpoints_dir / f"gt_{len(midpoints):04d}.png"
                cv2.imwrite(str(gt_path), frame)
                midpoints.append(gt_path.name)
            frame_idx += 1
            if verbose and frame_idx % 100 == 0:
                print(f"    Processed {frame_idx} frames...")
        cap.release()

        if motion_data:
            all_mean = [m["mean_flow"] for m in motion_data]
            all_max = [m["max_flow"] for m in motion_data]
            n = len(motion_data)
            aggregate = {
                "mean_flow": float(np.mean(all_mean)),
                "max_flow": float(np.max(all_max)),
                "variance": float(np.var(all_mean)),
                **{
                    f"{k.lower()}_pct": round(100 * difficulty_counts[k] / n, 1)
                    for k in ("STATIC", "EASY", "MEDIUM", "HARD", "EXTREME")
                },
            }
            overall = classify_difficulty(aggregate["mean_flow"])
        else:
            aggregate = {}
            overall = "UNKNOWN"

        with open(motion_dir / "complexity.json", "w") as f:
            json.dump(motion_data, f, indent=2)
        with open(motion_dir / "flow_stats.json", "w") as f:
            json.dump(aggregate, f, indent=2)

        meta = {
            "interval_id": interval_id,
            "clip_id": clip_id,
            "start_s": start_s,
            "end_s": start_s + duration_s,
            "start_frame": start_frame,
            "end_frame": start_frame + frame_idx,
            "keyframe_count": len(keyframes),
            "midpoint_count": len(midpoints),
            "resolution": f"{output_resolution[0]}x{output_resolution[1]}",
            "difficulty": overall,
            "motion_stats": aggregate,
            "extracted": datetime.now().isoformat(),
        }
        with open(interval_dir / "meta.json", "w") as f:
            json.dump(meta, f, indent=2)
        if verbose:
            print(
                f"    Done: {len(keyframes)} keyframes, {len(midpoints)} midpoints, "
                f"difficulty={overall}"
            )
        return meta

    def extract_intervals(
        self,
        clip_id: str,
        count: int = 10,
        duration: float = 10.0,
        start: Optional[float] = None,
        auto_difficulty: bool = False,
        output_resolution: Tuple[int, int] = (1920, 1080),
        verbose: bool = True,
    ) -> List[dict]:
        clip_info = self.registry.get_clip(clip_id)
        if clip_info is None:
            raise ValueError(f"Clip {clip_id!r} not found. Register it first.")
        video_path = clip_info.get("source_path") or clip_info.get("source")
        video_duration = clip_info["duration_s"]

        if start is not None:
            starts = [start]
        elif auto_difficulty:
            positions = np.linspace(0.1, 0.9, count)
            starts = [p * (video_duration - duration) for p in positions]
        else:
            max_start = video_duration - duration
            starts = [max_start / 2] if count == 1 else np.linspace(0, max_start, count).tolist()

        valid_starts = [s for s in starts if s >= 0 and s + duration <= video_duration]
        if verbose and len(valid_starts) < len(starts):
            print(f"Warning: {len(starts) - len(valid_starts)} intervals skipped (out of bounds)")

        intervals_dir = self.registry.clips_dir / clip_id / "intervals"
        existing = list(intervals_dir.glob("interval_*")) if intervals_dir.exists() else []
        next_idx = len(existing)

        results = []
        for i, start_s in enumerate(valid_starts):
            interval_id = f"interval_{next_idx + i:04d}"
            results.append(
                self.extract_single_interval(
                    video_path, clip_id, interval_id, start_s, duration,
                    output_resolution, verbose,
                )
            )

        self.registry.update_clip(
            clip_id,
            intervals_count=next_idx + len(results),
            last_processed=datetime.now().isoformat(),
        )
        clip_meta_path = self.registry.clips_dir / clip_id / "clip_meta.json"
        if clip_meta_path.exists():
            with open(clip_meta_path) as f:
                clip_meta = json.load(f)
            clip_meta["intervals"] = [r["interval_id"] for r in results]
            clip_meta["intervals_count"] = next_idx + len(results)
            clip_meta["last_processed"] = datetime.now().isoformat()
            with open(clip_meta_path, "w") as f:
                json.dump(clip_meta, f, indent=2)

        difficulty_index = {
            r["interval_id"]: {
                "difficulty": r["difficulty"],
                "mean_flow": r["motion_stats"].get("mean_flow", 0),
                "start_s": r["start_s"],
                "end_s": r["end_s"],
            }
            for r in results
        }
        with open(self.registry.clips_dir / clip_id / "difficulty_index.json", "w") as f:
            json.dump(difficulty_index, f, indent=2)
        return results


def load_interval(
    clip_id: str, interval, data_dir: str | Path = "data", max_frames: Optional[int] = None
):
    """Load cached interval frames (reference run_experiments.py:52-106).

    Returns (keyframes RGB list, midpoints RGB list, meta dict).
    """
    if isinstance(interval, int):
        interval = f"interval_{interval:04d}"
    interval_dir = Path(data_dir) / "clips" / clip_id / "intervals" / interval
    if not interval_dir.exists():
        raise FileNotFoundError(f"interval not found: {interval_dir}")
    with open(interval_dir / "meta.json") as f:
        meta = json.load(f)

    def load_dir(subdir):
        frames = []
        for p in sorted((interval_dir / subdir).glob("*.png")):
            img = cv2.imread(str(p))
            frames.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
            if max_frames and len(frames) >= max_frames:
                break
        return frames

    return load_dir("keyframes"), load_dir("midpoints"), meta
