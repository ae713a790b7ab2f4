#!/usr/bin/env python
"""Validate cached interval frames against on-the-fly re-extraction
(reference scripts/validate_intervals.py: byte-equivalence check)."""

import argparse
import sys
from pathlib import Path

import cv2
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--clip", required=True)
    parser.add_argument("--interval", type=int, default=0)
    parser.add_argument("--data-dir", default="data")
    parser.add_argument("--sample", type=int, default=5,
                        help="Number of keyframes to re-extract and compare")
    args = parser.parse_args()

    from vfisr_tpu.data.extract_intervals import crop16_9, load_interval
    from vfisr_tpu.data.registry import ClipRegistry

    reg = ClipRegistry(args.data_dir)
    clip = reg.get_clip(args.clip)
    if clip is None:
        raise SystemExit(f"clip {args.clip!r} not registered")
    keyframes, midpoints, meta = load_interval(args.clip, args.interval, args.data_dir)
    w, h = map(int, meta["resolution"].split("x"))

    cap = cv2.VideoCapture(clip.get("source_path") or clip.get("source"))
    fps = cap.get(cv2.CAP_PROP_FPS)
    start_frame = meta["start_frame"]
    mismatches = 0
    step = max(len(keyframes) // args.sample, 1)
    for kf_idx in range(0, len(keyframes), step):
        frame_idx = start_frame + 2 * kf_idx  # even frames are keyframes
        cap.set(cv2.CAP_PROP_POS_FRAMES, frame_idx)
        ret, frame = cap.read()
        if not ret:
            print(f"  kf_{kf_idx:04d}: source read failed at frame {frame_idx}")
            mismatches += 1
            continue
        frame = crop16_9(frame)
        if frame.shape[:2] != (h, w):
            frame = cv2.resize(frame, (w, h), interpolation=cv2.INTER_LANCZOS4)
        fresh = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        cached = keyframes[kf_idx]
        diff = np.abs(fresh.astype(int) - cached.astype(int))
        status = "OK" if diff.max() == 0 else f"MISMATCH max={diff.max()} mean={diff.mean():.3f}"
        if diff.max() > 0:
            mismatches += 1
        print(f"  kf_{kf_idx:04d}: {status}")
    cap.release()
    print(f"\n{'VALID' if mismatches == 0 else f'{mismatches} mismatch(es)'} "
          f"({meta['keyframe_count']} keyframes total)")
    sys.exit(1 if mismatches else 0)


if __name__ == "__main__":
    main()
