#!/usr/bin/env python
"""Prepare side-by-side blind-study videos (reference
scripts/prepare_blind_study.py:37-140).

Takes per-method videos, pairs them against a reference method, hstacks
the frames with randomized left/right position, burns in 'A'/'B' labels,
and writes an answer-key JSON.
"""

import argparse
import json
import random
import sys
from pathlib import Path

import cv2

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def hstack_pair(left_path, right_path, out_path, label_left="A", label_right="B",
                max_frames=None):
    from vfisr_tpu.data.video_io import VideoReader, VideoWriter

    with VideoReader(str(left_path)) as lr, VideoReader(str(right_path)) as rr:
        fps = lr.fps
        l0 = lr.read()
        r0 = rr.read()
        if l0 is None or r0 is None:
            raise RuntimeError("empty input video")
        h = min(l0.shape[0], r0.shape[0])
        w = min(l0.shape[1], r0.shape[1])
        with VideoWriter(str(out_path), 2 * w, h, fps) as writer:
            n = 0
            while l0 is not None and r0 is not None:
                lf = cv2.resize(l0, (w, h))
                rf = cv2.resize(r0, (w, h))
                for frame, label in ((lf, label_left), (rf, label_right)):
                    cv2.putText(frame, label, (30, 60), cv2.FONT_HERSHEY_SIMPLEX,
                                2, (0, 0, 0), 8)
                    cv2.putText(frame, label, (30, 60), cv2.FONT_HERSHEY_SIMPLEX,
                                2, (255, 255, 255), 3)
                import numpy as np

                writer.write(np.hstack([lf, rf]))
                n += 1
                if max_frames and n >= max_frames:
                    break
                l0 = lr.read()
                r0 = rr.read()
    return n


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--benchmark-dir", default="outputs/benchmark")
    parser.add_argument("--reference", default="control")
    parser.add_argument("--output-dir", default="outputs/blind_study")
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--max-frames", type=int, default=None)
    args = parser.parse_args()

    bench = Path(args.benchmark_dir)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    rng = random.Random(args.seed)

    ref_video = bench / f"{args.reference}.mp4"
    if not ref_video.exists():
        raise SystemExit(f"reference video missing: {ref_video}")
    methods = [p.stem for p in bench.glob("*.mp4") if p.stem != args.reference]
    answer_key = {}
    for i, method in enumerate(sorted(methods)):
        method_left = rng.random() < 0.5
        left = bench / f"{method}.mp4" if method_left else ref_video
        right = ref_video if method_left else bench / f"{method}.mp4"
        pair_name = f"pair_{i:02d}.mp4"
        n = hstack_pair(left, right, out / pair_name, max_frames=args.max_frames)
        answer_key[pair_name] = {
            "A": method if method_left else args.reference,
            "B": args.reference if method_left else method,
            "frames": n,
        }
        print(f"  {pair_name}: {n} frames ({'A' if method_left else 'B'} = {method})")
    (out / "answer_key.json").write_text(json.dumps(answer_key, indent=2))
    print(f"Wrote {len(answer_key)} pair videos + answer_key.json to {out}")


if __name__ == "__main__":
    main()
