#!/usr/bin/env python
"""Unified clip generator behind the reference's gui/generate_* family
(~2,600 LoC across generate_{all,all_fast,fast,scientific,sota,video_clips,
from_raw}.py). One parameterized engine; the variant scripts are presets:

- all:        every method, CPU methods via a process pool
              (generate_all.py:5-7, generate_all_fast.py:23-38)
- fast:       1080p output for quick iteration (generate_fast.py:22-26)
- scientific: aggressive 540p→4K degradation with metrics
              (generate_scientific.py:17-21)
- sota:       RIFE-only pipeline (generate_sota.py:1-28)
- video_clips: from interval frame caches with scale/crop/letterbox aspect
              modes (generate_video_clips.py:26-34)
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

import cv2
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PRESETS = {
    "all": {
        "methods": ["control", "degraded", "lanczos", "bicubic", "rife_lanczos",
                    "rife_bicubic", "adaptive_vfi"],
        "resolution": (2560, 1440),
    },
    "fast": {
        "methods": ["control", "lanczos", "rife_lanczos"],
        "resolution": (1920, 1080),
    },
    "scientific": {
        "methods": ["control", "degraded", "lanczos", "rife_lanczos", "adaptive_vfi"],
        "resolution": (3840, 2160),
        "degrade": (960, 540),
    },
    "sota": {
        "methods": ["rife_lanczos"],
        "resolution": (2560, 1440),
    },
}

CPU_METHODS = {"control", "degraded", "lanczos", "bicubic", "lanczos_edge"}


def _aspect_fit(frame: np.ndarray, out_w: int, out_h: int, mode: str) -> np.ndarray:
    """scale / crop / letterbox aspect handling (generate_video_clips.py:26-34)."""
    h, w = frame.shape[:2]
    if mode == "scale":
        return cv2.resize(frame, (out_w, out_h), interpolation=cv2.INTER_LANCZOS4)
    src_ar, dst_ar = w / h, out_w / out_h
    if mode == "crop":
        if src_ar > dst_ar:
            nw = int(h * dst_ar)
            frame = frame[:, (w - nw) // 2 : (w + nw) // 2]
        else:
            nh = int(w / dst_ar)
            frame = frame[(h - nh) // 2 : (h + nh) // 2]
        return cv2.resize(frame, (out_w, out_h), interpolation=cv2.INTER_LANCZOS4)
    # letterbox
    scale = min(out_w / w, out_h / h)
    nw, nh = int(w * scale), int(h * scale)
    resized = cv2.resize(frame, (nw, nh), interpolation=cv2.INTER_LANCZOS4)
    canvas = np.zeros((out_h, out_w, 3), frame.dtype)
    y0, x0 = (out_h - nh) // 2, (out_w - nw) // 2
    canvas[y0 : y0 + nh, x0 : x0 + nw] = resized
    return canvas


def generate_method(method, keyframes, out_path, out_w, out_h, fps,
                    degrade=(960, 540), aspect="scale"):
    from vfisr_tpu.data.video_io import VideoWriter
    from vfisr_tpu.methods.inline import calc_motion, linear_blend

    rife = None
    if "rife" in method or method == "adaptive_vfi":
        from vfisr_tpu.models.registry import get_model

        rife = get_model("rife", load=True)

    sr_interp = cv2.INTER_CUBIC if "bicubic" in method else cv2.INTER_LANCZOS4
    prev = None
    with VideoWriter(str(out_path), out_w, out_h, fps) as writer:
        for src in keyframes:
            if method == "control":
                out = _aspect_fit(src, out_w, out_h, aspect)
            else:
                small = cv2.resize(src, degrade, interpolation=cv2.INTER_AREA)
                out = cv2.resize(small, (out_w, out_h), interpolation=sr_interp)
            if prev is not None:
                for i in range(1, 4):
                    if method in ("control", "degraded"):
                        mid = prev
                    elif "rife" in method:
                        mid = rife.interpolate(prev, out, 1, [i / 4])[0]
                    elif method == "adaptive_vfi":
                        g0 = cv2.resize(cv2.cvtColor(prev, cv2.COLOR_RGB2GRAY), (480, 270))
                        g1 = cv2.resize(cv2.cvtColor(out, cv2.COLOR_RGB2GRAY), (480, 270))
                        mid = (rife.interpolate(prev, out, 1, [i / 4])[0]
                               if calc_motion(g0, g1) > 3.0 else linear_blend(prev, out, i / 4))
                    else:
                        mid = linear_blend(prev, out, i / 4)
                    writer.write(mid)
            writer.write(out)
            prev = out


def _run_one(job):
    method, clip, interval, data_dir, out_path, res, fps, degrade, aspect, max_frames = job
    from vfisr_tpu.data.extract_intervals import load_interval

    keyframes, _, _ = load_interval(clip, interval, data_dir, max_frames=max_frames)
    t0 = time.time()
    generate_method(method, keyframes, out_path, res[0], res[1], fps, degrade, aspect)
    return method, time.time() - t0


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", default="all", choices=sorted(PRESETS))
    parser.add_argument("--clip", required=True)
    parser.add_argument("--interval", type=int, default=0)
    parser.add_argument("--data-dir", default="data")
    parser.add_argument("--output-dir", default="outputs/benchmark")
    parser.add_argument("--fps", type=float, default=120.0)
    parser.add_argument("--aspect", default="scale", choices=["scale", "crop", "letterbox"])
    parser.add_argument("--workers", type=int, default=1,
                        help="Process pool for CPU methods (generate_all_fast pattern)")
    parser.add_argument("--max-frames", type=int, default=None)
    args = parser.parse_args()

    preset = PRESETS[args.preset]
    res = preset["resolution"]
    degrade = preset.get("degrade", (960, 540))
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    jobs = [
        (m, args.clip, args.interval, args.data_dir, out_dir / f"{m}.mp4",
         res, args.fps, degrade, args.aspect, args.max_frames)
        for m in preset["methods"]
    ]
    cpu_jobs = [j for j in jobs if j[0] in CPU_METHODS]
    gpu_jobs = [j for j in jobs if j[0] not in CPU_METHODS]
    results = []
    if args.workers > 1 and len(cpu_jobs) > 1:
        with ProcessPoolExecutor(max_workers=args.workers) as pool:
            results += list(pool.map(_run_one, cpu_jobs))
    else:
        results += [_run_one(j) for j in cpu_jobs]
    results += [_run_one(j) for j in gpu_jobs]  # accelerator methods serial
    for method, dt in results:
        print(f"  {method}: {dt:.1f}s")
    print(f"Wrote {len(results)} videos to {out_dir}")


if __name__ == "__main__":
    main()
