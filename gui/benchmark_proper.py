#!/usr/bin/env python
"""Video-producing benchmark for the blind study (reference
gui/benchmark_proper.py, 467 LoC).

Produces one video per method from a registered clip's frames, ordered
control → degraded → lanczos → rife_lanczos → adaptive_vfi (reference
:376-382; adaptive = motion>3.0 at 480×270 → RIFE else blend, :242-254),
and writes ``clips_metadata.json`` with psnr/ssim/bitrate per clip
(:412-453).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import cv2
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

METHODS = ["control", "degraded", "lanczos", "rife_lanczos", "adaptive_vfi"]
DURATION = 10.0  # seconds per study clip (reference benchmark_proper.py)


# Reuse surface for the GUIs' fast interval switching (reference
# benchmark_proper.py:138-175; imported by gui/video_blind_study.py's
# /api/new-interval): cut a segment out of a pre-generated full video,
# carrying source audio when ffmpeg is present.
def extract_clip(full_video, raw_video, start_time, duration, output) -> bool:
    from vfisr_tpu.data.video_io import extract_clip as _extract

    return _extract(str(full_video), str(raw_video) if raw_video else None,
                    float(start_time), float(duration), str(output))


def get_full_video_duration(video_path) -> float:
    from vfisr_tpu.data.video_io import get_video_duration

    return get_video_duration(str(video_path))


def run_method(method: str, keyframes, out_path: str, out_w: int, out_h: int, fps: float):
    from vfisr_tpu.data.video_io import VideoWriter
    from vfisr_tpu.evaluation.metrics import calc_psnr, calc_ssim
    from vfisr_tpu.methods.inline import calc_motion, edge_enhance, linear_blend

    rife = flow_vfi = None
    if method in ("rife_lanczos", "rife_bicubic", "adaptive_vfi"):
        from vfisr_tpu.models.registry import get_model

        rife = get_model("rife", load=True)
    elif method == "optical_flow":
        from vfisr_tpu.models.registry import get_model

        flow_vfi = get_model("optical_flow", load=True)

    # SR interpolation per method (reference benchmark_all.py:263-275:
    # bicubic/rife_bicubic use cubic taps, everything else Lanczos4)
    sr_interp = (cv2.INTER_CUBIC
                 if method in ("degraded", "bicubic", "rife_bicubic")
                 else cv2.INTER_LANCZOS4)

    psnrs, ssims = [], []
    prev = None
    n = len(keyframes)
    with VideoWriter(out_path, out_w, out_h, fps) as writer:
        for idx, src in enumerate(keyframes):
            if method == "control":
                out = cv2.resize(src, (out_w, out_h), interpolation=cv2.INTER_LANCZOS4)
            else:
                degraded = cv2.resize(src, (960, 540), interpolation=cv2.INTER_AREA)
                out = cv2.resize(degraded, (out_w, out_h), interpolation=sr_interp)
                if method == "lanczos_edge":
                    out = edge_enhance(out, 1.3)

            if prev is not None:
                for i in range(1, 4):
                    if method in ("control", "degraded"):
                        mid = prev
                    elif method in ("rife_lanczos", "rife_bicubic"):
                        mid = rife.interpolate(prev, out, 1, [i / 4])[0]
                    elif method == "optical_flow":
                        mid = flow_vfi.interpolate(prev, out, 1, [i / 4])[0]
                    elif method == "adaptive_vfi":
                        g0 = cv2.resize(cv2.cvtColor(prev, cv2.COLOR_RGB2GRAY), (480, 270))
                        g1 = cv2.resize(cv2.cvtColor(out, cv2.COLOR_RGB2GRAY), (480, 270))
                        if calc_motion(g0, g1) > 3.0:
                            mid = rife.interpolate(prev, out, 1, [i / 4])[0]
                        else:
                            mid = linear_blend(prev, out, i / 4)
                    else:  # lanczos / bicubic / lanczos_edge: linear blend
                        mid = linear_blend(prev, out, i / 4)
                    writer.write(mid)
            writer.write(out)
            # keyframe quality vs lanczos-upscaled source
            ref = cv2.resize(src, (out_w, out_h), interpolation=cv2.INTER_LANCZOS4)
            psnrs.append(calc_psnr(out, ref))
            ssims.append(
                calc_ssim(cv2.cvtColor(out, cv2.COLOR_RGB2GRAY),
                          cv2.cvtColor(ref, cv2.COLOR_RGB2GRAY))
            )
            prev = out
            if idx % 10 == 0:
                print(f"  [{method}] {int(100 * (idx + 1) / n)}%", flush=True)

    finite = [p for p in psnrs if np.isfinite(p)]
    return {
        "psnr": float(np.mean(finite)) if finite else None,
        "ssim": float(np.mean(ssims)) if ssims else None,
        "bitrate_kbps": round(Path(out_path).stat().st_size * 8 / 1000
                              / max(len(keyframes) * 4 / fps, 1e-9), 1),
        "output_path": str(out_path),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--clip", required=True, help="Registered clip id")
    parser.add_argument("--interval", type=int, default=0)
    parser.add_argument("--data-dir", default="data")
    parser.add_argument("--output-dir", default="outputs/benchmark")
    parser.add_argument("--methods", default=",".join(METHODS))
    parser.add_argument("--resolution", default="2560x1440")
    parser.add_argument("--fps", type=float, default=120.0)
    parser.add_argument("--max-frames", type=int, default=None)
    parser.add_argument(
        "--source-video", default=None,
        help="raw source video; when set and ffmpeg exists, its audio track "
        "is muxed into each method video (reference benchmark_proper.py:394-409)")
    args = parser.parse_args()

    from vfisr_tpu.data.extract_intervals import load_interval

    out_w, out_h = map(int, args.resolution.split("x"))
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    keyframes, _, meta = load_interval(args.clip, args.interval, args.data_dir,
                                       max_frames=args.max_frames)
    print(f"Benchmarking {args.clip} interval {args.interval}: "
          f"{len(keyframes)} keyframes")

    meta_path = out_dir / "clips_metadata.json"
    metadata = json.loads(meta_path.read_text()) if meta_path.exists() else {"clips": {}}
    clip_entry = metadata["clips"].setdefault(
        args.clip, {"videos": {}, "metrics": {}, "interval": args.interval}
    )

    for method in args.methods.split(","):
        method = method.strip()
        t0 = time.time()
        out_path = out_dir / f"{method}.mp4"
        stats = run_method(method, keyframes, str(out_path), out_w, out_h, args.fps)
        stats["time_s"] = round(time.time() - t0, 1)
        if args.source_video:
            from vfisr_tpu.data.video_io import extract_audio, mux_audio

            aac = str(out_path) + ".audio.aac"
            muxed = str(out_dir / f"{method}_audio.mp4")
            if (extract_audio(args.source_video, aac)
                    and mux_audio(str(out_path), aac, muxed)):
                Path(aac).unlink(missing_ok=True)
                Path(muxed).replace(out_path)
                stats["audio"] = True
            else:  # graceful skip: no ffmpeg or silent source
                Path(aac).unlink(missing_ok=True)
                stats["audio"] = False
        clip_entry["videos"][method] = str(out_path)
        clip_entry["metrics"][method] = stats
        meta_path.write_text(json.dumps(metadata, indent=2))
        print(f"  [{method}] psnr={stats['psnr']} time={stats['time_s']}s 100%")
    print(f"Wrote {meta_path}")


if __name__ == "__main__":
    main()
