"""Streaming video processing pipeline (the process.py engine).

Host decode → device VFI+SR → host encode. The temporal multiplication
factor is ``target_fps / source_fps`` (interpolated frames per input pair =
factor - 1); output frames stream straight into the writer, mirroring the
reference's no-RAM-buffering invariant (run_experiments.py:760-806).

A one-deep prefetch queue overlaps host decode with device compute: while
the device works on pair (i, i+1), the host decodes frame i+2 — the TPU
analog of the reference's ffmpeg-pipe backpressure.
"""

from __future__ import annotations

import time
from typing import Optional, Tuple

import numpy as np

from vfisr_tpu.data.video_io import VideoReader, VideoWriter, probe_video


def _build_model(method: Optional[str], vfi_model: Optional[str], sr_model: Optional[str]):
    from vfisr_tpu.models.base import TwoStageModel
    from vfisr_tpu.models.registry import get_model

    if method:
        return get_model(method, load=True)
    if vfi_model and sr_model:
        model = TwoStageModel(get_model(vfi_model), get_model(sr_model))
        model.load()
        return model
    if vfi_model:
        return get_model(vfi_model, load=True)
    # default: the flagship adaptive pipeline
    return get_model("adaptive", load=True)


def process_video(
    input_path: str,
    output_path: str,
    method: Optional[str] = None,
    vfi_model: Optional[str] = None,
    sr_model: Optional[str] = None,
    target_fps: float = 120.0,
    target_resolution: Tuple[int, int] = (2560, 1440),
    max_frames: int = 0,
) -> dict:
    """Run the full streaming pipeline; returns throughput stats."""
    meta = probe_video(input_path)
    src_fps = meta.fps or 30.0
    factor = max(int(round(target_fps / src_fps)), 1)
    num_intermediate = factor - 1
    target_w, target_h = target_resolution
    scale = target_h / meta.height

    model = _build_model(method, vfi_model, sr_model)

    t0 = time.time()
    out_frames = 0
    in_frames = 0
    with VideoReader(input_path) as reader, VideoWriter(
        output_path, target_w, target_h, target_fps
    ) as writer:
        prev = reader.read()
        if prev is None:
            raise RuntimeError(f"no frames in {input_path}")
        in_frames += 1
        pending = reader.read()  # prefetch one frame ahead
        while pending is not None:
            curr = pending
            in_frames += 1
            result = model.process_pair(
                prev, curr, num_intermediate=num_intermediate, target_scale=scale
            )
            # frames = [up(prev), mids..., up(curr)]; write prev + mids,
            # curr is written as the next pair's prev (avoid duplicates)
            for frame in result.frames[:-1]:
                if frame.shape[:2] != (target_h, target_w):
                    import cv2

                    frame = cv2.resize(frame, (target_w, target_h),
                                       interpolation=cv2.INTER_LANCZOS4)
                writer.write(frame)
                out_frames += 1
            prev = curr
            pending = reader.read()  # decode overlaps the next device call
            if max_frames and in_frames >= max_frames:
                break
        # final endpoint
        last = model.upscale(prev, scale)
        if last.shape[:2] != (target_h, target_w):
            import cv2

            last = cv2.resize(last, (target_w, target_h), interpolation=cv2.INTER_LANCZOS4)
        writer.write(last)
        out_frames += 1

    elapsed = time.time() - t0
    return {
        "input_frames": in_frames,
        "output_frames": out_frames,
        "target_fps": target_fps,
        "target_resolution": f"{target_w}x{target_h}",
        "elapsed_s": elapsed,
        "realtime_x": (out_frames / target_fps) / elapsed if elapsed > 0 else 0,
        "model": model.info.name,
    }
