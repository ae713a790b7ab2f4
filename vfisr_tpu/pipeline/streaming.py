"""Streaming video processing pipeline (the process.py engine).

Host decode → device VFI+SR → host encode, with REAL overlap (SURVEY
§7.4.4 double buffering; the reference gets its overlap from the ffmpeg
stdin pipe's backpressure, run_experiments.py:760-806):

- a **decode thread** fills a bounded frame queue (backpressure when the
  device is the bottleneck, no unbounded RAM growth — the reference's
  "prevents the 38GB+ memory explosion" invariant);
- the main loop **dispatches pair i+1 to the device before materializing
  pair i's output**: JAX dispatch is async, so the device computes the
  next pair while the host encodes the previous one (double buffer);
- the writer runs on the main thread; only uint8 output frames are ever
  materialized host-side.

Models that expose the batched device cores (``interpolate_batch`` /
``upscale_batch`` — every model in this framework) run fully on-device;
anything else falls back to the per-pair host path.

Stats include the stage timers (decode-wait / device-materialize / encode)
so the device-busy fraction is measurable rather than asserted.
"""

from __future__ import annotations

import queue
import threading
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


def _decode_worker(reader: VideoReader, q: "queue.Queue", max_frames: int,
                   stop: threading.Event):
    n = 0
    try:
        while not stop.is_set():
            frame = reader.read()
            if frame is None or (max_frames and n >= max_frames):
                break
            q.put(frame)
            n += 1
    finally:
        # EOF sentinel must reach the consumer even if read() raises
        # (corrupt stream), or the main thread blocks forever on q.get()
        q.put(None)
        # The worker OWNS the capture's release: cv2.VideoCapture is not
        # thread-safe, and the main thread's join can time out while this
        # thread is still blocked inside reader.read() — releasing from
        # the main thread then races the in-flight read. Closing here (the
        # sole reader-using thread) makes the release ordered-after the
        # last read by construction.
        reader.close()


def process_video(
    input_path: str,
    output_path: str,
    method: Optional[str] = None,
    vfi_model: Optional[str] = None,
    sr_model: Optional[str] = None,
    target_fps: float = 120.0,
    target_resolution: Tuple[int, int] = (2560, 1440),
    max_frames: int = 0,
    queue_depth: int = 8,
) -> dict:
    """Run the full streaming pipeline; returns throughput + stage stats."""
    import jax.numpy as jnp

    meta = probe_video(input_path)
    src_fps = meta.fps or 30.0
    factor = max(int(round(target_fps / src_fps)), 1)
    num_intermediate = factor - 1
    target_w, target_h = target_resolution
    scale = target_h / meta.height

    model = _build_model(method, vfi_model, sr_model)
    timestamps = tuple(
        (i + 1) / (num_intermediate + 1) for i in range(num_intermediate)
    )
    batched = hasattr(model, "interpolate_batch") and hasattr(model, "upscale_batch")
    # models with a fully fused per-pair program (flagship: analysis +
    # scene/HUD composite + VFI + SR in one jitted dispatch) stream
    # through it instead of the generic two-phase path
    fused = (getattr(model, "fused_stream_step", None)
             if num_intermediate else None)

    def device_step(prev_u8: np.ndarray, curr_u8: np.ndarray):
        """Dispatch VFI+SR for one pair; returns device arrays (async)."""
        if fused is not None:
            return fused(prev_u8, curr_u8, scale, timestamps)
        x0 = jnp.asarray(prev_u8, jnp.float32)[None] / 255.0
        x1 = jnp.asarray(curr_u8, jnp.float32)[None] / 255.0
        if num_intermediate:
            mids = model.interpolate_batch(x0, x1, timestamps)  # [1,T,h,w,3]
            frames = jnp.concatenate([x0[:, None], mids], axis=1)[0]
        else:
            frames = x0
        up = model.upscale_batch(frames, scale)
        return jnp.clip(jnp.floor(up * 255.0 + 0.5), 0, 255).astype(jnp.uint8)

    t0 = time.time()
    decode_wait_s = device_wait_s = encode_s = 0.0
    out_frames = 0
    in_frames = 0
    stop = threading.Event()
    q: "queue.Queue" = queue.Queue(maxsize=queue_depth)

    def fit(frame_u8: np.ndarray) -> np.ndarray:
        if frame_u8.shape[:2] != (target_h, target_w):
            import cv2

            return cv2.resize(frame_u8, (target_w, target_h),
                              interpolation=cv2.INTER_LANCZOS4)
        return frame_u8

    reader = VideoReader(input_path)
    decoder = None
    try:
        writer_cm = VideoWriter(output_path, target_w, target_h, target_fps)
    except Exception:
        # The reader's close normally happens inside the writer context;
        # a writer-open failure must not leak the cv2 capture.
        reader.close()
        raise
    with writer_cm as writer:
        decoder = threading.Thread(
            target=_decode_worker, args=(reader, q, max_frames, stop), daemon=True
        )
        try:
            decoder.start()
            tq = time.time()
            prev = q.get()
            decode_wait_s += time.time() - tq
            if prev is None:
                raise RuntimeError(f"no frames in {input_path}")
            in_frames += 1
            pending_dev = None  # device arrays for the previous pair (in flight)

            while True:
                tq = time.time()
                curr = q.get()
                decode_wait_s += time.time() - tq
                if curr is None:
                    break
                in_frames += 1
                if batched:
                    # dispatch pair i (async) BEFORE materializing pair i-1:
                    # the device computes while the host encodes
                    this_dev = device_step(prev, curr)
                    if pending_dev is not None:
                        td = time.time()
                        host_frames = np.asarray(pending_dev)  # sync point
                        device_wait_s += time.time() - td
                        tw = time.time()
                        for f in host_frames:
                            writer.write(fit(f))
                            out_frames += 1
                        encode_s += time.time() - tw
                    pending_dev = this_dev
                else:
                    result = model.process_pair(
                        prev, curr, num_intermediate=num_intermediate,
                        target_scale=scale,
                    )
                    tw = time.time()
                    for frame in result.frames[:-1]:
                        writer.write(fit(frame))
                        out_frames += 1
                    encode_s += time.time() - tw
                prev = curr

            if pending_dev is not None:
                td = time.time()
                host_frames = np.asarray(pending_dev)
                device_wait_s += time.time() - td
                for f in host_frames:
                    writer.write(fit(f))
                    out_frames += 1
            # final endpoint
            last = model.upscale(prev, scale)
            writer.write(fit(last))
            out_frames += 1
        finally:
            stop.set()
            # drain so the decoder's blocked put() can finish
            while True:
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            if decoder.ident is None:  # start() itself failed
                reader.close()
            else:
                # worker releases the capture on its way out; a timed-out
                # join just leaves the daemon thread (and the capture) to
                # die with the process rather than racing its read()
                decoder.join(timeout=10)

    elapsed = time.time() - t0
    overlapped = elapsed - decode_wait_s - encode_s
    return {
        "input_frames": in_frames,
        "output_frames": out_frames,
        "target_fps": target_fps,
        "target_resolution": f"{target_w}x{target_h}",
        "elapsed_s": elapsed,
        "realtime_x": (out_frames / target_fps) / elapsed if elapsed > 0 else 0,
        "model": model.info.name,
        "pipeline": ("fused_double_buffered" if fused is not None
                     else "double_buffered" if batched else "host_fallback"),
        "decode_wait_s": round(decode_wait_s, 3),
        "device_materialize_s": round(device_wait_s, 3),
        "encode_s": round(encode_s, 3),
        # fraction of wall time the device had work in flight (dispatch
        # overlaps encode; decode-wait and encode are host-blocked time)
        "device_busy_fraction": round(
            max(overlapped, 0.0) / elapsed, 3) if elapsed > 0 else 0,
    }
