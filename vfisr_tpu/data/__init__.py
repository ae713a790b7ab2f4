"""Dataset pipeline: clip registry → interval extraction → triplet index.

On-disk contracts mirror the reference exactly (SURVEY §2.5):
- ``data/clips_registry.json`` + per-clip ``clip_meta.json`` (register_clip.py)
- per-interval ``keyframes/kf_*.png`` (even frames), ``midpoints/gt_*.png``
  (odd frames), ``motion/{complexity,flow_stats}.json``, ``meta.json``
  (extract_intervals.py:116-243)
- per-processed-clip ``{input_1080p30/frames, ground_truth/frames,
  metadata.json, triplets.json}`` (preprocess_video.py:194-209,349-426)
"""

from vfisr_tpu.data.video_io import VideoReader, VideoWriter, probe_video

__all__ = ["VideoReader", "VideoWriter", "probe_video"]
