from vfisr_tpu.pipeline.streaming import process_video

__all__ = ["process_video"]
