from vfisr_tpu.models.novel.adaptive_pipeline import (
    AdaptivePipeline,
    AdaptiveRouter,
    ContentAnalysis,
    RoutingStats,
)

__all__ = ["AdaptivePipeline", "AdaptiveRouter", "ContentAnalysis", "RoutingStats"]
