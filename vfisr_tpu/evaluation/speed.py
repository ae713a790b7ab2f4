"""Device-time speed measurement with warmup and percentile aggregation.

The reference *documents* a correct GPU timing methodology (CUDA events,
50-iteration warmup, clock locking; INFO.md:564-607) but actually measures
wall clock everywhere (base.py:143-152, run_experiments.py:807). This module
implements the documented methodology natively for TPU:

- warmup iterations absorb XLA compilation + autotuning,
- ``block_until_ready`` brackets give true device time (no async skew),
- percentile aggregation (p50/p95/p99) matches run_benchmarks.py:204-240,
- throughput_fps = 1000/mean_ms × frames_per_call (run_benchmarks.py:236).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, List

import jax
import numpy as np


@dataclass
class SpeedStats:
    """Latency statistics in milliseconds (run_benchmarks.py schema)."""

    mean_ms: float
    std_ms: float
    min_ms: float
    max_ms: float
    p50_ms: float
    p95_ms: float
    p99_ms: float
    throughput_fps: float
    n_iterations: int
    warmup_iterations: int
    samples_ms: List[float] = field(default_factory=list)

    def to_dict(self) -> dict:
        return {
            "mean_ms": self.mean_ms,
            "std_ms": self.std_ms,
            "min_ms": self.min_ms,
            "max_ms": self.max_ms,
            "p50_ms": self.p50_ms,
            "p95_ms": self.p95_ms,
            "p99_ms": self.p99_ms,
            "throughput_fps": self.throughput_fps,
            "n_iterations": self.n_iterations,
            "warmup_iterations": self.warmup_iterations,
        }


def _block(x):
    return jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready") else a, x
    )


def measure(
    fn: Callable,
    *args,
    iterations: int = 50,
    warmup: int = 5,
    frames_per_call: int = 1,
) -> SpeedStats:
    """Time ``fn(*args)`` on device with warmup; returns SpeedStats."""
    for _ in range(warmup):
        _block(fn(*args))
    samples = []
    for _ in range(iterations):
        t0 = time.perf_counter()
        _block(fn(*args))
        samples.append((time.perf_counter() - t0) * 1000.0)
    arr = np.asarray(samples)
    mean = float(arr.mean())
    return SpeedStats(
        mean_ms=mean,
        std_ms=float(arr.std()),
        min_ms=float(arr.min()),
        max_ms=float(arr.max()),
        p50_ms=float(np.percentile(arr, 50)),
        p95_ms=float(np.percentile(arr, 95)),
        p99_ms=float(np.percentile(arr, 99)),
        throughput_fps=(1000.0 / mean) * frames_per_call if mean > 0 else float("inf"),
        n_iterations=iterations,
        warmup_iterations=warmup,
        samples_ms=samples,
    )
