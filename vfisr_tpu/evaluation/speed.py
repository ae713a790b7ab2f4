"""Device-time speed measurement with warmup and percentile aggregation.

The reference *documents* a correct GPU timing methodology (CUDA events,
50-iteration warmup, clock locking; INFO.md:564-607) but actually measures
wall clock everywhere (base.py:143-152, run_experiments.py:807). This module
implements the documented methodology natively for TPU.

Tunnel caveat (the whole reason this file isn't three lines): this
environment reaches the TPU through an async PJRT proxy where
``block_until_ready()`` returns immediately — bracketing a dispatch with it
measures launch latency (~0 ms), not device time, and a synchronous
readback costs ~30 ms of tunnel round-trip on top of the kernel. The only
valid device timing is the **chained-marginal method** (same as bench.py):
jit the measured function K times inside one ``lax.fori_loop`` with a data
dependence between iterations (so they serialize on device), and take the
marginal time between two loop lengths — the constant tunnel/dispatch
overhead cancels in the subtraction.

``measure`` traces ``fn`` into that loop automatically; functions that
cannot be traced (host code inside) fall back to wall-clock with a forced
readback, reported as ``method='host_wall_clock'``.

- warmup iterations absorb XLA compilation + autotuning,
- percentile aggregation (p50/p95/p99) matches run_benchmarks.py:204-240,
- throughput_fps = 1000/mean_ms × frames_per_call (run_benchmarks.py:236).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, List

import jax
import jax.numpy as jnp
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
    method: str = "device_marginal"
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
            "method": self.method,
        }


def _stats(samples: List[float], frames_per_call: int, iterations: int,
           warmup: int, method: str) -> SpeedStats:
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
        method=method,
        samples_ms=list(samples),
    )


def _readback(x) -> None:
    """Force a synchronous device->host readback of a tiny piece of x."""
    leaves = [a for a in jax.tree_util.tree_leaves(x) if hasattr(a, "shape")]
    if leaves:
        np.asarray(jax.device_get(leaves[0]))


def _chained_runner(fn: Callable, args: tuple) -> Callable[[int], Callable]:
    """Build run(k): jitted k-iteration loop over fn with data dependence.

    Each iteration's output is folded into the next iteration's first
    float-array argument as ``a + mean(out) * tiny`` — numerically a no-op
    (subnormal perturbation) but a real data dependence XLA cannot remove,
    so the k calls serialize on device.
    """
    flat_args, treedef = jax.tree_util.tree_flatten(args)
    feed_idx = next(
        i
        for i, a in enumerate(flat_args)
        if hasattr(a, "dtype") and jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
    )

    def make(k: int):
        @jax.jit
        def run(*fargs):
            flat = list(fargs)

            def body(_, flat):
                flat = list(flat)
                out = fn(*jax.tree_util.tree_unflatten(treedef, flat))
                s = jnp.zeros((), jnp.float32)
                for leaf in jax.tree_util.tree_leaves(out):
                    leaf = jnp.asarray(leaf)
                    if jnp.issubdtype(leaf.dtype, jnp.floating) or jnp.issubdtype(
                        leaf.dtype, jnp.integer
                    ):
                        s = s + jnp.mean(leaf).astype(jnp.float32)
                a = flat[feed_idx]
                flat[feed_idx] = a + (s * jnp.asarray(1e-38, jnp.float32)).astype(
                    a.dtype
                )
                return tuple(flat)

            flat = jax.lax.fori_loop(0, k, body, tuple(flat))
            return jnp.mean(flat[feed_idx]).astype(jnp.float32)

        return lambda: run(*flat_args)

    return make


# Marginal-time floor (ms). Host scheduling noise can make the subtraction
# (T_k2 - T_k1) momentarily nonpositive on a loaded machine; samples are
# retried and, as a last resort, clamped here so downstream throughput math
# never divides by <= 0.
_MIN_MARGINAL_MS = 1e-6


def measure(
    fn: Callable,
    *args,
    iterations: int = 50,
    warmup: int = 5,
    frames_per_call: int = 1,
    reps: int = 5,
    timer: Callable[[], float] = time.perf_counter,
) -> SpeedStats:
    """Time one call of ``fn(*args)`` on device; returns SpeedStats.

    Device path: chained-marginal timing — per-call time is
    ``(T(iterations) - T(k1)) / (iterations - k1)`` with both loop lengths
    jit-compiled, sampled ``reps`` times (warmup runs both compiles first).
    Falls back to wall-clock + forced readback if ``fn`` is not traceable.

    ``timer`` is injectable (a monotonic-seconds callable) so tests can
    assert on the aggregation deterministically instead of racing the real
    clock under host load.
    """
    iterations = max(int(iterations), 4)
    try:
        make = _chained_runner(fn, args)
        k1 = max(1, iterations // 8)
        run_k1, run_k2 = make(k1), make(iterations)
        for _ in range(max(warmup, 1)):  # absorbs both compiles
            np.asarray(run_k1())
            np.asarray(run_k2())

        def one_sample() -> float:
            t0 = timer()
            np.asarray(run_k1())
            t1 = timer()
            np.asarray(run_k2())
            t2 = timer()
            return ((t2 - t1) - (t1 - t0)) / (iterations - k1) * 1000.0

        samples = []
        for _ in range(max(reps, 2)):
            s = one_sample()
            retries = 0
            while s <= 0.0 and retries < 3:  # host-noise casualty: resample
                s = one_sample()
                retries += 1
            samples.append(max(s, _MIN_MARGINAL_MS))
        return _stats(samples, frames_per_call, iterations, warmup,
                      "device_marginal")
    except Exception:  # noqa: BLE001 — host code inside fn, etc.
        for _ in range(warmup):
            _readback(fn(*args))
        samples = []
        for _ in range(iterations):
            t0 = timer()
            _readback(fn(*args))
            samples.append(max((timer() - t0) * 1000.0, _MIN_MARGINAL_MS))
        return _stats(samples, frames_per_call, iterations, warmup,
                      "host_wall_clock")
