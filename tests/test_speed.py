"""Device-time measurement (evaluation/speed.py).

The reference documents but never implements real device timing
(INFO.md:564-607); ours must actually measure compute, not dispatch. The
chained-marginal method is validated by checking it scales with the work
inside the measured function.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vfisr_tpu.evaluation.speed import measure


def _work(x, reps):
    def fn(x):
        def body(_, a):
            return (a @ a) * (1.0 / jnp.maximum(jnp.max(jnp.abs(a)), 1e-3))

        return jax.lax.fori_loop(0, reps, body, x)

    return fn


class TestMeasure:
    def test_device_marginal_reports_positive_time(self):
        x = jnp.asarray(np.random.default_rng(0).random((256, 256), np.float32))
        stats = measure(_work(x, 8), x, iterations=8, warmup=1, reps=2)
        assert stats.method == "device_marginal"
        assert stats.mean_ms > 0
        assert stats.p99_ms >= stats.p50_ms >= 0
        assert stats.to_dict()["method"] == "device_marginal"

    def test_scales_with_work(self):
        # 16x the inner matmuls must take measurably longer per call:
        # a dispatch-latency measurement (the broken block_until_ready
        # bracketing) would report the same near-zero time for both.
        x = jnp.asarray(np.random.default_rng(0).random((384, 384), np.float32))
        small = measure(_work(x, 2), x, iterations=8, warmup=1, reps=3)
        big = measure(_work(x, 32), x, iterations=8, warmup=1, reps=3)
        assert big.mean_ms > small.mean_ms * 3

    def test_host_fallback_for_untraceable_fn(self):
        x = jnp.ones((8, 8), jnp.float32)

        def fn(x):
            # data-dependent host branch -> not traceable
            if float(jnp.sum(x)) > 0:
                return x + 1.0
            return x

        stats = measure(fn, x, iterations=4, warmup=1)
        assert stats.method == "host_wall_clock"
        assert stats.mean_ms >= 0

    def test_throughput_uses_frames_per_call(self):
        x = jnp.ones((64, 64), jnp.float32)
        s1 = measure(_work(x, 2), x, iterations=6, warmup=1, reps=2,
                     frames_per_call=1)
        assert s1.throughput_fps == pytest.approx(1000.0 / s1.mean_ms, rel=1e-6)
