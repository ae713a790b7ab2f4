"""Test fixtures.

Runs the whole suite on a virtual 8-device CPU mesh so multi-chip sharding
paths are exercised without TPU hardware (set BEFORE jax import). Synthetic
frame fixtures mirror the reference's tests/conftest.py:15-55 (random RGB
frame, np.roll-shifted pair, gradient frame).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the env presets a TPU platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# A sitecustomize (axon) re-injects JAX_PLATFORMS=axon; the config update
# below wins as long as it runs before first backend use.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def sample_rgb_frame(rng):
    """Random 480x640 RGB uint8 frame (reference conftest.py:15-20)."""
    return rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)


@pytest.fixture
def sample_frame_pair(sample_rgb_frame):
    """Frame + 5px-rolled copy: synthetic motion (reference conftest.py:23-30)."""
    f0 = sample_rgb_frame
    f1 = np.roll(f0, shift=5, axis=1)
    return f0, f1


@pytest.fixture
def sample_gradient_frame():
    """Smooth gradient frame — resampling-friendly content."""
    y = np.linspace(0, 255, 480, dtype=np.float32)[:, None]
    x = np.linspace(0, 255, 640, dtype=np.float32)[None, :]
    g = (y + x) / 2
    return np.stack([g, g * 0.5, 255 - g], axis=-1).astype(np.uint8)


@pytest.fixture
def smooth_rgb_frame(rng):
    """Low-frequency random frame (random field blurred) — for kernels whose
    cv2 counterparts use fixed-point math where white noise maximizes
    rounding disagreement."""
    import cv2

    base = rng.integers(0, 256, (120, 160, 3), dtype=np.uint8)
    big = cv2.resize(base, (640, 480), interpolation=cv2.INTER_CUBIC)
    return big
