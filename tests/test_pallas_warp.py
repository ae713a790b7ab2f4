"""Pallas windowed-warp parity vs the exact gather warp (interpret mode —
the compiled path is validated on TPU by bench/verify runs)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from vfisr_tpu.core.warp import flow_warp
from vfisr_tpu.ops.pallas.warp import warp_windowed


@pytest.fixture(scope="module")
def small_case():
    rng = jax.random.PRNGKey(0)
    n, h, w, c = 1, 64, 256, 1
    img = jax.random.uniform(rng, (n, h, w, c))
    ys = jax.lax.broadcasted_iota(jnp.float32, (n, h, w), 1)
    xs = jax.lax.broadcasted_iota(jnp.float32, (n, h, w), 2)
    flow = jnp.stack([3.0 * jnp.sin(xs / 40.0) + 2.0, 2.0 * jnp.cos(ys / 30.0) - 1.0], -1)
    return img, flow


def test_matches_gather_replicate(small_case):
    img, flow = small_case
    ref = np.asarray(flow_warp(img, flow, 1.0, border="replicate"))
    out = np.asarray(warp_windowed(img, flow, 1.0, r=8, interpret=True))
    assert np.abs(ref - out).max() < 1e-4


def test_zero_flow_identity(small_case):
    img, _ = small_case
    zero = jnp.zeros((*img.shape[:3], 2))
    out = np.asarray(warp_windowed(img, zero, 1.0, r=8, interpret=True))
    assert np.abs(out - np.asarray(img)).max() < 1e-6


def test_constant_border_masks_outside(small_case):
    img, _ = small_case
    flow = jnp.full((*img.shape[:3], 2), 300.0)  # everything out of range
    out = np.asarray(warp_windowed(img, flow, 1.0, r=8, border="constant", interpret=True))
    assert np.abs(out).max() == 0.0


def test_bf16_window_close_to_f32(small_case):
    img, flow = small_case
    ref = np.asarray(flow_warp(img, flow, 1.0, border="replicate"))
    out = np.asarray(
        warp_windowed(
            img, flow, 1.0, r=8, interpret=True, compute_dtype=jnp.bfloat16
        )
    )
    # window + weights in bf16: worst case ~2 bf16 ulps of the pixel
    # (≈56 dB PSNR noise floor — far below any VFI quality level)
    assert np.abs(ref - out).max() < 2.0 / 255.0


def test_asymmetric_radius_matches_gather(small_case):
    img, flow = small_case
    ref = np.asarray(flow_warp(img, flow, 1.0, border="replicate"))
    out = np.asarray(warp_windowed(img, flow, 1.0, r=(4, 6), interpret=True))
    assert np.abs(ref - out).max() < 1e-4


def test_constant_border_partial_band(small_case):
    """Per-tap zero blending at the border must match cv2.remap semantics
    (sub-pixel boundary pixels blend content with zeros)."""
    img, flow = small_case
    ref = np.asarray(flow_warp(img, flow, 1.0, border="constant"))
    out = np.asarray(
        warp_windowed(img, flow, 1.0, r=8, border="constant", interpret=True)
    )
    assert np.abs(ref - out).max() < 1e-4
