"""Golden-parity: flow_warp / remap_bilinear vs cv2.remap."""

import cv2
import numpy as np

from vfisr_tpu.core.warp import flow_warp, remap_bilinear


def test_remap_matches_cv2(smooth_rgb_frame, rng):
    h, w = smooth_rgb_frame.shape[:2]
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    map_x = xs + rng.normal(0, 3, (h, w)).astype(np.float32)
    map_y = ys + rng.normal(0, 3, (h, w)).astype(np.float32)
    ref = cv2.remap(smooth_rgb_frame, map_x, map_y, cv2.INTER_LINEAR)
    img = smooth_rgb_frame.astype(np.float32)[None]
    ours = np.asarray(remap_bilinear(img, map_x[None], map_y[None]))[0]
    ours_u8 = np.clip(np.floor(ours + 0.5), 0, 255).astype(np.uint8)
    diff = np.abs(ours_u8.astype(int) - ref.astype(int))
    # cv2.remap uses 5-bit fixed-point fractional coords → small quantization
    assert np.mean(diff <= 3) > 0.99
    assert diff.mean() < 1.0


def test_flow_warp_translation(sample_rgb_frame):
    """Constant integer flow == roll (away from borders)."""
    img = sample_rgb_frame.astype(np.float32)[None]
    flow = np.zeros((1, *sample_rgb_frame.shape[:2], 2), np.float32)
    flow[..., 0] = 5.0  # sample from x+5 → shifts content left by 5
    out = np.asarray(flow_warp(img, flow, 1.0))[0]
    assert np.allclose(out[:, :-5], img[0][:, 5:], atol=1e-3)


def test_flow_warp_t_scaling(sample_rgb_frame):
    img = sample_rgb_frame.astype(np.float32)[None]
    flow = np.full((1, *sample_rgb_frame.shape[:2], 2), 4.0, np.float32)
    half = np.asarray(flow_warp(img, flow, 0.5))
    full = np.asarray(flow_warp(img, flow * 0.5, 1.0))
    assert np.allclose(half, full, atol=1e-4)


def test_flow_warp_zero_border(sample_rgb_frame):
    img = np.full((1, 32, 32, 3), 255.0, np.float32)
    flow = np.full((1, 32, 32, 2), 40.0, np.float32)  # everything out of range
    out = np.asarray(flow_warp(img, flow, 1.0))
    assert np.all(out == 0.0)


def test_warp_transpose_shifted_matches_gather_vjp():
    import jax.numpy as jnp

    """Dense shifted adjoint (SAFA feature-warp image gradient) vs
    jax.grad of the gather warp, for flows within the clamp."""
    import jax

    from vfisr_tpu.core.warp import flow_warp, warp_transpose_shifted

    rng = np.random.default_rng(2)
    n, h, w, c = 1, 20, 28, 5
    img = jnp.asarray(rng.random((n, h, w, c), np.float32))
    ct = jnp.asarray(rng.random((n, h, w, c), np.float32))
    for border in ("replicate", "constant"):
        for flow in (
            jnp.asarray((rng.random((n, h, w, 2), np.float32) - 0.5) * 10),
            jnp.zeros((n, h, w, 2), jnp.float32),
        ):
            ref = jax.grad(
                lambda i: jnp.sum(flow_warp(i, flow, 1.0, border=border) * ct)
            )(img)
            got = warp_transpose_shifted(ct, flow, 1.0, border=border,
                                         max_disp=6)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=2e-6)
