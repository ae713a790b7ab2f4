"""Golden-parity tests: vfisr_tpu.core.resize vs cv2.resize.

cv2.resize uses fixed-point accumulation internally, so parity is asserted
at small absolute tolerances on uint8 output, not bitwise.
"""

import cv2
import numpy as np
import pytest

from vfisr_tpu.core.resize import crop_16_9, resize, scale_size

CV2_METHOD = {
    "nearest": cv2.INTER_NEAREST,
    "linear": cv2.INTER_LINEAR,
    "cubic": cv2.INTER_CUBIC,
    "lanczos4": cv2.INTER_LANCZOS4,
    "area": cv2.INTER_AREA,
}


def _cv2_resize(img, out_h, out_w, method):
    return cv2.resize(img, (out_w, out_h), interpolation=CV2_METHOD[method])


@pytest.mark.parametrize("method", ["linear", "cubic", "lanczos4"])
@pytest.mark.parametrize("out_hw", [(360, 480), (640, 853), (480, 640)])
def test_resize_matches_cv2(smooth_rgb_frame, method, out_hw):
    out_h, out_w = out_hw
    ours = np.asarray(resize(smooth_rgb_frame, (out_h, out_w), method))
    ref = _cv2_resize(smooth_rgb_frame, out_h, out_w, method)
    assert ours.shape == ref.shape
    diff = np.abs(ours.astype(int) - ref.astype(int))
    # allow ±2 LSB on ≥99.5% of pixels, small mean error
    assert np.mean(diff <= 2) > 0.995, f"{method} {out_hw}: mean diff {diff.mean()}"
    assert diff.mean() < 1.0


def test_resize_nearest_exact(sample_rgb_frame):
    ours = np.asarray(resize(sample_rgb_frame, (123, 321), "nearest"))
    ref = _cv2_resize(sample_rgb_frame, 123, 321, "nearest")
    assert np.array_equal(ours, ref)


def test_resize_area_downscale(smooth_rgb_frame):
    # integer-factor (2x) decimation: exact box average
    ours = np.asarray(resize(smooth_rgb_frame, (240, 320), "area"))
    ref = _cv2_resize(smooth_rgb_frame, 240, 320, "area")
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert np.mean(diff <= 1) > 0.999
    # fractional factor
    ours = np.asarray(resize(smooth_rgb_frame, (270, 360), "area"))
    ref = _cv2_resize(smooth_rgb_frame, 270, 360, "area")
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert np.mean(diff <= 2) > 0.99


def test_resize_upscale_1333(smooth_rgb_frame):
    """The headline SR factor: 1.333x (1080p→1440p geometry)."""
    h, w = smooth_rgb_frame.shape[:2]
    out_h, out_w = scale_size(h, w, 1.333)
    for method in ("cubic", "lanczos4"):
        ours = np.asarray(resize(smooth_rgb_frame, (out_h, out_w), method))
        ref = _cv2_resize(smooth_rgb_frame, out_h, out_w, method)
        diff = np.abs(ours.astype(int) - ref.astype(int))
        assert np.mean(diff <= 2) > 0.995
        assert diff.mean() < 1.0


def test_resize_identity(sample_rgb_frame):
    out = np.asarray(resize(sample_rgb_frame, sample_rgb_frame.shape[:2], "cubic"))
    assert np.array_equal(out, sample_rgb_frame)


def test_resize_batched(sample_rgb_frame):
    batch = np.stack([sample_rgb_frame] * 3)
    out = np.asarray(resize(batch, (240, 320), "linear"))
    single = np.asarray(resize(sample_rgb_frame, (240, 320), "linear"))
    assert out.shape == (3, 240, 320, 3)
    assert np.array_equal(out[0], single)


def test_resize_float_dtype(sample_rgb_frame):
    x = sample_rgb_frame.astype(np.float32) / 255.0
    out = np.asarray(resize(x, (240, 320), "lanczos4"))
    assert out.dtype == np.float32


def test_crop_16_9():
    x = np.zeros((1080, 3840, 3), np.uint8)
    out = crop_16_9(x)
    assert out.shape == (1080, 1920, 3)
    x = np.zeros((1000, 1000, 3), np.uint8)
    out = crop_16_9(x)
    assert out.shape[1] == 1000 and out.shape[0] == 562


@pytest.mark.parametrize("method", ["linear", "cubic", "lanczos4", "area"])
@pytest.mark.parametrize("sizes", [(270, 360), (1080, 1440), (540, 167)])
def test_banded_matmul_matches_tap_path(method, sizes):
    """The TPU matmul path (block-banded) must agree with the gather/tap
    path used on CPU — same tap tables, different evaluation order."""
    import jax
    import jax.numpy as jnp

    from vfisr_tpu.core.resize import _apply_axis_matmul, _tap_table_cached, _apply_axis

    in_size, out_size = sizes
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((2, in_size, 31, 3), np.float32))
    got = np.asarray(
        _apply_axis_matmul(x, in_size, out_size, method, 1,
                           jax.lax.Precision.HIGHEST)
    )
    idx, w = _tap_table_cached(in_size, out_size, method)
    want = np.asarray(_apply_axis(x, idx, w, 1))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_banded_matmul_width_axis():
    import jax
    import jax.numpy as jnp

    from vfisr_tpu.core.resize import _apply_axis_matmul, _tap_table_cached, _apply_axis

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.random((1, 24, 960, 3), np.float32))
    got = np.asarray(
        _apply_axis_matmul(x, 960, 1280, "lanczos4", 2, jax.lax.Precision.HIGHEST)
    )
    idx, w = _tap_table_cached(960, 1280, "lanczos4")
    want = np.asarray(_apply_axis(x, idx, w, 2))
    np.testing.assert_allclose(got, want, atol=2e-5)
