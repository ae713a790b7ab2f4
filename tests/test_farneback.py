"""Farneback flow parity vs cv2.calcOpticalFlowFarneback.

Flow fields can't match bitwise across implementations; we assert endpoint
error on synthetic translations and parity of the downstream statistics the
framework actually consumes (mean/max/std magnitude — SURVEY §7.4.1).
"""

import cv2
import numpy as np
import pytest

from vfisr_tpu.ops.flow import farneback_flow, flow_magnitude


def _textured(rng, h=240, w=320):
    base = rng.integers(0, 256, (h // 4, w // 4), np.uint8)
    return cv2.resize(base, (w, h), interpolation=cv2.INTER_CUBIC)


@pytest.mark.parametrize("shift", [(3.0, 1.5), (-5.0, 2.0)])
@pytest.mark.slow
def test_translation_parity(rng, shift):
    img = _textured(rng)
    M = np.float32([[1, 0, shift[0]], [0, 1, shift[1]]])
    img2 = cv2.warpAffine(img, M, (img.shape[1], img.shape[0]))
    ref = cv2.calcOpticalFlowFarneback(img, img2, None, 0.5, 3, 15, 3, 5, 1.2, 0)
    ours = np.asarray(farneback_flow(img, img2))
    c = np.s_[20:-20, 20:-20]
    epe = np.sqrt(((ref - ours) ** 2).sum(-1))
    assert epe[c].mean() < 0.1, f"EPE vs cv2 = {epe[c].mean():.4f}"
    assert abs(ours[c][..., 0].mean() - shift[0]) < 0.2
    assert abs(ours[c][..., 1].mean() - shift[1]) < 0.2


def test_downstream_stats_parity(rng):
    """Stats the router/metrics consume must match cv2 closely."""
    img = _textured(rng)
    # rotation-ish warp for a non-uniform field
    M = cv2.getRotationMatrix2D((160, 120), 1.5, 1.02)
    img2 = cv2.warpAffine(img, M, (320, 240))
    ref = cv2.calcOpticalFlowFarneback(img, img2, None, 0.5, 3, 15, 3, 5, 1.2, 0)
    ours = np.asarray(farneback_flow(img, img2))
    mr = np.sqrt((ref**2).sum(-1))
    mo = np.asarray(flow_magnitude(ours))
    assert abs(mr.mean() - mo.mean()) < 0.1
    assert abs(mr.std() - mo.std()) < 0.15
    assert abs(mr.max() - mo.max()) < 1.0


def test_calc_motion_params(rng):
    """The run_experiments calc_motion parameterization (1 level, 1 iter)."""
    img = _textured(rng, 120, 160)
    M = np.float32([[1, 0, 2.0], [0, 1, 0.0]])
    img2 = cv2.warpAffine(img, M, (160, 120))
    ref = cv2.calcOpticalFlowFarneback(img, img2, None, 0.5, 1, 15, 1, 5, 1.1, 0)
    ours = np.asarray(
        farneback_flow(img, img2, pyr_scale=0.5, levels=1, winsize=15,
                       iterations=1, poly_n=5, poly_sigma=1.1)
    )
    c = np.s_[15:-15, 15:-15]
    epe = np.sqrt(((ref - ours) ** 2).sum(-1))
    assert epe[c].mean() < 0.15


@pytest.mark.slow
def test_batched_matches_single(rng):
    img = _textured(rng, 120, 160)
    M = np.float32([[1, 0, 1.0], [0, 1, 1.0]])
    img2 = cv2.warpAffine(img, M, (160, 120))
    single = np.asarray(farneback_flow(img, img2))
    batched = np.asarray(
        farneback_flow(np.stack([img, img]), np.stack([img2, img2]))
    )
    assert batched.shape == (2, 120, 160, 2)
    assert np.allclose(batched[0], single, atol=1e-5)
    assert np.allclose(batched[1], single, atol=1e-5)


def test_zero_motion(rng):
    img = _textured(rng, 120, 160)
    flow = np.asarray(farneback_flow(img, img))
    assert np.abs(flow).mean() < 0.02
