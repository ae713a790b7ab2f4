"""Inline-method behavior tests (UAFI/MCAR/UGHI/blend/edge/frame_dup)."""

import numpy as np
import pytest

from vfisr_tpu.methods.inline import (
    calc_motion,
    detect_ui_mask,
    edge_enhance,
    estimate_motion_complexity,
    estimate_uncertainty,
    flow_interpolate,
    frame_dup,
    linear_blend,
    mcar_interpolate_cached,
    ui_aware_interpolate,
    ughi_interpolate,
)


@pytest.fixture(scope="module")
def pair():
    import cv2

    rng = np.random.default_rng(7)
    base = cv2.resize(rng.integers(0, 256, (17, 30, 3), np.uint8), (240, 136),
                      interpolation=cv2.INTER_CUBIC)
    return base, np.roll(base, 4, axis=1)


def test_linear_blend_endpoints(pair):
    f0, f1 = pair
    assert np.array_equal(linear_blend(f0, f1, 0.0), f0)
    assert np.array_equal(linear_blend(f0, f1, 1.0), f1)
    mid = linear_blend(f0, f1, 0.5)
    expected = ((f0.astype(int) + f1.astype(int)) // 2)
    assert np.abs(mid.astype(int) - expected).max() <= 1


def test_frame_dup(pair):
    f0, f1 = pair
    assert np.array_equal(frame_dup(f0, f1, 0.5), f0)


def test_edge_enhance_sharpens(pair):
    f0, _ = pair
    out = edge_enhance(f0, 1.3)
    assert out.shape == f0.shape and out.dtype == np.uint8
    # unsharp mask increases local variance
    assert out.astype(float).var() > f0.astype(float).var()
    assert edge_enhance(f0, 0) is f0


def test_calc_motion_detects_shift(pair):
    import cv2

    f0, f1 = pair
    g0 = cv2.cvtColor(f0, cv2.COLOR_RGB2GRAY)
    g1 = cv2.cvtColor(f1, cv2.COLOR_RGB2GRAY)
    moving = calc_motion(g0, g1)
    static = calc_motion(g0, g0)
    assert moving > static
    assert static < 0.3


def test_uafi_preserves_static_hud(pair):
    import cv2

    f0, f1 = pair.__class__(pair)  # copy tuple
    f0 = pair[0].copy()
    f1 = pair[1].copy()
    # burn a static HUD box into both frames
    for f in (f0, f1):
        cv2.rectangle(f, (10, 110), (80, 130), (255, 255, 255), -1)
        cv2.putText(f, "HP", (14, 126), cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 0, 0), 2)
    mid = ui_aware_interpolate(f0, f1, 0.25)
    assert mid.shape == f0.shape and mid.dtype == np.uint8


def test_mcar_tiers(pair):
    import cv2

    f0, f1 = pair
    g0 = cv2.cvtColor(f0, cv2.COLOR_RGB2GRAY)
    g1 = cv2.cvtColor(f1, cv2.COLOR_RGB2GRAY)
    complexity, flow = estimate_motion_complexity(g0, g1)
    assert 0.0 <= complexity <= 1.0
    assert flow.shape == (*g0.shape, 2)
    # low threshold forces linear tier; high forces flow tier
    out, tier = mcar_interpolate_cached(f0, f1, 0.5, 0.1, flow,
                                        threshold_low=0.5, threshold_high=0.9)
    assert tier == "linear"
    out, tier = mcar_interpolate_cached(f0, f1, 0.5, 0.6, flow,
                                        threshold_low=0.5, threshold_high=0.9)
    assert tier == "flow"
    # rife tier falls back to flow when no model given
    out, tier = mcar_interpolate_cached(f0, f1, 0.5, 0.95, flow,
                                        threshold_low=0.5, threshold_high=0.9)
    assert tier == "flow"


@pytest.mark.slow
def test_ughi_returns_uncertainty(pair):
    f0, f1 = pair
    mid, unc = ughi_interpolate(f0, f1, 0.5)
    assert mid.shape == f0.shape
    assert 0.0 <= unc <= 1.0


def test_flow_interpolate_endpointish(pair):
    f0, f1 = pair
    near0 = flow_interpolate(f0, f1, 0.05)
    # at t~0 output should be close to f0 (interior)
    diff = np.abs(near0[10:-10, 10:-10].astype(int) - f0[10:-10, 10:-10].astype(int))
    assert diff.mean() < 20
