"""Golden-parity tests for classical vision kernels vs OpenCV."""

import cv2
import numpy as np
import pytest

from vfisr_tpu.ops import (
    box_filter,
    canny,
    dilate,
    erode,
    gaussian_blur,
    laplacian,
    morph_close,
    sobel,
    ssim,
    ssim_global,
)


@pytest.fixture
def gray(smooth_rgb_frame):
    return cv2.cvtColor(smooth_rgb_frame, cv2.COLOR_RGB2GRAY)


def test_gaussian_blur_matches_cv2(gray):
    ref = cv2.GaussianBlur(gray.astype(np.float32), (0, 0), 2)
    ours = np.asarray(gaussian_blur(gray.astype(np.float32), 0, 2.0))
    assert np.abs(ours - ref).max() < 0.1


def test_gaussian_blur_fixed_ksize(gray):
    ref = cv2.GaussianBlur(gray.astype(np.float32), (5, 5), 1.5)
    ours = np.asarray(gaussian_blur(gray.astype(np.float32), 5, 1.5))
    assert np.abs(ours - ref).max() < 0.1


def test_sobel_matches_cv2(gray):
    g = gray.astype(np.float32)
    ref_x = cv2.Sobel(g, cv2.CV_32F, 1, 0, ksize=3)
    ref_y = cv2.Sobel(g, cv2.CV_32F, 0, 1, ksize=3)
    ours_x = np.asarray(sobel(g, "x"))
    ours_y = np.asarray(sobel(g, "y"))
    assert np.abs(ours_x - ref_x).max() < 1e-2
    assert np.abs(ours_y - ref_y).max() < 1e-2


def test_laplacian_matches_cv2(gray):
    g = gray.astype(np.float32)
    ref = cv2.Laplacian(g, cv2.CV_32F)
    ours = np.asarray(laplacian(g))
    assert np.abs(ours - ref).max() < 1e-2


def test_box_filter_matches_cv2(gray):
    g = gray.astype(np.float32)
    ref = cv2.blur(g, (7, 7))
    ours = np.asarray(box_filter(g, 7))
    # interior exact; border modes differ slightly (cv2.blur default reflect101)
    assert np.abs(ours - ref).max() < 0.05


def test_morphology_matches_cv2():
    rng = np.random.default_rng(1)
    mask = (rng.random((64, 64)) > 0.7).astype(np.uint8)
    k = np.ones((5, 5), np.uint8)
    assert np.array_equal(np.asarray(dilate(mask, 5)), cv2.dilate(mask, k))
    assert np.array_equal(np.asarray(erode(mask, 5)), cv2.erode(mask, k))
    assert np.array_equal(
        np.asarray(morph_close(mask, 5)), cv2.morphologyEx(mask, cv2.MORPH_CLOSE, k)
    )


def test_canny_overlaps_cv2(gray):
    ref = cv2.Canny(gray, 100, 200) > 0
    ours = np.asarray(canny(gray, 100, 200)) > 0
    inter = (ref & ours).sum()
    union = (ref | ours).sum()
    if union == 0:
        return
    iou = inter / union
    assert iou > 0.85, f"Canny IoU {iou:.3f}"
    # edge density (the quantity MCAR/UI metrics consume) within 10% rel
    assert abs(ours.mean() - ref.mean()) < 0.1 * max(ref.mean(), 1e-6)


def test_ssim_properties(gray, rng):
    g = gray.astype(np.float32)
    assert float(ssim(g, g)) == pytest.approx(1.0, abs=1e-5)
    noisy = np.clip(g + rng.normal(0, 5, g.shape), 0, 255).astype(np.float32)
    s = float(ssim(g, noisy))
    assert 0.5 < s < 1.0
    opposite = 255.0 - g
    assert float(ssim(g, opposite)) < s


def test_ssim_batched(gray):
    g = gray.astype(np.float32)
    batch = np.stack([g, g * 0.5])
    out = np.asarray(ssim(batch, batch))
    assert out.shape == (2,)
    assert np.allclose(out, 1.0, atol=1e-5)


def test_ssim_global_reference_formula(gray, rng):
    """Cross-check vs an independent numpy transcription of
    run_experiments.py:304-312."""
    g = gray.astype(float)
    noisy = np.clip(g + rng.normal(0, 10, g.shape), 0, 255)
    C1, C2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    mu1, mu2 = g.mean(), noisy.mean()
    s1, s2 = ((g - mu1) ** 2).mean(), ((noisy - mu2) ** 2).mean()
    s12 = ((g - mu1) * (noisy - mu2)).mean()
    expected = ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / (
        (mu1**2 + mu2**2 + C1) * (s1 + s2 + C2)
    )
    ours = float(ssim_global(g, noisy))
    assert ours == pytest.approx(max(0.0, min(1.0, expected)), abs=1e-5)
