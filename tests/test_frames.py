"""Frame conversion / padding contract tests (reference models/base.py helpers)."""

import numpy as np
import pytest

from vfisr_tpu.core import color, frames


def test_roundtrip_uint8(sample_rgb_frame):
    x = frames.to_batched(sample_rgb_frame)
    assert x.shape == (1, 480, 640, 3)
    assert x.dtype == np.float32
    back = frames.from_batched(x)
    assert np.array_equal(back, sample_rgb_frame)


def test_pad_to_multiple():
    x = np.zeros((1, 480, 640, 3), np.float32)
    padded, pads = frames.pad_to_multiple(x, 32)
    assert padded.shape == (1, 480, 640, 3)
    assert pads == (0, 0, 0, 0)

    x = np.zeros((1, 481, 641, 3), np.float32)
    padded, pads = frames.pad_to_multiple(x, 32)
    assert padded.shape == (1, 512, 672, 3)
    assert pads == (0, 31, 0, 31)
    out = frames.unpad(padded, 481, 641)
    assert out.shape == (1, 481, 641, 3)


def test_pad_reflect_semantics():
    x = np.arange(5, dtype=np.float32).reshape(1, 5, 1, 1)
    x = np.broadcast_to(x, (1, 5, 4, 1))
    padded, _ = frames.pad_to_multiple(x, 8)
    # reflect (edge not repeated): rows after 4 are 3, 2, 1
    assert padded.shape[1] == 8
    assert np.array_equal(np.asarray(padded)[0, :, 0, 0], [0, 1, 2, 3, 4, 3, 2, 1])


def test_default_timestamps():
    assert frames.get_default_timestamps(3) == [0.25, 0.5, 0.75]
    assert frames.get_default_timestamps(1) == [0.5]


def test_gray_matches_cv2(sample_rgb_frame):
    import cv2

    ref = cv2.cvtColor(sample_rgb_frame, cv2.COLOR_RGB2GRAY)
    ours = np.asarray(color.rgb_to_gray(sample_rgb_frame))
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.max() <= 1
    assert np.mean(diff == 0) > 0.99


def test_to_uint8_rounding():
    x = np.array([0.0, 0.4 / 255, 0.6 / 255, 1.0, 1.5], np.float32)
    out = np.asarray(frames.to_uint8(x))
    assert out.tolist() == [0, 0, 1, 255, 255]
