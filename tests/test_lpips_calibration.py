"""Calibrated LPIPS heads: ranking validity is pinned, not assumed.

The official 2AFC heads cannot exist in this environment (zero egress);
the shipped substitute (weights/lpips_heads.npz, trained by
scripts/calibrate_lpips.py on synthetic ranked distortions) must
demonstrably rank-order distortions — VERDICT r2 task 6's done-criterion.
"""

import numpy as np
import pytest

from vfisr_tpu.evaluation.lpips import LPIPS
from vfisr_tpu.evaluation.lpips_calibrate import (
    FAMILIES,
    SEVERITIES,
    build_pairs,
    distort,
    evaluate_heads,
    make_base_patches,
    severity_spearman,
)
from vfisr_tpu.utils.paths import REPO_ROOT

HEADS_PATH = REPO_ROOT / "weights" / "lpips_heads.npz"


def _load_heads():
    if not HEADS_PATH.exists():
        pytest.skip("lpips_heads.npz not generated yet")
    data = np.load(HEADS_PATH)
    return {k: data[k] for k in data.files}


class TestCalibratedHeads:
    def test_mode_reported(self):
        if not HEADS_PATH.exists():
            pytest.skip("lpips_heads.npz not generated yet")
        lp = LPIPS()
        assert lp.mode == "calibrated_heads"
        for i in range(5):
            assert (np.asarray(lp.params[f"lin{i}_w"]) >= 0).all()

    def test_severity_monotonicity(self):
        heads = _load_heads()
        rho = severity_spearman(heads, np.random.default_rng(7), n_patches=2)
        assert np.mean(list(rho.values())) >= 0.9, rho
        for fam, r in rho.items():
            assert r >= 0.6, f"{fam} non-monotone: {r}"

    def test_2afc_accuracy_on_fresh_pairs(self):
        heads = _load_heads()
        refs, near, far = build_pairs(np.random.default_rng(99),
                                      n_patches=4, cross_per_patch=6)
        rep = evaluate_heads(heads, refs, near, far)
        assert rep["accuracy_2afc"] >= 0.85, rep

    def test_blend_ghosting_increases_with_displacement(self):
        # the VFI-specific failure mode: larger blend displacement must
        # read as perceptually worse
        heads = _load_heads()
        lp = LPIPS(weights_path="__nonexistent__", seed=0)
        for i in range(5):
            lp.params[f"lin{i}_w"] = heads[f"lin{i}_w"]
        rng = np.random.default_rng(3)
        base = make_base_patches(rng, 2)
        for b in base:
            ds = [float(lp(distort(b, "ghost", s, rng), b)[0])
                  for s in SEVERITIES]
            assert ds[-1] > ds[0], ds
