"""Fused flagship step (pipeline/flagship.py): composite semantics +
registry-model contract. Reference semantics: scene-cut repeat
(adaptive_pipeline.py:388), HUD compositing source=f0/f1 by t (:399-409)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vfisr_tpu.models.sota.rife import IFNet, RIFEConfig, shared_flow_apply
from vfisr_tpu.pipeline.flagship import (
    FlagshipConfig,
    init_history,
    make_flagship_step,
    push_history,
)


@pytest.fixture(scope="module")
def tiny_ifnet():
    cfg = RIFEConfig(scales=(4, 2, 1), channels=(16, 12, 8), num_convs=2)
    module = IFNet(cfg)
    params = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((1, 64, 64, 3)), jnp.asarray([0.5]),
    )["params"]
    return module, params


def _smooth(rng, h=64, w=96):
    import cv2

    x = cv2.resize(rng.random((h // 8, w // 8, 3)).astype(np.float32), (w, h),
                   interpolation=cv2.INTER_CUBIC)
    return np.clip(x, 0, 1)


class TestFlagshipStep:
    def test_scene_cut_repeats_frame0(self, tiny_ifnet):
        module, params = tiny_ifnet
        rng = np.random.default_rng(0)
        a = jnp.asarray(_smooth(rng))[None]
        b = jnp.asarray(1.0 - _smooth(np.random.default_rng(9)))[None]  # cut
        cfg = FlagshipConfig(out_hw=(96, 128), analysis_hw=(32, 64),
                             scene_ssim_threshold=0.99)  # force the gate
        step = jax.jit(make_flagship_step(module, params, cfg))
        hist, hcnt = init_history(1)
        up, mids, hist, hcnt, sig = step(a, b, hist, hcnt)
        assert bool(sig["is_scene_change"][0])
        np.testing.assert_allclose(np.asarray(mids[0]), np.asarray(a[0]),
                                   atol=1e-6)

    def test_hud_composite_sources_by_timestep(self, tiny_ifnet):
        module, params = tiny_ifnet
        rng = np.random.default_rng(1)
        a = jnp.asarray(_smooth(rng))[None]
        b = jnp.roll(a, 5, axis=2)
        cfg = FlagshipConfig(out_hw=(96, 128), analysis_hw=(32, 64),
                             hud_var_threshold=1e9,  # everything is "HUD"
                             hud_coverage_threshold=0.0,
                             hud_agree_eps=0.0,  # mechanics test: no
                             # pair-agreement refinement (moving pixels
                             # must composite too, to observe sourcing)
                             scene_ssim_threshold=0.0)
        step = jax.jit(make_flagship_step(module, params, cfg))
        hist, hcnt = init_history(1)
        hcnt = hcnt + 5  # pretend history is warm
        up, mids, _, _, sig = step(a, b, hist, hcnt)
        assert float(sig["hud_coverage"][0]) > 0.99
        # t=0.25, 0.5 -> source x0; t=0.75 -> source x1
        np.testing.assert_allclose(np.asarray(mids[0]), np.asarray(a[0]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(mids[2]), np.asarray(b[0]), atol=1e-6)

    def test_history_ring_shifts(self):
        hist, cnt = init_history(1)
        frame = jnp.ones((1, 32, 48, 3)) * 0.5
        h2, c2 = push_history(hist, cnt, frame)
        assert int(c2[0]) == 1
        assert float(jnp.abs(h2[:, -1]).sum()) > 0  # newest slot filled
        assert float(jnp.abs(h2[:, 0]).sum()) == 0  # oldest still empty

    def test_shared_flow_anchor_exact(self, tiny_ifnet):
        module, params = tiny_ifnet
        rng = np.random.default_rng(2)
        a = jnp.asarray(_smooth(rng))[None]
        b = jnp.roll(a, 3, axis=2)
        out = shared_flow_apply(module, params, a, b, (0.25, 0.5, 0.75))
        assert out.shape == (3, 64, 96, 3)
        exact, _, _ = module.apply({"params": params}, a, b, jnp.full((1,), 0.5))
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(exact[0]),
                                   atol=1e-6)


class TestFlagshipModel:
    @pytest.mark.slow
    def test_registry_contract(self):
        from vfisr_tpu.models.registry import get_model, list_models

        assert "flagship" in list_models()
        m = get_model("flagship", load=True)
        assert m.info.supports_joint and m.info.parameters > 1_000_000
        f0 = (np.random.default_rng(3).random((64, 96, 3)) * 255).astype(np.uint8)
        f1 = np.roll(f0, 4, axis=1)
        res = m.process_pair(f0, f1, num_intermediate=3, target_scale=1.0)
        assert len(res.frames) == 5
        assert res.frames[0].shape == (64, 96, 3)
        assert res.frames[0].dtype == np.uint8
        for k in ("is_scene_change", "motion_mean", "hud_coverage",
                  "route_vfimamba"):
            assert k in res.extra_info
