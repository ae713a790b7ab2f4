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


class TestGradWeightModes:
    """The warp VJP's flow gradient = two windowed passes with derivative
    hat weights (weight_mode='grad_y'/'grad_x') — parity vs autodiff of the
    exact gather warp, including the zero-/integer-flow cases where a naive
    -sign(d) derivative would vanish (zero-init flow heads train on this)."""

    @pytest.mark.parametrize("border", ["replicate", "constant"])
    @pytest.mark.parametrize("flow_kind", ["random", "zero", "integer"])
    def test_flow_grad_parity(self, border, flow_kind):
        import jax

        from vfisr_tpu.core.warp import flow_warp

        rng = np.random.default_rng(7)
        n, h, w, c = 1, 32, 64, 3
        img = jnp.asarray(rng.random((n, h, w, c), np.float32))
        ct = jnp.asarray(rng.random((n, h, w, c), np.float32))
        if flow_kind == "random":
            flow = jnp.asarray((rng.random((n, h, w, 2), np.float32) - 0.5) * 8)
        elif flow_kind == "zero":
            flow = jnp.zeros((n, h, w, 2), jnp.float32)
        else:
            flow = jnp.asarray(rng.integers(-3, 4, (n, h, w, 2)).astype(np.float32))

        gy = warp_windowed(img, flow, 1.0, r=6, tile=(8, 128), border=border,
                           interpret=True, weight_mode="grad_y")
        gx = warp_windowed(img, flow, 1.0, r=6, tile=(8, 128), border=border,
                           interpret=True, weight_mode="grad_x")
        got = jnp.stack(
            [jnp.sum(ct * gx, axis=-1), jnp.sum(ct * gy, axis=-1)], axis=-1
        )
        ref = jax.grad(
            lambda f: jnp.sum(flow_warp(img, f, 1.0, border=border) * ct)
        )(flow)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
