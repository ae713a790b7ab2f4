"""LPIPS (AlexNet backbone) in JAX/Flax.

The reference computes LPIPS through pyiqa / the `lpips` package
(evaluation/metrics.py:129-159, run_experiments.py:315-338: AlexNet
backbone, RGB input scaled to [-1, 1]). This module reproduces the exact
LPIPS-v0.1 computation graph:

    AlexNet features at 5 taps (post-ReLU of conv1..conv5)
    → channel-wise unit normalization
    → squared difference
    → learned non-negative 1x1 linear head per tap
    → spatial mean, summed over taps

Weights: the official LPIPS weights cannot be downloaded in this
environment (zero egress). `LPIPS.load(path)` consumes a converted ``.npz``
(see ``convert_torch_weights``) when available; otherwise deterministic
He-initialized features with uniform linear heads are used — random-feature
LPIPS is a documented, well-correlated perceptual proxy, and the mode is
reported as ``lpips_mode='random_features'`` so results are never silently
conflated with official-weight LPIPS.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# (out_ch, kernel, stride, pad)
_ALEX_CFG = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
# ImageNet normalization used by LPIPS' ScalingLayer (input in [-1, 1]).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

DEFAULT_WEIGHTS_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "weights",
    "lpips_alex.npz",
)


def _init_params(seed: int = 0) -> dict:
    """Deterministic He-init AlexNet + uniform heads (random-features mode)."""
    rng = np.random.default_rng(seed)
    params = {}
    in_ch = 3
    for i, (out_ch, k, _, _) in enumerate(_ALEX_CFG):
        fan_in = in_ch * k * k
        params[f"conv{i}_w"] = (
            rng.normal(0, np.sqrt(2.0 / fan_in), (k, k, in_ch, out_ch))
        ).astype(np.float32)
        params[f"conv{i}_b"] = np.zeros((out_ch,), np.float32)
        params[f"lin{i}_w"] = np.full((out_ch,), 1.0 / out_ch, np.float32)
        in_ch = out_ch
    return params


class LPIPS:
    """Callable LPIPS distance. Frames: uint8 HWC RGB or [N,H,W,3] float [0,1]."""

    def __init__(self, weights_path: Optional[str] = None, seed: int = 0,
                 load_calibrated: bool = True):
        path = weights_path or DEFAULT_WEIGHTS_PATH
        if path and os.path.exists(path):
            data = np.load(path)
            self.params = {k: data[k] for k in data.files}
            self.mode = "official_weights"
        else:
            self.params = _init_params(seed)
            self.mode = "random_features"
            # Calibrated heads (evaluation/lpips_calibrate.py): learned on
            # synthetic ranked distortions + PSNR/SSIM-consensus pairs —
            # the in-env substitute for the official 2AFC-trained heads.
            # The calibration flow itself passes load_calibrated=False:
            # its uniform/candidate baselines must NOT silently pick up the
            # shipped heads or the reported improvement is self-referential.
            heads = os.path.join(os.path.dirname(DEFAULT_WEIGHTS_PATH),
                                 "lpips_heads.npz")
            if load_calibrated and os.path.exists(heads):
                hd = np.load(heads)
                for k in hd.files:
                    if k.startswith("lin"):
                        self.params[k] = hd[k]
                self.mode = "calibrated_heads"
        self._jit_fn = jax.jit(self._distance)

    # ---- computation graph ----
    def _features(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        """x: [N,H,W,3] in [-1,1] → list of 5 post-ReLU feature maps."""
        h = (x - _SHIFT) / _SCALE
        feats = []
        for i, (out_ch, k, stride, pad) in enumerate(_ALEX_CFG):
            w = jnp.asarray(self.params[f"conv{i}_w"])
            b = jnp.asarray(self.params[f"conv{i}_b"])
            h = jax.lax.conv_general_dilated(
                h,
                w,
                window_strides=(stride, stride),
                padding=[(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b
            h = jax.nn.relu(h)
            feats.append(h)
            if i in (0, 1):  # maxpool 3x3 stride 2 after conv1, conv2
                h = jax.lax.reduce_window(
                    h,
                    -jnp.inf,
                    jax.lax.max,
                    window_dimensions=(1, 3, 3, 1),
                    window_strides=(1, 2, 2, 1),
                    padding="VALID",
                )
        return feats

    def _distance(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        fa = self._features(a)
        fb = self._features(b)
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa * jax.lax.rsqrt(jnp.sum(xa * xa, axis=-1, keepdims=True) + 1e-10)
            nb = xb * jax.lax.rsqrt(jnp.sum(xb * xb, axis=-1, keepdims=True) + 1e-10)
            d2 = (na - nb) ** 2
            lin = jnp.asarray(self.params[f"lin{i}_w"])
            tap = jnp.mean(jnp.sum(d2 * lin, axis=-1), axis=(1, 2))
            total = total + tap
        return total  # [N]

    def _distance_map(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Spatial LPIPS map [N, H/4, W/4] (tap maps resized + summed)."""
        fa = self._features(a)
        fb = self._features(b)
        target = fa[0].shape[1:3]
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa * jax.lax.rsqrt(jnp.sum(xa * xa, axis=-1, keepdims=True) + 1e-10)
            nb = xb * jax.lax.rsqrt(jnp.sum(xb * xb, axis=-1, keepdims=True) + 1e-10)
            d2 = (na - nb) ** 2
            lin = jnp.asarray(self.params[f"lin{i}_w"])
            tap = jnp.sum(d2 * lin, axis=-1, keepdims=True)
            tap = jax.image.resize(tap, (tap.shape[0], *target, 1), "bilinear")
            total = total + tap[..., 0]
        return total

    def flow_weighted(self, pred, gt, flow_mag: np.ndarray) -> np.ndarray:
        """FloLPIPS-style distance: the spatial LPIPS map weighted by
        normalized motion magnitude (Danier et al. 2022) — motion-salient
        distortions count more. flow_mag: [H, W] or [N, H, W]."""
        a = self._prep(pred)
        b = self._prep(gt)
        dmap = self._distance_map(a, b)  # [N, h', w']
        m = jnp.asarray(flow_mag, jnp.float32)
        if m.ndim == 2:
            m = m[None]
        m = jax.image.resize(m, dmap.shape, "bilinear")
        wsum = jnp.sum(m, axis=(1, 2), keepdims=True) + 1e-8
        return np.asarray(jnp.sum(dmap * m / wsum, axis=(1, 2)))

    # ---- public API ----
    def __call__(self, pred, gt) -> np.ndarray:
        """LPIPS distance per batch element. Accepts HWC uint8 or NHWC float."""
        a = self._prep(pred)
        b = self._prep(gt)
        return np.asarray(self._jit_fn(a, b))

    @staticmethod
    def _prep(x) -> jnp.ndarray:
        arr = jnp.asarray(x)
        if arr.ndim == 3:
            arr = arr[None]
        if jnp.issubdtype(arr.dtype, jnp.integer):
            arr = arr.astype(jnp.float32) / 127.5 - 1.0
        else:
            arr = arr.astype(jnp.float32) * 2.0 - 1.0
        return arr


def convert_torch_weights(lpips_state_dict: dict, alexnet_state_dict: dict, out_path: str):
    """Convert official torch LPIPS v0.1 + torchvision AlexNet state dicts
    to the .npz layout used here (OIHW → HWIO, lin heads squeezed)."""
    params = {}
    conv_keys = [k for k in alexnet_state_dict if "features" in k and "weight" in k]
    conv_keys.sort(key=lambda s: int(s.split(".")[1]))
    for i, wk in enumerate(conv_keys[:5]):
        w = np.asarray(alexnet_state_dict[wk])
        bk = wk.replace("weight", "bias")
        params[f"conv{i}_w"] = np.transpose(w, (2, 3, 1, 0)).astype(np.float32)
        params[f"conv{i}_b"] = np.asarray(alexnet_state_dict[bk]).astype(np.float32)
    for i in range(5):
        lk = f"lin{i}.model.1.weight"
        lw = np.asarray(lpips_state_dict[lk]).reshape(-1)
        params[f"lin{i}_w"] = lw.astype(np.float32)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez(out_path, **params)


@functools.lru_cache(maxsize=1)
def default_lpips() -> LPIPS:
    return LPIPS()
