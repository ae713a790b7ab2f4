"""SAFA-style joint VFI+SR network in Flax.

The reference wraps external WACV2024-SAFA (models/sota/safa_wrapper.py;
repo absent, API placeholder at safa_wrapper.py:69-72) with the contract
``model(img0, img1, scale, num_frames)`` → all frames at target scale in a
single pass (safa_wrapper.py:133-137), plus a VFI-only mode that runs the
joint model at scale 1.0 (safa_wrapper.py:185-206).

Native design (flow-aligned space-time SR, after the SAFA paper's
scale-adaptive feature aggregation idea):
- shared stride-4 encoder on both frames;
- an IFBlock-style flow head estimates bidirectional flow + fusion mask per
  timestep at 1/4 resolution;
- warped full-res frames and warped encoder features are aggregated and
  decoded through a pixel-shuffle x2 head, producing output at 2x input
  resolution, then resampled to the exact fractional target scale.

~5.6M parameters (wrapper claims ~5.5M, safa_wrapper.py metadata).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vfisr_tpu.core.frames import from_batched, pad_to_multiple, to_batched, unpad
from vfisr_tpu.core.resize import resize, scale_size
from vfisr_tpu.core.warp import backward_warp
from vfisr_tpu.models.base import JointModel, ModelInfo


def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.2)


class SAFANet(nn.Module):
    c: int = 176
    num_dec_blocks: int = 8
    dtype: jnp.dtype = jnp.float32
    # Feature-warp flow clamp at 1/4 res (x4 that in full-res px). Upstream
    # SAFA does not clamp; ours bounds the warp so its VJP can use the dense
    # shifted-transpose feature gradient (see _feat_warp). Training uses the
    # default 8; inference may widen it (larger-radius transpose kernels
    # cost more but stay gather-free). Documented in docs/PARITY.md.
    feat_warp_clamp: float = 8.0

    @nn.compact
    def __call__(self, img0, img1, timestep):
        """img0/img1: [N,H,W,3] in [0,1]; timestep: [N].

        Returns frames at 2x resolution: [N, 2H, 2W, 3].
        """
        n, h, w, _ = img0.shape
        conv = functools.partial(nn.Conv, dtype=self.dtype)
        c = self.c

        enc = nn.Sequential(
            [
                conv(c // 2, (3, 3), strides=(2, 2), padding=1),
                _lrelu,
                conv(c, (3, 3), strides=(2, 2), padding=1),
                _lrelu,
                conv(c, (3, 3), padding=1),
            ],
            name="encoder",
        )
        f0 = enc(img0)
        f1 = enc(img1)
        h4, w4 = f0.shape[1], f0.shape[2]

        t_map4 = jnp.broadcast_to(
            jnp.reshape(jnp.asarray(timestep, img0.dtype), (-1, 1, 1, 1)), (n, h4, w4, 1)
        )

        # Feature warps: flows clamped to +/-feat_warp_clamp at 1/4 res
        # (4x that in full-res px) so the warp VJP can use the dense shifted
        # transpose for the feature gradient (img_grad='shifted:R') — the
        # gather VJP's scatter lowering stalls the TPU compiler at train
        # shapes, and unlike the IFNet's input-frame warps these operands
        # NEED grads.
        clamp = float(self.feat_warp_clamp)
        shift_r = int(np.ceil(clamp))

        def _feat_warp(f, fl):
            fl = jnp.clip(fl, -clamp, clamp)
            return backward_warp(f, fl, 1.0, border="replicate",
                                 img_grad=f"shifted:{shift_r}")

        # flow head: two refinement stages at 1/4 res
        flow = jnp.zeros((n, h4, w4, 4), img0.dtype)
        mask = jnp.zeros((n, h4, w4, 1), img0.dtype)
        for i in range(2):
            w0 = _feat_warp(f0, flow[..., 0:2])
            w1 = _feat_warp(f1, flow[..., 2:4])
            inp = jnp.concatenate([w0, w1, t_map4, mask, flow], axis=-1)
            hdd = _lrelu(conv(c, (3, 3), padding=1, name=f"flow{i}_a")(inp))
            hdd = _lrelu(conv(c, (3, 3), padding=1, name=f"flow{i}_b")(hdd)) + hdd
            out = conv(5, (3, 3), padding=1, name=f"flow{i}_head",
                       kernel_init=nn.initializers.zeros)(hdd)
            flow = flow + out[..., :4]
            mask = mask + out[..., 4:5]

        # full-res flows
        flow_full = jax.image.resize(flow, (n, h, w, 4), "bilinear") * 4.0
        mask_full = nn.sigmoid(jax.image.resize(mask, (n, h, w, 1), "bilinear"))
        warped0 = backward_warp(img0, flow_full[..., 0:2], 1.0, border="replicate")
        warped1 = backward_warp(img1, flow_full[..., 2:4], 1.0, border="replicate")
        fused = warped0 * mask_full + warped1 * (1.0 - mask_full)

        # aggregate warped features, decode to 2x via pixel shuffle
        wf0 = _feat_warp(f0, flow[..., 0:2])
        wf1 = _feat_warp(f1, flow[..., 2:4])
        agg = jnp.concatenate([wf0, wf1, t_map4], axis=-1)
        d = _lrelu(conv(c, (3, 3), padding=1, name="dec_a")(agg))
        for i in range(self.num_dec_blocks):
            d = _lrelu(conv(c, (3, 3), padding=1, name=f"dec_b{i}")(d)) + d
        # upsample features 1/4 → 1x → pixel-shuffle to 2x residual
        d = jax.image.resize(d, (n, h, w, c), "bilinear")
        d = jnp.concatenate([d, fused, warped0, warped1], axis=-1)
        d = _lrelu(conv(c, (3, 3), padding=1, name="dec_c")(d))
        out = conv(3 * 4, (3, 3), padding=1, name="ps_head",
                   kernel_init=nn.initializers.zeros)(d)
        out = out.reshape(n, h, w, 2, 2, 3)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(n, h * 2, w * 2, 3)
        base = jax.image.resize(fused, (n, h * 2, w * 2, 3), "bilinear")
        return jnp.clip(base + out, 0.0, 1.0)


class SAFAModel(JointModel):
    """Joint VFI+SR (reference models/sota/safa_wrapper.py contract)."""

    def __init__(self, device: str = "tpu", seed: int = 0,
                 feat_warp_clamp: float = 8.0):
        super().__init__(device)
        self.seed = seed
        self.feat_warp_clamp = feat_warp_clamp
        self.params = None
        self._apply = None

    @property
    def info(self) -> ModelInfo:
        return ModelInfo(
            name="SAFA",
            type="sota",
            supports_vfi=True,
            supports_sr=True,
            supports_joint=True,
            parameters=self._param_count(),
            requires_gpu=True,
            description="Scale-adaptive joint VFI+SR (single-pass space-time upscaling)",
        )

    def _param_count(self) -> Optional[int]:
        if self.params is None:
            return 5_500_000
        return int(sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(self.params)))

    def load(self, weights_path: Optional[str] = None) -> None:
        if weights_path is None:
            from vfisr_tpu.utils.paths import default_weights

            weights_path = default_weights("safa")
        module = SAFANet(feat_warp_clamp=self.feat_warp_clamp)
        rng = jax.random.PRNGKey(self.seed)
        dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
        self.params = module.init(rng, dummy, dummy, jnp.asarray([0.5]))["params"]
        if weights_path:
            from vfisr_tpu.utils.checkpoint import load_params

            self.params = load_params(weights_path, self.params)
        self._apply = jax.jit(
            lambda p, i0, i1, t: module.apply({"params": p}, i0, i1, t)
        )
        self._loaded = True

    # ---- joint device core ----
    def joint_batch(
        self, x0: jnp.ndarray, x1: jnp.ndarray, timestamps: Tuple[float, ...], scale: float
    ) -> jnp.ndarray:
        """[N,H,W,3] pair → [N,T,H',W',3] at target scale (single pass)."""
        n, h, w, _ = x0.shape
        x0p, _ = pad_to_multiple(x0, 16)
        x1p, _ = pad_to_multiple(x1, 16)
        t = len(timestamps)
        x0r = jnp.repeat(x0p, t, axis=0)
        x1r = jnp.repeat(x1p, t, axis=0)
        ts = jnp.tile(jnp.asarray(timestamps, x0.dtype), (n,))
        out2x = self._apply(self.params, x0r, x1r, ts)  # 2x padded res
        out2x = unpad(out2x, 2 * h, 2 * w)
        target = scale_size(h, w, scale)
        if out2x.shape[-3:-1] != target:
            out2x = resize(out2x, target, "lanczos4")
        return out2x.reshape(n, t, *target, 3)

    def joint_process(
        self,
        frame0: np.ndarray,
        frame1: np.ndarray,
        num_intermediate: int = 3,
        target_scale: float = 1.333,
    ) -> List[np.ndarray]:
        """All frames (endpoints + intermediates) at target scale
        (safa_wrapper.py:133-155)."""
        self.ensure_loaded()
        ts = [0.0] + self.get_default_timestamps(num_intermediate) + [1.0]
        x0 = to_batched(frame0)
        x1 = to_batched(frame1)
        out = self.joint_batch(x0, x1, tuple(ts), target_scale)
        return [from_batched(out[:, i]) for i in range(out.shape[1])]

    # VFI-only mode: joint at scale 1.0 (safa_wrapper.py:185-206)
    def interpolate_batch(self, x0, x1, timestamps):
        return self.joint_batch(x0, x1, tuple(timestamps), 1.0)

    def interpolate(self, frame0, frame1, num_frames=3, timestamps=None):
        self.ensure_loaded()
        if timestamps is None:
            timestamps = self.get_default_timestamps(num_frames)
        x0 = to_batched(frame0)
        x1 = to_batched(frame1)
        h, w = frame0.shape[:2]
        out2 = self.joint_batch(x0, x1, tuple(timestamps), 1.0)
        return [from_batched(out2[:, i]) for i in range(out2.shape[1])]

    def upscale(self, frame: np.ndarray, scale: float = 1.333) -> np.ndarray:
        h, w = frame.shape[:2]
        return np.asarray(resize(frame, scale_size(h, w, scale), "lanczos4"))

    def upscale_batch(self, x, scale: float = 1.333):
        h, w = x.shape[-3:-1]
        return resize(x, scale_size(h, w, scale), "lanczos4")
