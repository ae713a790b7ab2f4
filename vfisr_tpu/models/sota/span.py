"""SPAN — Swift Parameter-free Attention Network for efficient SR, in Flax.

The reference wraps the external SPAN repo (models/sota/span_wrapper.py;
absent from the snapshot). Implemented here from the paper
(arXiv:2311.12770, NTIRE 2024 Efficient SR winner) in its inference
(re-parameterized) form:

- Conv3XC blocks collapse to single 3x3 convs at inference;
- SPAB block: three 3x3 convs with SiLU, parameter-free attention
  ``sim_att = sigmoid(out3) - 0.5``, output ``(out3 + x) * sim_att``;
- feature aggregation conv_cat over (first feature, final feature,
  block1 out, block5 pre-attention), pixel-shuffle upsampler.

~430K parameters at feature_channels=48 (wrapper claims ~400K,
span_wrapper.py:57). Contract mirrored from the wrapper: fixed 2x/4x net,
then Lanczos resize to the exact fractional target
(span_wrapper.py:139-155); ``interpolate`` falls back to linear blending
(span_wrapper.py:107-124).
"""

from __future__ import annotations

import functools
from typing import List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vfisr_tpu.core.frames import from_batched, to_batched
from vfisr_tpu.core.resize import resize, scale_size
from vfisr_tpu.models.base import BaseModel, ModelInfo, TwoStageModel


class SPAB(nn.Module):
    c: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = functools.partial(nn.Conv, self.c, (3, 3), padding=1, dtype=self.dtype)
        out1 = conv(name="c1")(x)
        out2 = conv(name="c2")(nn.silu(out1))
        out3 = conv(name="c3")(nn.silu(out2))
        sim_att = nn.sigmoid(out3) - 0.5
        out = (out3 + x) * sim_att
        return out, out1


class SPANNet(nn.Module):
    feature_channels: int = 48
    upscale: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.feature_channels
        conv3 = functools.partial(nn.Conv, c, (3, 3), padding=1, dtype=self.dtype)
        feat = conv3(name="conv_1")(x)
        h, b1 = SPAB(c, self.dtype, name="block_1")(feat)
        h, _ = SPAB(c, self.dtype, name="block_2")(h)
        h, _ = SPAB(c, self.dtype, name="block_3")(h)
        h, _ = SPAB(c, self.dtype, name="block_4")(h)
        h, b5 = SPAB(c, self.dtype, name="block_5")(h)
        h, _ = SPAB(c, self.dtype, name="block_6")(h)
        final = conv3(name="conv_2")(h)
        agg = nn.Conv(c, (1, 1), dtype=self.dtype, name="conv_cat")(
            jnp.concatenate([feat, final, b1, b5], axis=-1)
        )
        out = nn.Conv(
            3 * self.upscale**2, (3, 3), padding=1, dtype=self.dtype, name="upsampler"
        )(agg)
        # pixel shuffle (depth_to_space)
        n, hh, ww, _ = out.shape
        r = self.upscale
        out = out.reshape(n, hh, ww, r, r, 3)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(n, hh * r, ww * r, 3)
        return out


class SPANModel(BaseModel):
    """SPAN SR model (reference span_wrapper.py:24-155 contract)."""

    def __init__(self, scale: int = 2, device: str = "tpu", seed: int = 0):
        super().__init__(device)
        self.scale = scale
        self.seed = seed
        self.params = None
        self._apply = None

    @property
    def info(self) -> ModelInfo:
        return ModelInfo(
            name=f"SPAN_x{self.scale}",
            type="sota",
            supports_vfi=False,
            supports_sr=True,
            supports_joint=False,
            parameters=self._param_count(),
            requires_gpu=True,
            description="Swift Parameter-free Attention Network for SR",
        )

    def _param_count(self) -> Optional[int]:
        if self.params is None:
            return 400_000  # wrapper's nominal claim before load
        return int(sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(self.params)))

    def load(self, weights_path: Optional[str] = None) -> None:
        if weights_path is None:
            from vfisr_tpu.utils.paths import default_weights

            weights_path = default_weights(f"span_x{self.scale}")
        module = SPANNet(upscale=self.scale)
        rng = jax.random.PRNGKey(self.seed)
        variables = module.init(rng, jnp.zeros((1, 32, 32, 3), jnp.float32))
        self.params = variables["params"]
        if weights_path:
            from vfisr_tpu.utils.checkpoint import load_params

            self.params = load_params(weights_path, self.params)
        self._apply = jax.jit(lambda p, x: module.apply({"params": p}, x))
        self._loaded = True

    # SPAN doesn't interpolate: linear blend fallback (span_wrapper.py:107-124)
    def interpolate_batch(self, x0, x1, timestamps):
        from vfisr_tpu.models.traditional.baselines import _crossfade_batch

        return _crossfade_batch(x0, x1, timestamps)

    def upscale_batch(self, x, scale: float = 1.333):
        h, w = x.shape[-3:-1]
        up = self._apply(self.params, x)
        target = scale_size(h, w, scale)
        if up.shape[-3:-1] != target:
            up = resize(up, target, "lanczos4")
        return jnp.clip(up, 0.0, 1.0)

    def upscale(self, frame: np.ndarray, scale: float = 1.333) -> np.ndarray:
        self.ensure_loaded()
        return from_batched(self.upscale_batch(to_batched(frame), scale))


def create_rife_span(device: str = "tpu") -> TwoStageModel:
    """RIFE + SPAN two-stage model (span_wrapper.py:264-270)."""
    from vfisr_tpu.models.sota.rife import RIFEModel

    return TwoStageModel(vfi_model=RIFEModel(device=device), sr_model=SPANModel(device=device))


def create_vfimamba_span(device: str = "tpu") -> TwoStageModel:
    """VFIMamba + SPAN two-stage model (span_wrapper.py:273-279)."""
    from vfisr_tpu.models.sota.vfimamba import VFIMambaModel

    return TwoStageModel(
        vfi_model=VFIMambaModel(device=device), sr_model=SPANModel(device=device)
    )
