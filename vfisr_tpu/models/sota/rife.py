"""RIFE-style intermediate flow estimation (IFNet) in Flax, NHWC, bf16-ready.

The reference wraps external Practical-RIFE (models/sota/rife_wrapper.py;
external repo absent from the snapshot), calling
``model.inference(img0, img1, timestep, scale)`` per timestep with ×32/×128
padding. Here IFNet is implemented natively from the RIFE paper
(arXiv:2011.06294, "Real-Time Intermediate Flow Estimation for Video Frame
Interpolation") in its v4-style arbitrary-timestep form:

- coarse-to-fine pyramid of IFBlocks at scales (8, 4, 2, 1); each block
  refines a 4-channel bidirectional flow (F_t→0, F_t→1) plus a fusion mask
  from the warped inputs and the timestep map;
- backward warping with border-replicate sampling (grid_sample analog);
- final frame = σ(mask)·warp(I0) + (1-σ(mask))·warp(I1) (+ small residual
  refine head).

All timesteps of a pair are processed as one batched call (timestep is just
a constant channel), so a 3-midpoint interpolation is a single device
program — the TPU-native replacement for the reference's per-timestep
Python loop (rife_wrapper.py:118-164).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vfisr_tpu.core.frames import from_batched, pad_to_multiple, to_batched, unpad
from vfisr_tpu.core.resize import resize, scale_size
from vfisr_tpu.core.warp import backward_warp
from vfisr_tpu.models.base import BaseModel, ModelInfo


@dataclass(frozen=True)
class RIFEConfig:
    scales: Tuple[int, ...] = (8, 4, 2, 1)
    channels: Tuple[int, ...] = (256, 160, 112, 80)
    num_convs: int = 8
    # Practical-RIFE v4.x (the lineage the reference wraps,
    # rife_wrapper.py:6-9) removed the separate refine/context net — the
    # fusion blend IS the output. The optional RefineNet here costs
    # ~12.6 ms at 3×1080p (small-channel convs pad to 128 MXU lanes, cost
    # ∝ M·K regardless of output width) for a ≤1/16 residual — off by
    # default, available for quality experiments.
    refine: bool = False
    # Warp block inputs at each pyramid level's own resolution (IFRNet-style)
    # instead of full resolution: cuts warp cost from 2·L full-res warps to
    # ~2.6 full-res equivalents — the warp is the dominant cost on TPU.
    # min_warp_scale bounds how fine the intermediate warps go (the final
    # fusion warps always run at full resolution).
    warp_at_level: bool = True
    min_warp_scale: int = 2
    # Pallas-warp residual radii (ry, rx): kernel tap cost scales with
    # (2ry+2)·(2rx+2). Gaming motion is mostly horizontal, so the vertical
    # radius is smaller. Level warps see smooth downsampled flows; the
    # final full-res fusion warps get wider radii. Training runs through
    # the same warp, so the network adapts to the clamping behavior.
    level_warp_radius: Tuple[int, int] = (2, 4)
    final_warp_radius: Tuple[int, int] = (4, 6)
    dtype: jnp.dtype = jnp.float32
    # Pallas-warp window dtype: bf16 halves the warp kernel's DMA + roll
    # volume (rolls act on an int32 bitcast of sublane pairs — Mosaic's
    # dynamic rotate is 32-bit-only) at a ~2-ulp (≈56 dB) noise floor;
    # on-chip parity: max err 0.0066 vs the exact gather warp.
    warp_dtype: jnp.dtype = jnp.bfloat16


def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.2)


# Conv-lowering note: a 9-shifted-GEMM "taps" lowering of the 3×3 trunk
# convs measures 2.7× faster than XLA's native conv IN ISOLATION
# (scripts/profile_conv.py: 0.093 vs 0.253 ms at block2's trunk shape) but
# LOSES inside the full IFNet forward (29.6 vs 26.3 ms at 3×1080p bf16,
# trunk-only; 76.9 ms if applied to the stride-2 encoders too): in context
# XLA fuses the lrelu/residual chain into the native conv and schedules it
# better than 9 separate GEMMs + adds. Keep native convs.


def _up2_axis(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Exact 2x bilinear upsample along one axis (half-pixel mapping,
    edge-clamped — jax.image.resize 'bilinear' semantics) as 4 shifted
    FMAs: out[2k] = 0.25·in[k-1] + 0.75·in[k], out[2k+1] = 0.75·in[k] +
    0.25·in[k+1]. Memory-bound instead of the dense resize matmul."""
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 1)
    xp = jnp.pad(x, pad, mode="edge")
    lo = jax.lax.slice_in_dim(xp, 0, n, axis=axis)
    mid = jax.lax.slice_in_dim(xp, 1, n + 1, axis=axis)
    hi = jax.lax.slice_in_dim(xp, 2, n + 2, axis=axis)
    even = 0.25 * lo + 0.75 * mid
    odd = 0.75 * mid + 0.25 * hi
    y = jnp.stack([even, odd], axis=axis + 1)
    return y.reshape(x.shape[:axis] + (2 * n,) + x.shape[axis + 1 :])


def _resize_bilinear(x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    h, w = x.shape[-3], x.shape[-2]
    if hw == (h, w):
        return x
    if hw == (2 * h, 2 * w):  # the pyramid's level-to-level upsample
        return _up2_axis(_up2_axis(x, x.ndim - 3), x.ndim - 2)
    return jax.image.resize(x, (*x.shape[:-3], *hw, x.shape[-1]), "bilinear")


def _halve(x: jnp.ndarray) -> jnp.ndarray:
    """2×2 mean pool — the pyramid downsample. reduce_window is the
    layout-friendly TPU pooling path (a reshape-split of the sublane/lane
    dims with C minor forces transposes and measured 30% slower IFNet)."""
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) * 0.25


def _build_pyramid(x: jnp.ndarray, max_down: int) -> dict:
    """{1: x, 2: x/2, ...} by successive halving; each level reads only the
    previous one (vs. resizing from full resolution per pyramid level)."""
    pyr = {1: x}
    s = 1
    while s < max_down:
        pyr[s * 2] = _halve(pyr[s])
        s *= 2
    return pyr


class IFBlock(nn.Module):
    """One pyramid level: stride-4 encoder, residual conv trunk, upsampling head."""

    c: int
    num_convs: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv = functools.partial(nn.Conv, dtype=self.dtype)
        h = _lrelu(conv(self.c // 2, (3, 3), strides=(2, 2), padding=1)(x))
        h = _lrelu(conv(self.c, (3, 3), strides=(2, 2), padding=1)(h))
        feat = h
        for _ in range(self.num_convs):
            feat = _lrelu(conv(self.c, (3, 3), padding=1)(feat)) + feat
        # transpose-conv x2, then bilinear x2 back to block input res.
        # Zero-init: the block starts by predicting zero flow/mask delta, so
        # an untrained IFNet degenerates to a clean 50/50 blend instead of
        # warping by random flows (critical for trainability).
        out = nn.ConvTranspose(
            5, (4, 4), strides=(2, 2), padding=1, dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
        )(feat)
        out = _resize_bilinear(out, (x.shape[-3], x.shape[-2]))
        return out  # [..., 5]: flow delta (4) + mask delta (1)


class RefineNet(nn.Module):
    """Residual head sharpening the fused frame.

    Runs at half resolution: full-res 3×3 convs with 11/32 channels waste
    >75% of the MXU's 128 input/output lanes AND pay full-res activation
    traffic (measured 24 ms of a 59 ms IFNet forward at 3×1080p; a 6×6
    stride-2 encoder conv was no better at 19 ms). A 2×2 mean-pool entry
    (reduce_window — the fast TPU pooling path) drops all conv work to
    quarter area; the zero-init 4×4 stride-2 transpose conv returns the
    residual to full resolution.
    """

    c: int = 40
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv = functools.partial(nn.Conv, dtype=self.dtype)
        xh = jax.lax.reduce_window(
            x, jnp.zeros((), x.dtype), jax.lax.add,
            (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
        ) * jnp.asarray(0.25, x.dtype)
        h = _lrelu(conv(self.c, (3, 3), padding=1)(xh))
        h = _lrelu(conv(self.c, (3, 3), padding=1)(h))
        out = nn.ConvTranspose(
            3, (4, 4), strides=(2, 2), padding="SAME", dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
        )(h)
        return jnp.tanh(out) * (1.0 / 16.0)


class IFNet(nn.Module):
    """Coarse-to-fine intermediate flow network."""

    config: RIFEConfig = RIFEConfig()

    @nn.compact
    def __call__(self, img0: jnp.ndarray, img1: jnp.ndarray, timestep: jnp.ndarray):
        """img0/img1: [N,H,W,3] in [0,1]; timestep: [N] or scalar.

        Returns (merged [N,H,W,3], flow [N,H,W,4], mask [N,H,W,1]).
        """
        cfg = self.config
        n, h, w, _ = img0.shape
        out_dtype = img0.dtype
        # activations (pyramid, flows, masks, warps, fusion) run in
        # cfg.dtype; outputs are cast back so callers see a stable dtype.
        img0 = img0.astype(cfg.dtype)
        img1 = img1.astype(cfg.dtype)
        t_scalar = jnp.reshape(jnp.asarray(timestep, cfg.dtype), (-1, 1, 1, 1))

        ws_list = [
            max(s, cfg.min_warp_scale) if cfg.warp_at_level else 1
            for s in cfg.scales
        ]
        pyr0 = _build_pyramid(img0, max(ws_list))
        pyr1 = _build_pyramid(img1, max(ws_list))

        flow = None  # [N, sh, sw, 4] in that level's pixel units
        mask = None

        for i, scale in enumerate(cfg.scales):
            ws = ws_list[i]
            sh, sw = max(h // ws, 1), max(w // ws, 1)
            img0_s = pyr0[ws]
            img1_s = pyr1[ws]
            t_map = jnp.broadcast_to(t_scalar, (n, sh, sw, 1))
            if flow is None:
                flow = jnp.zeros((n, sh, sw, 4), img0.dtype)
                mask = jnp.zeros((n, sh, sw, 1), img0.dtype)
                warped0, warped1 = img0_s, img1_s
            else:
                rescale = sh / flow.shape[1]
                flow = _resize_bilinear(flow, (sh, sw)) * rescale
                mask = _resize_bilinear(mask, (sh, sw))
                # both sides in ONE warp call (halves kernel dispatches)
                pair = jnp.concatenate([img0_s, img1_s], axis=0)
                pair_flow = jnp.concatenate([flow[..., 0:2], flow[..., 2:4]], axis=0)
                warped = backward_warp(
                    pair, pair_flow, 1.0, border="replicate",
                    radius=cfg.level_warp_radius, compute_dtype=cfg.warp_dtype,
                )
                warped0, warped1 = warped[:n], warped[n:]
            inp = jnp.concatenate([warped0, warped1, t_map, mask, flow], axis=-1)
            # block sees its nominal pyramid scale relative to current res
            block_down = max(scale // ws, 1)
            if block_down > 1:
                inp = _resize_bilinear(inp, (max(sh // block_down, 1), max(sw // block_down, 1)))
            out = IFBlock(cfg.channels[i], cfg.num_convs, cfg.dtype, name=f"block{i}")(inp)
            out = _resize_bilinear(out, (sh, sw))
            flow = flow + out[..., :4] * block_down
            mask = mask + out[..., 4:5]

        # final full-resolution fusion warps (both sides in one call)
        rescale = h / flow.shape[1]
        flow = _resize_bilinear(flow, (h, w)) * rescale
        mask = _resize_bilinear(mask, (h, w))
        t_map = jnp.broadcast_to(t_scalar, (n, h, w, 1))
        pair = jnp.concatenate([img0, img1], axis=0)
        pair_flow = jnp.concatenate([flow[..., 0:2], flow[..., 2:4]], axis=0)
        warped = backward_warp(
            pair, pair_flow, 1.0, border="replicate",
            radius=cfg.final_warp_radius, compute_dtype=cfg.warp_dtype,
        )
        warped0, warped1 = warped[:n], warped[n:]

        m = nn.sigmoid(mask)
        merged = warped0 * m + warped1 * (1.0 - m)
        if cfg.refine:
            res = RefineNet(dtype=cfg.dtype, name="refine")(
                jnp.concatenate([merged, warped0, warped1, m, t_map], axis=-1)
            )
            merged = jnp.clip(merged + res, 0.0, 1.0)
        else:
            merged = jnp.clip(merged, 0.0, 1.0)
        return (
            merged.astype(out_dtype),
            flow.astype(out_dtype),
            mask.astype(out_dtype),
        )


def shared_flow_apply(module: IFNet, params, x0: jnp.ndarray, x1: jnp.ndarray,
                      timestamps: Tuple[float, ...]) -> jnp.ndarray:
    """Deployment fast path: one trunk pass, all timesteps from its flow.

    The exact path runs the full IFNet once per timestep (t is an input
    channel at every pyramid level). This runs the trunk ONCE at the
    anchor timestep (the one closest to 0.5), then derives the remaining
    timesteps by linearly rescaling the bidirectional flow —
    F_t'→0 = F_a→0·(t'/a), F_t'→1 = F_a→1·((1−t')/(1−a)) — and paying only
    the final fusion warp per timestep. Same linear-motion assumption the
    reference's own flow methods make (run_experiments.py:479-533).

    The anchor's fusion mask is t-shifted for the derived timesteps:
    m_t = clip(σ(mask) + (a − t), 0, 1), the ideal linear-blend prior at
    off-anchor t. Measured on held-out scenes (deploy config, trained
    rife.npz): exact-per-t 33.66 dB, shared 32.17, shared+shift **34.10**
    — the shared path is both ~30% faster and slightly better than
    running the trunk per timestep (docs/PARITY.md).

    x0/x1: [P,H,W,3] (padded); returns [P*T,H,W,3] pair-major (pair i's
    timestep j at index i*T+j), matching ``RIFEModel.interpolate_batch``.
    """
    cfg = module.config
    p, h, w, _ = x0.shape
    ts = tuple(float(t) for t in timestamps)
    anchor_idx = min(range(len(ts)), key=lambda i: abs(ts[i] - 0.5))
    a = ts[anchor_idx]
    if a <= 1e-3 or a >= 1.0 - 1e-3:
        # Anchor at an endpoint (caller passed t≈0 or t≈1 only): the
        # derived-flow rescale divides by a and (1−a) and would emit
        # inf/NaN flows — fall back to exact per-timestep trunk passes.
        outs_exact = [
            module.apply({"params": params}, x0, x1,
                         jnp.full((p,), t, x0.dtype))[0]
            for t in ts
        ]
        return jnp.stack(outs_exact, axis=1).reshape(p * len(ts), h, w, 3)
    merged_a, flow, mask = module.apply(
        {"params": params}, x0, x1, jnp.full((p,), a, x0.dtype)
    )
    others = [t for i, t in enumerate(ts) if i != anchor_idx]
    if not others:
        return merged_a
    m = nn.sigmoid(mask.astype(cfg.dtype))

    # one fused warp call for every (timestep, side): batch 2*len(others)*P
    imgs, flows = [], []
    for t in others:
        imgs.append(x0.astype(cfg.dtype))
        flows.append(flow[..., 0:2] * (t / a))
        imgs.append(x1.astype(cfg.dtype))
        flows.append(flow[..., 2:4] * ((1.0 - t) / (1.0 - a)))
    warped = backward_warp(
        jnp.concatenate(imgs, axis=0),
        jnp.concatenate(flows, axis=0).astype(cfg.dtype),
        1.0,
        border="replicate",
        radius=cfg.final_warp_radius,
        compute_dtype=cfg.warp_dtype,
    )
    outs = {a: merged_a}
    for k, t in enumerate(others):
        w0 = warped[2 * k * p:(2 * k + 1) * p]
        w1 = warped[(2 * k + 1) * p:(2 * k + 2) * p]
        m_t = jnp.clip(m + jnp.asarray(a - t, m.dtype), 0.0, 1.0)
        outs[t] = jnp.clip(w0 * m_t + w1 * (1.0 - m_t), 0.0, 1.0).astype(x0.dtype)
    # pair-major interleave: [P*T]
    stacked = jnp.stack([outs[t] for t in ts], axis=1)  # [P,T,H,W,3]
    return stacked.reshape(p * len(ts), h, w, 3)


# =============================================================================
# BaseModel wrapper
# =============================================================================

_LITE_CONFIG = RIFEConfig(scales=(4, 2, 1), channels=(176, 112, 80), num_convs=8)


class RIFEModel(BaseModel):
    """RIFE VFI model (reference models/sota/rife_wrapper.py contract).

    VFI: IFNet per timestep batch; SR: Lanczos (the wrapper delegates SR to
    Lanczos too, rife_wrapper.py upscale).
    """

    CONFIG = RIFEConfig()
    NAME = "RIFE"
    PAD_MULTIPLE = 32  # reference pads to x32 via base helper (x128 in scripts)

    def __init__(self, device: str = "tpu", uhd_mode: bool = False,
                 seed: int = 0, config: Optional[RIFEConfig] = None):
        super().__init__(device)
        self.uhd_mode = uhd_mode  # reference: scale 0.5 for >=4K inputs
        self.seed = seed
        if config is not None:
            self.CONFIG = config  # instance override (e.g. warp-radius sweeps)
        self.params = None
        self._apply = None
        self._apply_variants = {}  # rife-scale -> (apply_fn, cfg)

    @property
    def info(self) -> ModelInfo:
        return ModelInfo(
            name=self.NAME,
            type="sota",
            supports_vfi=True,
            supports_sr=False,
            supports_joint=False,
            parameters=self.param_count(),
            requires_gpu=True,
            description="RIFE-style IFNet: real-time intermediate flow estimation",
        )

    def param_count(self) -> Optional[int]:
        if self.params is None:
            return None
        return int(
            sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(self.params))
        )

    def load(self, weights_path: Optional[str] = None) -> None:
        """Initialize IFNet parameters; auto-loads weights/<name>.npz if present."""
        import os
        import warnings

        auto = weights_path is None
        if auto:
            from vfisr_tpu.utils.paths import default_weights

            weights_path = default_weights(
                "rife_lite" if "Lite" in self.NAME else "rife")
        module = IFNet(self.CONFIG)
        rng = jax.random.PRNGKey(self.seed)
        dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = module.init(rng, dummy, dummy, jnp.asarray([0.5]))
        self.params = variables["params"]
        if weights_path:
            from vfisr_tpu.utils.checkpoint import load_params

            try:
                self.params = load_params(weights_path, self.params)
            except ValueError:
                # auto-discovered checkpoints are best-effort: a structure
                # mismatch (stale file from an older architecture) falls
                # back to fresh init; explicit paths stay strict.
                if not auto:
                    raise
                warnings.warn(
                    f"{weights_path} does not match the current architecture; "
                    "using fresh init (retrain via scripts/train.py)",
                    stacklevel=2,
                )

        @functools.partial(jax.jit, static_argnames=())
        def apply_fn(params, img0, img1, timestep):
            return module.apply({"params": params}, img0, img1, timestep)

        self._apply = apply_fn
        self._apply_variants = {}
        self._loaded = True

    def _apply_for_scale(self, scale: float):
        """Reference ``Model.inference(..., scale=s)`` semantics
        (rife_wrapper.py:146, run_experiments.py:365-386): s < 1 runs the
        flow pyramid at coarser resolutions (Practical-RIFE's scale_list =
        [level/s], the UHD trick — rife_default uses 0.5, rife_fast 0.25).
        The IFBlocks are fully convolutional, so the SAME params serve
        every scale; each scale is its own cached jitted program."""
        if not scale or scale == 1.0:
            return self._apply, self.CONFIG
        key = round(float(scale), 4)
        if key not in self._apply_variants:
            import dataclasses

            cfg = dataclasses.replace(
                self.CONFIG,
                scales=tuple(
                    max(int(round(s / scale)), 1) for s in self.CONFIG.scales
                ),
            )
            module = IFNet(cfg)

            @jax.jit
            def apply_fn(params, img0, img1, timestep):
                return module.apply({"params": params}, img0, img1, timestep)

            self._apply_variants[key] = (apply_fn, cfg)
        return self._apply_variants[key]

    # ---- batched device core ----
    def interpolate_batch(self, x0, x1, timestamps, scale: float = 1.0):
        apply_fn, cfg = self._apply_for_scale(scale)
        pad = max(self.PAD_MULTIPLE, max(cfg.scales))
        n, h, w, _ = x0.shape
        x0p, _ = pad_to_multiple(x0, pad)
        x1p, _ = pad_to_multiple(x1, pad)
        t = len(timestamps)
        # fold timesteps into the batch: [N*T, H, W, 3] in one device call
        x0r = jnp.repeat(x0p, t, axis=0)
        x1r = jnp.repeat(x1p, t, axis=0)
        ts = jnp.tile(jnp.asarray(timestamps, x0.dtype), (n,))
        merged, _, _ = apply_fn(self.params, x0r, x1r, ts)
        merged = unpad(merged, h, w)
        return merged.reshape(n, t, h, w, 3)

    def interpolate(
        self,
        frame0: np.ndarray,
        frame1: np.ndarray,
        num_frames: int = 3,
        timestamps=None,
        scale: Optional[float] = None,
    ):
        """Base adapter plus the reference's per-call ``scale`` knob.

        ``scale`` is in NATIVE pyramid units (1.0 = trained full pyramid
        = reference rife_scale 0.5; see harness._rife_native_scale). An
        explicit scale always wins; when unspecified, ``uhd_mode`` drops
        one pyramid level (reference rife_wrapper.py:146 halves its flow
        resolution for >=4K inputs — the native analog, at the measured
        coarse-pyramid quality cost on non-UHD content).
        """
        if timestamps is None:
            timestamps = self.get_default_timestamps(num_frames)
        if scale is None:
            scale = 0.5 if self.uhd_mode else 1.0
        from vfisr_tpu.core.frames import from_batched, to_batched

        out = self.interpolate_batch(
            to_batched(frame0), to_batched(frame1), tuple(timestamps),
            scale=scale,
        )
        return [from_batched(out[:, i]) for i in range(out.shape[1])]

    def upscale_batch(self, x, scale: float = 1.333):
        h, w = x.shape[-3:-1]
        return resize(x, scale_size(h, w, scale), "lanczos4")

    def upscale(self, frame: np.ndarray, scale: float = 1.333) -> np.ndarray:
        h, w = frame.shape[:2]
        return np.asarray(resize(frame, scale_size(h, w, scale), "lanczos4"))

    def interpolate_recursive(
        self, frame0: np.ndarray, frame1: np.ndarray, factor: int = 2
    ) -> list:
        """2^n frame multiplication by recursive midpointing
        (reference rife_wrapper.py:166-203)."""
        self.ensure_loaded()
        if factor < 2:
            return []
        frames = [frame0, frame1]
        while len(frames) - 1 < factor:
            new_frames = [frames[0]]
            for i in range(len(frames) - 1):
                mid = self.interpolate(frames[i], frames[i + 1], num_frames=1)[0]
                new_frames += [mid, frames[i + 1]]
            frames = new_frames
        return frames[1:-1]


class RIFELiteModel(RIFEModel):
    """Lite config (reference rife_wrapper.py:206-224, ~4.5M params)."""

    CONFIG = _LITE_CONFIG
    NAME = "RIFE-Lite"


def get_rife_model(lite: bool = False, device: str = "tpu") -> RIFEModel:
    """Factory (reference rife_wrapper.py:227-245)."""
    model = RIFELiteModel(device) if lite else RIFEModel(device)
    model.load()
    return model
