"""Windowed backward-warp Pallas kernel — the gather-free TPU warp.

Motivation (measured on v5e): XLA's element gather runs ~55 ms per
3×1080p×3ch image (serial hardware gather), making `flow_warp` ~226 ms and
an IFNet forward ~1.85 s — 98% of runtime. TPUs have no fast random
gather; the TPU-native formulation replaces it with dense vector math:

1. Host/jit side: each output tile (th×tw) gets a window origin from the
   rounded tile-mean displacement (a reduce_window average over the flow —
   no full-resolution coordinate arrays are materialized host-side).
   Origins obey Mosaic's DMA alignment (rows 8/16-aligned, cols
   128-aligned); all origin/slack scalars pack into one int32 per tile.
2. Kernel per (n, c, tile): DMA the input window HBM→VMEM at the tile's
   aligned origin, de-slack it with dynamic rolls, compute the per-pixel
   source coordinates and residuals IN-KERNEL from the flow tile (a few
   VPU ops), then accumulate
       out[p] = Σ_a hat(ry[p]-a) · Σ_b hat(rx[p]-b) · win[p+(a,b)]
   over (2·ry+2)×(2·rx+2) relative shifts — every term is a (th,tw)
   vector FMA on the VPU; bilinear's 4-tap structure is recovered because
   the hat weights vanish except at the two integer neighbors.

bf16 windows: Mosaic's dynamic rotate is 32-bit-only, so bf16 rolls act on
an int32 bitcast view — (hw, ww) bf16 packs to (hw/2, ww) i32 (sublane
pairs), where a lane-roll is exactly a bf16 column roll and a row-roll
moves TWO bf16 rows; the odd row-slack remainder folds into ry as one
extra vertical tap. On-chip parity vs the exact gather warp: ≤1e-4 (f32),
≤0.0066 (bf16 ≈ 2 ulp of a [0,1] pixel, a ~56 dB noise floor).

Exactness: identical to bilinear-gather warping wherever the per-pixel
flow deviates from its tile mean by ≤ (ry, rx) px. Larger deviations clamp
to the window edge (slight smear strictly localized to extreme intra-tile
motion discontinuities). Parity is asserted in tests/test_pallas_warp.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _warp_kernel(
    packed_ref,  # [N, TY, TX] int32: oy/8<<17 | ox/128<<11 | sy<<7 | sx
    t_ref,  # [N] f32 per-batch flow scale
    img_ref,  # [N, C, H, W] in ANY (manual DMA)
    fy_ref,  # [1, 1, th, tw] flow dy tile
    fx_ref,  # [1, 1, th, tw] flow dx tile
    out_ref,  # [1, C, th, tw]
    win,  # VMEM scratch [C, hw, ww]
    sem,
    *,
    nch: int,  # channels per program (one DMA, shared coords/weights)
    th: int,
    tw: int,
    nsh_y: int,  # vertical taps (2·ry+2, +1 when fold_odd_row)
    nsh_x: int,  # horizontal taps (2·rx+2)
    hw: int,
    ww: int,
    ylo: float,  # source-coordinate clip bounds (canvas space)
    yhi: float,
    xlo: float,
    xhi: float,
    pt: int,  # content origin inside the canvas
    pl_: int,
    fold_odd_row: bool = False,  # bf16: roll even rows only, odd slack in ry
    bitcast_roll: bool = False,  # bf16 compiled path (32-bit-only rotate)
    skip_roll: bool = False,  # TIMING ONLY: wrong output, isolates roll cost
    weight_mode: str = "interp",  # 'interp' | 'grad_y' | 'grad_x'
):
    n = pl.program_id(0)
    ty = pl.program_id(1)
    tx = pl.program_id(2)

    packed = packed_ref[n, ty, tx]
    oy = pl.multiple_of((packed >> 17) * 8, 8)
    ox = pl.multiple_of(((packed >> 11) & 0x3F) * 128, 128)
    copy = pltpu.make_async_copy(
        img_ref.at[n, :, pl.ds(oy, hw), pl.ds(ox, ww)], win, sem
    )
    copy.start()

    # ---- per-pixel source coords + residuals (in-kernel; overlaps DMA;
    # computed ONCE for all channels) ----
    t = t_ref[n]
    # tpu.iota is integer-only in compiled Mosaic; cast after
    rows = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1).astype(jnp.float32)
    y_abs = (pt + ty * th).astype(jnp.float32) + rows
    x_abs = (pl_ + tx * tw).astype(jnp.float32) + cols
    sy_raw = y_abs + fy_ref[0, 0].astype(jnp.float32) * t
    sx_raw = x_abs + fx_ref[0, 0].astype(jnp.float32) * t
    sy = jnp.clip(sy_raw, ylo, yhi)
    sx = jnp.clip(sx_raw, xlo, xhi)

    row_slack = (packed >> 7) & 0xF
    col_slack = packed & 0x7F
    # effective window origin after the rolls
    if fold_odd_row:
        oy_eff = oy + (row_slack & ~1)
    else:
        oy_eff = oy + row_slack
    ox_eff = ox + col_slack
    ry_raw = sy - oy_eff.astype(jnp.float32) - rows
    rx_raw = sx - ox_eff.astype(jnp.float32) - cols
    ry = jnp.clip(ry_raw, 0.0, nsh_y - 1.001)
    rx = jnp.clip(rx_raw, 0.0, nsh_x - 1.001)

    # Factorized hat weights, shared across channels: the horizontal taps
    # wx_b depend only on the output pixel, not on the vertical shift a —
    # hoisting them turns the inner term into a single FMA. With a bf16
    # window the inner (horizontal) sum runs in bf16 (≤2 nonzero hat taps
    # per pixel → ≤1 bf16 ulp of the pixel); the outer vertical
    # accumulation stays f32.
    #
    # grad modes (the warp VJP's flow gradient, which is per-pixel local —
    # no scatter): replace one axis' hat with its derivative
    # hat'(d) = -sign(d)·[|d|<1], masked to zero wherever the source
    # coordinate or residual was clipped (border clamp ⇒ d out/d flow = 0).
    cdt = win.dtype

    def hat(d):
        return jnp.maximum(0.0, 1.0 - jnp.abs(d))

    def dhat(d):
        # floor-consistent bilinear derivative (half-open support, so the
        # gradient at EXACT integer coordinates — e.g. zero-init flow — is
        # v[k+1]-v[k], matching d/df of (1-f)·v[k] + f·v[k+1] at f=0, not 0)
        return jnp.where(
            (d >= 0.0) & (d < 1.0),
            -1.0,
            jnp.where((d >= -1.0) & (d < 0.0), 1.0, 0.0),
        )

    # Gradient validity matches the forward's clip saturation EXACTLY:
    # the forward clamps residuals to [0, nsh-1.001], so anywhere
    # rx_raw/ry_raw falls at or past that bound the forward output is
    # constant in the flow and the true derivative is zero — the VJP must
    # report zero there too (VJP == d(forward), not d(ideal warp)).
    if weight_mode == "grad_x":
        vx = ((sx_raw >= xlo) & (sx_raw < xhi)
              & (rx_raw >= 0.0) & (rx_raw < nsh_x - 1.001)).astype(jnp.float32)
        wxs = [(dhat(rx - b) * vx).astype(cdt) for b in range(nsh_x)]
        wys = [hat(ry - a) for a in range(nsh_y)]
    elif weight_mode == "grad_y":
        vy = ((sy_raw >= ylo) & (sy_raw < yhi)
              & (ry_raw >= 0.0) & (ry_raw < nsh_y - 1.001)).astype(jnp.float32)
        wxs = [hat(rx - b).astype(cdt) for b in range(nsh_x)]
        wys = [dhat(ry - a) * vy for a in range(nsh_y)]
    else:
        wxs = [hat(rx - b).astype(cdt) for b in range(nsh_x)]
        wys = [hat(ry - a) for a in range(nsh_y)]

    copy.wait()

    for ci in range(nch):
        # de-slack this channel's window with dynamic rolls (window dims
        # are powers of two — dynamic roll miscompiles otherwise)
        if skip_roll:
            rolled = win[ci]
        elif bitcast_roll:
            wv = pltpu.bitcast(win[ci], jnp.int32)
            wv = pltpu.roll(wv, -(row_slack >> 1), axis=0)
            wv = pltpu.roll(wv, -col_slack, axis=1)
            rolled = pltpu.bitcast(wv, win.dtype)
        else:
            rolled = pltpu.roll(win[ci], -row_slack, axis=0)
            rolled = pltpu.roll(rolled, -col_slack, axis=1)

        acc = jnp.zeros((th, tw), jnp.float32)
        for a in range(nsh_y):
            inner = wxs[0] * rolled[a : a + th, 0:tw]
            for b in range(1, nsh_x):
                inner = inner + wxs[b] * rolled[a : a + th, b : b + tw]
            acc = acc + wys[a] * inner.astype(jnp.float32)
        out_ref[0, ci] = acc


@functools.partial(
    jax.jit,
    static_argnames=(
        "r", "tile", "border", "interpret", "compute_dtype",
        "weight_mode", "_timing_skip_roll",
    ),
)
def warp_windowed(
    img: jnp.ndarray,
    flow: jnp.ndarray,
    t: float | jnp.ndarray = 1.0,
    r: int | Tuple[int, int] = 8,
    tile: Tuple[int, int] = (32, 256),
    border: str = "replicate",
    interpret: bool = False,
    compute_dtype: jnp.dtype = jnp.float32,
    weight_mode: str = "interp",
    _timing_skip_roll: bool = False,  # benchmark-only: wrong output
) -> jnp.ndarray:
    """Backward-warp img by t·flow without gathers.

    img: [N, H, W, C] float; flow: [N, H, W, 2] (u=dx, v=dy).
    t: scalar or [N] per-batch flow scale.
    r: residual radius — int, or (ry, rx) for asymmetric radii (gaming
    motion is mostly horizontal; a smaller vertical radius cuts the tap
    loop, whose cost is (2ry+2)·(2rx+2)).
    border: 'replicate' (grid_sample-style) or 'constant' (cv2.remap zeros).
    compute_dtype: window/horizontal-sum dtype. bfloat16 halves DMA + roll
    volume; worst-case error ~2 bf16 ulps of the pixel (~1 uint8 LSB) —
    fine for model-internal warps, keep f32 for cv2-parity paths.
    weight_mode: 'interp' (the warp), or 'grad_y'/'grad_x' — the same
    windowed sum with one axis' hat weights replaced by their derivative:
    returns d out/d sy (resp. d out/d sx) per pixel/channel, used by the
    warp VJP to get the flow gradient without any gather or scatter.
    """
    n, h, w, c = img.shape
    th, tw = tile
    ry_r, rx_r = (r, r) if isinstance(r, int) else r
    is_bf16 = compute_dtype == jnp.bfloat16

    # VMEM guard: the window scratch is [C, hw_win, ww_win]; many-channel
    # feature maps (e.g. SAFA's 176-ch encoder warps) would blow the ~16 MB
    # VMEM (176·64·512·4B ≈ 23 MB — the round-1 SAFA train-step compile
    # stall). Chunk channels so the scratch stays ≤ ~4 MB; coordinates and
    # weights are recomputed per chunk (VPU-cheap vs the window math).
    _row_al = 16 if is_bf16 else 8
    _nsh_y = 2 * ry_r + 2 + (1 if is_bf16 else 0)
    _hw = 1 << (th + _nsh_y + _row_al - 1 - 1).bit_length()
    _ww = 1 << (tw + 128 + 2 * rx_r + 2 - 1).bit_length()
    _bytes = 2 if is_bf16 else 4
    c_max = max(1, (4 << 20) // (_hw * _ww * _bytes))
    if c > c_max:
        parts = [
            warp_windowed(
                img[..., i:i + c_max], flow, t, r, tile, border, interpret,
                compute_dtype, weight_mode, _timing_skip_roll,
            )
            for i in range(0, c, c_max)
        ]
        return jnp.concatenate(parts, axis=-1)
    # bf16's native sublane tile is 16 — row origins align accordingly, the
    # roll removes only the even part of the slack and the odd remainder
    # folds into ry as one extra vertical tap.
    row_al = 16 if is_bf16 else 8
    nsh_y = 2 * ry_r + 2 + (1 if is_bf16 else 0)
    nsh_x = 2 * rx_r + 2
    # Window dims are powers of two: pltpu.roll with a dynamic shift
    # miscompiles on non-power-of-2 dims (empirically: lane W=384 and
    # sublane H=56/48 read one tile off; 64/256/512 correct).
    hw_min = th + nsh_y + (row_al - 1)  # + row-alignment slack
    hw_win = 1 << (hw_min - 1).bit_length()
    ww_min = tw + 128 + nsh_x
    ww_win = 1 << (ww_min - 1).bit_length()

    # Canvas: content at (PT, PL), padded on all sides. replicate: edge
    # padding — a window clamped even fully into padding reads correct
    # replicate values. constant (cv2.remap zeros): ZERO padding with
    # source coords clipped to the canvas instead of the content — taps
    # then sample actual zeros, reproducing cv2's per-tap zero blending at
    # the border exactly (within the residual radius).
    PT = ((th + ry_r + 1 + th - 1) // th) * th
    PL = ((tw + rx_r + 1 + tw - 1) // tw) * tw
    ph_c = (-h) % th  # content rounded up to tile multiples
    pw_c = (-w) % tw
    PB = hw_win
    PR = ww_win
    pad_cfg = ((0, 0), (PT, ph_c + PB), (PL, pw_c + PR), (0, 0))
    if border == "constant":
        img_p = jnp.pad(img, pad_cfg, mode="constant")
    else:
        img_p = jnp.pad(img, pad_cfg, mode="edge")
    flow_p = (
        jnp.pad(flow, ((0, 0), (0, ph_c), (0, pw_c), (0, 0)), mode="edge")
        if (ph_c or pw_c)
        else flow
    )
    hc, wc = h + ph_c, w + pw_c  # content grid size (tile multiples)
    hp, wp = img_p.shape[1], img_p.shape[2]  # full canvas
    ty_n, tx_n = hc // th, wc // tw

    t_arr = jnp.broadcast_to(
        jnp.asarray(t, jnp.float32).reshape(-1), (n,)
    )

    # tile-mean displacements → window origins, clamped into the canvas.
    # A single reduce_window with a (th, tw) window lowers as a naive
    # sliding reduction (measured +17 ms at 6×1080p); a chain of 2×2
    # halvings down to the largest power-of-two factor of (th, tw),
    # finished by one small reduce, is the fast TPU pooling path.
    mean_f = flow_p.astype(jnp.float32)
    g = 1
    while th % (2 * g) == 0 and tw % (2 * g) == 0:
        g *= 2
    for _ in range(g.bit_length() - 1):
        mean_f = jax.lax.reduce_window(
            mean_f, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        ) * 0.25
    if (th // g, tw // g) != (1, 1):  # finish to one cell per tile
        mean_f = jax.lax.reduce_window(
            mean_f, 0.0, jax.lax.add,
            (1, th // g, tw // g, 1), (1, th // g, tw // g, 1), "VALID",
        ) * (g * g / (th * tw))
    # mean_f: [n, ty, tx, 2]
    mean_vx = mean_f[..., 0] * t_arr[:, None, None]
    mean_vy = mean_f[..., 1] * t_arr[:, None, None]
    ty0 = (PT + jnp.arange(ty_n) * th)[None, :, None]
    tx0 = (PL + jnp.arange(tx_n) * tw)[None, None, :]
    oy_c = jnp.clip(
        ty0 + jnp.round(mean_vy).astype(jnp.int32) - (ry_r + 1), 0, hp - hw_win
    )
    ox_c = jnp.clip(
        tx0 + jnp.round(mean_vx).astype(jnp.int32) - (rx_r + 1), 0, wp - ww_win
    )
    oy_al = (oy_c // row_al) * row_al
    ox_al = (ox_c // 128) * 128
    # all origin/slack scalars packed into ONE int32 per tile (SMEM-bound:
    # scalar-prefetch tables live in the 1MB SMEM):
    # oy/8 << 17 | ox/128 << 11 | row_slack << 7 | col_slack
    packed = (
        (oy_al // 8) * 131072 + (ox_al // 128) * 2048
        + (oy_c - oy_al) * 128 + (ox_c - ox_al)
    ).astype(jnp.int32)

    img_nchw = jnp.transpose(img_p, (0, 3, 1, 2)).astype(compute_dtype)
    flow_nchw = jnp.transpose(flow_p, (0, 3, 1, 2))  # [n, 2, hc, wc]

    if border == "constant":
        # clip into the zero padding (one px past content suffices for the
        # bilinear taps; anything further is all-zero anyway)
        ylo, yhi = float(PT - ry_r), float(PT + h - 1 + ry_r)
        xlo, xhi = float(PL - rx_r), float(PL + w - 1 + rx_r)
    else:
        ylo, yhi = float(PT), float(PT + h - 1)
        xlo, xhi = float(PL), float(PL + w - 1)

    kernel = functools.partial(
        _warp_kernel, nch=c, th=th, tw=tw, nsh_y=nsh_y, nsh_x=nsh_x,
        hw=hw_win, ww=ww_win, ylo=ylo, yhi=yhi, xlo=xlo, xhi=xhi,
        pt=PT, pl_=PL,
        fold_odd_row=is_bf16,
        # interpret mode has no native-layout bitcast; direct roll works there
        bitcast_roll=is_bf16 and not interpret,
        skip_roll=_timing_skip_roll,
        weight_mode=weight_mode,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n, ty_n, tx_n),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # img (manual DMA)
                pl.BlockSpec(  # flow dy plane
                    (1, 1, th, tw), lambda ni, ti, xi, *refs: (ni, 1, ti, xi),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(  # flow dx plane
                    (1, 1, th, tw), lambda ni, ti, xi, *refs: (ni, 0, ti, xi),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, c, th, tw), lambda ni, ti, xi, *refs: (ni, 0, ti, xi),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((c, hw_win, ww_win), compute_dtype),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n, c, hc, wc), jnp.float32),
        interpret=interpret,
    )(packed, t_arr, img_nchw, flow_nchw, flow_nchw)

    out = jnp.transpose(out, (0, 2, 3, 1))
    out = out[:, :h, :w]
    return out.astype(img.dtype)
