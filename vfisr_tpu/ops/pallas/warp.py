"""Windowed backward-warp Pallas kernel — the gather-free TPU warp.

Motivation (measured on v5e): XLA's element gather runs ~55 ms per
3×1080p×3ch image (serial hardware gather), making `flow_warp` ~226 ms and
an IFNet forward ~1.85 s — 98% of runtime. TPUs have no fast random
gather; the TPU-native formulation replaces it with dense vector math:

1. Host/jit side: absolute source coords are clamped (replicate border);
   each output tile (th×tw) gets a window origin from the rounded mean of
   its source coordinates. Origins obey Mosaic's DMA alignment (rows
   8-aligned, cols 128-aligned): the row slack (0-7) folds into the
   vertical residual loop, the column slack (0-127) is removed in-kernel
   by a dynamic lane `pltpu.roll` of the window.
2. Kernel per (n, c, tile): DMA the (64 × tw+256) input window HBM→VMEM at
   the tile's dynamic aligned origin, roll columns by the slack, then
   accumulate
       out[p] = Σ_{a,b} hat(ry[p]-a)·hat(rx[p]-b) · win[p+(a,b)]
   over (2r+10)×(2r+2) relative shifts — every term is a (th,tw) vector
   FMA on the VPU; bilinear's 4-tap structure is recovered because the
   hat weights vanish except at the two integer neighbors.

Exactness: identical to bilinear-gather warping wherever the per-pixel
flow deviates from its tile mean by ≤ r px (default r=8). Larger
deviations clamp to the window edge (slight smear strictly localized to
extreme intra-tile motion discontinuities). Parity vs the exact gather
warp is asserted in tests/test_pallas_warp.py.
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
    img_ref,  # [N, C, H, W] in ANY (manual DMA)
    ry_ref,  # [1, th, tw] vertical residual in [0, 2r+9]
    rx_ref,  # [1, th, tw] horizontal residual in [0, 2r+1]
    out_ref,  # [1, 1, th, tw]
    win,  # VMEM scratch [hw, ww]
    sem,
    *,
    th: int,
    tw: int,
    r: int,
    hw: int,
    ww: int,
    fold_odd_row: bool = False,  # bf16: roll even rows only, odd slack in ry
    bitcast_roll: bool = False,  # bf16 compiled path (32-bit-only rotate)
    skip_roll: bool = False,  # TIMING ONLY: wrong output, isolates roll cost
):
    n = pl.program_id(0)
    c = pl.program_id(1)
    ty = pl.program_id(2)
    tx = pl.program_id(3)

    packed = packed_ref[n, ty, tx]
    oy = pl.multiple_of((packed >> 17) * 8, 8)
    ox = pl.multiple_of(((packed >> 11) & 0x3F) * 128, 128)
    copy = pltpu.make_async_copy(
        img_ref.at[n, c, pl.ds(oy, hw), pl.ds(ox, ww)], win, sem
    )
    copy.start()

    ry = ry_ref[0]
    rx = rx_ref[0]
    copy.wait()

    # remove both alignment slacks with dynamic rolls (window dims are
    # powers of two — dynamic roll miscompiles otherwise). Mosaic's dynamic
    # rotate is 32-bit-only: for a bf16 window, roll an int32 bitcast view
    # — (hw, ww) bf16 packs to (hw/2, ww) i32 (sublane pairs), where a
    # lane-roll is exactly a bf16 column roll and a row-roll moves TWO bf16
    # rows (the odd row-slack remainder is folded into ry host-side).
    row_slack = (packed >> 7) & 0xF
    col_slack = packed & 0x7F
    if skip_roll:
        rolled = win[:]
    elif bitcast_roll:
        wv = pltpu.bitcast(win[:], jnp.int32)
        wv = pltpu.roll(wv, -(row_slack >> 1), axis=0)
        wv = pltpu.roll(wv, -col_slack, axis=1)
        rolled = pltpu.bitcast(wv, win.dtype)
    else:
        even = (row_slack & ~1) if fold_odd_row else row_slack
        rolled = pltpu.roll(win[:], -even, axis=0)
        rolled = pltpu.roll(rolled, -col_slack, axis=1)

    # Factorized accumulation: out = Σ_a wy_a · (Σ_b wx_b · win[a+·, b+·]).
    # The horizontal hat weights wx_b depend only on the output pixel, not
    # on the vertical shift a — hoisting them turns the 3-op inner term
    # (wy·wx then FMA) into a single FMA: ~2× fewer VPU ops, bit-identical
    # up to float reassociation. With a bf16 window the inner (horizontal)
    # sum runs in bf16 — ≤2 nonzero hat taps per pixel, so worst-case error
    # is one bf16 ulp of the pixel value (~0.4 uint8 LSB) — and the outer
    # vertical accumulation stays f32.
    cdt = rolled.dtype
    nsh_y = 2 * r + 2 + (1 if fold_odd_row else 0)
    nsh_x = 2 * r + 2
    wxs = [
        jnp.maximum(0.0, 1.0 - jnp.abs(rx - b)).astype(cdt) for b in range(nsh_x)
    ]
    acc = jnp.zeros((th, tw), jnp.float32)
    for a in range(nsh_y):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(ry - a))
        inner = wxs[0] * rolled[a : a + th, 0:tw]
        for b in range(1, nsh_x):
            inner = inner + wxs[b] * rolled[a : a + th, b : b + tw]
        acc = acc + wy * inner.astype(jnp.float32)
    out_ref[0, 0] = acc


@functools.partial(
    jax.jit,
    static_argnames=(
        "r", "tile", "border", "interpret", "compute_dtype", "_timing_skip_roll"
    ),
)
def warp_windowed(
    img: jnp.ndarray,
    flow: jnp.ndarray,
    t: float | jnp.ndarray = 1.0,
    r: int = 8,
    tile: Tuple[int, int] = (32, 256),
    border: str = "replicate",
    interpret: bool = False,
    compute_dtype: jnp.dtype = jnp.float32,
    _timing_skip_roll: bool = False,  # benchmark-only: wrong output
) -> jnp.ndarray:
    """Backward-warp img by t·flow without gathers.

    img: [N, H, W, C] float; flow: [N, H, W, 2] (u=dx, v=dy).
    border: 'replicate' (grid_sample-style) or 'constant' (cv2.remap zeros).
    compute_dtype: window/horizontal-sum dtype. bfloat16 halves DMA + roll
    volume; worst-case error ~1 bf16 ulp of the pixel (~0.4 uint8 LSB) —
    fine for model-internal warps, keep f32 for cv2-parity paths.
    """
    n, h, w, c = img.shape
    th, tw = tile
    is_bf16 = compute_dtype == jnp.bfloat16
    # bf16's native sublane tile is 16 — row origins align accordingly, the
    # roll removes only the even part of the slack (Mosaic's rotate is
    # 32-bit-only; bf16 rolls act on an int32 sublane-pair view) and the
    # odd remainder folds into ry as one extra vertical tap.
    row_al = 16 if is_bf16 else 8
    nsh_y = 2 * r + 2 + (1 if is_bf16 else 0)
    # Window dims are powers of two: pltpu.roll with a dynamic shift
    # miscompiles on non-power-of-2 dims (empirically: lane W=384 and
    # sublane H=56/48 read one tile off; 64/256/512 correct).
    hw_min = th + nsh_y + (row_al - 1)  # + row-alignment slack
    hw_win = 1 << (hw_min - 1).bit_length()
    ww_min = tw + 128 + 2 * r + 2
    ww_win = 1 << (ww_min - 1).bit_length()

    # Canvas padding sized so window origins are NEVER clipped: any tile's
    # clamped source coords admit a window fully inside the canvas. Content
    # sits at (PT, PL); tiles stay aligned to the content origin.
    PT = ((th + r + 1 + th - 1) // th) * th
    PL = ((tw + r + 1 + tw - 1) // tw) * tw
    ph_c = (-h) % th  # content rounded up to tile multiples
    pw_c = (-w) % tw
    PB = hw_win
    PR = ww_win
    img_p = jnp.pad(
        img, ((0, 0), (PT, ph_c + PB), (PL, pw_c + PR), (0, 0)), mode="edge"
    )
    flow_p = (
        jnp.pad(flow, ((0, 0), (0, ph_c), (0, pw_c), (0, 0)), mode="edge")
        if (ph_c or pw_c)
        else flow
    )
    hc, wc = h + ph_c, w + pw_c  # content grid size (tile multiples)
    hp, wp = img_p.shape[1], img_p.shape[2]  # full canvas
    ty_n, tx_n = hc // th, wc // tw

    # coordinates in CANVAS space; clip to the content region (replicate)
    ys = jax.lax.broadcasted_iota(jnp.float32, (n, hc, wc), 1) + PT
    xs = jax.lax.broadcasted_iota(jnp.float32, (n, hc, wc), 2) + PL
    sy_raw = ys + flow_p[..., 1] * t
    sx_raw = xs + flow_p[..., 0] * t
    sy = jnp.clip(sy_raw, float(PT), PT + h - 1.0)
    sx = jnp.clip(sx_raw, float(PL), PL + w - 1.0)

    # tile-mean displacements → window origins (never out of canvas)
    mean_vy = jnp.mean((sy - ys).reshape(n, ty_n, th, tx_n, tw), axis=(2, 4))
    mean_vx = jnp.mean((sx - xs).reshape(n, ty_n, th, tx_n, tw), axis=(2, 4))
    ty0 = (PT + jnp.arange(ty_n) * th)[None, :, None]
    tx0 = (PL + jnp.arange(tx_n) * tw)[None, None, :]
    oy_c = ty0 + jnp.round(mean_vy).astype(jnp.int32) - (r + 1)
    ox_c = tx0 + jnp.round(mean_vx).astype(jnp.int32) - (r + 1)
    oy8 = (oy_c // row_al) * row_al
    ox128 = (ox_c // 128) * 128
    # all origin/slack scalars packed into ONE int32 per tile (SMEM-bound:
    # scalar-prefetch tables live in the 1MB SMEM):
    # oy/8 << 17 | ox/128 << 11 | row_slack << 7 | col_slack
    packed = (
        (oy8 // 8) * 131072 + (ox128 // 128) * 2048
        + (oy_c - oy8) * 128 + (ox_c - ox128)
    ).astype(jnp.int32)

    # per-pixel residuals relative to (effective origin + local position).
    # bf16: the kernel roll removes only the even row slack, so the
    # effective window origin is oy_c shifted back by the odd slack bit.
    ly = jnp.mod(ys - PT, th)
    lx = jnp.mod(xs - PL, tw)
    oy_eff = oy_c - ((oy_c - oy8) & 1) if is_bf16 else oy_c
    oy_b = jnp.repeat(jnp.repeat(oy_eff, th, axis=1), tw, axis=2).reshape(n, hc, wc)
    ox_b = jnp.repeat(jnp.repeat(ox_c, th, axis=1), tw, axis=2).reshape(n, hc, wc)
    ry = jnp.clip(sy - oy_b - ly, 0.0, nsh_y - 1.001)
    rx = jnp.clip(sx - ox_b - lx, 0.0, (2 * r + 2) - 1.001)

    img_nchw = jnp.transpose(img_p, (0, 3, 1, 2)).astype(compute_dtype)

    kernel = functools.partial(
        _warp_kernel, th=th, tw=tw, r=r, hw=hw_win, ww=ww_win,
        fold_odd_row=is_bf16,
        # interpret mode has no native-layout bitcast; direct roll works there
        bitcast_roll=is_bf16 and not interpret,
        skip_roll=_timing_skip_roll,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n, c, ty_n, tx_n),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # img (manual DMA)
                pl.BlockSpec(
                    (1, th, tw), lambda ni, ci, ti, xi, *refs: (ni, ti, xi),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, th, tw), lambda ni, ci, ti, xi, *refs: (ni, ti, xi),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, th, tw), lambda ni, ci, ti, xi, *refs: (ni, ci, ti, xi),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((hw_win, ww_win), compute_dtype),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n, c, hc, wc), jnp.float32),
        interpret=interpret,
    )(packed, img_nchw, ry, rx)

    out = jnp.transpose(out, (0, 2, 3, 1))
    if border == "constant":
        valid = (
            (sy_raw >= float(PT)) & (sy_raw <= PT + h - 1.0)
            & (sx_raw >= float(PL)) & (sx_raw <= PL + w - 1.0)
        )
        out = out * valid[..., None].astype(out.dtype)
    out = out[:, :h, :w]
    return out.astype(img.dtype)
