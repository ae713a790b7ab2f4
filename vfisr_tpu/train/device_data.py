"""On-device synthetic training-data generation.

The axon TPU tunnel moves host batches at ~44 MB/s with ~0.2 s fixed
latency per transfer — a 42 MB float32 VFI batch costs more than 30 train
steps (measured: 0.54 s per 14 MB array vs a 32 ms step). Generating the
synthetic gaming scenes ON the device removes host->device traffic
entirely: textures come from the device PRNG + resize, layer motion is
applied with the same Pallas windowed warp the models use (per-sample
constant flows have zero intra-tile deviation, so a small residual radius
is exact), and the static HUD overlay is an iota-mask composite. A fresh
batch costs a few ms — every step trains on new scenes, no pooling or
augmentation needed.

Scene model mirrors train/data.py::synthetic_batch (host reference):
textured background with subpixel camera translation, a soft-edged
foreground disc with independent motion, and an optional static HUD box
that must NOT move — the gaming failure mode (HUD ghosting) the reference
benchmarks (adaptive_pipeline.py:193-235, metrics.py:530-572).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vfisr_tpu.core.warp import backward_warp


def _texture(key, n: int, size: int, coarse: int) -> jnp.ndarray:
    base = jax.random.uniform(key, (n, coarse, coarse, 3))
    return jax.image.resize(base, (n, size, size, 3), "cubic")


@functools.partial(jax.jit, static_argnames=("batch", "crop", "detail"))
def device_synthetic_batch(key, batch: int = 32, crop: int = 192,
                           detail: float = 0.35) -> dict:
    """Returns {img0, img1, gt, t} as DEVICE float32 arrays in [0, 1].

    ``detail`` mixes HIGH-FREQUENCY structure into the world texture
    (near-Nyquist checkers, thin grid lines, specular pixel noise) — the
    content class real gameplay is full of and band-limited cubic-noise
    textures lack entirely. Without it an SR net has nothing beyond a
    fixed resampler to learn (round-2 finding: span_x2 tied Lanczos) and
    blends never ghost. Set detail=0.0 for the legacy smooth scenes.
    """
    c = crop
    n = batch
    ks = jax.random.split(key, 16)

    # multi-scale textures (mix of coarse and fine detail, random blend)
    wmix = jax.random.uniform(ks[8], (n, 1, 1, 1), minval=0.25, maxval=0.75)
    canvas = (
        wmix * _texture(ks[0], n, 2 * c, max(2 * c // 16, 2))
        + (1 - wmix) * _texture(ks[1], n, 2 * c, max(2 * c // 4, 4))
    )
    fg = (
        wmix * _texture(ks[2], n, c, max(c // 12, 2))
        + (1 - wmix) * _texture(ks[3], n, c, max(c // 3, 4))
    )

    if detail > 0.0:
        cy = jax.lax.broadcasted_iota(jnp.float32, (1, 2 * c, 2 * c), 1)
        cx = jax.lax.broadcasted_iota(jnp.float32, (1, 2 * c, 2 * c), 2)
        dk = jax.random.split(ks[12], 6)
        # near-Nyquist checker (random 2-4 px period), gated to patches
        per = jax.random.randint(dk[0], (n, 1, 1), 2, 5).astype(jnp.float32)
        checker = jnp.mod(jnp.floor(cy / per) + jnp.floor(cx / per), 2.0)
        gate = (_texture(dk[1], n, 2 * c, max(2 * c // 24, 2))[..., 0]
                > 0.72).astype(jnp.float32)
        # thin grid lines (panel seams), random pitch
        pitch = jax.random.randint(dk[2], (n, 1, 1), 24, 96).astype(jnp.float32)
        lines = ((jnp.mod(cy, pitch) < 2.0) | (jnp.mod(cx, pitch) < 2.0)
                 ).astype(jnp.float32)
        # specular speckle: sparse bright pixels
        speck = (jax.random.uniform(dk[3], (n, 2 * c, 2 * c)) > 0.985
                 ).astype(jnp.float32)
        amp = detail * jax.random.uniform(dk[4], (n, 1, 1, 1),
                                          minval=0.5, maxval=1.0)
        struct = jnp.clip(
            0.8 * checker * gate + 0.6 * lines + 1.5 * speck, 0.0, 1.0
        )[..., None]
        tone = jax.random.uniform(dk[5], (n, 1, 1, 3), minval=0.2, maxval=1.0)
        canvas = canvas * (1.0 - amp * struct) + tone * (amp * struct)

    # soft-edged foreground disc (random centre/radius)
    yy = jax.lax.broadcasted_iota(jnp.float32, (1, c, c), 1)
    xx = jax.lax.broadcasted_iota(jnp.float32, (1, c, c), 2)
    ctr = jax.random.uniform(ks[4], (n, 2, 1, 1), minval=0.3 * c, maxval=0.7 * c)
    rad = jax.random.uniform(ks[5], (n, 1, 1), minval=c / 8, maxval=c / 3)
    dist = jnp.sqrt((yy - ctr[:, 0]) ** 2 + (xx - ctr[:, 1]) ** 2)
    fmask = jax.nn.sigmoid(rad - dist)[..., None]  # ~1px soft edge

    t = jax.random.uniform(ks[6], (n,), minval=0.1, maxval=0.9)
    bgd = jax.random.uniform(ks[7], (n, 2), minval=-12.0, maxval=12.0)
    fgd = jax.random.uniform(ks[9], (n, 2), minval=-20.0, maxval=20.0)

    # three renders (pos = 0, t, 1) batched into ONE warp call each for
    # background and foreground: per-sample CONSTANT flows -> zero
    # intra-tile deviation -> small residual radius is exact bilinear.
    pos = jnp.concatenate([jnp.zeros((n,)), t, jnp.ones((n,))])  # [3n]
    canvas3 = jnp.tile(canvas, (3, 1, 1, 1))
    fg3 = jnp.tile(jnp.concatenate([fg, fmask], axis=-1), (3, 1, 1, 1))
    bgd3 = jnp.tile(bgd, (3, 1)) * pos[:, None] + c / 2  # crop origin offset
    fgd3 = jnp.tile(fgd, (3, 1)) * pos[:, None]

    flow_bg = jnp.broadcast_to(
        bgd3[:, None, None, :], (3 * n, 2 * c, 2 * c, 2)
    )
    bg_w = backward_warp(canvas3, flow_bg, 1.0, border="replicate", radius=2)
    frames = bg_w[:, :c, :c]

    # cv2.warpAffine(M=[1,0,fx]) moves content BY +fx => backward flow -fx
    flow_fg = jnp.broadcast_to(-fgd3[:, None, None, :], (3 * n, c, c, 2))
    fg_w = backward_warp(fg3, flow_fg, 1.0, border="constant", radius=2)
    m = jnp.clip(fg_w[..., 3:4], 0.0, 1.0)
    frames = frames * (1.0 - m) + fg_w[..., :3] * m

    # static HUD: bright box with dark inner stripes at a random position,
    # identical in all three frames (broadcast over the 3n render batch)
    hud_on = (jax.random.uniform(ks[10], (n, 1, 1)) < 0.5).astype(jnp.float32)
    # box is 20x56 px; keep the placement interval valid for small crops
    # (c < 68 would invert minval/maxval) and the box inside the frame
    hud_max = max(5.0, c - 64.0)
    hx = jax.random.uniform(ks[11], (n, 2, 1, 1), minval=4.0,
                            maxval=hud_max)
    in_box = (
        (yy >= hx[:, 0]) & (yy < hx[:, 0] + 20)
        & (xx >= hx[:, 1]) & (xx < hx[:, 1] + 56)
    ).astype(jnp.float32) * hud_on
    stripe = (
        (jnp.mod(xx - hx[:, 1], 8.0) < 4.0)
        & (yy >= hx[:, 0] + 6) & (yy < hx[:, 0] + 14)
    ).astype(jnp.float32)
    hud_val = jnp.clip(1.0 - 0.9 * stripe, 0.0, 1.0)[..., None]
    hmask = jnp.tile(in_box[..., None], (3, 1, 1, 1))
    hval = jnp.tile(hud_val, (3, 1, 1, 1))
    frames = frames * (1.0 - hmask) + hval * hmask

    frames = jnp.clip(frames, 0.0, 1.0)
    return {
        "img0": frames[:n],
        "gt": frames[n : 2 * n],
        "img1": frames[2 * n :],
        "t": t,
    }


@functools.partial(jax.jit, static_argnames=("batch", "size", "detail"))
def device_sr_batch(key, batch: int = 32, size: int = 192,
                    detail: float = 0.6) -> dict:
    """Crisp HR scenes for SR training: {"gt": [N,size,size,3]}.

    The VFI generator renders frames through a subpixel bilinear warp,
    which low-passes near-Nyquist content to almost nothing (measured:
    >0.25 cyc/px energy fraction ~0.007 regardless of the detail dial) —
    an SR net trained on its outputs has no aliased detail to learn and
    collapses to a fixed resampler (round-2 finding: span_x2 == Lanczos).
    SR needs no motion, so this composites the structure UNWARPED: pixel
    checkers, panel seams, hard-edged boxes and speckle survive at full
    contrast; the caller area-downsamples for the LR input.
    """
    n, c = batch, size
    ks = jax.random.split(key, 10)
    wmix = jax.random.uniform(ks[0], (n, 1, 1, 1), minval=0.25, maxval=0.75)
    canvas = (
        wmix * _texture(ks[1], n, c, max(c // 16, 2))
        + (1 - wmix) * _texture(ks[2], n, c, max(c // 4, 4))
    )
    cy = jax.lax.broadcasted_iota(jnp.float32, (1, c, c), 1)
    cx = jax.lax.broadcasted_iota(jnp.float32, (1, c, c), 2)

    # hard-edged panels (random boxes with flat colors, crisp borders)
    boxes = jax.random.uniform(ks[3], (n, 6, 4))  # y0,x0,h,w fractions
    cols = jax.random.uniform(ks[4], (n, 6, 3), minval=0.1, maxval=1.0)
    for k in range(6):
        y0 = boxes[:, k, 0, None, None] * c * 0.8
        x0 = boxes[:, k, 1, None, None] * c * 0.8
        bh = 8.0 + boxes[:, k, 2, None, None] * c * 0.25
        bw = 8.0 + boxes[:, k, 3, None, None] * c * 0.25
        inb = ((cy >= y0) & (cy < y0 + bh) & (cx >= x0) & (cx < x0 + bw)
               ).astype(jnp.float32)[..., None]
        canvas = canvas * (1 - 0.9 * inb) + cols[:, k, None, None] * 0.9 * inb

    per = jax.random.randint(ks[5], (n, 1, 1), 2, 5).astype(jnp.float32)
    checker = jnp.mod(jnp.floor(cy / per) + jnp.floor(cx / per), 2.0)
    gate = (_texture(ks[6], n, c, max(c // 24, 2))[..., 0] > 0.7
            ).astype(jnp.float32)
    pitch = jax.random.randint(ks[7], (n, 1, 1), 16, 64).astype(jnp.float32)
    lines = ((jnp.mod(cy, pitch) < 1.0) | (jnp.mod(cx, pitch) < 1.0)
             ).astype(jnp.float32)
    speck = (jax.random.uniform(ks[8], (n, c, c)) > 0.99).astype(jnp.float32)
    struct = jnp.clip(checker * gate + 0.7 * lines + 1.5 * speck, 0.0, 1.0
                      )[..., None]
    tone = jax.random.uniform(ks[9], (n, 1, 1, 3), minval=0.1, maxval=1.0)
    canvas = canvas * (1.0 - detail * struct) + tone * (detail * struct)
    return {"gt": jnp.clip(canvas, 0.0, 1.0)}
