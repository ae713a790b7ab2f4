"""Warp-kernel tile sweep at the deploy radius (3,4), bf16 windows.

The windowed warp's DMA reads hw_win*ww_win per th*tw output tile; the
default (32,256) tile amplifies DMA 4x (64x512 window). Window dims round
to powers of two, so tiles chosen to land just under a boundary cut the
amplification: (40,640) -> 64x1024 = 2.56x, (104,640) -> 128x1024 = 1.97x.
Larger tiles also raise intra-tile flow deviation (clamped at the residual
radius) — quality re-checked separately via scripts/eval_vfi_quality.py.

Run: nohup python scripts/profile_warp_tiles.py > /tmp/warptiles.log 2>&1 &
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from vfisr_tpu.ops.pallas.warp import warp_windowed

    H, W = 1088, 1920
    rng = np.random.default_rng(0)
    img6 = jnp.asarray(rng.random((6, H, W, 3), np.float32))
    # smooth flow field (gaming-like): large-scale sinusoidal + constant
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    fx = 6.0 * np.sin(2 * np.pi * yy / 540) + 3.0
    fy = 2.0 * np.cos(2 * np.pi * xx / 960)
    flow1 = np.stack([fx, fy], axis=-1).astype(np.float32)
    flow6 = jnp.asarray(np.broadcast_to(flow1, (6, H, W, 2)).copy())

    def case(r, tile, dtype):
        def make(k):
            @jax.jit
            def run():
                def body(_, carry):
                    im, fl = carry
                    out = warp_windowed(im, fl, 1.0, r=r, tile=tile,
                                        compute_dtype=dtype)
                    return out, fl + out[..., :2] * 1e-6

                im, _ = jax.lax.fori_loop(0, k, body, (img6, flow6))
                return jnp.sum(im[0, ::409, ::409, 0])

            return run

        r1, r2 = make(2), make(8)
        np.asarray(r1())
        np.asarray(r2())

        def best(fn):
            b = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(fn())
                b = min(b, time.perf_counter() - t0)
            return b

        return (best(r2) - best(r1)) / 6

    for tile in [(32, 256), (40, 256), (40, 640), (104, 640), (104, 256),
                 (40, 1920), (8, 640)]:
        key = f"warp_r34_bf16_t{tile[0]}x{tile[1]}_ms"
        try:
            ms = case((3, 4), tile, jnp.bfloat16) * 1000
            print(json.dumps({key: round(ms, 2)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({key: f"FAIL {type(e).__name__}: {e}"[:160]}),
                  flush=True)
    # level-warp shape too: radius (2,2) at half res, batch 6
    img_h = jnp.asarray(rng.random((6, 544, 960, 3), np.float32))
    flow_h = jnp.asarray(np.broadcast_to(flow1[::2, ::2] / 2, (6, 544, 960, 2)).copy())

    def case_half(tile):
        def make(k):
            @jax.jit
            def run():
                def body(_, carry):
                    im, fl = carry
                    out = warp_windowed(im, fl, 1.0, r=(2, 2), tile=tile,
                                        compute_dtype=jnp.bfloat16)
                    return out, fl + out[..., :2] * 1e-6

                im, _ = jax.lax.fori_loop(0, k, body, (img_h, flow_h))
                return jnp.sum(im[0, ::256, ::256, 0])

            return run

        r1, r2 = make(2), make(8)
        np.asarray(r1())
        np.asarray(r2())

        def best(fn):
            b = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(fn())
                b = min(b, time.perf_counter() - t0)
            return b

        return (best(r2) - best(r1)) / 6

    for tile in [(32, 256), (40, 960), (104, 960)]:
        key = f"warp_r22_bf16_half_t{tile[0]}x{tile[1]}_ms"
        try:
            ms = case_half(tile) * 1000
            print(json.dumps({key: round(ms, 2)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({key: f"FAIL {type(e).__name__}: {e}"[:160]}),
                  flush=True)


if __name__ == "__main__":
    main()
