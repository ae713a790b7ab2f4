"""Profile round 8: warp tile geometry at the REAL final-fusion config.

The VMEM window is rounded up to power-of-two dims (dynamic pltpu.roll
constraint), so tile (32,256) pays a 4x DMA/roll amplification
(64x512 window for a 32x256 tile). Tiles sized so that tile+margin lands
just under a power of two cut this: (96,368) -> 128x512 window = 1.86x.

Cases run the exact final-fusion call: 6x1088x1920x3, radius (4,6), bf16
windows. Also the level-warp shape 6x544x960, radius (2,4).

Run: nohup python scripts/profile_warp8.py > /tmp/warp8.log 2>&1 &
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def marginal_time(make_run, k1=2, k2=8, reps=3):
    run1, run2 = make_run(k1), make_run(k2)
    np.asarray(run1())
    np.asarray(run2())

    def best(fn):
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn())
            b = min(b, time.perf_counter() - t0)
        return b

    return (best(run2) - best(run1)) / (k2 - k1)


def main():
    import jax
    import jax.numpy as jnp

    from vfisr_tpu.ops.pallas.warp import warp_windowed

    rng = np.random.default_rng(0)
    results = {}

    def warp_case(shape, r, tile, dtype):
        n, h, w = shape
        img = jnp.asarray(rng.random((n, h, w, 3), np.float32))
        flow = jnp.asarray((rng.random((n, h, w, 2), np.float32) - 0.5) * 8)

        def make(k):
            @jax.jit
            def run():
                def body(_, carry):
                    im, fl = carry
                    out = warp_windowed(im, fl, 1.0, r=r, tile=tile,
                                        compute_dtype=dtype)
                    return out, fl + out[..., :2] * 1e-6

                im, _ = jax.lax.fori_loop(0, k, body, (img, flow))
                return jnp.sum(im[0, ::409, ::409, 0])

            return run

        return marginal_time(make)

    # final-fusion shape: 6x1088x1920, radius (4,6), bf16
    FINAL = (6, 1088, 1920)
    for tile in [(32, 256), (96, 368), (96, 256), (64, 368)]:
        key = f"final_r46_bf16_t{tile[0]}x{tile[1]}_ms"
        try:
            results[key] = round(warp_case(FINAL, (4, 6), tile, jnp.bfloat16) * 1000, 2)
        except Exception as e:  # noqa: BLE001
            results[key] = f"FAIL {type(e).__name__}: {e}"[:160]
        print(json.dumps({key: results[key]}), flush=True)

    # level-warp shape: 6x544x960, radius (2,4), bf16
    LEVEL = (6, 544, 960)
    for tile in [(32, 256), (96, 368), (96, 240)]:
        key = f"level_r24_bf16_t{tile[0]}x{tile[1]}_ms"
        try:
            results[key] = round(warp_case(LEVEL, (2, 4), tile, jnp.bfloat16) * 1000, 2)
        except Exception as e:  # noqa: BLE001
            results[key] = f"FAIL {type(e).__name__}: {e}"[:160]
        print(json.dumps({key: results[key]}), flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
