"""Profile round 9: valid 128-multiple tile widths with th=96 (window
amplification 2.67x vs 4x at (32,256)), plus roll-cost isolation via
_timing_skip_roll at the final-fusion config.

Run: nohup python scripts/profile_warp9.py > /tmp/warp9.log 2>&1 &
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

    def warp_case(shape, r, tile, dtype, skip_roll=False):
        n, h, w = shape
        img = jnp.asarray(rng.random((n, h, w, 3), np.float32))
        flow = jnp.asarray((rng.random((n, h, w, 2), np.float32) - 0.5) * 8)

        def make(k):
            @jax.jit
            def run():
                def body(_, carry):
                    im, fl = carry
                    out = warp_windowed(im, fl, 1.0, r=r, tile=tile,
                                        compute_dtype=dtype,
                                        _timing_skip_roll=skip_roll)
                    return out, fl + out[..., :2] * 1e-6

                im, _ = jax.lax.fori_loop(0, k, body, (img, flow))
                return jnp.sum(im[0, ::409, ::409, 0])

            return run

        return marginal_time(make)

    FINAL = (6, 1088, 1920)
    cases = [
        ("final_r46_bf16_t96x256", (4, 6), (96, 256), jnp.bfloat16, False),
        ("final_r46_bf16_t96x512", (4, 6), (96, 512), jnp.bfloat16, False),
        ("final_r46_bf16_t32x256_noroll", (4, 6), (32, 256), jnp.bfloat16, True),
        ("final_r46_bf16_t96x256_noroll", (4, 6), (96, 256), jnp.bfloat16, True),
    ]
    for name, r, tile, dt, sk in cases:
        try:
            results[name] = round(warp_case(FINAL, r, tile, dt, sk) * 1000, 2)
        except Exception as e:  # noqa: BLE001
            results[name] = f"FAIL {type(e).__name__}: {e}"[:160]
        print(json.dumps({name: results[name]}), flush=True)

    # level shape with the best geometry
    LEVEL = (6, 544, 960)
    for name, r, tile in [
        ("level_r24_bf16_t96x256", (2, 4), (96, 256)),
    ]:
        try:
            results[name] = round(
                warp_case(LEVEL, r, tile, jnp.bfloat16) * 1000, 2
            )
        except Exception as e:  # noqa: BLE001
            results[name] = f"FAIL {type(e).__name__}: {e}"[:160]
        print(json.dumps({name: results[name]}), flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
