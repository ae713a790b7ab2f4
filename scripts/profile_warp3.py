"""Profile round 3: compiled bf16 bitcast-roll warp (parity + timing),
roll-cost isolation, IFNet with the shared halving pyramid.

    nohup python scripts/profile_warp3.py > /tmp/profile3.log 2>&1 &
"""

from __future__ import annotations

import json
import sys
import time
import traceback
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

    from vfisr_tpu.core.warp import flow_warp
    from vfisr_tpu.models.sota.rife import IFNet, RIFEConfig
    from vfisr_tpu.ops.pallas.warp import warp_windowed

    rng = np.random.default_rng(0)
    results = {}

    # ---- compiled bf16 parity on-chip (small) ----
    try:
        img = jnp.asarray(rng.random((1, 64, 256, 1), np.float32))
        ys = jax.lax.broadcasted_iota(jnp.float32, (1, 64, 256), 1)
        xs = jax.lax.broadcasted_iota(jnp.float32, (1, 64, 256), 2)
        flow = jnp.stack(
            [3.0 * jnp.sin(xs / 40.0) + 2.0, 2.0 * jnp.cos(ys / 30.0) - 1.0], -1
        )
        ref = np.asarray(flow_warp(img, flow, 1.0, border="replicate"))
        out_f32 = np.asarray(warp_windowed(img, flow, 1.0, r=6))
        out_bf16 = np.asarray(
            warp_windowed(img, flow, 1.0, r=6, compute_dtype=jnp.bfloat16)
        )
        results["parity_f32_maxerr"] = float(np.abs(ref - out_f32).max())
        results["parity_bf16_maxerr"] = float(np.abs(ref - out_bf16).max())
    except Exception:  # noqa: BLE001
        results["parity"] = traceback.format_exc()[-400:]
    print(json.dumps({k: results[k] for k in results}), flush=True)

    # ---- warp timings at 6x1080p ----
    H, W = 1088, 1920
    img6 = jnp.asarray(rng.random((6, H, W, 3), np.float32))
    flow6 = jnp.asarray((rng.random((6, H, W, 2), np.float32) - 0.5) * 8)

    def warp_case(r, dtype, skip=False):
        def make(k):
            @jax.jit
            def run():
                def body(_, carry):
                    im, fl = carry
                    out = warp_windowed(
                        im, fl, 1.0, r=r, compute_dtype=dtype,
                        _timing_skip_roll=skip,
                    )
                    return out, fl + out[..., :2] * 1e-6

                im, _ = jax.lax.fori_loop(0, k, body, (img6, flow6))
                return jnp.sum(im[0, ::409, ::409, 0])

            return run

        return marginal_time(make)

    for key, args in [
        ("warp_r6_bf16_ms", (6, jnp.bfloat16, False)),
        ("warp_r6_f32_SKIPROLL_ms", (6, jnp.float32, True)),
        ("warp_r6_bf16_SKIPROLL_ms", (6, jnp.bfloat16, True)),
        ("warp_r4_bf16_ms", (4, jnp.bfloat16, False)),
    ]:
        try:
            results[key] = round(warp_case(*args) * 1000, 2)
        except Exception as e:  # noqa: BLE001
            results[key] = f"FAIL {type(e).__name__}: {str(e)[:120]}"
        print(json.dumps({key: results[key]}), flush=True)

    # ---- IFNet with shared pyramid (f32 warps) and bf16 warps ----
    x0 = jnp.asarray(rng.random((3, H, W, 3), np.float32))
    x1 = jnp.asarray(rng.random((3, H, W, 3), np.float32))
    ts = jnp.asarray([0.25, 0.5, 0.75], jnp.float32)

    def ifnet_case(warp_dtype):
        cfg = RIFEConfig(warp_dtype=warp_dtype)
        module = IFNet(cfg)
        params = module.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
            jnp.zeros((1, 64, 64, 3)), jnp.asarray([0.5]),
        )["params"]

        def make(k):
            @jax.jit
            def run():
                def body(_, carry):
                    a, b = carry
                    m, _, _ = module.apply({"params": params}, a, b, ts)
                    return m, a

                m, _ = jax.lax.fori_loop(0, k, body, (x0, x1))
                return jnp.sum(m[0, ::409, ::409, 0].astype(jnp.float32))

            return run

        return marginal_time(make)

    for key, dt in [
        ("ifnet_pyr_f32warp_ms", jnp.float32),
        ("ifnet_pyr_bf16warp_ms", jnp.bfloat16),
    ]:
        try:
            results[key] = round(ifnet_case(dt) * 1000, 2)
        except Exception as e:  # noqa: BLE001
            results[key] = f"FAIL {type(e).__name__}: {str(e)[:120]}"
        print(json.dumps({key: results[key]}), flush=True)

    print(json.dumps(results, indent=1, default=str))


if __name__ == "__main__":
    main()
