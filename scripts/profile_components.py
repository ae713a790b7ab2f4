"""Component-level device profiling of the flagship RIFE pipeline.

Times the hot components in isolation on the real chip using the marginal
fori_loop methodology from bench.py (the TPU tunnel is async; per-step time
is (T_K2-T_K1)/(K2-K1) over chained, data-dependent iterations so host and
tunnel latency cancel).

Components:
  - warp_windowed at 1080p for several (radius, tile) points
  - IFNet forward (batch 3 = one pair x 3 timesteps) in f32 vs bf16
  - Lanczos-4 resize 1080p->1440p x4 frames
  - full pipeline step (reference config)

Run: nohup python scripts/profile_components.py > /tmp/profile.log 2>&1 &
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

    from vfisr_tpu.core.resize import resize
    from vfisr_tpu.models.sota.rife import IFNet, RIFEConfig
    from vfisr_tpu.ops.pallas.warp import warp_windowed

    H, W = 1088, 1920  # x32-padded 1080p
    rng = np.random.default_rng(0)
    results = {}

    # ---- warp variants: [6,H,W,3] (both sides of 3 timesteps in one call,
    # matching the final fusion warp batch in IFNet) ----
    img6 = jnp.asarray(rng.random((6, H, W, 3), np.float32))
    flow6 = jnp.asarray((rng.random((6, H, W, 2), np.float32) - 0.5) * 8)

    def warp_case(r, tile):
        def make(k):
            @jax.jit
            def run():
                def body(_, carry):
                    im, fl = carry
                    out = warp_windowed(im, fl, 1.0, r=r, tile=tile)
                    return out, fl + out[..., :2] * 1e-6

                im, _ = jax.lax.fori_loop(0, k, body, (img6, flow6))
                return jnp.sum(im[0, ::409, ::409, 0])

            return run

        return marginal_time(make)

    for r, tile in [(8, (32, 256)), (6, (32, 256)), (4, (32, 256)),
                    (6, (16, 256)), (4, (16, 256)), (2, (16, 256))]:
        key = f"warp_r{r}_t{tile[0]}x{tile[1]}_6x1080p_ms"
        try:
            results[key] = round(warp_case(r, tile) * 1000, 2)
        except Exception as e:  # noqa: BLE001
            results[key] = f"FAIL {type(e).__name__}: {e}"[:120]
        print(json.dumps({key: results[key]}), flush=True)

    # ---- IFNet forward f32 vs bf16, batch 3 (one pair x 3 ts) ----
    x0 = jnp.asarray(rng.random((3, H, W, 3), np.float32))
    x1 = jnp.asarray(rng.random((3, H, W, 3), np.float32))
    ts = jnp.asarray([0.25, 0.5, 0.75], jnp.float32)

    def ifnet_case(dtype):
        cfg = RIFEConfig(dtype=dtype)
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

    for name, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
        key = f"ifnet_fwd_3x1080p_{name}_ms"
        try:
            results[key] = round(ifnet_case(dt) * 1000, 2)
        except Exception as e:  # noqa: BLE001
            results[key] = f"FAIL {type(e).__name__}: {e}"[:120]
        print(json.dumps({key: results[key]}), flush=True)

    # ---- Lanczos resize 1080p->1440p x4 ----
    fr4 = jnp.asarray(rng.random((4, 1080, 1920, 3), np.float32))

    def resize_case():
        def make(k):
            @jax.jit
            def run():
                def body(_, x):
                    up = resize(x, (1440, 2560), "lanczos4")
                    return x + up[:, :1080, :1920] * 1e-6

                x = jax.lax.fori_loop(0, k, body, fr4)
                return jnp.sum(x[0, ::409, ::409, 0])

            return run

        return marginal_time(make)

    key = "resize_lanczos_4x1080p_to_1440p_ms"
    results[key] = round(resize_case() * 1000, 2)
    print(json.dumps({key: results[key]}), flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
