"""Profile round 7: warp v2 (in-kernel coordinates) + pooled refine head.
Compiled parity, warp timing, IFNet, bench step.

    nohup python scripts/profile_warp7.py > /tmp/profile7.log 2>&1 &
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

    from vfisr_tpu.core.frames import pad_to_multiple, to_uint8, unpad
    from vfisr_tpu.core.resize import resize
    from vfisr_tpu.core.warp import flow_warp
    from vfisr_tpu.models.sota.rife import IFNet, RIFEConfig
    from vfisr_tpu.ops.pallas.warp import warp_windowed

    rng = np.random.default_rng(0)
    results = {}

    # ---- compiled parity on-chip ----
    try:
        img = jnp.asarray(rng.random((2, 96, 320, 3), np.float32))
        ys = jax.lax.broadcasted_iota(jnp.float32, (2, 96, 320), 1)
        xs = jax.lax.broadcasted_iota(jnp.float32, (2, 96, 320), 2)
        flow = jnp.stack(
            [4.0 * jnp.sin(xs / 40.0) + 2.0, 2.0 * jnp.cos(ys / 30.0) - 1.0], -1
        )
        for border in ("replicate", "constant"):
            ref = np.asarray(flow_warp(img, flow, 0.7, border=border))
            o32 = np.asarray(warp_windowed(img, flow, 0.7, r=(4, 6), border=border))
            obf = np.asarray(
                warp_windowed(img, flow, 0.7, r=(4, 6), border=border,
                              compute_dtype=jnp.bfloat16)
            )
            results[f"parity_{border}_f32"] = float(np.abs(ref - o32).max())
            results[f"parity_{border}_bf16"] = float(np.abs(ref - obf).max())
    except Exception as e:  # noqa: BLE001
        results["parity"] = f"FAIL {type(e).__name__}: {str(e)[:200]}"
    print(json.dumps(results), flush=True)

    # ---- warp v2 timing 6x1080p ----
    H, W = 1088, 1920
    img6 = jnp.asarray(rng.random((6, H, W, 3), np.float32))
    flow6 = jnp.asarray((rng.random((6, H, W, 2), np.float32) - 0.5) * 8)

    def warp_case(r, dtype):
        def make(k):
            @jax.jit
            def run():
                def body(_, carry):
                    im, fl = carry
                    out = warp_windowed(im, fl, 1.0, r=r, compute_dtype=dtype)
                    return out, fl + out[..., :2] * 1e-6

                im, _ = jax.lax.fori_loop(0, k, body, (img6, flow6))
                return jnp.sum(im[0, ::409, ::409, 0])

            return run

        return marginal_time(make)

    for key, args in [
        ("warpv2_r46_bf16_ms", ((4, 6), jnp.bfloat16)),
        ("warpv2_r46_f32_ms", ((4, 6), jnp.float32)),
        ("warpv2_r24_bf16_ms", ((2, 4), jnp.bfloat16)),
    ]:
        try:
            results[key] = round(warp_case(*args) * 1000, 2)
        except Exception as e:  # noqa: BLE001
            results[key] = f"FAIL {type(e).__name__}: {str(e)[:140]}"
        print(json.dumps({key: results[key]}), flush=True)

    # ---- IFNet + bench step ----
    x0 = jnp.asarray(rng.random((3, H, W, 3), np.float32))
    x1 = jnp.asarray(rng.random((3, H, W, 3), np.float32))
    ts = jnp.asarray([0.25, 0.5, 0.75], jnp.float32)

    def ifnet_case(cfg):
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
                    return m.astype(jnp.float32), a

                m, _ = jax.lax.fori_loop(0, k, body, (x0, x1))
                return jnp.sum(m[0, ::409, ::409, 0].astype(jnp.float32))

            return run

        return marginal_time(make)

    for key, cfg in [
        ("ifnetv2_f32act_ms", RIFEConfig()),
        ("ifnetv2_bf16act_ms", RIFEConfig(dtype=jnp.bfloat16)),
        ("ifnetv2_bf16act_norefine_ms", RIFEConfig(dtype=jnp.bfloat16, refine=False)),
    ]:
        try:
            results[key] = round(ifnet_case(cfg) * 1000, 2)
        except Exception as e:  # noqa: BLE001
            results[key] = f"FAIL {type(e).__name__}: {str(e)[:140]}"
        print(json.dumps({key: results[key]}), flush=True)

    def bench_case(dtype):
        cfg = RIFEConfig(dtype=dtype)
        module = IFNet(cfg)
        params = module.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
            jnp.zeros((1, 64, 64, 3)), jnp.asarray([0.5]),
        )["params"]
        Hs, Ws = 1080, 1920
        TS = (0.25, 0.5, 0.75)

        def pipeline_step(a, b):
            ap, _ = pad_to_multiple(a, 32)
            bp, _ = pad_to_multiple(b, 32)
            ar = jnp.repeat(ap, 3, axis=0)
            br = jnp.repeat(bp, 3, axis=0)
            tss = jnp.asarray(TS, jnp.float32)
            merged, _, _ = module.apply({"params": params}, ar, br, tss)
            mids = unpad(merged, Hs, Ws)
            frames = jnp.concatenate([a, mids], axis=0)
            return to_uint8(resize(frames, (1440, 2560), "lanczos4")), mids

        f0 = jnp.asarray(rng.random((1, Hs, Ws, 3), np.float32))
        f1 = jnp.asarray(rng.random((1, Hs, Ws, 3), np.float32))

        def make(k):
            @jax.jit
            def run():
                def body(_, carry):
                    a, b, acc = carry
                    up, mids = pipeline_step(a, b)
                    return (mids[2::3][:1], b,
                            acc + jnp.sum(up[0, ::409, ::409, 0].astype(jnp.float32)))

                _, _, acc = jax.lax.fori_loop(
                    0, k, body, (f0, f1, jnp.zeros((), jnp.float32))
                )
                return acc

            return run

        return marginal_time(make)

    for key, dt in [("benchv2_bf16act", jnp.bfloat16), ("benchv2_f32act", jnp.float32)]:
        try:
            per = bench_case(dt)
            results[key + "_ms"] = round(per * 1000, 2)
            results[key + "_interp_fps"] = round(3.0 / per, 1)
        except Exception as e:  # noqa: BLE001
            results[key + "_ms"] = f"FAIL {type(e).__name__}: {str(e)[:140]}"
        print(json.dumps({k: v for k, v in results.items() if k.startswith(key)}), flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
