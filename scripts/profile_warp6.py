"""Profile round 6: strided-conv refine head + bf16 activations; full
bench pipeline step preview.

    nohup python scripts/profile_warp6.py > /tmp/profile6.log 2>&1 &
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
    from vfisr_tpu.models.sota.rife import IFNet, RIFEConfig

    H, W = 1088, 1920
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.random((3, H, W, 3), np.float32))
    x1 = jnp.asarray(rng.random((3, H, W, 3), np.float32))
    ts = jnp.asarray([0.25, 0.5, 0.75], jnp.float32)
    results = {}

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
        ("ifnet_newrefine_f32act_ms", RIFEConfig()),
        ("ifnet_newrefine_bf16act_ms", RIFEConfig(dtype=jnp.bfloat16)),
    ]:
        try:
            results[key] = round(ifnet_case(cfg) * 1000, 2)
        except Exception as e:  # noqa: BLE001
            results[key] = f"FAIL {type(e).__name__}: {str(e)[:140]}"
        print(json.dumps({key: results[key]}), flush=True)

    # ---- full bench pipeline step (pair -> 4 upscaled 1440p frames) ----
    def bench_case(dtype):
        cfg = RIFEConfig(dtype=dtype)
        module = IFNet(cfg)
        params = module.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
            jnp.zeros((1, 64, 64, 3)), jnp.asarray([0.5]),
        )["params"]
        Hs, Ws = 1080, 1920
        OUT = (1440, 2560)
        TS = (0.25, 0.5, 0.75)

        def pipeline_step(a, b):
            ap, _ = pad_to_multiple(a, 32)
            bp, _ = pad_to_multiple(b, 32)
            t = len(TS)
            ar = jnp.repeat(ap, t, axis=0)
            br = jnp.repeat(bp, t, axis=0)
            tss = jnp.tile(jnp.asarray(TS, a.dtype), (1,))
            merged, _, _ = module.apply({"params": params}, ar, br, tss)
            mids = unpad(merged, Hs, Ws)
            frames = jnp.concatenate([a, mids], axis=0)
            return to_uint8(resize(frames, OUT, "lanczos4")), mids

        f0 = jnp.asarray(rng.random((1, Hs, Ws, 3), np.float32))
        f1 = jnp.asarray(rng.random((1, Hs, Ws, 3), np.float32))

        def make(k):
            @jax.jit
            def run():
                def body(_, carry):
                    a, b, acc = carry
                    up, mids = pipeline_step(a, b)
                    nxt = mids[2::3][:1]
                    return (nxt, b, acc + jnp.sum(up[0, ::409, ::409, 0].astype(jnp.float32)))

                _, _, acc = jax.lax.fori_loop(0, k, body, (f0, f1, jnp.zeros((), jnp.float32)))
                return acc

            return run

        return marginal_time(make)

    for key, dt in [
        ("bench_step_f32act_ms", jnp.float32),
        ("bench_step_bf16act_ms", jnp.bfloat16),
    ]:
        try:
            per = bench_case(dt)
            results[key] = round(per * 1000, 2)
            results[key.replace("_ms", "_interp_fps")] = round(3.0 / per, 1)
        except Exception as e:  # noqa: BLE001
            results[key] = f"FAIL {type(e).__name__}: {str(e)[:140]}"
        print(json.dumps({k: results[k] for k in results if k.startswith(key[:16])}), flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
