"""Profile round 2: factorized warp kernel, bf16 window, roll cost
isolation, IFNet warp share. Run on the real chip:

    nohup python scripts/profile_warp2.py > /tmp/profile2.log 2>&1 &
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

    import vfisr_tpu.ops.pallas.warp as pwarp
    import vfisr_tpu.models.sota.rife as rife_mod
    from vfisr_tpu.models.sota.rife import IFNet, RIFEConfig

    H, W = 1088, 1920
    rng = np.random.default_rng(0)
    results = {}

    img6 = jnp.asarray(rng.random((6, H, W, 3), np.float32))
    flow6 = jnp.asarray((rng.random((6, H, W, 2), np.float32) - 0.5) * 8)

    def warp_case(r, dtype):
        def make(k):
            @jax.jit
            def run():
                def body(_, carry):
                    im, fl = carry
                    out = pwarp.warp_windowed(
                        im, fl, 1.0, r=r, compute_dtype=dtype
                    )
                    return out, fl + out[..., :2] * 1e-6

                im, _ = jax.lax.fori_loop(0, k, body, (img6, flow6))
                return jnp.sum(im[0, ::409, ::409, 0])

            return run

        return marginal_time(make)

    cases = [
        ("warp_fact_r6_f32_ms", lambda: warp_case(6, jnp.float32)),
        ("warp_fact_r6_bf16_ms", lambda: warp_case(6, jnp.bfloat16)),
        ("warp_fact_r4_bf16_ms", lambda: warp_case(4, jnp.bfloat16)),
    ]

    for key, fn in cases:
        try:
            results[key] = round(fn() * 1000, 2)
        except Exception as e:  # noqa: BLE001
            results[key] = f"FAIL {type(e).__name__}: {e}"[:140]
        print(json.dumps({key: results[key]}), flush=True)

    # ---- roll-cost isolation: no-op the rolls (timing only, wrong output)
    real_roll = pwarp.pltpu.roll
    try:
        pwarp.pltpu.roll = lambda x, shift, axis: x
        key = "warp_fact_r4_bf16_NOROLL_ms"
        results[key] = round(warp_case(4, jnp.bfloat16) * 1000, 2)
        print(json.dumps({key: results[key]}), flush=True)
        key = "warp_fact_r6_f32_NOROLL_ms"
        results[key] = round(warp_case(6, jnp.float32) * 1000, 2)
        print(json.dumps({key: results[key]}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"noroll": f"FAIL {e}"[:140]}), flush=True)
    finally:
        pwarp.pltpu.roll = real_roll

    # ---- IFNet: full (new config) vs warps-stubbed ----
    x0 = jnp.asarray(rng.random((3, H, W, 3), np.float32))
    x1 = jnp.asarray(rng.random((3, H, W, 3), np.float32))
    ts = jnp.asarray([0.25, 0.5, 0.75], jnp.float32)

    def ifnet_case():
        cfg = RIFEConfig()
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

    key = "ifnet_fwd_bf16warp_fact_ms"
    try:
        results[key] = round(ifnet_case() * 1000, 2)
    except Exception as e:  # noqa: BLE001
        results[key] = f"FAIL {type(e).__name__}: {e}"[:140]
    print(json.dumps({key: results[key]}), flush=True)

    real_warp = rife_mod.backward_warp
    try:
        rife_mod.backward_warp = lambda pair, flow, t, **kw: pair
        key = "ifnet_fwd_NOWARP_ms"
        results[key] = round(ifnet_case() * 1000, 2)
        print(json.dumps({key: results[key]}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"nowarp": f"FAIL {e}"[:140]}), flush=True)
    finally:
        rife_mod.backward_warp = real_warp

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
