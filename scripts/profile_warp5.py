"""Profile round 5: asymmetric radii, bf16 activations, nowarp re-baseline,
refine share, and the full bench pipeline step.

    nohup python scripts/profile_warp5.py > /tmp/profile5.log 2>&1 &
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

    import vfisr_tpu.models.sota.rife as rife_mod
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

    cases = [
        ("ifnet_asym_radii_ms", RIFEConfig()),
        ("ifnet_asym_norefine_ms", RIFEConfig(refine=False)),
        ("ifnet_asym_bf16act_ms", RIFEConfig(dtype=jnp.bfloat16)),
    ]
    for key, cfg in cases:
        try:
            results[key] = round(ifnet_case(cfg) * 1000, 2)
        except Exception as e:  # noqa: BLE001
            results[key] = f"FAIL {type(e).__name__}: {str(e)[:140]}"
        print(json.dumps({key: results[key]}), flush=True)

    # nowarp re-baseline with the current pyramid
    real_warp = rife_mod.backward_warp
    try:
        rife_mod.backward_warp = lambda pair, flow, t, **kw: pair
        key = "ifnet_asym_NOWARP_ms"
        results[key] = round(ifnet_case(RIFEConfig()) * 1000, 2)
        print(json.dumps({key: results[key]}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"nowarp": f"FAIL {str(e)[:140]}"}), flush=True)
    finally:
        rife_mod.backward_warp = real_warp

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
