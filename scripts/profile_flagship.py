"""Flagship fused AdaptiveVFI step throughput vs frame-pair batch (PAIRS).

Measures the full north-star path (router analysis @480x270 + HUD ring +
RIFE deploy-config interpolation + branchless scene/HUD composite + SR to
1440p) with the marginal fori_loop methodology (see bench.py docstring).

Run: nohup python scripts/profile_flagship.py > /tmp/flagship.log 2>&1 &
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

    from vfisr_tpu.models.sota.rife import IFNet, RIFEConfig
    from vfisr_tpu.pipeline.flagship import (
        FlagshipConfig,
        init_history,
        make_flagship_step,
    )

    H, W = 1080, 1920
    cfg = RIFEConfig(
        dtype=jnp.bfloat16,
        level_warp_radius=(2, 2),
        final_warp_radius=(3, 4),
    )
    module = IFNet(cfg)
    params = module.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((1, 64, 64, 3)),
        jnp.asarray([0.5]),
    )["params"]
    def make_case(pairs, shared):
        fcfg = FlagshipConfig(shared_flow=shared)
        step = make_flagship_step(module, params, fcfg)
        t_count = len(fcfg.timestamps)
        def chained(k):
            @jax.jit
            def run(x0, x1):
                hist, hcnt = init_history(pairs)

                def body(_, carry):
                    a, b, hist, hcnt, acc = carry
                    up, mids, hist, hcnt, _sig = step(a, b, hist, hcnt)
                    nxt = mids[1::t_count][:pairs]  # t=0.5 mids -> next input
                    acc = acc + jnp.sum(up[0, ::409, ::409, 0].astype(jnp.float32))
                    return (nxt, b, hist, hcnt, acc)

                _, _, _, _, acc = jax.lax.fori_loop(
                    0, k, body, (x0, x1, hist, hcnt, jnp.zeros((), jnp.float32))
                )
                return acc

            return run

        rng = np.random.default_rng(0)
        f0 = jnp.asarray(rng.random((pairs, H, W, 3), np.float32))
        f1 = jnp.asarray(rng.random((pairs, H, W, 3), np.float32))
        k1, k2 = 2, 8
        r1, r2 = chained(k1), chained(k2)
        np.asarray(r1(f0, f1))
        np.asarray(r2(f0, f1))

        def best(fn, reps=3):
            b = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                np.asarray(fn(f0, f1))
                b = min(b, time.perf_counter() - t0)
            return b

        per_step = (best(r2) - best(r1)) / (k2 - k1)
        return per_step, t_count * pairs / per_step

    for pairs, shared in ((1, True), (2, True), (1, False)):
        try:
            per_step, fps = make_case(pairs, shared)
            print(
                json.dumps(
                    {
                        "pairs": pairs,
                        "shared_flow": shared,
                        "step_ms": round(per_step * 1000, 2),
                        "interp_fps": round(fps, 2),
                    }
                ),
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"pairs": pairs, "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
