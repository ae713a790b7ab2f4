"""IFNet cost breakdown + warp-radius ablation on the real chip.

Cases (all bf16 activations, 3x1080p = one pair x 3 timesteps):
  - baseline: final radius (4,6), level (2,4)          [current default]
  - slim:     final (3,5), level (2,3)
  - minimal:  final (2,4), level (1,3)
  - coarse levels: min_warp_scale=4 with baseline radii
  - nowarp: warps monkeypatched to identity -> conv/glue-only cost

Run: nohup python scripts/profile_ifnet2.py > /tmp/ifnet2.log 2>&1 &
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

    def ifnet_case(cfg, nowarp=False):
        module = IFNet(cfg)
        params = module.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
            jnp.zeros((1, 64, 64, 3)), jnp.asarray([0.5]),
        )["params"]

        real_warp = rife_mod.backward_warp
        if nowarp:
            rife_mod.backward_warp = lambda img, flow, t=1.0, **kw: img

        try:
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
        finally:
            rife_mod.backward_warp = real_warp

    cases = [
        ("baseline_f46_l24", RIFEConfig(dtype=jnp.bfloat16), False),
        ("slim_f35_l23",
         RIFEConfig(dtype=jnp.bfloat16, final_warp_radius=(3, 5),
                    level_warp_radius=(2, 3)), False),
        ("minimal_f24_l13",
         RIFEConfig(dtype=jnp.bfloat16, final_warp_radius=(2, 4),
                    level_warp_radius=(1, 3)), False),
        ("coarse_levels_ws4",
         RIFEConfig(dtype=jnp.bfloat16, min_warp_scale=4), False),
        ("nowarp", RIFEConfig(dtype=jnp.bfloat16), True),
    ]
    results = {}
    for name, cfg, nowarp in cases:
        try:
            ms = round(ifnet_case(cfg, nowarp) * 1000, 2)
        except Exception as e:  # noqa: BLE001
            ms = f"FAIL {type(e).__name__}: {e}"[:160]
        results[name] = ms
        print(json.dumps({name: ms}), flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
