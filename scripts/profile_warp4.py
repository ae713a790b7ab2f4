"""Profile round 4: pyramid-halve variants inside IFNet (reduce_window vs
jax.image.resize vs the old per-level full-res resize).

    nohup python scripts/profile_warp4.py > /tmp/profile4.log 2>&1 &
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

    def ifnet_case(warp_dtype=jnp.bfloat16):
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

    def halve_rw(x):
        return jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        ) * 0.25

    def halve_imgresize(x):
        n, h, w, c = x.shape
        return jax.image.resize(x, (n, h // 2, w // 2, c), "bilinear")

    def pyr_fullres(x, max_down):
        # old behavior: resize from full res per level
        pyr = {1: x}
        s = 1
        n, h, w, c = x.shape
        while s < max_down:
            s *= 2
            pyr[s] = jax.image.resize(x, (n, h // s, w // s, c), "bilinear")
        return pyr

    real_halve = rife_mod._halve
    real_pyr = rife_mod._build_pyramid

    cases = []

    def case_rw():
        rife_mod._halve = halve_rw
        return ifnet_case()

    def case_imgresize():
        rife_mod._halve = halve_imgresize
        return ifnet_case()

    def case_fullres():
        rife_mod._build_pyramid = pyr_fullres
        return ifnet_case()

    cases = [
        ("ifnet_halve_reducewin_ms", case_rw),
        ("ifnet_halve_imgresize_ms", case_imgresize),
        ("ifnet_pyr_fullres_ms", case_fullres),
    ]
    for key, fn in cases:
        try:
            results[key] = round(fn() * 1000, 2)
        except Exception as e:  # noqa: BLE001
            results[key] = f"FAIL {type(e).__name__}: {str(e)[:120]}"
        finally:
            rife_mod._halve = real_halve
            rife_mod._build_pyramid = real_pyr
        print(json.dumps({key: results[key]}), flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
