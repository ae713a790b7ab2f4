"""Throughput scaling with frame-pair batch size (PAIRS).

The bench pipeline folds 3 timesteps of ONE pair into batch 3. Offline
throughput (the reference's 147-pair sweep) allows batching multiple pairs
per device step: batch 3·PAIRS improves MXU/VPU occupancy and Pallas grid
pipelining. This measures interpolated fps at several PAIRS using the
marginal fori_loop methodology (see bench.py docstring).

Run: nohup python scripts/profile_pairs.py > /tmp/pairs.log 2>&1 &
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

    from vfisr_tpu.core.frames import pad_to_multiple, to_uint8, unpad
    from vfisr_tpu.core.resize import resize
    from vfisr_tpu.models.sota.rife import IFNet, RIFEConfig

    H, W = 1080, 1920
    OUT_H, OUT_W = 1440, 2560
    TS = (0.25, 0.5, 0.75)

    cfg = RIFEConfig(dtype=jnp.bfloat16)
    module = IFNet(cfg)
    params = module.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((1, 64, 64, 3)),
        jnp.asarray([0.5]),
    )["params"]

    def make_case(pairs):
        def pipeline_step(x0, x1):
            x0p, _ = pad_to_multiple(x0, 32)
            x1p, _ = pad_to_multiple(x1, 32)
            t = len(TS)
            x0r = jnp.repeat(x0p, t, axis=0)
            x1r = jnp.repeat(x1p, t, axis=0)
            ts = jnp.tile(jnp.asarray(TS, x0.dtype), (pairs,))
            merged, _, _ = module.apply({"params": params}, x0r, x1r, ts)
            mids = unpad(merged, H, W)
            frames = jnp.concatenate([x0, mids], axis=0)
            up = to_uint8(resize(frames, (OUT_H, OUT_W), "lanczos4"))
            return up, mids

        def chained(k):
            @jax.jit
            def run(x0, x1):
                def body(_, carry):
                    x0c, x1c, acc = carry
                    up, mids = pipeline_step(x0c, x1c)
                    nxt = mids[2 :: len(TS)][:pairs]
                    return (
                        nxt,
                        x1c,
                        acc + jnp.sum(up[0, ::409, ::409, 0].astype(jnp.float32)),
                    )

                _, _, acc = jax.lax.fori_loop(
                    0, k, body, (x0, x1, jnp.zeros((), jnp.float32))
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
        return len(TS) * pairs / per_step

    for pairs in (1, 2, 4):
        try:
            fps = make_case(pairs)
            print(json.dumps({"pairs": pairs, "interp_fps": round(fps, 2)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"pairs": pairs, "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
