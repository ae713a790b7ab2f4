"""Quality-vs-radius sweep for the Pallas windowed warp in the deployed
IFNet: the warp tap loop costs ~(2·ry+2)·(2·rx+2) VPU FMAs per pixel, so
the residual radius is the dominant final-warp cost knob (measured: r=(4,6)
bf16 12.26 ms vs r≈(2,4)-class ~8 ms at 6×1080p). This measures what the
radius buys in *quality* with trained weights: midpoint PSNR on held-out
synthetic gaming scenes at several (level, final) radii, plus IFNet fwd
marginal time at 3×1080p per config.

Run: nohup python scripts/profile_radius.py > /tmp/radius.log 2>&1 &
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

    from vfisr_tpu.evaluation.metrics import compute_psnr_simple
    from vfisr_tpu.models.sota.rife import IFNet, RIFEConfig
    from vfisr_tpu.train.data import synthetic_batch
    from vfisr_tpu.utils.checkpoint import load_params

    # held-out scenes, larger crop for realistic flow magnitudes
    rng = np.random.default_rng(987)
    batch = synthetic_batch(rng, 12, 512)
    img0 = jnp.asarray(batch["img0"])
    img1 = jnp.asarray(batch["img1"])
    gt = np.asarray(batch["gt"])
    ts = jnp.asarray(batch["t"])

    base_cfg = RIFEConfig(dtype=jnp.bfloat16)
    module0 = IFNet(base_cfg)
    params = module0.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)),
        jnp.asarray([0.5]),
    )["params"]
    wpath = Path("weights/rife.npz")
    if wpath.exists():
        params = load_params(str(wpath), params)
        print(json.dumps({"weights": "loaded"}), flush=True)
    else:
        print(json.dumps({"weights": "RANDOM (train first!)"}), flush=True)

    H, W = 1080, 1920
    results = {}
    for rl, rf in [((2, 4), (4, 6)), ((2, 4), (3, 5)), ((2, 4), (3, 4)),
                   ((2, 4), (2, 4)), ((2, 2), (2, 4)), ((2, 4), (2, 6))]:
        cfg = RIFEConfig(dtype=jnp.bfloat16, level_warp_radius=rl,
                         final_warp_radius=rf)
        module = IFNet(cfg)

        @jax.jit
        def fwd(p, a, b, t):
            m, _, _ = module.apply({"params": p}, a, b, t)
            return m

        merged = np.asarray(fwd(params, img0, img1, ts))
        psnr = float(np.mean([
            compute_psnr_simple(
                (np.clip(m, 0, 1) * 255).astype(np.uint8),
                (g * 255).astype(np.uint8),
            )
            for m, g in zip(merged, gt)
        ]))

        # marginal fwd time at 3x1080p (bench shapes)
        x0 = jnp.asarray(rng.random((3, H, W, 3), np.float32))
        x1 = jnp.asarray(rng.random((3, H, W, 3), np.float32))
        tt = jnp.asarray([0.25, 0.5, 0.75])
        from vfisr_tpu.core.frames import pad_to_multiple

        def chain(k):
            @jax.jit
            def run(a, b):
                ap, _ = pad_to_multiple(a, 32)
                bp, _ = pad_to_multiple(b, 32)

                def body(_, carry):
                    aa, bb = carry
                    m, _, _ = module.apply({"params": params}, aa, bb, tt)
                    return (m, bb)

                m, _ = jax.lax.fori_loop(0, k, body, (ap, bp))
                return jnp.sum(m[0, ::409, ::409, 0])

            return run

        r1, r2 = chain(2), chain(8)
        np.asarray(r1(x0, x1)); np.asarray(r2(x0, x1))

        def best(fn):
            b = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(fn(x0, x1))
                b = min(b, time.perf_counter() - t0)
            return b

        ms = (best(r2) - best(r1)) / 6 * 1000
        key = f"l{rl[0]}{rl[1]}_f{rf[0]}{rf[1]}"
        results[key] = {"psnr": round(psnr, 3), "fwd_ms": round(ms, 2)}
        print(json.dumps({key: results[key]}), flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
