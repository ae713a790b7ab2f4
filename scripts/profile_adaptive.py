"""Measure the AdaptiveVFI fast path end-to-end on chip: router analysis
(reference run_experiments.py:848-874 analyzes at 480x270 in the streaming
'adaptive' method), RIFE deploy-config interpolation, scene-cut/HUD
compositing, and Lanczos SR to 1440p — the BASELINE.json north-star
configuration (AdaptiveVFI 30->120fps on one chip).

Also times the full-res parity analyzer (AdaptiveRouter.analyze_device =
reference adaptive_pipeline.py:108-138 full-res Farneback) separately.

Run: nohup python scripts/profile_adaptive.py > /tmp/adaptive.log 2>&1 &
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
    from vfisr_tpu.models.novel.adaptive_pipeline import _analyze_core
    from vfisr_tpu.models.sota.rife import IFNet, RIFEConfig
    from vfisr_tpu.ops.flow.farneback import farneback_flow
    from vfisr_tpu.core.color import rgb_to_gray

    rng = np.random.default_rng(0)
    H, W = 1080, 1920
    OUT_H, OUT_W = 1440, 2560
    TS = (0.25, 0.5, 0.75)

    def marginal(make_run, k1=2, k2=8):
        r1, r2 = make_run(k1), make_run(k2)
        np.asarray(r1())
        np.asarray(r2())

        def best(fn):
            b = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(fn())
                b = min(b, time.perf_counter() - t0)
            return b

        return (best(r2) - best(r1)) / (k2 - k1)

    x0 = jnp.asarray(rng.random((1, H, W, 3), np.float32))
    x1 = jnp.asarray(rng.random((1, H, W, 3), np.float32))
    results = {}

    # --- full-res parity analyzer (scene SSIM + full-res Farneback +
    # particles + HUD ring) ---
    hist = jnp.zeros((1, 10, 180, 320))
    hcnt = jnp.zeros((1,), jnp.int32)

    def make_full(k):
        @jax.jit
        def run():
            def body(_, carry):
                a, b = carry
                sig = _analyze_core(a, b, hist, hcnt, 0.65, 0.4, 10.0)
                return (a + sig["motion_mean"][:, None, None, None] * 1e-9, b)

            a, _ = jax.lax.fori_loop(0, k, body, (x0, x1))
            return jnp.sum(a[0, ::409, ::409, 0])

        return run

    results["analyze_fullres_ms"] = round(marginal(make_full) * 1000, 2)
    print(json.dumps({"analyze_fullres_ms": results["analyze_fullres_ms"]}),
          flush=True)

    # --- streaming-method analysis at 480x270 (reference adaptive inline
    # method resolution) ---
    def make_small(k):
        @jax.jit
        def run():
            def body(_, carry):
                a, b = carry
                g0 = rgb_to_gray(resize(a, (270, 480), "linear") * 255.0)
                g1 = rgb_to_gray(resize(b, (270, 480), "linear") * 255.0)
                flow = farneback_flow(g0, g1, 0.5, 3, 15, 3, 5, 1.2)
                mag = jnp.sqrt(flow[..., 0] ** 2 + flow[..., 1] ** 2)
                mm = jnp.mean(mag, axis=(1, 2))
                return (a + mm[:, None, None, None] * 1e-9, b)

            a, _ = jax.lax.fori_loop(0, k, body, (x0, x1))
            return jnp.sum(a[0, ::409, ::409, 0])

        return run

    results["analyze_480x270_ms"] = round(marginal(make_small) * 1000, 2)
    print(json.dumps({"analyze_480x270_ms": results["analyze_480x270_ms"]}),
          flush=True)

    # --- full fused adaptive fast path: analysis@480x270 -> rife deploy ->
    # scene-gate composite -> SR ---
    cfg = RIFEConfig(dtype=jnp.bfloat16, level_warp_radius=(2, 2),
                     final_warp_radius=(3, 4))
    module = IFNet(cfg)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                         jnp.zeros((1, 64, 64, 3)), jnp.asarray([0.5]))["params"]

    def adaptive_step(a, b):
        g0 = rgb_to_gray(resize(a, (270, 480), "linear") * 255.0)
        g1 = rgb_to_gray(resize(b, (270, 480), "linear") * 255.0)
        flow = farneback_flow(g0, g1, 0.5, 3, 15, 3, 5, 1.2)
        mag = jnp.sqrt(flow[..., 0] ** 2 + flow[..., 1] ** 2)
        motion = jnp.mean(mag, axis=(1, 2))
        scene = motion > 1e9  # scene-cut gate (never on random data)
        ap, _ = pad_to_multiple(a, 32)
        bp, _ = pad_to_multiple(b, 32)
        t = len(TS)
        ar = jnp.repeat(ap, t, axis=0)
        br = jnp.repeat(bp, t, axis=0)
        ts = jnp.asarray(TS, a.dtype)
        merged, _, _ = module.apply({"params": params}, ar, br, ts)
        mids = unpad(merged, H, W)
        mids = jnp.where(scene[:, None, None, None], a, mids)  # branchless gate
        frames = jnp.concatenate([a, mids], axis=0)
        up = to_uint8(resize(frames, (OUT_H, OUT_W), "lanczos4",
                             precision="default"))
        return up, mids

    def make_adaptive(k):
        @jax.jit
        def run():
            def body(_, carry):
                a, b, acc = carry
                up, mids = adaptive_step(a, b)
                nxt = mids[2::3][:1]
                return (nxt, b, acc + jnp.sum(
                    up[0, ::409, ::409, 0].astype(jnp.float32)))

            _, _, acc = jax.lax.fori_loop(
                0, k, body, (x0, x1, jnp.zeros((), jnp.float32)))
            return acc

        return run

    step_s = marginal(make_adaptive)
    results["adaptive_step_ms"] = round(step_s * 1000, 2)
    results["adaptive_interp_fps"] = round(len(TS) / step_s, 1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
