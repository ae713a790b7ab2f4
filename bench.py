"""Headline benchmark: full AdaptiveVFI 1080p→1440p interpolated fps, one chip.

Measures the BASELINE.md north-star path end-to-end as ONE jitted device
program per frame pair (vfisr_tpu/pipeline/flagship.py): router analysis
(scene-cut SSIM + Farneback motion + particle + HUD temporal-variance ring,
at the reference's streaming-adaptive 480x270 resolution,
run_experiments.py:848-874), RIFE interpolation at 3 timesteps, branchless
scene-cut/HUD compositing (adaptive_pipeline.py:388,399-409), and Lanczos
SR of all output frames to 1440p.

Deployment config (each dial quantified on held-out scenes, docs/PARITY.md):
- bf16 activations + bf16 Pallas warp windows (~56 dB noise floor);
- reduced warp residual radii l=(2,2)/f=(3,4): −0.64 dB vs quality radii;
- shared-flow timesteps (rife.shared_flow_apply): one IFNet trunk pass at
  t=0.5, other timesteps from linearly rescaled flows + t-shifted fusion
  mask — measured BETTER than per-t trunk passes (34.10 vs 33.66 dB
  held-out midpoint PSNR) at ~30% less compute.
- trained ``weights/rife.npz`` loaded when present, so the measured
  program is byte-identical to the shipped model (FLOP-identical either
  way; fresh init is only the no-weights fallback).

Timing methodology: this environment tunnels the TPU behind an async PJRT
proxy where ``block_until_ready`` returns immediately and a synchronous
readback costs ~30 ms. The pipeline is therefore iterated K times *inside*
one jitted ``fori_loop`` (iterations data-dependent, so they serialize),
and per-step time is the marginal (T_K2 - T_K1)/(K2 - K1) between two loop
lengths — host/tunnel latency cancels.

Driver-proofing: the TPU tunnel in this environment can go down (backend
init raises, or ``jax.devices()`` hangs). The parent process therefore
(1) probes the backend in a short-timeout subprocess, (2) runs the actual
measurement in a bounded-timeout child subprocess with retries/backoff,
and (3) if the tunnel is truly unavailable, emits the last recorded
measurement from ``outputs/bench_latest.json`` tagged ``"stale": true``
instead of a traceback — the driver always gets one parseable JSON line.

Baseline: the reference's measured rife_default run produces 147 pairs × 3
midpoints = 441 interpolated frames in 70.1 s on an RTX 3090
(outputs/COMPREHENSIVE_REPORT.md:59) → 6.29 interpolated fps.
North-star (BASELINE.json): ≥120 interpolated fps per chip.

Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

BASELINE_INTERP_FPS = 441.0 / 70.1  # reference rife_default, RTX 3090
METRIC = "adaptive_vfi_interpolated_fps_1080p_to_1440p_single_chip"
LATEST = Path(__file__).resolve().parent / "outputs" / "bench_latest.json"

# Bounded orchestration budget. First flagship compile through the remote
# endpoint takes minutes; warm (cached) runs take ~1-2. Keep the total under
# ~35 min so a dead tunnel still yields the stale record promptly.
PROBE_TIMEOUT_S = float(os.environ.get("VFISR_BENCH_PROBE_TIMEOUT", 180))
CHILD_TIMEOUT_S = float(os.environ.get("VFISR_BENCH_CHILD_TIMEOUT", 1500))
TOTAL_BUDGET_S = float(os.environ.get("VFISR_BENCH_TOTAL_BUDGET", 2100))
MAX_ATTEMPTS = int(os.environ.get("VFISR_BENCH_MAX_ATTEMPTS", 3))


def measure() -> dict:
    """Run the actual on-chip measurement. Raises on backend failure."""
    import jax
    import jax.numpy as jnp

    from vfisr_tpu.models.sota.rife import IFNet, RIFEConfig
    from vfisr_tpu.pipeline.flagship import (
        FlagshipConfig,
        init_history,
        make_flagship_step,
    )

    H, W = 1080, 1920
    PAIRS = 1  # PAIRS>=2 measured memory-bound slower per pair
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
    weights_path = Path(__file__).resolve().parent / "weights" / "rife.npz"
    if weights_path.exists():
        from vfisr_tpu.utils.checkpoint import load_params

        params = load_params(str(weights_path), params)
    fcfg = FlagshipConfig(shared_flow=True)
    step = make_flagship_step(module, params, fcfg)
    t_count = len(fcfg.timestamps)

    def chained(k):
        @jax.jit
        def run(x0, x1):
            hist, hcnt = init_history(PAIRS)

            def body(_, carry):
                a, b, hist, hcnt, acc = carry
                up, mids, hist, hcnt, _sig = step(a, b, hist, hcnt)
                # data dependence: next batch continues from t=0.5 midpoints
                nxt = mids[1::t_count][:PAIRS]
                acc = acc + jnp.sum(up[0, ::409, ::409, 0].astype(jnp.float32))
                return (nxt, b, hist, hcnt, acc)

            _, _, _, _, acc = jax.lax.fori_loop(
                0, k, body, (x0, x1, hist, hcnt, jnp.zeros((), jnp.float32))
            )
            return acc

        return run

    rng = np.random.default_rng(0)
    f0 = jnp.asarray(rng.random((PAIRS, H, W, 3), np.float32))
    f1 = jnp.asarray(rng.random((PAIRS, H, W, 3), np.float32))

    k1, k2 = 2, 10
    run_k1 = chained(k1)
    run_k2 = chained(k2)
    np.asarray(run_k1(f0, f1))  # warmup / compile
    np.asarray(run_k2(f0, f1))

    def best_time(fn, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(f0, f1))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = best_time(run_k1)
    t2 = best_time(run_k2)
    per_step = (t2 - t1) / (k2 - k1)
    interp_fps = t_count * PAIRS / per_step if per_step > 0 else float("inf")

    record = {
        "metric": METRIC,
        "value": round(interp_fps, 2),
        "unit": "fps",
        "vs_baseline": round(interp_fps / BASELINE_INTERP_FPS, 2),
    }

    # MFU: XLA cost analysis of the single flagship step (the program the
    # fori_loop body repeats), so fps can be judged against chip peak —
    # the profiling methodology the reference documents but never
    # implements (/root/reference/INFO.md:564-607). Pallas custom calls
    # report 0 flops, so this counts the conv/matmul work (the MXU side);
    # the quoted MFU is therefore a slight undercount, never an overcount.
    try:
        hist0, hcnt0 = init_history(PAIRS)
        compiled = jax.jit(
            lambda a, b, h, c: step(a, b, h, c)
        ).lower(f0, f1, hist0, hcnt0).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0] if cost else {}
        flops = float(cost.get("flops", 0.0))
        if flops > 0 and per_step > 0:
            peak = float(os.environ.get(
                "VFISR_BENCH_PEAK_FLOPS",
                197e12,  # TPU v5e (v5 lite) bf16 peak: 197 TFLOP/s
            ))
            achieved = flops / per_step
            record.update(
                flops_per_pair=round(flops / PAIRS),
                achieved_tflops=round(achieved / 1e12, 3),
                mfu=round(achieved / peak, 4),
            )
    except Exception as e:  # noqa: BLE001 — cost analysis is best-effort
        record["mfu_unavailable"] = str(e)[:120]

    return record


def _child_main() -> int:
    record = measure()
    print(json.dumps(record))
    try:
        LATEST.parent.mkdir(exist_ok=True)
        LATEST.write_text(json.dumps(record))
    except OSError:
        pass
    return 0


def _parse_record(stdout: str) -> dict | None:
    for line in reversed(stdout.strip().splitlines()):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(rec, dict) and "metric" in rec and "value" in rec:
            return rec
    return None


def _emit_stale(reason: str) -> int:
    try:
        rec = json.loads(LATEST.read_text())
    except (OSError, json.JSONDecodeError):
        rec = {
            "metric": METRIC,
            "value": 0.0,
            "unit": "fps",
            "vs_baseline": 0.0,
        }
    rec["stale"] = True
    rec["stale_reason"] = reason
    print(json.dumps(rec))
    return 0


def _probe_backend() -> bool:
    """Quick subprocess check that the device backend initializes at all."""
    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=PROBE_TIMEOUT_S,
            capture_output=True,
        )
        return proc.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        return False


def _orchestrate() -> int:
    deadline = time.time() + TOTAL_BUDGET_S
    last_reason = "unknown"
    for attempt in range(1, MAX_ATTEMPTS + 1):
        if time.time() >= deadline:
            last_reason = "orchestration budget exhausted"
            break
        if not _probe_backend():
            last_reason = "backend probe failed (tunnel down or hung)"
            print(
                f"bench.py: attempt {attempt}: {last_reason}", file=sys.stderr
            )
            time.sleep(min(30 * attempt, max(0, deadline - time.time())))
            continue
        env = dict(os.environ, VFISR_BENCH_CHILD="1")
        budget = min(CHILD_TIMEOUT_S, max(60, deadline - time.time()))
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                timeout=budget,
                capture_output=True,
                text=True,
                env=env,
            )
        except subprocess.TimeoutExpired:
            last_reason = f"measurement timed out after {budget:.0f}s"
            print(
                f"bench.py: attempt {attempt}: {last_reason}", file=sys.stderr
            )
            continue
        rec = _parse_record(proc.stdout)
        if proc.returncode == 0 and rec is not None:
            print(json.dumps(rec))
            return 0
        tail = "\n".join(proc.stderr.strip().splitlines()[-8:])
        last_reason = f"child rc={proc.returncode}"
        print(
            f"bench.py: attempt {attempt}: {last_reason}\n{tail}",
            file=sys.stderr,
        )
        time.sleep(min(30 * attempt, max(0, deadline - time.time())))
    return _emit_stale(last_reason)


def main() -> int:
    if os.environ.get("VFISR_BENCH_CHILD") == "1":
        return _child_main()
    return _orchestrate()


if __name__ == "__main__":
    sys.exit(main())
