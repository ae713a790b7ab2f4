"""Microbench RefineNet pieces at their exact shapes (3×1080p batch).

    nohup python scripts/profile_refine.py > /tmp/profile_refine.log 2>&1 &
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def marginal_time(make_run, k1=2, k2=10, reps=3):
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
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    H, W, C_IN, CMID = 1088, 1920, 11, 40
    N = 3
    DT = jnp.bfloat16
    rng = np.random.default_rng(0)
    x_full = jnp.asarray(rng.random((N, H, W, C_IN), np.float32), DT)
    x_half = jnp.asarray(rng.random((N, H // 2, W // 2, CMID), np.float32), DT)
    results = {}

    def time_op(name, module, x):
        params = module.init(jax.random.PRNGKey(0), x)

        def make(k):
            @jax.jit
            def run():
                def body(i, carry):
                    # vary input per iteration so nothing hoists; consume the
                    # FULL output (a sliced sum lets XLA slice away the conv)
                    out = module.apply(params, carry[0] + i.astype(carry[0].dtype) * 1e-6)
                    return (carry[0], carry[1] + jnp.sum(out.astype(jnp.float32)))

                _, acc = jax.lax.fori_loop(0, k, body, (x, jnp.zeros((), jnp.float32)))
                return acc

            return run

        try:
            results[name] = round(marginal_time(make) * 1000, 2)
        except Exception as e:  # noqa: BLE001
            results[name] = f"FAIL {type(e).__name__}: {str(e)[:120]}"
        print(json.dumps({name: results[name]}), flush=True)

    class Pool(nn.Module):
        @nn.compact
        def __call__(self, x):
            return jax.lax.reduce_window(
                x, jnp.zeros((), x.dtype), jax.lax.add,
                (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
            ) * jnp.asarray(0.25, x.dtype)

    class Conv1(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(CMID, (3, 3), padding=1, dtype=DT)(x)

    class Conv2(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(CMID, (3, 3), padding=1, dtype=DT)(x)

    class ConvT(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.ConvTranspose(3, (4, 4), strides=(2, 2), padding="SAME", dtype=DT)(x)

    class Conv12(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(12, (3, 3), padding=1, dtype=DT)(x)

    class Conv12D2S(nn.Module):
        @nn.compact
        def __call__(self, x):
            o = nn.Conv(12, (3, 3), padding=1, dtype=DT)(x)
            n, h, w, _ = o.shape
            o = o.reshape(n, h, w, 2, 2, 3)
            return o.transpose(0, 1, 3, 2, 4, 5).reshape(n, h * 2, w * 2, 3)

    time_op("pool_2x2_full11ch_ms", Pool(), x_full)
    time_op("conv1_11to40_half_ms", Conv1(), Pool().apply({}, x_full))
    time_op("conv2_40to40_half_ms", Conv2(), x_half)
    time_op("convT_40to3_full_ms", ConvT(), x_half)
    time_op("conv12_40to12_half_ms", Conv12(), x_half)
    time_op("conv12_d2s_ms", Conv12D2S(), x_half)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
