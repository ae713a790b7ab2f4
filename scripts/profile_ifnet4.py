"""IFNet conv-efficiency mapping: the 544x960 blocks run at ~22% MXU
utilization (4.09 ms for block2 vs ~1.0 ms theory). Maps where the time
goes and which trunk geometry is efficient:

  - trunk-only (num_convs scaling): isolates encoder/upsample overhead
  - c=128 trunk (MXU-native lanes) vs c=112/c=80
  - deeper encoder (stride /8) with wider trunk: same receptive field,
    quarter the trunk pixels
  - space-to-depth entry conv (544x960x12 -> 272x480x48 stride-1)

Run: nohup python scripts/profile_ifnet4.py > /tmp/ifnet4.log 2>&1 &
"""

from __future__ import annotations

import functools
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

    rng = np.random.default_rng(0)
    results = {}

    def lrelu(v):
        return nn.leaky_relu(v, negative_slope=0.2)

    class Trunk(nn.Module):
        c: int
        num_convs: int
        dtype: jnp.dtype = jnp.bfloat16

        @nn.compact
        def __call__(self, x):
            conv = functools.partial(nn.Conv, dtype=self.dtype)
            feat = x
            for _ in range(self.num_convs):
                feat = lrelu(conv(self.c, (3, 3), padding=1)(feat)) + feat
            return feat

    def run_case(module, x):
        params = module.init(jax.random.PRNGKey(0), x)["params"]

        def make(k):
            @jax.jit
            def run():
                def body(_, xc):
                    out = module.apply({"params": params}, xc)
                    # feed back at matching shape
                    return xc * 0.999 + out.reshape(xc.shape) * 1e-6 \
                        if out.shape == xc.shape else xc * 0.999 + 1e-6 * jnp.mean(
                            out.astype(jnp.float32)).astype(xc.dtype)

                xc = jax.lax.fori_loop(0, k, body, x)
                return jnp.sum(xc[0, ::97, ::97, 0].astype(jnp.float32))

            return run

        return marginal_time(make)

    # ---- trunk-only at 136x240, c in {80, 112, 128}, num_convs in {4, 8}
    for c in (80, 112, 128):
        for nc in (4, 8):
            x = jnp.asarray(rng.random((3, 136, 240, c), np.float32), jnp.bfloat16)
            key = f"trunk_136x240_c{c}_n{nc}_ms"
            try:
                results[key] = round(run_case(Trunk(c, nc), x) * 1000, 2)
            except Exception as e:  # noqa: BLE001
                results[key] = f"FAIL {type(e).__name__}: {e}"[:160]
            print(json.dumps({key: results[key]}), flush=True)

    # ---- trunk at 68x120 (stride-/8 encoder), c=160
    x = jnp.asarray(rng.random((3, 68, 120, 160), np.float32), jnp.bfloat16)
    key = "trunk_68x120_c160_n8_ms"
    results[key] = round(run_case(Trunk(160, 8), x) * 1000, 2)
    print(json.dumps({key: results[key]}), flush=True)

    # ---- encoder variants on 544x960x12 input -> 136x240 trunk entry
    class Enc2(nn.Module):  # current: two stride-2 3x3 convs
        c: int = 112
        dtype: jnp.dtype = jnp.bfloat16

        @nn.compact
        def __call__(self, x):
            conv = functools.partial(nn.Conv, dtype=self.dtype)
            h = lrelu(conv(self.c // 2, (3, 3), strides=(2, 2), padding=1)(x))
            return lrelu(conv(self.c, (3, 3), strides=(2, 2), padding=1)(h))

    class EncS2D(nn.Module):  # space-to-depth then one stride-2 conv
        c: int = 112
        dtype: jnp.dtype = jnp.bfloat16

        @nn.compact
        def __call__(self, x):
            n, h, w, cc = x.shape
            x = x.reshape(n, h // 2, 2, w // 2, 2, cc)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * cc)
            conv = functools.partial(nn.Conv, dtype=self.dtype)
            return lrelu(conv(self.c, (3, 3), strides=(2, 2), padding=1)(x))

    x12 = jnp.asarray(rng.random((3, 544, 960, 12), np.float32), jnp.bfloat16)
    for name, mod in [("enc2_544x960_ms", Enc2()), ("encs2d_544x960_ms", EncS2D())]:
        try:
            results[name] = round(run_case(mod, x12) * 1000, 2)
        except Exception as e:  # noqa: BLE001
            results[name] = f"FAIL {type(e).__name__}: {e}"[:160]
        print(json.dumps({name: results[name]}), flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
