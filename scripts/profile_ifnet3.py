"""IFNet conv/glue microbench: per-level IFBlock cost + pyramid + a
ConvTranspose-vs-depth_to_space upsampling-head comparison.

nowarp IFNet = 11.7 ms (profile_ifnet2); theoretical MXU time ~2 ms. This
locates the gap at the exact shapes of the default config
(scales (8,4,2,1), ws_list (8,4,2,2), batch 3 bf16, 1088x1920 input).

Run: nohup python scripts/profile_ifnet3.py > /tmp/ifnet3.log 2>&1 &
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

    from vfisr_tpu.models.sota.rife import IFBlock, _build_pyramid

    rng = np.random.default_rng(0)
    results = {}

    def block_case(h, w, c, module_cls=IFBlock, **kw):
        x = jnp.asarray(rng.random((3, h, w, 12), np.float32), jnp.bfloat16)
        module = module_cls(c, 8, jnp.bfloat16, **kw)
        params = module.init(jax.random.PRNGKey(0), x)["params"]

        def make(k):
            @jax.jit
            def run():
                def body(_, xc):
                    out = module.apply({"params": params}, xc)
                    return xc * 0.999 + jnp.pad(
                        out, ((0, 0), (0, 0), (0, 0), (0, 7))
                    ) * 1e-6

                xc = jax.lax.fori_loop(0, k, body, x)
                return jnp.sum(xc[0, ::97, ::97, 0].astype(jnp.float32))

            return run

        return marginal_time(make)

    # per-level block shapes of the default config (after block_down):
    # i=0: ws=8 block_down=1 -> 136x240 c=256
    # i=1: ws=4 block_down=1 -> 272x480 c=160
    # i=2: ws=2 block_down=1 -> 544x960 c=112
    # i=3: ws=2 block_down=1 (scale 1 // ws 2) -> 544x960 c=80
    for name, (h, w, c) in {
        "block0_136x240_c256": (136, 240, 256),
        "block1_272x480_c160": (272, 480, 160),
        "block2_544x960_c112": (544, 960, 112),
        "block3_544x960_c80": (544, 960, 80),
    }.items():
        try:
            results[name] = round(block_case(h, w, c) * 1000, 2)
        except Exception as e:  # noqa: BLE001
            results[name] = f"FAIL {type(e).__name__}: {e}"[:160]
        print(json.dumps({name: results[name]}), flush=True)

    # pyramid build of both padded inputs (to /8)
    img = jnp.asarray(rng.random((3, 1088, 1920, 3), np.float32), jnp.bfloat16)

    def pyr_make(k):
        @jax.jit
        def run():
            def body(_, x):
                p = _build_pyramid(x, 8)
                return x * 0.999 + jax.image.resize(p[8], x.shape, "nearest") * 1e-6

            x = jax.lax.fori_loop(0, k, body, img)
            return jnp.sum(x[0, ::409, ::409, 0].astype(jnp.float32))

        return run

    results["pyramid_both_ms"] = round(marginal_time(pyr_make) * 1000 * 2, 2)
    print(json.dumps({"pyramid_both_ms": results["pyramid_both_ms"]}), flush=True)

    # depth_to_space upsampling head vs ConvTranspose inside a block
    class IFBlockDS(nn.Module):
        c: int
        num_convs: int = 8
        dtype: jnp.dtype = jnp.bfloat16

        @nn.compact
        def __call__(self, x):
            conv = functools.partial(nn.Conv, dtype=self.dtype)
            lrelu = lambda v: nn.leaky_relu(v, negative_slope=0.2)  # noqa: E731
            h = lrelu(conv(self.c // 2, (3, 3), strides=(2, 2), padding=1)(x))
            h = lrelu(conv(self.c, (3, 3), strides=(2, 2), padding=1)(h))
            feat = h
            for _ in range(self.num_convs):
                feat = lrelu(conv(self.c, (3, 3), padding=1)(feat)) + feat
            out = nn.Conv(5 * 4, (3, 3), padding=1, dtype=self.dtype,
                          kernel_init=nn.initializers.zeros)(feat)
            n, hh, ww, _ = out.shape
            out = out.reshape(n, hh, ww, 2, 2, 5)
            out = out.transpose(0, 1, 3, 2, 4, 5).reshape(n, hh * 2, ww * 2, 5)
            return jax.image.resize(
                out, (n, x.shape[1], x.shape[2], 5), "bilinear"
            )

    for name, (h, w, c) in {
        "block3ds_544x960_c80": (544, 960, 80),
        "block2ds_544x960_c112": (544, 960, 112),
    }.items():
        try:
            results[name] = round(
                block_case(h, w, c, module_cls=IFBlockDS) * 1000, 2
            )
        except Exception as e:  # noqa: BLE001
            results[name] = f"FAIL {type(e).__name__}: {e}"[:160]
        print(json.dumps({name: results[name]}), flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
