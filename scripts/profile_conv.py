"""A/B alternative lowerings of the IFBlock residual 3x3 conv at the real
block shapes (bf16, batch 3): XLA's native conv runs ~22% MXU there.

Candidates (numerically the same conv, different lowering):
- native: lax.conv_general_dilated NHWC (what nn.Conv emits)
- im2col: concat 9 shifted copies along C -> one [M, 9C]x[9C, C] GEMM
- taps9: sum of 9 shifted [M, C]x[C, C] GEMMs

Run: nohup python scripts/profile_conv.py > /tmp/conv.log 2>&1 &
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

    rng = np.random.default_rng(0)

    def marginal(make_run, k1=2, k2=10):
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

    def native(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)

    def im2col(x, k):
        n, h, w, c = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = jnp.concatenate(
            [
                xp[:, dy : dy + h, dx : dx + w]
                for dy in range(3)
                for dx in range(3)
            ],
            axis=-1,
        )  # [n, h, w, 9c]
        kk = k.reshape(9 * c, k.shape[-1])  # HWIO -> (9c, o)
        return jnp.einsum(
            "nhwk,ko->nhwo", cols, kk, preferred_element_type=jnp.float32
        ).astype(x.dtype)

    def taps9(x, k):
        n, h, w, c = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = None
        for dy in range(3):
            for dx in range(3):
                part = jnp.einsum(
                    "nhwc,co->nhwo",
                    xp[:, dy : dy + h, dx : dx + w],
                    k[dy, dx],
                    preferred_element_type=jnp.float32,
                )
                acc = part if acc is None else acc + part
        return acc.astype(x.dtype)

    FORMS = {"native": native, "im2col": im2col, "taps9": taps9}
    # (label, feature-map shape at the conv, channels) — IFBlock trunks run
    # at 1/4 of block input res: block2 544x960 -> 136x240 c112, block3 -> c80,
    # block1 272x480 -> 68x120 c160, block0 136x240 -> 34x60 c256
    CASES = [
        ("b2_136x240_c112", (3, 136, 240, 112)),
        ("b3_136x240_c80", (3, 136, 240, 80)),
        ("b1_68x120_c160", (3, 68, 120, 160)),
    ]
    results = {}
    for label, shape in CASES:
        c = shape[-1]
        x = jnp.asarray(rng.random(shape, np.float32), jnp.bfloat16)
        k = jnp.asarray(
            rng.standard_normal((3, 3, c, c)) * 0.05, jnp.bfloat16
        )
        ref = None
        for fname, f in FORMS.items():

            def make(kk_):
                @jax.jit
                def run():
                    def body(_, acc):
                        y = f(acc, k)
                        return 0.5 * acc + 0.5 * y  # keep magnitudes sane

                    r = jax.lax.fori_loop(0, kk_, body, x)
                    return jnp.sum(r[0, ::31, ::31, 0].astype(jnp.float32))

                return run

            try:
                ms = marginal(make) * 1000
                # numerics sanity once per form
                y = np.asarray(f(x, k), np.float32)
                if ref is None:
                    ref = y
                    err = 0.0
                else:
                    err = float(np.max(np.abs(y - ref)))
                results[f"{label}_{fname}"] = {
                    "ms": round(ms, 3), "max_err_vs_native": round(err, 5)
                }
            except Exception as e:  # noqa: BLE001
                results[f"{label}_{fname}"] = f"FAIL {e}"[:140]
            print(json.dumps({f"{label}_{fname}": results[f"{label}_{fname}"]}),
                  flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
