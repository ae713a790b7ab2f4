"""Time the resize matmul paths on chip: dense vs block-banded, by
precision, at the pipeline's 1080p->1440p SR shape and the degrade shape.

Run: nohup python scripts/profile_resize.py > /tmp/resize.log 2>&1 &
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

    from vfisr_tpu.core.resize import _resize_f

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

    cases = [
        ("sr_4x1080p_to_1440p", (4, 1080, 1920, 3), (1440, 2560), "lanczos4"),
        ("degrade_4x1080p_to_540p", (4, 1080, 1920, 3), (540, 960), "area"),
    ]
    results = {}
    for name, shape, out, method in cases:
        x = jnp.asarray(rng.random(shape, np.float32))
        for prec in ("high", "default"):

            def make(k):
                @jax.jit
                def run():
                    def body(_, acc):
                        y = _resize_f(acc, out[0], out[1], method, prec)
                        # scalar feedback keeps iterations data-dependent
                        # (a loop-invariant resize would be hoisted)
                        return acc * (1.0 + 1e-12 * y[0, 0, 0, 0])

                    r = jax.lax.fori_loop(0, k, body, x)
                    return jnp.sum(r[0, ::409, ::409, 0])

                return run

            key = f"{name}_{prec}"
            try:
                results[key] = round(marginal(make) * 1000, 2)
            except Exception as e:  # noqa: BLE001
                results[key] = f"FAIL {e}"[:120]
            print(json.dumps({key: results[key]}), flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
