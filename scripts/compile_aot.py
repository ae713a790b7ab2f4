#!/usr/bin/env python
"""AOT-compile a model for deployment — the documented TensorRT-conversion
surface (reference README.md:335-348, `scripts/convert_tensorrt.py`, file
absent) realized TPU-natively via jax.export / XLA AOT.

Examples:
    # "Convert RIFE to TensorRT" analog: fixed 1080p shape, bf16 compute
    python scripts/compile_aot.py --model rife --precision bf16 \
        --output weights/rife_1080p.jaxexport

    # Inspect compile cost without writing an artifact
    python scripts/compile_aot.py --model rife_lite --stats-only

    # Validate an artifact end-to-end
    python scripts/compile_aot.py --load weights/rife_1080p.jaxexport \
        --height 1080 --width 1920
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="rife")
    p.add_argument("--precision", default="f32", choices=["f32", "bf16"],
                   help="bf16 = the TPU analog of the reference's fp16")
    p.add_argument("--output", default=None, help="artifact path (.jaxexport)")
    p.add_argument("--load", default=None, help="validate an existing artifact")
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--pairs", type=int, default=1)
    p.add_argument("--timesteps", default="0.25,0.5,0.75")
    p.add_argument("--weights", default=None)
    p.add_argument("--stats-only", action="store_true",
                   help="print AOT compile stats, skip serialization")
    args = p.parse_args()

    from vfisr_tpu.utils import aot

    if args.load:
        blob = Path(args.load).read_bytes()
        t0 = time.perf_counter()
        shape = aot.smoke_run(blob, args.height, args.width, args.pairs)
        print(json.dumps({
            "artifact": args.load,
            "bytes": len(blob),
            "output_shape": list(shape),
            "run_s": round(time.perf_counter() - t0, 3),
        }))
        return

    ts = tuple(float(t) for t in args.timesteps.split(","))
    if args.stats_only:
        import jax
        import jax.numpy as jnp

        fn, _ = aot.build_interpolate_fn(
            args.model, ts, args.precision, args.weights
        )
        aval = jax.ShapeDtypeStruct(
            (args.pairs, args.height, args.width, 3), jnp.float32
        )
        print(json.dumps({"model": args.model, "precision": args.precision,
                          **aot.compile_stats(fn, aval, aval)}))
        return

    out = args.output or f"weights/{args.model}_{args.height}p.jaxexport"
    blob = aot.export_interpolate(
        args.model, args.height, args.width, args.pairs, ts,
        args.precision, args.weights,
    )
    Path(out).parent.mkdir(exist_ok=True)
    Path(out).write_bytes(blob)
    print(json.dumps({"model": args.model, "precision": args.precision,
                      "artifact": out, "bytes": len(blob)}))


if __name__ == "__main__":
    main()
