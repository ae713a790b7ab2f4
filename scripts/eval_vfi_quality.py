#!/usr/bin/env python
"""Quick VFI-quality comparison on held-out synthetic gaming scenes:
trained/loaded models vs classical baselines (PSNR on midpoints)."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--models", default="rife,lanczos,optical_flow")
    parser.add_argument("--samples", type=int, default=16)
    parser.add_argument("--crop", type=int, default=256)
    parser.add_argument("--seed", type=int, default=123)
    parser.add_argument("--platform", default="auto", choices=["cpu", "auto"],
                        help="force JAX to CPU (a sitecustomize pins "
                        "JAX_PLATFORMS; use this when the TPU tunnel is "
                        "down — 'auto' keeps the environment default)")
    args = parser.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from vfisr_tpu.evaluation.metrics import compute_psnr_simple, compute_ssim_simple
    from vfisr_tpu.models.registry import get_model
    from vfisr_tpu.train.data import synthetic_batch

    rng = np.random.default_rng(args.seed)
    batch = synthetic_batch(rng, args.samples, args.crop)
    f0s = (batch["img0"] * 255).astype(np.uint8)
    f1s = (batch["img1"] * 255).astype(np.uint8)
    gts = (batch["gt"] * 255).astype(np.uint8)
    ts = batch["t"]

    print(f"{'model':<16}{'PSNR':>8}{'SSIM':>8}")
    print("-" * 32)
    for name in args.models.split(","):
        name = name.strip()
        model = get_model(name, load=True)
        psnrs, ssims = [], []
        for i in range(args.samples):
            mid = model.interpolate(f0s[i], f1s[i], 1, [float(ts[i])])[0]
            psnrs.append(compute_psnr_simple(mid, gts[i]))
            ssims.append(compute_ssim_simple(mid, gts[i]))
        finite = [p for p in psnrs if np.isfinite(p)]
        print(f"{name:<16}{np.mean(finite):>8.2f}{np.mean(ssims):>8.4f}")


if __name__ == "__main__":
    main()
