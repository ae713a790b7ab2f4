#!/usr/bin/env python
"""Held-out SR quality comparison: trained SR models vs classical resamplers.

Companion to eval_vfi_quality.py. Renders held-out synthetic gaming scenes,
downscales by the model's factor (area, the degradation the harness uses —
reference run_experiments.py degrade step), upscales back with each model,
and reports PSNR/SSIM vs the original.

    python scripts/eval_sr_quality.py --models span,span_x4,lanczos,bicubic
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--models", default="span,span_x4,lanczos,bicubic")
    parser.add_argument("--samples", type=int, default=12)
    parser.add_argument("--crop", type=int, default=256)
    parser.add_argument("--seed", type=int, default=321)
    parser.add_argument(
        "--scene", default="smooth", choices=["smooth", "detail"],
        help="held-out scene family: 'smooth' = host synthetic_batch VFI "
        "scenes (bilinear-warped, little aliased energy — classical "
        "resamplers are near-optimal there); 'detail' = unwarped "
        "device_sr_batch scenes (pixel checkers, panel seams, speckle) "
        "where x2 area decimation actually destroys information")
    parser.add_argument(
        "--detail", type=float, default=0.6,
        help="structure weight for --scene detail")
    parser.add_argument("--platform", default="auto", choices=["cpu", "auto"],
                        help="force JAX to CPU (a sitecustomize pins "
                        "JAX_PLATFORMS; use this when the TPU tunnel is "
                        "down — 'auto' keeps the environment default)")
    args = parser.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from vfisr_tpu.core.resize import resize
    from vfisr_tpu.evaluation.metrics import (
        compute_psnr_simple,
        compute_ssim_simple,
    )
    from vfisr_tpu.models.registry import get_model
    from vfisr_tpu.train.data import synthetic_batch

    if args.scene == "detail":
        import jax

        from vfisr_tpu.train.device_data import device_sr_batch

        batch = device_sr_batch(
            jax.random.PRNGKey(args.seed), args.samples, args.crop,
            detail=args.detail,
        )
        hr = np.asarray(
            np.clip(np.asarray(batch["gt"]) * 255 + 0.5, 0, 255), np.uint8
        )
    else:
        rng = np.random.default_rng(args.seed)
        batch = synthetic_batch(rng, args.samples, args.crop)
        hr = (batch["gt"] * 255).astype(np.uint8)

    print(f"scene={args.scene}")
    print(f"{'model':<12}{'scale':>6}{'PSNR':>8}{'SSIM':>8}")
    print("-" * 34)
    for name in args.models.split(","):
        name = name.strip()
        scale = 4 if name.endswith("_x4") else 2
        # "_x4" suffix selects the 4x variant; classical resamplers accept
        # any scale, so strip the suffix for their registry lookup too.
        reg = "span" if name.startswith("span") else name.removesuffix("_x4")
        kw = {"scale": 4} if name == "span_x4" else {}
        model = get_model(reg, load=True, **kw)
        lo_hw = (args.crop // scale, args.crop // scale)
        psnrs, ssims = [], []
        for i in range(args.samples):
            lo = np.asarray(resize(hr[i].astype(np.float32), lo_hw, "area"))
            lo_u8 = np.clip(lo + 0.5, 0, 255).astype(np.uint8)
            up = model.upscale(lo_u8, scale=float(scale))
            psnrs.append(compute_psnr_simple(up, hr[i]))
            ssims.append(compute_ssim_simple(up, hr[i]))
        finite = [p for p in psnrs if np.isfinite(p)]
        print(f"{name:<12}{scale:>5}x{np.mean(finite):>8.2f}"
              f"{np.mean(ssims):>8.4f}")


if __name__ == "__main__":
    main()
