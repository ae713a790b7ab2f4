#!/usr/bin/env python
"""Gate a freshly trained checkpoint against an incumbent model.

Training runs in this environment are stopped by hard timeouts (the TPU
tunnel can vanish for hours, so the chip queue budgets every stage), which
means a checkpoint on disk may be an early, undertrained cut. Model
auto-loading is existence-based (vfisr_tpu/models/registry.py), so a weak
checkpoint would silently degrade every consumer — most critically
AdaptivePipeline, which routes the HARDEST pairs to the heavy expert
(reference models/novel/adaptive_pipeline.py:265-286 routes particles and
motion>25px to VFIMamba).

This script compares the candidate model (with its checkpoint auto-loaded)
against an incumbent on held-out synthetic scenes and, if the candidate is
worse, renames the checkpoint aside (``--demote-to``) so auto-load falls
back to the incumbent path. A JSON decision record is written for the
evidence trail either way.

Usage (chip queue, after a budget-bounded training stage):
    python scripts/gate_checkpoint.py --candidate vfimamba \
        --incumbent vfimamba_s --weights weights/vfimamba.npz \
        --demote-to weights/vfimamba_partial.npz \
        --record outputs/train_r3/gate_vfimamba.json
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def heldout_psnr(
    model_name: str,
    samples: int,
    crop: int,
    seed: int,
    weights_path: str | None = None,
) -> float:
    import numpy as np

    from vfisr_tpu.evaluation.metrics import compute_psnr_simple
    from vfisr_tpu.models.registry import get_model
    from vfisr_tpu.train.data import synthetic_batch

    rng = np.random.default_rng(seed)
    batch = synthetic_batch(rng, samples, crop)
    f0s = (batch["img0"] * 255).astype(np.uint8)
    f1s = (batch["img1"] * 255).astype(np.uint8)
    gts = (batch["gt"] * 255).astype(np.uint8)
    ts = batch["t"]
    if weights_path is None:
        model = get_model(model_name, load=True)
    else:
        # Same-model gating (a resumed checkpoint vs its pre-resume
        # snapshot): load an explicit weights file instead of the
        # registry's default auto-load path. Only the trainable sota
        # models accept a weights path — fail with a clear message
        # instead of a TypeError for base/traditional models.
        import inspect

        model = get_model(model_name)
        sig = inspect.signature(model.load)
        if not sig.parameters:
            raise SystemExit(
                f"model '{model_name}' takes no weights path in load() — "
                "checkpoint gating only applies to trainable models "
                "(rife/rife_lite/span/safa/vfimamba/vfimamba_s)")
        model.load(weights_path)
    psnrs = []
    for i in range(samples):
        mid = model.interpolate(f0s[i], f1s[i], 1, [float(ts[i])])[0]
        p = compute_psnr_simple(mid, gts[i])
        if np.isfinite(p):
            psnrs.append(p)
    return float(np.mean(psnrs)) if psnrs else float("-inf")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--candidate", required=True)
    ap.add_argument("--incumbent", required=True)
    ap.add_argument("--incumbent-weights", default=None,
                    help="gate against an explicit incumbent checkpoint "
                    "file (same-model resume gating): the incumbent is "
                    "evaluated as CANDIDATE's model with these weights, "
                    "and on demotion this file is restored to --weights "
                    "so auto-load keeps the better checkpoint")
    ap.add_argument("--weights", required=True,
                    help="candidate checkpoint path (auto-loaded by the "
                    "registry); absent file = nothing to gate")
    ap.add_argument("--demote-to", required=True,
                    help="rename target if the candidate underperforms")
    ap.add_argument("--margin", type=float, default=0.0,
                    help="demote when candidate < incumbent - margin (dB)")
    ap.add_argument("--samples", type=int, default=16)
    ap.add_argument("--crop", type=int, default=256)
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--record", default=None,
                    help="write the decision as JSON here")
    ap.add_argument("--platform", default="auto", choices=["cpu", "auto"])
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    record: dict = {
        "candidate": args.candidate,
        "incumbent": args.incumbent,
        "weights": args.weights,
    }
    if not os.path.exists(args.weights):
        record["decision"] = "skip (no candidate checkpoint on disk)"
        print(json.dumps(record))
    else:
        # Score the exact file this gate will move: auto-load resolution
        # (CWD-dependent) could otherwise score a different checkpoint
        # than --weights and demote/keep on a mismatched measurement.
        cand = heldout_psnr(args.candidate, args.samples, args.crop,
                            args.seed, weights_path=args.weights)
        if args.incumbent_weights is not None:
            record["incumbent_weights"] = args.incumbent_weights
            inc = heldout_psnr(args.candidate, args.samples, args.crop,
                               args.seed, weights_path=args.incumbent_weights)
        else:
            inc = heldout_psnr(args.incumbent, args.samples, args.crop,
                               args.seed)
        record["candidate_psnr_db"] = round(cand, 2)
        record["incumbent_psnr_db"] = round(inc, 2)
        if cand < inc - args.margin:
            if args.incumbent_weights is not None:
                # Same-model gating: the default auto-load path must keep
                # pointing at the better checkpoint, not vanish. Stage the
                # incumbent copy BEFORE moving the candidate aside so a
                # copy failure cannot leave the path empty.
                staged = args.weights + ".gate_restore"
                shutil.copyfile(args.incumbent_weights, staged)
                os.replace(args.weights, args.demote_to)
                os.replace(staged, args.weights)
                record["decision"] = (
                    f"demoted to {args.demote_to}; restored incumbent "
                    f"checkpoint {args.incumbent_weights} to {args.weights}")
            else:
                os.replace(args.weights, args.demote_to)
                record["decision"] = (
                    f"demoted to {args.demote_to} (candidate underperforms; "
                    "auto-load falls back to the incumbent)")
        else:
            record["decision"] = "kept (candidate >= incumbent)"
        print(json.dumps(record))
    if args.record:
        Path(args.record).parent.mkdir(parents=True, exist_ok=True)
        Path(args.record).write_text(json.dumps(record, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
