#!/usr/bin/env python
"""Model weight acquisition (documented scripts/download_weights.py).

The reference downloads external PyTorch checkpoints (setup_wsl.sh:61-75).
The native JAX models cannot use those without conversion, and this
environment has no network egress — so this script:

1. reports which native weight files are present/absent under weights/,
2. converts PyTorch checkpoints into the native .npz layout when a
   --convert path is given (runs offline, torch-cpu is available),
3. otherwise explains the training path (scripts/train.py).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

EXPECTED = {
    "rife": "weights/rife.npz",
    "rife_lite": "weights/rife_lite.npz",
    "span_x2": "weights/span_x2.npz",
    "vfimamba": "weights/vfimamba.npz",
    "safa": "weights/safa.npz",
    "lpips_alex": "weights/lpips_alex.npz",
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--convert", default=None,
                        help="Path to a PyTorch .pth checkpoint to convert")
    parser.add_argument("--model", default=None, choices=sorted(EXPECTED),
                        help="Which native model the checkpoint belongs to")
    args = parser.parse_args()

    if args.convert:
        if not args.model:
            raise SystemExit("--convert requires --model")
        import numpy as np
        import torch

        state = torch.load(args.convert, map_location="cpu")
        if hasattr(state, "state_dict"):
            state = state.state_dict()
        if args.model == "lpips_alex":
            raise SystemExit(
                "LPIPS conversion needs both the lpips and alexnet state dicts; "
                "use vfisr_tpu.evaluation.lpips.convert_torch_weights directly."
            )
        # Generic conversion: OIHW conv weights -> HWIO, flatten dict keys.
        out = {}
        for k, v in state.items():
            arr = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
            if arr.ndim == 4:  # conv OIHW -> HWIO
                arr = arr.transpose(2, 3, 1, 0)
            out[k.replace(".", "/")] = arr
        target = Path(EXPECTED[args.model])
        target.parent.mkdir(exist_ok=True)
        np.savez(target, **out)
        print(f"Converted {args.convert} -> {target} ({len(out)} tensors). "
              "NOTE: key mapping to the native module tree may still need "
              "adjustment; load_params validates structure at load time.")
        return

    print("Native weight status (no network egress — no downloads possible):")
    missing = 0
    for name, path in EXPECTED.items():
        exists = Path(path).exists()
        missing += not exists
        print(f"  [{'x' if exists else ' '}] {name:12s} {path}")
    if missing:
        print(f"\n{missing} weight file(s) absent. Options:\n"
              "  - train natively: python scripts/train.py --model rife ...\n"
              "  - convert a PyTorch checkpoint: "
              "download_weights.py --convert ckpt.pth --model rife")


if __name__ == "__main__":
    main()
