#!/usr/bin/env python
"""Regression check between two result checkpoints
(reference scripts/compare_phases.py — which hardcodes phase-1 numbers;
here both phases come from files)."""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _table(path):
    data = json.loads(Path(path).read_text())
    out = {}
    for e in data.get("experiments", []):
        v = e.get("vfi_psnr_db")
        if isinstance(v, (int, float)):
            out.setdefault(e["name"], []).append(v)
    return {k: sum(v) / len(v) for k, v in out.items()}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("phase1", help="Older experiment_results.json")
    parser.add_argument("phase2", help="Newer experiment_results.json")
    parser.add_argument("--tolerance", type=float, default=0.5,
                        help="Allowed VFI-PSNR regression (dB)")
    args = parser.parse_args()

    t1, t2 = _table(args.phase1), _table(args.phase2)
    shared = sorted(set(t1) & set(t2))
    regressions = 0
    print(f"{'method':<28}{'phase1':>8}{'phase2':>8}{'delta':>8}")
    for m in shared:
        d = t2[m] - t1[m]
        flag = "  REGRESSION" if d < -args.tolerance else ""
        if flag:
            regressions += 1
        print(f"{m:<28}{t1[m]:>8.2f}{t2[m]:>8.2f}{d:>+8.2f}{flag}")
    print(f"\n{regressions} regression(s) beyond {args.tolerance} dB "
          f"across {len(shared)} shared methods")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
