#!/usr/bin/env python
"""Prune bad checkpoint entries (reference scripts/cleanup_results.py):
dedup (name, interval) keeping the newest, drop zero-PSNR rows."""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--results", default="outputs/experiment_results.json")
    parser.add_argument("--dry-run", action="store_true")
    args = parser.parse_args()

    path = Path(args.results)
    data = json.loads(path.read_text())
    exps = data.get("experiments", [])
    kept = {}
    dropped_zero = 0
    for e in exps:
        v = e.get("vfi_psnr_db")
        kf = e.get("keyframe_psnr_db")
        if (not isinstance(v, (int, float)) or v == 0) and (
            not isinstance(kf, (int, float)) or kf == 0
        ):
            dropped_zero += 1
            continue
        kept[(e["name"], e.get("interval_idx", 0))] = e  # newest wins
    deduped = len(exps) - dropped_zero - len(kept)
    print(f"{len(exps)} entries -> {len(kept)} "
          f"(dropped {dropped_zero} zero-metric, {deduped} duplicates)")
    if not args.dry_run:
        data["experiments"] = list(kept.values())
        path.write_text(json.dumps(data, indent=2))
        print(f"Saved {path}")


if __name__ == "__main__":
    main()
