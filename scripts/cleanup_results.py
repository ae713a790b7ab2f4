#!/usr/bin/env python
"""Prune bad checkpoint entries (reference scripts/cleanup_results.py):
dedup (clip, name, interval) keeping the newest, drop zero-PSNR rows.

--migrate-legacy-lpips: rows measured with the pre-calibration
'random_features' LPIPS proxy are 4 orders of magnitude off the
calibrated scale (round-3 verdict weak #5: one naive mean poisons a
table). Their PSNR/SSIM stay valid, so instead of deleting the rows the
legacy LPIPS value moves to `vfi_lpips_random_features` and `vfi_lpips`
is nulled — every consumer of `vfi_lpips` now sees ONE scale."""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--results", default="outputs/experiment_results.json")
    parser.add_argument("--dry-run", action="store_true")
    parser.add_argument("--migrate-legacy-lpips", action="store_true",
                        help="move pre-calibration 'random_features' LPIPS "
                        "values aside so vfi_lpips is single-scale")
    args = parser.parse_args()

    path = Path(args.results)
    data = json.loads(path.read_text())
    exps = data.get("experiments", [])
    kept = {}
    dropped_zero = 0
    migrated = 0
    for e in exps:
        def _valid(x):
            # safe_round serializes PSNR inf as the string 'inf' (identical
            # frames, e.g. control keyframes) — that is a VALID measurement
            if x == "inf":
                return True
            return isinstance(x, (int, float)) and x != 0

        if not _valid(e.get("vfi_psnr_db")) and not _valid(
            e.get("keyframe_psnr_db")
        ):
            dropped_zero += 1
            continue
        if args.migrate_legacy_lpips and e.get("lpips_mode") == "random_features":
            if e.get("vfi_lpips") is not None:
                e["vfi_lpips_random_features"] = e["vfi_lpips"]
                e["vfi_lpips"] = None
                migrated += 1
        # clip_id IS part of identity: the same (name, interval) exists on
        # every corpus (pre-round-3 rows default to the legacy clip)
        key = (e.get("clip_id", "synth_001"), e["name"],
               e.get("interval_idx", 0))
        kept[key] = e  # newest wins
    deduped = len(exps) - dropped_zero - len(kept)
    print(f"{len(exps)} entries -> {len(kept)} "
          f"(dropped {dropped_zero} zero-metric, {deduped} duplicates, "
          f"migrated {migrated} legacy-LPIPS)")
    if not args.dry_run:
        data["experiments"] = list(kept.values())
        path.write_text(json.dumps(data, indent=2))
        print(f"Saved {path}")


if __name__ == "__main__":
    main()
