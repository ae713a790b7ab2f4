#!/usr/bin/env python
"""Status dashboard (reference scripts/quick_summary.py)."""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--results", default="outputs/experiment_results.json")
    parser.add_argument("--data-dir", default="data")
    args = parser.parse_args()

    data_dir = Path(args.data_dir)
    reg = data_dir / "clips_registry.json"
    if reg.exists():
        clips = json.loads(reg.read_text()).get("clips", [])
        print(f"Registered clips: {len(clips)}")
        for c in clips:
            print(f"  {c['clip_id']}: {c['width']}x{c['height']}@{c['fps']}fps, "
                  f"{c.get('intervals_count', 0)} intervals")
    else:
        print("No clips registered.")

    rp = Path(args.results)
    if rp.exists():
        data = json.loads(rp.read_text())
        exps = data.get("experiments", [])
        names = sorted({e["name"] for e in exps})
        intervals = sorted({e.get("interval_idx", 0) for e in exps})
        print(f"\nExperiment results: {len(exps)} runs, {len(names)} methods, "
              f"{len(intervals)} interval(s)")
        done = {(e["name"], e.get("interval_idx", 0)) for e in exps}
        print(f"Completed cells: {len(done)}")
    else:
        print("\nNo experiment results yet.")


if __name__ == "__main__":
    main()
