#!/usr/bin/env python
"""Full benchmark orchestrator (reference scripts/run_full_benchmark.py:52-76):
run the experiment sweep over every registered clip × interval."""

import argparse
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-dir", default="data")
    parser.add_argument("--output-dir", default="outputs")
    parser.add_argument("--heavy", action="store_true")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--max-frames", type=int, default=None)
    args = parser.parse_args()

    from vfisr_tpu.data.registry import ClipRegistry

    reg = ClipRegistry(args.data_dir)
    clips = reg.list_clips()
    if not clips:
        raise SystemExit("No clips registered.")
    failures = 0
    for clip in clips:
        n_intervals = clip.get("intervals_count", 0)
        if not n_intervals:
            print(f"[skip] {clip['clip_id']}: no intervals extracted")
            continue
        intervals = ",".join(str(i) for i in range(n_intervals))
        cmd = [
            sys.executable, str(Path(__file__).parent / "run_experiments.py"),
            "--clip", clip["clip_id"], "--intervals", intervals,
            "--data-dir", args.data_dir, "--output-dir", args.output_dir,
        ]
        if args.heavy:
            cmd.append("--heavy")
        if args.resume:
            cmd.append("--resume")
        if args.max_frames:
            cmd += ["--max-frames", str(args.max_frames)]
        print(f"==> {clip['clip_id']} ({n_intervals} intervals)")
        rc = subprocess.call(cmd)
        if rc != 0:
            failures += 1
            print(f"  run_experiments exited {rc}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
