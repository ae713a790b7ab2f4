#!/usr/bin/env python
"""Merge all result sources into all_benchmark_data.json
(reference scripts/consolidate_data.py)."""

import argparse
import json
import sys
from datetime import datetime
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SOURCES = [
    ("experiments", "experiment_results.json"),
    ("benchmarks", "benchmarks/benchmark_results.json"),
    ("statistics", "statistical_analysis.json"),
    ("normalized", "normalized_results.json"),
    ("final", "final_analysis.json"),
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--output-dir", default="outputs")
    args = parser.parse_args()

    out_dir = Path(args.output_dir)
    merged = {"consolidated_at": datetime.now().isoformat(), "sources": {}}
    for key, rel in SOURCES:
        p = out_dir / rel
        if p.exists():
            merged["sources"][key] = json.loads(p.read_text())
            print(f"  + {rel}")
        else:
            print(f"  - {rel} (missing)")
    target = out_dir / "all_benchmark_data.json"
    target.write_text(json.dumps(merged, indent=2, default=str))
    print(f"Wrote {target}")


if __name__ == "__main__":
    main()
