#!/usr/bin/env python
"""Publication figure entry point (documented scripts/generate_figures.py) —
delegates to the visualization + report-figure generators."""

import argparse
import subprocess
import sys
from pathlib import Path


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--results", default="outputs/experiment_results.json")
    parser.add_argument("--output-dir", default="outputs/figures")
    args = parser.parse_args()
    here = Path(__file__).parent
    for script in ("generate_visualizations.py", "generate_report_figures.py"):
        rc = subprocess.call([
            sys.executable, str(here / script),
            "--results", args.results, "--output-dir", args.output_dir,
        ])
        if rc != 0:
            sys.exit(rc)


if __name__ == "__main__":
    main()
