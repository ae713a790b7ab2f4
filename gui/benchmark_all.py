#!/usr/bin/env python
"""7-method video benchmark (reference gui/benchmark_all.py:263-275 —
same pattern as benchmark_proper with rife_bicubic and lanczos_edge added).
Thin preset over the unified generator."""

import subprocess
import sys
from pathlib import Path

if __name__ == "__main__":
    sys.exit(subprocess.call(
        [sys.executable, str(Path(__file__).parent / "generate_clips.py"),
         "--preset", "all", *sys.argv[1:]]
    ))
