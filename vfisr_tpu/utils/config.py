"""Configuration loading — making the YAML real.

The reference ships config/default.yaml (70 lines of documented defaults)
that no code ever parses (SURVEY: no yaml/OmegaConf/hydra import anywhere);
thresholds are hardcoded in constructors. Here ``load_config()`` actually
loads it, deep-merges user overrides, and the constructors consume it.
"""

from __future__ import annotations

import copy
import os
from pathlib import Path
from typing import Any, Dict, Optional

import yaml

DEFAULT_CONFIG_PATH = (
    Path(__file__).resolve().parent.parent.parent / "config" / "default.yaml"
)


def _deep_merge(base: dict, override: dict) -> dict:
    out = copy.deepcopy(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def load_config(path: Optional[str | Path] = None, overrides: Optional[dict] = None) -> dict:
    """Load default.yaml, optionally merged with another file + dict overrides."""
    with open(DEFAULT_CONFIG_PATH) as f:
        cfg = yaml.safe_load(f)
    if path:
        with open(path) as f:
            cfg = _deep_merge(cfg, yaml.safe_load(f) or {})
    if overrides:
        cfg = _deep_merge(cfg, overrides)
    return cfg


def get(cfg: dict, dotted: str, default: Any = None) -> Any:
    """cfg lookup by dotted path, e.g. get(cfg, 'adaptive.route_mode')."""
    node = cfg
    for part in dotted.split("."):
        if not isinstance(node, dict) or part not in node:
            return default
        node = node[part]
    return node


def make_adaptive_pipeline(cfg: Optional[dict] = None, **kwargs):
    """Construct AdaptivePipeline from config (thresholds no longer hardcoded)."""
    from vfisr_tpu.models.novel.adaptive_pipeline import AdaptivePipeline

    cfg = cfg or load_config()
    a = cfg.get("adaptive", {})
    params = dict(
        motion_threshold_low=a.get("motion_threshold_low", 5.0),
        motion_threshold_high=a.get("motion_threshold_high", 25.0),
        route_mode=a.get("route_mode", "hosted"),
    )
    params.update(kwargs)
    return AdaptivePipeline(**params)
