"""Parameter checkpoint save/load.

The reference has no model training and hence no model checkpoints (its
"checkpointing" is the results-JSON resume path, run_experiments.py:
1204-1218 — realized in pipeline/experiment state handling). This module
covers the model-parameter side for the native JAX models: a flat ``.npz``
format (portable, dependency-free) plus orbax for full train states.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    flat = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            flat.update(_flatten(v, f"{prefix}{k}/"))
    else:
        flat[prefix.rstrip("/")] = np.asarray(tree)
    return flat


def _unflatten(flat: Dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def save_params(path: str, params: Any) -> None:
    """Save a pytree of arrays as flat .npz (atomic tmp-replace: training
    jobs are stopped by hard timeouts, which must never be able to leave a
    truncated checkpoint behind)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    # Deterministic tmp name ending in .npz so np.savez never appends a
    # suffix — a stale '<path>.tmp' from an older interrupted run can then
    # never be preferred over the freshly written file.
    tmp = f"{path}.tmp.npz"
    for stale in (f"{path}.tmp", tmp):
        if os.path.exists(stale):
            os.remove(stale)
    np.savez(tmp, **_flatten(params))
    os.replace(tmp, path)


def load_params(path: str, like: Any = None, partial: bool = False) -> dict:
    """Load params saved by save_params. If ``like`` is given, validates that
    the loaded tree has the same structure/shapes.

    partial=True (requires ``like``): keys missing from the checkpoint keep
    their ``like`` (fresh-init) values instead of raising — the warm-start
    path for architectures extended with zero-init stages (e.g. the
    VFIMamba refinement pyramid), where a v1 checkpoint + fresh zero-init
    extras is output-identical to the v1 model. Present keys must still
    match shapes exactly.
    """
    data = np.load(path)
    tree = _unflatten({k: data[k] for k in data.files})
    if like is not None:
        ref_flat = _flatten(like)
        got_flat = _flatten(tree)
        missing = set(ref_flat) - set(got_flat)
        if missing:
            if not partial:
                raise ValueError(
                    f"checkpoint {path} missing keys: {sorted(missing)[:5]}...")
            import warnings

            warnings.warn(
                f"checkpoint {path}: {len(missing)} key(s) absent, kept at "
                f"fresh init (e.g. {sorted(missing)[0]})", stacklevel=2)
            for k in missing:
                got_flat[k] = ref_flat[k]
        for k, v in ref_flat.items():
            if got_flat[k].shape != v.shape:
                raise ValueError(
                    f"checkpoint {path} key {k}: shape {got_flat[k].shape} != {v.shape}"
                )
        if partial:
            # keep exactly the model's key set (drop checkpoint extras)
            return _unflatten({k: got_flat[k] for k in ref_flat})
    return tree
