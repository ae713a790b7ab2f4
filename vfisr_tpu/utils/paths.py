"""Repo-anchored artifact paths.

The reference resolves its weights via ``external/<repo>/train_log`` dirs
relative to CWD (rife_wrapper.py:47-60); the native build ships flat
``weights/<name>.npz`` checkpoints. Auto-loading must work regardless of
the caller's CWD (CLIs run from the repo root; tests and library users may
not), so default lookups check CWD first (back-compat) then the repo root.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

REPO_ROOT = Path(__file__).resolve().parents[2]


def default_weights(name: str) -> Optional[str]:
    """Path to ``weights/<name>.npz`` if it exists, else None."""
    for base in (Path.cwd(), REPO_ROOT):
        p = base / "weights" / f"{name}.npz"
        if p.exists():
            return str(p)
    return None
