#!/usr/bin/env python
"""Setup verification (reference verify_setup.py:26-129 surface).

Checks: Python >= 3.10, JAX + accelerator allocation probe, core packages,
video IO backend, native model availability (the analog of the reference's
external-repo checks — here the models are built in, so the check is that
they initialize), project directories. Exits non-zero on failure.
"""

from __future__ import annotations

import argparse
import importlib
import subprocess
import sys
from pathlib import Path

PASS, FAIL, WARN = "[PASS]", "[FAIL]", "[warn]"
failures = 0


def check(label: str, fn):
    global failures
    try:
        detail = fn()
        print(f"{PASS} {label}" + (f" — {detail}" if detail else ""))
    except Exception as e:
        failures += 1
        print(f"{FAIL} {label} — {e}")


def warn_check(label: str, fn):
    try:
        detail = fn()
        print(f"{PASS} {label}" + (f" — {detail}" if detail else ""))
    except Exception as e:
        print(f"{WARN} {label} — {e}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--platform", default="auto", choices=["auto", "cpu"],
                        help="probe the CPU backend instead of the default "
                        "device (use when the TPU tunnel is down)")
    parser.add_argument("--probe-timeout", type=float, default=120.0,
                        help="seconds before the device probe is declared "
                        "hung (a dead tunnel makes jax.devices() block "
                        "forever — the probe runs in a bounded subprocess)")
    args = parser.parse_args()

    print("Verifying setup...\n")

    def py_version():
        if sys.version_info < (3, 10):
            raise RuntimeError(f"need >=3.10, have {sys.version.split()[0]}")
        return sys.version.split()[0]

    check("Python >= 3.10", py_version)

    def jax_alloc():
        # Bounded subprocess: with the axon tunnel down, jax.devices()
        # hangs indefinitely (no timeout inside PJRT) — the reference's
        # CUDA probe fails fast, ours must too.
        force_cpu = ("jax.config.update('jax_platforms','cpu'); "
                     if args.platform == "cpu" else "")
        code = (
            "import jax; " + force_cpu +
            "import jax.numpy as jnp; d=jax.devices()[0]; "
            "v=float(jnp.sum(jnp.ones((256,256)))); assert v==65536.0; "
            "print(d.platform, getattr(d,'device_kind','?'))"
        )
        try:
            proc = subprocess.run(
                [sys.executable, "-c", code], capture_output=True,
                text=True, timeout=args.probe_timeout,
            )
        except subprocess.TimeoutExpired:
            raise RuntimeError(
                f"device probe hung >{args.probe_timeout:.0f}s (TPU tunnel "
                "down? retry with --platform cpu)")
        if proc.returncode != 0:
            raise RuntimeError(proc.stderr.strip().splitlines()[-1]
                               if proc.stderr.strip() else "probe failed")
        return proc.stdout.strip()

    check("JAX device allocation probe", jax_alloc)

    for pkg in ("flax", "optax", "numpy", "cv2", "scipy", "pandas",
                "matplotlib", "yaml", "psutil"):
        check(f"package {pkg}", lambda p=pkg: getattr(
            importlib.import_module(p), "__version__", "ok"))

    def video_io():
        import numpy as np

        from vfisr_tpu.data.video_io import FFMPEG, VideoReader, VideoWriter

        import tempfile, os

        path = os.path.join(tempfile.mkdtemp(), "probe.mp4")
        with VideoWriter(path, 64, 48, 30) as w:
            for _ in range(3):
                w.write(np.zeros((48, 64, 3), np.uint8))
        with VideoReader(path) as r:
            assert r.read() is not None
        return "ffmpeg" if FFMPEG else "cv2 backend"

    check("video IO round-trip", video_io)

    def models_init():
        from vfisr_tpu.models.registry import get_model, list_models

        m = get_model("lanczos", load=True)
        assert m.info.name == "Lanczos"
        return f"{len(list_models())} models registered"

    check("model registry", models_init)

    def config_loads():
        from vfisr_tpu.utils.config import load_config

        cfg = load_config()
        assert cfg["adaptive"]["scene_change_threshold"] == 0.65
        return "config/default.yaml parsed"

    check("config system", config_loads)

    def dirs():
        made = []
        for d in ("data/clips", "data/processed", "outputs"):
            p = Path(d)
            if not p.exists():
                p.mkdir(parents=True, exist_ok=True)
                made.append(d)
        return f"created {', '.join(made)}" if made else "all present"

    check("project directories", dirs)

    warn_check("neural weights", lambda: _weights_status())

    print(f"\n{'All checks passed.' if failures == 0 else f'{failures} check(s) FAILED.'}")
    sys.exit(1 if failures else 0)


def _weights_status():
    weights = Path("weights")
    found = list(weights.glob("*.npz")) if weights.exists() else []
    if not found:
        raise RuntimeError(
            "no trained weights in weights/ — neural models run with "
            "deterministic random init (train or convert checkpoints)"
        )
    return f"{len(found)} weight file(s)"


if __name__ == "__main__":
    main()
