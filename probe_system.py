#!/usr/bin/env python
"""System probe (reference probe_system.py, 889 LoC — GPU/WSL2 oriented).

TPU-native rebuild: detects the JAX platform and TPU topology (chip
generation, core count, HBM), Python/venv, core dependencies, disks and
RAM, and emits recommendations plus a 0-100 compatibility score; ``--json``
for machine consumption (probe_system.py:93-106 surface).
"""

from __future__ import annotations

import argparse
import importlib
import json
import os
import platform
import shutil
import sys


def probe_python() -> dict:
    return {
        "version": platform.python_version(),
        "executable": sys.executable,
        "in_venv": sys.prefix != getattr(sys, "base_prefix", sys.prefix),
    }


_ACCEL_PROBE = r"""
import json
info = {"platform": None, "devices": [], "hbm_gb": None, "error": None}
try:
    import jax
    devs = jax.devices()
    info["platform"] = devs[0].platform if devs else "none"
    for d in devs:
        entry = {"id": d.id, "kind": getattr(d, "device_kind", "unknown")}
        try:
            stats = d.memory_stats()
            if stats and "bytes_limit" in stats:
                entry["hbm_gb"] = round(stats["bytes_limit"] / 1e9, 1)
                info["hbm_gb"] = entry["hbm_gb"]
        except Exception:
            pass
        info["devices"].append(entry)
    info["jax_version"] = jax.__version__
except Exception as e:
    info["error"] = str(e)
print(json.dumps(info))
"""


def probe_accelerator(timeout_s: float = 120.0) -> dict:
    """Device probe in a bounded subprocess: a dead TPU tunnel makes
    jax.devices() block forever inside PJRT, and a system prober must
    never hang (reference probe degrades gracefully without a GPU)."""
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, "-c", _ACCEL_PROBE],
            capture_output=True, text=True, timeout=timeout_s,
        )
        for line in reversed(proc.stdout.strip().splitlines()):
            if line.startswith("{"):
                return json.loads(line)
        err = (proc.stderr.strip().splitlines() or ["no probe output"])[-1]
        return {"platform": None, "devices": [], "hbm_gb": None, "error": err}
    except subprocess.TimeoutExpired:
        return {
            "platform": None, "devices": [], "hbm_gb": None,
            "error": f"device probe hung >{timeout_s:.0f}s "
                     "(TPU tunnel down?)",
        }
    except (OSError, json.JSONDecodeError) as e:
        # Never-hang also means never-crash: a failed spawn or a partial/
        # garbled stdout line (tunnel dropping mid-print) degrades to an
        # error-tagged report like every other probe failure.
        return {"platform": None, "devices": [], "hbm_gb": None,
                "error": f"device probe failed: {e}"}


def probe_dependencies() -> dict:
    deps = {}
    for mod in ("jax", "flax", "optax", "orbax.checkpoint", "chex", "einops",
                "numpy", "cv2", "pandas", "matplotlib", "scipy", "yaml", "psutil"):
        try:
            m = importlib.import_module(mod)
            deps[mod] = getattr(m, "__version__", "ok")
        except Exception:
            deps[mod] = None
    return deps


def probe_system_resources() -> dict:
    import psutil

    vm = psutil.virtual_memory()
    disk = shutil.disk_usage(os.getcwd())
    return {
        "os": f"{platform.system()} {platform.release()}",
        "cpu_count": os.cpu_count(),
        "ram_gb": round(vm.total / 1e9, 1),
        "ram_available_gb": round(vm.available / 1e9, 1),
        "disk_free_gb": round(disk.free / 1e9, 1),
        "ffmpeg": shutil.which("ffmpeg") is not None,
    }


def compute_score(report: dict) -> tuple[int, list, list]:
    score = 100
    recs, warns = [], []
    acc = report["accelerator"]
    if acc.get("error") or not acc.get("devices"):
        score -= 50
        warns.append("No accelerator visible to JAX — compute will run on CPU.")
    elif acc.get("platform") == "cpu":
        score -= 30
        recs.append("Running on CPU backend; attach a TPU for production throughput.")
    sysres = report["system"]
    if sysres["ram_gb"] < 16:
        score -= 10
        warns.append("Less than 16 GB RAM — large-clip preprocessing may swap.")
    if sysres["disk_free_gb"] < 20:
        score -= 10
        warns.append("Less than 20 GB free disk — interval caches are PNG-heavy.")
    if not sysres["ffmpeg"]:
        recs.append("ffmpeg binary not found; video IO uses the OpenCV backend "
                    "(mp4v). Install ffmpeg for x264/NVENC-grade encoding.")
    missing = [k for k, v in report["dependencies"].items() if v is None]
    if missing:
        score -= 5 * len(missing)
        warns.append(f"Missing python deps: {', '.join(missing)}")
    py = report["python"]
    if tuple(int(x) for x in py["version"].split(".")[:2]) < (3, 10):
        score -= 20
        warns.append("Python >= 3.10 required.")
    return max(score, 0), recs, warns


def main():
    parser = argparse.ArgumentParser(description="Probe system compatibility")
    parser.add_argument("--json", action="store_true", help="Emit JSON")
    parser.add_argument("--probe-timeout", type=float, default=120.0,
                        help="seconds before the device probe is declared hung")
    args = parser.parse_args()

    report = {
        "python": probe_python(),
        "accelerator": probe_accelerator(args.probe_timeout),
        "dependencies": probe_dependencies(),
        "system": probe_system_resources(),
    }
    score, recs, warns = compute_score(report)
    report["compatibility_score"] = score
    report["recommendations"] = recs
    report["warnings"] = warns

    if args.json:
        print(json.dumps(report, indent=2))
        return

    print("=" * 60)
    print("SYSTEM PROBE")
    print("=" * 60)
    print(f"OS: {report['system']['os']} | CPUs: {report['system']['cpu_count']} | "
          f"RAM: {report['system']['ram_gb']} GB")
    acc = report["accelerator"]
    if acc["devices"]:
        kinds = ", ".join(d["kind"] for d in acc["devices"])
        print(f"Accelerator: {acc['platform']} ({kinds}) x{len(acc['devices'])}"
              + (f", HBM {acc['hbm_gb']} GB" if acc.get("hbm_gb") else ""))
    else:
        print(f"Accelerator: NONE ({acc.get('error')})")
    print(f"Python: {report['python']['version']} (venv={report['python']['in_venv']})")
    missing = [k for k, v in report["dependencies"].items() if v is None]
    print(f"Dependencies: {len(report['dependencies']) - len(missing)}/"
          f"{len(report['dependencies'])} present"
          + (f" (missing: {', '.join(missing)})" if missing else ""))
    for w in warns:
        print(f"  [warn] {w}")
    for r in recs:
        print(f"  [rec]  {r}")
    print(f"\nCompatibility score: {score}/100")


if __name__ == "__main__":
    main()
