"""Ahead-of-time compilation + serialized deployment artifacts.

The reference documents a TensorRT conversion step for deployment
(`scripts/convert_tensorrt.py`, README.md:335-348) that converts a model to
a fixed-shape, reduced-precision engine file. The file never ships. The
TPU-native realization of that surface is XLA AOT compilation:

- ``export_interpolate`` traces a model's batched device core
  (``interpolate_batch``) at a fixed [pairs, H, W, 3] shape and timestep
  set, optionally in bf16 (the TPU analog of fp16), and serializes the
  StableHLO artifact via ``jax.export`` — the ".engine" equivalent, loadable
  without the model code.
- ``load_exported`` deserializes and returns a callable.
- ``compile_stats`` AOT-compiles on the current backend and reports
  compile time, FLOPs and peak-memory estimates from XLA's cost analysis
  (the reference documents but never implements such profiling,
  INFO.md:564-607).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _maybe_bf16(model, precision: str):
    """Rebuild the model's module config in bf16 where supported."""
    if precision not in ("bf16", "bfloat16"):
        return model
    # RIFE family: dataclass CONFIG with a dtype field (class attr, shadowed
    # per-instance); VFIMamba: instance .cfg dataclass.
    for attr in ("CONFIG", "cfg"):
        cfg = getattr(model, attr, None)
        if cfg is not None and hasattr(cfg, "dtype"):
            setattr(model, attr, dataclasses.replace(cfg, dtype=jnp.bfloat16))
            return model
    raise ValueError(
        f"{type(model).__name__} has no dtype-bearing config; "
        "bf16 export unsupported for this model"
    )


def build_interpolate_fn(
    model_name: str,
    timesteps: Sequence[float] = (0.25, 0.5, 0.75),
    precision: str = "f32",
    weights_path: str | None = None,
) -> Tuple[Callable, object]:
    """(fn, model): fn(x0, x1) -> [N, T, H, W, 3], jit/export-traceable."""
    from vfisr_tpu.models.registry import get_model

    model = get_model(model_name)
    _maybe_bf16(model, precision)
    model.load(weights_path) if weights_path else model.load()
    ts = tuple(float(t) for t in timesteps)

    def fn(x0, x1):
        return model.interpolate_batch(x0, x1, ts)

    return fn, model


def export_interpolate(
    model_name: str,
    height: int = 1080,
    width: int = 1920,
    pairs: int = 1,
    timesteps: Sequence[float] = (0.25, 0.5, 0.75),
    precision: str = "f32",
    weights_path: str | None = None,
) -> bytes:
    """Serialize the model's fixed-shape interpolation program (StableHLO)."""
    fn, _ = build_interpolate_fn(model_name, timesteps, precision, weights_path)
    aval = jax.ShapeDtypeStruct((pairs, height, width, 3), jnp.float32)
    exported = jax.export.export(jax.jit(fn))(aval, aval)
    return bytes(exported.serialize())


def load_exported(blob: bytes) -> Callable:
    """Deserialize an exported artifact into a callable(x0, x1)."""
    exported = jax.export.deserialize(blob)
    return lambda x0, x1: exported.call(x0, x1)


def compile_stats(
    fn: Callable, *avals: jax.ShapeDtypeStruct
) -> Dict[str, float]:
    """AOT-compile fn at the given avals; return compile-time + XLA cost
    analysis (flops, bytes accessed, peak memory where reported)."""
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*avals)
    t_lower = time.perf_counter()
    compiled = lowered.compile()
    t_comp = time.perf_counter()
    stats: Dict[str, float] = {
        "lower_s": round(t_lower - t0, 3),
        "compile_s": round(t_comp - t_lower, 3),
    }
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0] if cost else {}
        for key in ("flops", "bytes accessed", "transcendentals"):
            if key in cost:
                stats[key.replace(" ", "_")] = float(cost[key])
    except Exception:  # noqa: BLE001 — cost analysis is backend-best-effort
        pass
    try:
        mem = compiled.memory_analysis()
        for key in (
            "temp_size_in_bytes",
            "argument_size_in_bytes",
            "output_size_in_bytes",
        ):
            val = getattr(mem, key, None)
            if val is not None:
                stats[key] = float(val)
    except Exception:  # noqa: BLE001
        pass
    return stats


def smoke_run(blob: bytes, height: int, width: int, pairs: int = 1) -> tuple:
    """Run a deserialized artifact once on zeros; returns output shape."""
    fn = load_exported(blob)
    x = jnp.zeros((pairs, height, width, 3), jnp.float32)
    out = np.asarray(jax.jit(fn)(x, x))
    return out.shape
