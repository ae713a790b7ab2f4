"""AOT export/compile tests (documented convert_tensorrt.py surface,
reference README.md:335-348 — realized via jax.export in utils/aot.py)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from vfisr_tpu.utils import aot  # noqa: E402


def test_export_roundtrip_bicubic():
    blob = aot.export_interpolate(
        "bicubic", height=32, width=48, pairs=1, timesteps=(0.5,)
    )
    assert isinstance(blob, bytes) and len(blob) > 0
    fn = aot.load_exported(blob)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.random((1, 32, 48, 3), np.float32))
    x1 = jnp.asarray(rng.random((1, 32, 48, 3), np.float32))
    out = np.asarray(fn(x0, x1))
    assert out.shape == (1, 1, 32, 48, 3)
    # bicubic VFI is a linear crossfade (reference baselines.py:16-75)
    expect = 0.5 * np.asarray(x0)[0] + 0.5 * np.asarray(x1)[0]
    np.testing.assert_allclose(out[0, 0], expect, atol=2e-2)


def test_export_rejects_wrong_shape():
    blob = aot.export_interpolate(
        "bicubic", height=32, width=48, pairs=1, timesteps=(0.5,)
    )
    fn = aot.load_exported(blob)
    bad = jnp.zeros((1, 16, 48, 3), jnp.float32)
    with pytest.raises(Exception):
        np.asarray(fn(bad, bad))


def test_compile_stats_keys():
    fn, _ = aot.build_interpolate_fn("lanczos", timesteps=(0.5,))
    aval = jax.ShapeDtypeStruct((1, 32, 48, 3), jnp.float32)
    stats = aot.compile_stats(fn, aval, aval)
    assert stats["compile_s"] >= 0
    assert stats["lower_s"] >= 0


def test_bf16_export_rife_lite_tiny():
    fn, model = aot.build_interpolate_fn(
        "rife_lite", timesteps=(0.5,), precision="bf16"
    )
    # config dtype actually switched
    assert model.CONFIG.dtype == jnp.bfloat16
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    out = np.asarray(fn(x, x))
    assert out.shape == (1, 1, 32, 32, 3)
    assert np.isfinite(out).all()
