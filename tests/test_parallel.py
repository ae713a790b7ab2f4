"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vfisr_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
    spatial_sharding,
)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 8, "spatial": 1}


def test_shard_batch_places_data_axis():
    mesh = make_mesh(8)
    batch = {"x": np.zeros((16, 8, 8, 3), np.float32), "t": np.zeros((16,), np.float32)}
    sharded = shard_batch(mesh, batch)
    sh = sharded["x"].sharding
    assert sh.shard_shape(sharded["x"].shape)[0] == 2  # 16/8 per device


@pytest.mark.slow
def test_data_parallel_train_step_matches_single_device():
    """The sharded train step must produce the same loss/params as unsharded."""
    from vfisr_tpu.models.sota.rife import IFNet, RIFEConfig
    from vfisr_tpu.train.train import create_train_state, make_train_step

    cfg = RIFEConfig(scales=(2, 1), channels=(16, 8), num_convs=1, refine=False)
    module = IFNet(cfg)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 32, 32, 3))
    params = module.init(rng, dummy, dummy, jnp.asarray([0.5]))["params"]

    def apply_fn(p, i0, i1, t):
        return module.apply({"params": p}, i0, i1, t)

    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 3)
    batch = {
        "img0": jax.random.uniform(ks[0], (8, 32, 32, 3)),
        "img1": jax.random.uniform(ks[1], (8, 32, 32, 3)),
        "gt": jax.random.uniform(ks[2], (8, 32, 32, 3)),
        "t": jnp.full((8,), 0.5),
    }

    state0, tx = create_train_state(params)
    step_single = make_train_step(apply_fn, tx, mesh=None, use_remat=False)
    s1, loss_single = step_single(state0, batch)

    mesh = make_mesh(8)
    state0m, txm = create_train_state(params)
    step_mesh = make_train_step(apply_fn, txm, mesh=mesh, use_remat=False)
    sharded = shard_batch(mesh, batch)
    state0m = jax.device_put(state0m, replicated_sharding(mesh))
    s2, loss_mesh = step_mesh(state0m, sharded)

    assert float(loss_single) == pytest.approx(float(loss_mesh), rel=1e-5)
    p1 = jax.tree_util.tree_leaves(s1.params)[0]
    p2 = jax.tree_util.tree_leaves(s2.params)[0]
    assert np.allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)


def test_spatial_sharding_inference():
    """H-sharded SR inference over the spatial axis compiles + matches."""
    from vfisr_tpu.models.sota.span import SPANNet

    mesh = make_mesh(8, spatial=4)  # data=2, spatial=4
    module = SPANNet(feature_channels=8, upscale=2)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (2, 64, 64, 3))
    params = module.init(rng, x)["params"]

    ref = module.apply({"params": params}, x)
    xs = jax.device_put(x, spatial_sharding(mesh))
    out = jax.jit(lambda p, a: module.apply({"params": p}, a))(params, xs)
    assert out.shape == (2, 128, 128, 3)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_sr_train_step_and_data():
    """SR training path: synthetic LR/HR pairs + make_sr_train_step reduce
    the Charbonnier loss signature correctly (shapes, finiteness)."""
    import jax.numpy as jnp
    import numpy as np

    from vfisr_tpu.models.registry import get_model
    from vfisr_tpu.train.data import synthetic_sr_batch
    from vfisr_tpu.train.train import create_train_state, make_sr_train_step

    m = get_model("span")
    m.load()
    state, tx = create_train_state(m.params, total_steps=10)
    step = make_sr_train_step(m._apply, tx)
    rng = np.random.default_rng(0)
    b = synthetic_sr_batch(rng, 2, 64, 2)
    assert b["lr"].shape == (2, 32, 32, 3)
    assert b["hr"].shape == (2, 64, 64, 3)
    bj = {k: jnp.asarray(v) for k, v in b.items()}
    state, loss = step(state, bj)
    assert np.isfinite(float(loss))
    assert int(state.step) == 1


def test_augmented_pool_iter_label_consistency():
    """Pooled/augmented synthetic stream: shapes stable, t within (0,1),
    and time-reversal consistency (img0/img1 swapped WITH t flipped) holds
    statistically — augmented batches must still satisfy the VFI contract
    that gt lies on the motion path between img0 and img1."""
    import numpy as np

    from vfisr_tpu.train.data import synthetic_pool_iter

    rng = np.random.default_rng(5)
    it = synthetic_pool_iter(rng, 2, 64, 12, fresh_every=4)
    seen = 0
    for b in it:
        assert b["img0"].shape == (2, 64, 64, 3)
        assert b["gt"].shape == (2, 64, 64, 3)
        assert np.all((b["t"] > 0) & (b["t"] < 1))
        # blend of endpoints should approximate gt far better than a
        # mismatched endpoint pairing would (sanity of label consistency)
        blend = (1 - b["t"][:, None, None, None]) * b["img0"] + b[
            "t"
        ][:, None, None, None] * b["img1"]
        err = np.mean(np.abs(blend - b["gt"]))
        assert err < 0.25
        seen += 1
    assert seen == 12


def test_device_synthetic_batch():
    """On-device scene generator: correct shapes/ranges, real motion,
    GT on the motion path, HUD static across all three frames."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vfisr_tpu.train.device_data import device_synthetic_batch

    b = device_synthetic_batch(jax.random.PRNGKey(3), 4, 96)
    i0, i1, gt, t = (np.asarray(b[k]) for k in ("img0", "img1", "gt", "t"))
    assert i0.shape == (4, 96, 96, 3) and t.shape == (4,)
    assert i0.min() >= 0.0 and i0.max() <= 1.0
    assert np.mean(np.abs(i0 - i1)) > 0.02  # motion exists
    blend = (1 - t[:, None, None, None]) * i0 + t[:, None, None, None] * i1
    assert np.mean(np.abs(blend - gt)) < 0.25  # gt lies between endpoints
    hud = (i0 > 0.97).all(axis=-1)
    if hud.any():  # static HUD must not move
        assert np.abs(i0 - i1)[hud].max() < 1e-5
        assert np.abs(i0 - gt)[hud].max() < 1e-5
    # determinism by key
    b2 = device_synthetic_batch(jax.random.PRNGKey(3), 4, 96)
    np.testing.assert_allclose(np.asarray(b2["img0"]), i0)
