"""Device mesh + sharding helpers for multi-chip scale-out.

The reference is single-process single-GPU with no collectives anywhere
(SURVEY §2.10); its only parallelism is a CPU process pool and a host-level
ffmpeg pipe. The TPU-native scale-out model (per SURVEY §2.10 plan):

- **data axis**: frame-pair batches shard across chips (the dominant axis —
  VFI pairs are embarrassingly parallel). Gradient/metric reductions ride
  ICI via psum inserted by XLA.
- **spatial axis**: for single large frames, H shards across chips; XLA's
  SPMD partitioner inserts halo exchanges for the convolutions. This is the
  sequence-parallel analog for video (frames, not tokens).
- TP/PP are intentionally absent: the model zoo tops out at ~27.7M params
  (adaptive_pipeline.py:338), far below the threshold where weight sharding
  pays for its collectives; params are replicated.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data", "spatial"),
    spatial: int = 1,
) -> Mesh:
    """Create a 2-D (data × spatial) mesh over the first n devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    data = n // spatial
    grid = np.asarray(devices[:n]).reshape(data, spatial)
    return Mesh(grid, axis_names=tuple(axis_names))


def data_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) dim over 'data'; replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def spatial_sharding(mesh: Mesh, ndim: int = 4, h_axis: int = 1) -> NamedSharding:
    """Shard batch over 'data' and H over 'spatial' (halo-exchanged convs)."""
    spec = [None] * ndim
    spec[0] = "data"
    spec[h_axis] = "spatial"
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, h_sharded: bool = False):
    """Device-put a pytree of [N, ...] arrays with batch (and optionally H)
    sharded."""

    def put(x):
        sh = (
            spatial_sharding(mesh, x.ndim)
            if (h_sharded and x.ndim >= 3)
            else data_sharding(mesh, x.ndim)
        )
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, batch)
