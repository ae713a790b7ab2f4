"""Training/distillation steps for the native neural models.

The reference repo does no training (its models are frozen external
checkpoints it cannot even load — SURVEY §2.2); but the native JAX models
need trainable weights, and the official checkpoints cannot be downloaded
in this environment. This module provides the pjit'd data-parallel training
path used to fit RIFE/SPAN/SAFA/VFIMamba on triplet data (the dataset
pipeline's keyframe/midpoint contract: even frames in, odd frames as GT —
extract_intervals.py:163-188).

Sharding: params replicated, batch sharded over the mesh 'data' axis;
XLA inserts the gradient psum over ICI. (TP/PP intentionally absent —
models ≤27.7M params; see parallel/mesh.py.)
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any


def charbonnier(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    return jnp.sqrt(x * x + eps)


def census_soft(x: jnp.ndarray, window: int = 3) -> jnp.ndarray:
    """Soft census transform (illumination-robust structure descriptor)."""
    gray = jnp.mean(x, axis=-1, keepdims=True) * 255.0
    pad = window // 2
    patches = []
    for dy in range(-pad, pad + 1):
        for dx in range(-pad, pad + 1):
            if dy == 0 and dx == 0:
                continue
            shifted = jnp.roll(jnp.roll(gray, dy, axis=1), dx, axis=2)
            d = shifted - gray
            patches.append(d / jnp.sqrt(0.81 + d * d))
    return jnp.concatenate(patches, axis=-1)


def vfi_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Charbonnier + soft-census loss for interpolation training."""
    l_char = jnp.mean(charbonnier(pred - gt))
    l_census = jnp.mean(charbonnier(census_soft(pred) - census_soft(gt), 1e-3))
    return l_char + 0.1 * l_census


def sr_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Charbonnier reconstruction loss (the standard efficient-SR recipe)."""
    return jnp.mean(charbonnier(pred - gt))


def make_sr_train_step(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    loss_fn: Callable = sr_loss,
):
    """Train step for SR models: apply_fn(params, lr) -> hr_pred.

    Batch pytree: {lr [N,h,w,3], hr [N,h·s,w·s,3]}; same sharding scheme
    as the VFI step (params replicated, batch over 'data')."""

    def forward(params, batch):
        pred = apply_fn(params, batch["lr"])
        return loss_fn(pred, batch["hr"])

    def step(state: TrainState, batch) -> Tuple[TrainState, jnp.ndarray]:
        loss, grads = jax.value_and_grad(forward)(state.params, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state), loss

    if mesh is None:
        return jax.jit(step)
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))
    return jax.jit(step, in_shardings=(repl, batch_sh), out_shardings=(repl, repl))


def create_train_state(
    params: Any,
    learning_rate: float = 2e-4,
    weight_decay: float = 1e-4,
    total_steps: int = 100_000,
    warmup_steps: int = 2000,
) -> Tuple[TrainState, optax.GradientTransformation]:
    warmup_steps = min(warmup_steps, max(total_steps // 10, 1))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, learning_rate, warmup_steps, max(total_steps, warmup_steps + 1),
        learning_rate * 0.01,
    )
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, weight_decay=weight_decay),
    )
    return TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params)), tx


def make_train_step(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    loss_fn: Callable = vfi_loss,
    use_remat: bool = True,
):
    """Build a jitted (optionally mesh-sharded) VFI train step.

    apply_fn(params, img0, img1, t) -> (pred, *aux). Batch pytree:
    {img0, img1, t, gt}; batch dim sharded over 'data' when a mesh is given.
    """

    def forward(params, batch):
        out = apply_fn(params, batch["img0"], batch["img1"], batch["t"])
        pred = out[0] if isinstance(out, tuple) else out
        return loss_fn(pred, batch["gt"])

    if use_remat:
        forward = jax.checkpoint(forward)

    def step(state: TrainState, batch) -> Tuple[TrainState, jnp.ndarray]:
        loss, grads = jax.value_and_grad(forward)(state.params, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state), loss

    if mesh is None:
        return jax.jit(step)

    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))
    # shardings: state replicated, batch leading-dim sharded over 'data'
    return jax.jit(
        step,
        in_shardings=(repl, batch_sh),
        out_shardings=(repl, repl),
    )
