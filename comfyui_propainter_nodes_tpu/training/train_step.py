"""Sharded training step for the InpaintGenerator (flagship model).

New, TPU-first (the reference is inference-only): dp over clips on the
"data" mesh axis, Megatron-style tp over the transformer width on
"model" (parallel/sharding.py), optax adamw, one jitted step with
explicit in/out shardings — XLA/GSPMD inserts the psum/all-gathers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from ..models.propainter import inpaint_generator_forward
from ..parallel.sharding import batch_sharding, shard_params
from .losses import reconstruction_loss


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def make_optimizer(lr: float = 1e-4) -> optax.GradientTransformation:
    return optax.adamw(lr, b1=0.9, b2=0.99, weight_decay=1e-4)


def init_state(params: dict, mesh: Mesh, lr: float = 1e-4) -> TrainState:
    params = shard_params(
        {k: jnp.asarray(v, jnp.float32) for k, v in params.items()}, mesh
    )
    opt = make_optimizer(lr)
    opt_state = opt.init(params)
    return TrainState(params, opt_state, jnp.zeros((), jnp.int32))


def make_train_step(mesh: Mesh, num_local_frames: int, lr: float = 1e-4):
    """Build the jitted sharded step.

    Batch dict (leading axis = clips, sharded over "data"):
      frames  [B, T, H, W, 3] target frames in [-1, 1]
      masks   [B, T, H, W, 1]
      flows_f/flows_b [B, l_t-1, H, W, 2]
    """
    opt = make_optimizer(lr)
    bs = batch_sharding(mesh)

    def loss_fn(params, batch):
        frames = batch["frames"]
        masks = batch["masks"]
        masked = frames * (1.0 - masks)
        pred = inpaint_generator_forward(
            params,
            masked,
            batch["flows_f"],
            batch["flows_b"],
            masks,
            masks,
            num_local_frames,
        )
        return reconstruction_loss(
            pred, frames[:, :num_local_frames], masks[:, :num_local_frames]
        )

    def step(state: TrainState, batch):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    # state shardings are inferred from the device placement done in
    # init_state (shard_params); only the batch needs explicit specs
    batch_shardings = {k: bs for k in ("frames", "masks", "flows_f", "flows_b")}
    return jax.jit(
        step,
        in_shardings=(None, batch_shardings),
        donate_argnums=(0,),
    )
