"""Device mesh construction.

The reference is strictly single-device (SURVEY.md section 2.4; the
DataParallel at model/modules/flow_comp_raft.py:17 is a checkpoint-key
shim). This layer is new, TPU-first: one `jax.sharding.Mesh` with a
("data", "model") axis pair —

  * "data":  clip/chunk parallelism — independent subvideo chunks and
             flow pairs are embarrassingly parallel (the reference's
             host-side chunk loops become the sharded batch axis);
  * "model": tensor parallelism over the transformer's heads/hidden and
             sequence parallelism for attention K/V.

Collectives are inserted by XLA from sharding annotations (GSPMD); they
ride ICI within a slice and DCN across hosts with the same program.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: int | None = None, model_parallel: int | None = None
) -> Mesh:
    """Mesh over the first `n_devices` devices, shaped (data, model).

    model_parallel defaults to min(4, n) — the InpaintGenerator has 4
    attention heads, so deeper TP would split heads fractionally.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if model_parallel is None:
        model_parallel = 4 if n % 4 == 0 else (2 if n % 2 == 0 else 1)
    data_parallel = n // model_parallel
    arr = np.asarray(devices).reshape(data_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def named(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
