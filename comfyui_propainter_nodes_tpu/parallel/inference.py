"""Multi-chip inference sharding.

The reference scales inference only by host-side temporal chunking on a
single device (SURVEY §2.4). Here the pipeline's batched window
predictions — the dominant compute, and embarrassingly parallel since
windows only interact through the (cheap, sequential) uint8 blend — are
sharded over the mesh "data" axis: placing the window-batch inputs with
a NamedSharding lets jit/GSPMD partition the whole transformer forward
(Pallas kernels included, via their leading batch dims) with zero
changes to the program.

Attach a mesh with `Pipeline(..., mesh=make_mesh(...))` or
`pipe.mesh = mesh`. Sharding only activates for batches divisible by
the data-axis size; other batches run replicated (still correct).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS


def shard_window_batch(mesh: Mesh | None, arrays: tuple):
    """Place window-batched arrays (leading axis = windows) onto the mesh
    data axis when the batch divides it; no-op otherwise."""
    if mesh is None:
        return arrays
    dp = mesh.shape[DATA_AXIS]
    g = arrays[0].shape[0]
    if dp <= 1 or g % dp != 0:
        return arrays
    sh = NamedSharding(mesh, P(DATA_AXIS))
    return tuple(jax.device_put(a, sh) for a in arrays)


def replicate_params(mesh: Mesh | None, params: dict) -> dict:
    if mesh is None:
        return params
    sh = NamedSharding(mesh, P())
    return {k: jax.device_put(v, sh) for k, v in params.items()}
