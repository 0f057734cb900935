"""Sharding rules: parameter and activation partition specs.

Rule table for the InpaintGenerator (flagship) under a ("data", "model")
mesh — tensor parallelism over the transformer width, data parallelism
over clips. Written as suffix-matching rules over the flat torch-named
param dict so new layers inherit sensible defaults (replicated).

TP layout (Megatron-style, XLA inserts the collectives):
  * attention q/k/v Linear [in, out]: shard `out` (head dim) on "model";
  * attention proj  Linear [in, out]: shard `in`  on "model" (row
    parallel) — XLA reduces the partial sums with one psum;
  * FFN fc1 [512, 1960]: shard out; fc2 [1960, 512]: shard in.
    NOTE: fc1/fc2 touch a fold/unfold overlap-renormalization between
    them (ops/attention.py fusion_feed_forward), which mixes the hidden
    dim spatially per 40-wide group; sharding 1960 = 49*40 over "model"
    keeps each group intact for model_parallel <= 8 (1960/8 = 245 = 5*49).
  * everything else (convs, norms, deform offsets): replicated — they are
    small relative to activations; activations carry the "data" axis.
"""

from __future__ import annotations

from typing import Mapping

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS

# (suffix-regex-free) substring -> spec builders, first match wins
_COL_PARALLEL = (".query.weight", ".key.weight", ".value.weight", ".fc1.0.weight")
_COL_BIAS = (".query.bias", ".key.bias", ".value.bias", ".fc1.0.bias")
_ROW_PARALLEL = (".proj.weight", ".fc2.1.weight")


def param_spec(name: str) -> P:
    for s in _COL_PARALLEL:
        if name.endswith(s):
            return P(None, MODEL_AXIS)
    for s in _COL_BIAS:
        if name.endswith(s):
            return P(MODEL_AXIS)
    for s in _ROW_PARALLEL:
        if name.endswith(s):
            return P(MODEL_AXIS, None)
    return P()


def shard_params(params: Mapping, mesh: Mesh) -> dict:
    """Place a flat param dict onto the mesh per the rule table."""
    return {
        k: jax.device_put(v, NamedSharding(mesh, param_spec(k)))
        for k, v in params.items()
    }


def batch_spec() -> P:
    """Video batches shard their leading (clip) axis over "data"."""
    return P(DATA_AXIS)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, batch_spec())
