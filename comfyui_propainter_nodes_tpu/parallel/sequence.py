"""Sequence parallelism for the temporal sparse transformer.

New, TPU-first (SURVEY §2.4b; the reference is single-device). The
transformer's masked windows attend over ALL frames
(sparse_transformer.py:327-380), which couples every T position — the
long-context coupling this module distributes:

  * the token sequence [B, T, f_h, f_w, C] shards over T on the mesh
    "model" axis (shard_map, contiguous blocks);
  * queries, layer norms, FFN, and the clean-window branch are frame-
    local — zero communication;
  * the masked branch all-gathers its three K/V segments (window,
    rolled, pooled) over the T shards — one `all_gather` per segment
    riding ICI (ops/attention.py axis_name path). With n_head=4,
    Ulysses-style head-scatter would cap at 4-way; gathered-KV scales
    with the mesh.

Compute and activation memory scale 1/S per shard; gathered keys are
transient. Output identical to the single-device stack (same
accumulation order — the gather reconstructs contiguous T).
"""

from __future__ import annotations

from contextlib import contextmanager

import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.attention import transformer_stack
from .mesh import MODEL_AXIS

# (mesh, axis) while a sequence-parallel trace is active; consulted by
# the model at its transformer call sites (models/propainter.py) so the
# feature stage can select T-sharding per resolution (stages.py
# _seq_selected) without the model code importing any mesh machinery.
_ACTIVE: tuple[Mesh, str] | None = None


def sequence_active() -> tuple[Mesh, str] | None:
    return _ACTIVE


@contextmanager
def sequence_sharding(mesh: Mesh, axis: str = MODEL_AXIS):
    """Route transformer stacks traced inside to
    `sequence_parallel_transformer` over `axis` (T-sharding)."""
    global _ACTIVE
    prev = _ACTIVE
    _ACTIVE = (mesh, axis)
    try:
        yield
    finally:
        _ACTIVE = prev


def sequence_parallel_transformer(
    params,
    pre: str,
    tokens: jnp.ndarray,
    fold_size: tuple[int, int],
    mask: jnp.ndarray,
    mesh: Mesh,
    depths: int = 8,
    t_dilation: int = 2,
    t_valid_mask: jnp.ndarray | None = None,
    axis: str = MODEL_AXIS,
) -> jnp.ndarray:
    """Run the transformer stack with T sharded over `axis`.

    tokens: [B, T, f_h, f_w, C]; T is zero-padded up to a multiple of
    the axis size (padded frames masked out via t_valid_mask — exact,
    the attention key masks drop them) and the output sliced back.
    mask:   [B, l_t, H, W, 1] GLOBAL sparsity mask (replicated).
    """
    t_in = tokens.shape[1]
    n_shards = mesh.shape[axis]
    t = -(-t_in // n_shards) * n_shards
    tv = (
        t_valid_mask
        if t_valid_mask is not None
        else jnp.ones((t_in,), jnp.bool_)
    )
    if t != t_in:
        tokens = jnp.pad(
            tokens, ((0, 0), (0, t - t_in), (0, 0), (0, 0), (0, 0))
        )
        pad = ((0, t - t_in),) if tv.ndim == 1 else ((0, 0), (0, t - t_in))
        tv = jnp.pad(tv, pad)

    def fn(p_, x_, m_, tv_):
        return transformer_stack(
            p_, pre, x_, fold_size, m_,
            depths=depths, t_dilation=t_dilation,
            t_valid_mask=tv_, axis_name=axis, t_total=t,
        )

    fn_s = shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(), P(None, axis), P(), P()),
        out_specs=P(None, axis),
        check_vma=False,
    )
    return fn_s(dict(params), tokens, mask, tv)[:, :t_in]
