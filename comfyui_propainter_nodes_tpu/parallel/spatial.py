"""Spatial (H) sequence parallelism for high-resolution inference.

New, TPU-first (SURVEY §2.4c; the reference is single-device and scales
resolution only by fp16 + chunking). At 720p/1080p the InpaintGenerator's
activations — not its weights — dominate memory: one 13-frame window at
1080p holds ~1.6 GB of fp32 encoder features alone. This module shards
the image height over a mesh axis and runs the WHOLE forward under
GSPMD:

  * convolutions (encoder, decoder, propagation backbones, offsets) are
    spatially partitioned by XLA with automatic halo exchanges of their
    receptive-field rows over ICI;
  * window attention is H-local by construction ((5, 9) windows tile the
    token grid), so window/rolled keys stay on-shard; only the 4x4-pooled
    global tokens and the roll boundary rows cross shards;
  * `spatial_sharding(...)` installs sharding constraints at the model's
    stage boundaries (models/propainter.py) so the H axis stays sharded
    through reshapes instead of washing out to replication.

The alternative — shard_map with hand-written halo ppermutes around every
conv — would hand-schedule exactly what GSPMD's spatial partitioner
already does well; annotate-and-let-XLA is the idiomatic TPU design
(scaling-book recipe), and it composes with the clip-parallel "data" axis
for the 1080p x 1000-frame BASELINE config.

The Pallas kernels are bypassed under spatial sharding (they are
single-device programs; wrapping them in shard_map would pin the H split
to their block geometry) — the XLA fallback paths partition cleanly.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import propainter as pp
from ..ops import deform_conv as _dc
from .mesh import MODEL_AXIS

# (mesh, axis) when a spatial-parallel trace is active; consulted by
# constrain_h at the model's stage boundaries
_ACTIVE: tuple[Mesh, str] | None = None


def spatial_active() -> bool:
    """True inside a spatial_sharding trace (consulted by the model to
    pick GSPMD-friendly program forms, e.g. unrolled transformer)."""
    return _ACTIVE is not None


def _spec_h(ndim: int, h_dim: int, axis: str) -> P:
    spec = [None] * ndim
    spec[h_dim] = axis
    return P(*spec)


def constrain_h(x, h_dim: int):
    """Keep `x`'s height dimension sharded over the active spatial axis.

    No-op outside a `spatial_sharding` trace, so the model code stays a
    plain single-device program by default."""
    if _ACTIVE is None:
        return x
    mesh, axis = _ACTIVE
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, _spec_h(x.ndim, h_dim, axis))
    )


@contextmanager
def spatial_sharding(mesh: Mesh, axis: str = MODEL_AXIS):
    """Activate H-sharding constraints for traces performed inside.

    Also disables the Pallas kernels for the scope (they would otherwise
    force their operands to gather onto one device)."""
    global _ACTIVE
    prev = _ACTIVE
    prev_pallas = _dc._USE_PALLAS
    _ACTIVE = (mesh, axis)
    _dc._USE_PALLAS = False
    try:
        yield
    finally:
        _ACTIVE = prev
        _dc._USE_PALLAS = prev_pallas


def spatial_parallel_window_predict(
    params: dict,
    mesh: Mesh,
    num_local_frames: int,
    axis: str = MODEL_AXIS,
):
    """Jitted InpaintGenerator forward with image height sharded over
    `axis`. Returns fn(frames, flows_f, flows_b, masks_in, masks_updated)
    -> predicted local frames, H sharded in and out (one compile per
    shape; semantics identical to the single-device forward)."""

    def fwd(prm, frames, ff, fb, m_in, m_upd):
        return pp.inpaint_generator_forward(
            prm, frames, ff, fb, m_in, m_upd, num_local_frames
        )

    sh5 = NamedSharding(mesh, _spec_h(5, 2, axis))
    rep = NamedSharding(mesh, P())
    jitted = jax.jit(
        fwd,
        in_shardings=(rep, sh5, sh5, sh5, sh5, sh5),
        out_shardings=sh5,
    )

    def run(frames, ff, fb, m_in, m_upd):
        with spatial_sharding(mesh, axis):
            return jitted(params, frames, ff, fb, m_in, m_upd)

    return run
