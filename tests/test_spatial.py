"""Spatial (H) parallelism: sharded == unsharded on the virtual CPU mesh.

SURVEY §2.4c — H-sharded InpaintGenerator forward under GSPMD with
sharding constraints at the stage boundaries (parallel/spatial.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from comfyui_propainter_nodes_tpu.models.propainter import (
    inpaint_generator_forward,
)
from comfyui_propainter_nodes_tpu.parallel.mesh import make_mesh, MODEL_AXIS
from comfyui_propainter_nodes_tpu.parallel.spatial import (
    spatial_parallel_window_predict,
)
from comfyui_propainter_nodes_tpu.utils.weights import random_params


def test_spatial_parallel_matches_single_device():
    """Semantic equality of the H-sharded forward, pinned in float64.

    GSPMD partitions some reductions (attention softmax over gathered
    keys), so fp32 sharded-vs-unsharded differs by reassociation noise
    that this random-weight net amplifies (~1e-7 seeds -> ~1e-2 at the
    output; measured to scale with weight magnitude, replicated-jit is
    bit-exact). Running the same comparison in f64 drops the seeds to
    ~1e-16 — any surviving difference would be a real partitioning bug."""
    with jax.enable_x64(True):
        params = {
            k: jnp.asarray(v, jnp.float64)
            for k, v in random_params("inpaint_generator").items()
        }
        b, l_t, n_ref, h, w = 1, 4, 2, 80, 96
        t = l_t + n_ref
        rng = np.random.default_rng(0)
        frames = jnp.asarray(rng.uniform(-1, 1, (b, t, h, w, 3)))
        masks = jnp.asarray(
            (rng.uniform(size=(b, t, h, w, 1)) > 0.85).astype(np.float64)
        )
        flows = jnp.asarray(rng.standard_normal((b, l_t - 1, h, w, 2)) * 2)
        masked = frames * (1 - masks)

        base = inpaint_generator_forward(
            params, masked, flows, flows, masks, masks, l_t
        )

        mesh = make_mesh(8, model_parallel=4)  # H shards over the 4-way axis
        run = spatial_parallel_window_predict(params, mesh, l_t, axis=MODEL_AXIS)
        sharded = run(masked, flows, flows, masks, masks)

        np.testing.assert_allclose(
            np.asarray(sharded), np.asarray(base), atol=1e-9, rtol=1e-9
        )


def test_spatial_constraints_are_noops_outside_context():
    """constrain_h must be inert without an active spatial_sharding."""
    from comfyui_propainter_nodes_tpu.parallel.spatial import constrain_h

    x = jnp.ones((2, 3, 4))
    y = constrain_h(x, 1)
    assert y is x
