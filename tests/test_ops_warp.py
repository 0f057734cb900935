"""Unit tests: warp/grid-sample ops vs torch oracles."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from comfyui_propainter_nodes_tpu.ops import (
    grid_sample,
    flow_warp,
    fb_consistency_check,
    coords_grid,
)


def _torch_flow_warp(x_nchw, flow_nhwc2, interpolation="bilinear"):
    """Oracle mirroring reference flow_warp (flow_loss_utils.py:6-51)."""
    n, c, h, w = x_nchw.shape
    grid_y, grid_x = torch.meshgrid(
        torch.arange(0, h), torch.arange(0, w), indexing="ij"
    )
    grid = torch.stack((grid_x, grid_y), 2).type_as(x_nchw)
    grid_flow = grid + flow_nhwc2
    gx = 2.0 * grid_flow[:, :, :, 0] / max(w - 1, 1) - 1.0
    gy = 2.0 * grid_flow[:, :, :, 1] / max(h - 1, 1) - 1.0
    gf = torch.stack((gx, gy), dim=3)
    return F.grid_sample(
        x_nchw, gf, mode=interpolation, padding_mode="zeros", align_corners=True
    )


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_flow_warp_matches_torch(mode):
    rng = np.random.default_rng(0)
    n, h, w, c = 2, 13, 17, 3
    x = rng.standard_normal((n, h, w, c)).astype(np.float32)
    flow = (rng.standard_normal((n, h, w, 2)) * 3).astype(np.float32)

    ours = flow_warp(jnp.asarray(x), jnp.asarray(flow), interpolation=mode)

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = _torch_flow_warp(xt, torch.from_numpy(flow), mode)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5, rtol=1e-5)


def test_grid_sample_pixel_coords_matches_torch():
    """Pixel-coord sampling == RAFT bilinear_sampler (utils.py:66-80)."""
    rng = np.random.default_rng(1)
    n, h, w, c = 3, 9, 11, 4
    p = 37
    img = rng.standard_normal((n, h, w, c)).astype(np.float32)
    coords = (rng.uniform(-2, 12, size=(n, p, 2))).astype(np.float32)

    ours = grid_sample(jnp.asarray(img), jnp.asarray(coords))

    imgt = torch.from_numpy(img).permute(0, 3, 1, 2)
    xg = torch.from_numpy(coords[..., 0:1])
    yg = torch.from_numpy(coords[..., 1:2])
    xn = 2 * xg / (w - 1) - 1
    yn = 2 * yg / (h - 1) - 1
    grid = torch.cat([xn, yn], dim=-1).view(n, p, 1, 2)
    ref = F.grid_sample(imgt, grid, align_corners=True)  # [n, c, p, 1]
    ref = ref[:, :, :, 0].permute(0, 2, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5, rtol=1e-5)


def test_fb_consistency_check_values():
    # constant forward flow (2, 0) and its inverse: interior pixels are
    # consistent (diff = 0), pixels warped out of bounds read zeros and
    # fail the threshold |fw|^2 = 4 > 0.01 * 4 + 0.5.
    n, h, w = 1, 8, 8
    ff = np.zeros((n, h, w, 2), dtype=np.float32)
    ff[..., 0] = 2.0
    fb = -ff
    out = np.asarray(fb_consistency_check(jnp.asarray(ff), jnp.asarray(fb)))
    assert out.shape == (n, h, w, 1)
    np.testing.assert_array_equal(out[0, :, : w - 2, 0], 1.0)
    np.testing.assert_array_equal(out[0, :, w - 2 :, 0], 0.0)


def test_coords_grid():
    g = np.asarray(coords_grid(2, 3, 4))
    assert g.shape == (2, 3, 4, 2)
    assert g[0, 1, 2, 0] == 2  # x
    assert g[0, 1, 2, 1] == 1  # y
