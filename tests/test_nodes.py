"""Integration tests: full node API on synthetic video (random weights)."""

import numpy as np
import pytest

from comfyui_propainter_nodes_tpu.nodes import (
    NODE_CLASS_MAPPINGS,
    ProPainterInpaint,
    ProPainterOutpaint,
    check_inputs,
)


def synthetic_clip(t=8, h=120, w=160):
    """Moving square over a gradient background + object mask."""
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [yy / h, xx / w, (yy + xx) / (h + w)], axis=-1
    ).astype(np.float32)
    frames = np.repeat(base[None], t, axis=0)
    masks = np.zeros((t, h, w), dtype=np.float32)
    for i in range(t):
        x0 = 10 + 6 * i
        y0 = 30 + 2 * i
        frames[i, y0 : y0 + 24, x0 : x0 + 24] = [1.0, 0.2, 0.2]
        masks[i, y0 : y0 + 24, x0 : x0 + 24] = 1.0
    return frames, masks


@pytest.fixture(scope="module")
def small_result():
    frames, masks = synthetic_clip()
    node = ProPainterInpaint()
    out = node.propainter_inpainting(
        frames,
        masks,
        width=96,
        height=64,
        mask_dilates=4,
        flow_mask_dilates=4,
        ref_stride=4,
        neighbor_length=4,
        subvideo_length=80,
        raft_iter=2,
        fp16="disable",
        _allow_random_weights=True,
    )
    return frames, masks, out


def test_inpaint_node_shapes_and_ranges(small_result):
    frames, masks, (img, flow_mask, mask_dilate) = small_result
    img = np.asarray(img)
    assert img.shape == (8, 64, 96, 3)
    assert img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0
    fm = np.asarray(flow_mask)
    md = np.asarray(mask_dilate)
    assert fm.shape == (8, 64, 96)
    assert md.shape == (8, 64, 96)
    assert set(np.unique(fm)).issubset({0.0, 1.0})
    assert set(np.unique(md)).issubset({0.0, 1.0})
    # dilated mask must cover at least the resized original mask
    assert md.sum() >= fm.shape[0]


def test_inpaint_preserves_unmasked_regions(small_result):
    frames, masks, (img, flow_mask, mask_dilate) = small_result
    img = np.asarray(img)
    md = np.asarray(mask_dilate)
    # outside the dilated mask the output must equal the (resized) input
    # exactly: compositing uses original frames there
    from comfyui_propainter_nodes_tpu.utils.image import prepare_frames
    import jax.numpy as jnp

    _, original = prepare_frames(jnp.asarray(frames), 96, 64)
    original = np.asarray(original) / 255.0
    outside = md == 0
    err = np.abs(img - original)[outside]
    assert err.max() < 1e-6


def test_outpaint_node(small_result_unused=None):
    frames, _ = synthetic_clip(t=6)
    node = ProPainterOutpaint()
    img, mask, ow, oh = node.propainter_outpainting(
        frames,
        width=96,
        height=64,
        width_scale=1.25,
        height_scale=1.0,
        mask_dilates=4,
        flow_mask_dilates=4,
        ref_stride=4,
        neighbor_length=4,
        subvideo_length=80,
        raft_iter=2,
        fp16="disable",
        _allow_random_weights=True,
    )
    assert (ow, oh) == (120, 64)
    img = np.asarray(img)
    assert img.shape == (6, 64, 120, 3)
    mask = np.asarray(mask)
    assert mask.shape == (6, 64, 120)
    # border region is masked, center is not
    assert mask[:, :, 0].all() and mask[:, :, -1].all()
    assert not mask[:, 32, 60].any()


def test_check_inputs_raises():
    frames = np.zeros((1, 8, 8, 3), np.float32)
    masks = np.zeros((1, 8, 8), np.float32)
    with pytest.raises(Exception, match="length must be greater"):
        check_inputs(frames, masks)
    frames = np.zeros((4, 8, 8, 3), np.float32)
    masks = np.zeros((3, 8, 8), np.float32)
    with pytest.raises(Exception, match="same length"):
        check_inputs(frames, masks)
    masks = np.zeros((4, 6, 8), np.float32)
    with pytest.raises(Exception, match="same dimensions"):
        check_inputs(frames, masks)


def test_node_mappings_contract():
    assert set(NODE_CLASS_MAPPINGS) == {"ProPainterInpaint", "ProPainterOutpaint"}
    it = ProPainterInpaint.INPUT_TYPES()["required"]
    assert list(it) == [
        "image", "mask", "width", "height", "mask_dilates", "flow_mask_dilates",
        "ref_stride", "neighbor_length", "subvideo_length", "raft_iter", "fp16",
    ]
    assert ProPainterInpaint.RETURN_TYPES == ("IMAGE", "MASK", "MASK")
    assert ProPainterInpaint.RETURN_NAMES == ("IMAGE", "FLOW_MASK", "MASK_DILATE")
    assert ProPainterOutpaint.RETURN_TYPES == ("IMAGE", "MASK", "INT", "INT")


def test_chunked_long_video_matches_defaults():
    """Video longer than subvideo_length exercises every chunking path."""
    frames, masks = synthetic_clip(t=14)
    node = ProPainterInpaint()
    img, _, _ = node.propainter_inpainting(
        frames,
        masks,
        width=64,
        height=48,
        mask_dilates=2,
        flow_mask_dilates=2,
        ref_stride=3,
        neighbor_length=4,
        subvideo_length=6,  # < t -> chunked completion & ref windows
        raft_iter=2,
        fp16="disable",
        _allow_random_weights=True,
    )
    img = np.asarray(img)
    assert img.shape == (14, 48, 64, 3)
    assert np.isfinite(img).all()
