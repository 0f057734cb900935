"""Minimal-transfer node path == the direct pipeline path.

The nodes upload uint8 frames + bit-packed masks and fetch only the
mask-bbox crop of the composed video (plus packed mask crops), pasting
results over host-known bytes (nodes.py::_mask_crop_plan,
pipeline/stages.py::Pipeline.process_node). These tests pin that the
reassembled outputs equal a direct full-frame Pipeline run — i.e. the
transfer optimization is semantics-free."""

import numpy as np
import jax.numpy as jnp

from comfyui_propainter_nodes_tpu import nodes as nodes_mod
from comfyui_propainter_nodes_tpu.config import PipelineConfig
from comfyui_propainter_nodes_tpu.utils import image as image_utils


def _clip(t=8, h=64, w=96):
    rng = np.random.default_rng(0)
    frames = rng.uniform(0, 1, (t, h, w, 3)).astype(np.float32)
    masks = np.zeros((t, h, w), np.float32)
    for i in range(t):
        masks[i, 20:36, 30 + i : 52 + i] = 1.0
    return frames, masks


def _direct_reference_outputs(frames, masks, w, h, fd, md, cfg):
    """The pre-optimization node body: full-frame device prep + process +
    full fetches."""
    pipe = nodes_mod.get_pipeline(cfg, True)
    frames_norm, original = image_utils.prepare_frames(
        nodes_mod._upload_frames(frames), w, h
    )
    masks_dev = jnp.asarray(masks)
    flow_masks, masks_dilated = image_utils.prepare_masks(
        masks_dev, w, h, fd, md
    )
    composed = pipe.process(
        frames_norm[None], flow_masks[None], masks_dilated[None], original
    )
    return (
        np.asarray(composed.astype(jnp.uint8)).astype(np.float32) / 255.0,
        np.asarray(flow_masks).squeeze(-1),
        np.asarray(masks_dilated).squeeze(-1),
    )


def test_node_packed_path_matches_direct_pipeline():
    t, h, w = 8, 64, 96
    frames, masks = _clip(t, h, w)
    fd, md = 4, 2
    cfg = PipelineConfig(
        ref_stride=4, neighbor_length=4, subvideo_length=40, raft_iter=1,
        fp16="disable", process_size=(w, h),
    )
    ref_img, ref_fm, ref_md = _direct_reference_outputs(
        frames, masks, w, h, fd, md, cfg
    )

    node = nodes_mod.ProPainterInpaint()
    out = node.propainter_inpainting(
        frames, masks, width=w, height=h, mask_dilates=md,
        flow_mask_dilates=fd, ref_stride=4, neighbor_length=4,
        subvideo_length=40, raft_iter=1, fp16="disable",
        _allow_random_weights=True,
    )
    img = np.asarray(out[0])
    fm = np.asarray(out[1])
    mdl = np.asarray(out[2])

    np.testing.assert_array_equal(fm, ref_fm)
    np.testing.assert_array_equal(mdl, ref_md)
    # identical program arithmetic; allow 1 uint8 level on a vanishing
    # fraction for XLA fusion reassociation between the two program forms
    d = np.abs(img - ref_img) * 255.0
    assert d.max() <= 1.0 + 1e-5, d.max()
    assert (d > 0.5).mean() < 1e-3


def test_node_packed_path_empty_mask():
    """All-zero mask: output must be the (quantized) input, masks zero."""
    t, h, w = 4, 64, 96
    rng = np.random.default_rng(1)
    frames = rng.uniform(0, 1, (t, h, w, 3)).astype(np.float32)
    masks = np.zeros((t, h, w), np.float32)
    node = nodes_mod.ProPainterInpaint()
    out = node.propainter_inpainting(
        frames, masks, width=w, height=h, mask_dilates=2,
        flow_mask_dilates=2, ref_stride=4, neighbor_length=4,
        subvideo_length=40, raft_iter=1, fp16="disable",
        _allow_random_weights=True,
    )
    img = np.asarray(out[0])
    expected = np.floor(np.clip(frames * 255, 0, 255)) / 255.0
    np.testing.assert_allclose(img, expected, atol=1e-6)
    assert np.asarray(out[1]).sum() == 0
    assert np.asarray(out[2]).sum() == 0


def test_node_packed_path_with_host_resize():
    """Input at 2x the process size: host PIL resize + packed transfer
    path must match the reference-style prep within the documented
    PIL-vs-device-resize tolerance (tests/test_pil_resize.py)."""
    t, h, w = 6, 128, 192
    ph, pw = 64, 96
    rng = np.random.default_rng(2)
    frames = rng.uniform(0, 1, (t, h, w, 3)).astype(np.float32)
    masks = np.zeros((t, h, w), np.float32)
    masks[:, 40:72, 60:104] = 1.0
    node = nodes_mod.ProPainterInpaint()
    out = node.propainter_inpainting(
        frames, masks, width=pw, height=ph, mask_dilates=2,
        flow_mask_dilates=4, ref_stride=4, neighbor_length=4,
        subvideo_length=40, raft_iter=1, fp16="disable",
        _allow_random_weights=True,
    )
    img = np.asarray(out[0])
    assert img.shape == (t, ph, pw, 3)
    fm = np.asarray(out[1])
    mdl = np.asarray(out[2])
    assert fm.shape == (t, ph, pw)
    assert set(np.unique(fm)) <= {0.0, 1.0}
    # dilated masks contain the resized core mask and stay within its
    # bbox grown by the dilation radius
    assert mdl[:, 22:34, 32:50].min() == 1.0
    assert mdl[:, :14, :].max() == 0.0
    assert fm.sum() > mdl.sum()  # flow dilation is wider


def test_outpaint_band_path_matches_direct_pipeline():
    t, h, w = 6, 64, 96
    rng = np.random.default_rng(3)
    frames = rng.uniform(0, 1, (t, h, w, 3)).astype(np.float32)
    cfg = PipelineConfig(
        ref_stride=4, neighbor_length=4, subvideo_length=40, raft_iter=1,
        fp16="disable", process_size=(120, 64),
    )
    pipe = nodes_mod.get_pipeline(cfg, True)
    canvas, fm, md = image_utils.extrapolate_frames(
        nodes_mod._upload_frames(frames), w, h, 120, 64
    )
    original = jnp.floor(jnp.clip(canvas * 255.0, 0.0, 255.0))
    composed = pipe.process(canvas[None] * 2.0 - 1.0, fm[None], md[None], original)
    ref_img = np.asarray(composed.astype(jnp.uint8)).astype(np.float32) / 255.0

    node = nodes_mod.ProPainterOutpaint()
    out = node.propainter_outpainting(
        frames, width=w, height=h, width_scale=1.25, height_scale=1.0,
        mask_dilates=2, flow_mask_dilates=4, ref_stride=4,
        neighbor_length=4, subvideo_length=40, raft_iter=1,
        fp16="disable", _allow_random_weights=True,
    )
    img = np.asarray(out[0])
    assert img.shape == ref_img.shape == (t, 64, 120, 3)
    d = np.abs(img - ref_img) * 255.0
    assert d.max() <= 1.0 + 1e-5, d.max()
    assert (d > 0.5).mean() < 1e-3
    mask = np.asarray(out[1])
    assert mask.shape == (t, 64, 120)
    assert mask[:, :, :12].min() == 1.0 and mask[:, :, 12:108].max() == 0.0
