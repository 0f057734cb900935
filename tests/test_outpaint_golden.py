"""Golden parity: outpaint canvas/mask construction vs the reference."""

import numpy as np
from PIL import Image
import jax.numpy as jnp

from oracles import import_reference_module

ref_image_utils = import_reference_module("utils.image_utils")

from comfyui_propainter_nodes_tpu.utils.image import extrapolate_frames


def test_extrapolation_matches_reference():
    rng = np.random.default_rng(0)
    t, h, w = 3, 240, 320
    scale_w, scale_h = 1.25, 1.1
    frames01 = rng.uniform(0, 1, (t, h, w, 3)).astype(np.float32)
    frames_u8 = (frames01 * 255).astype(np.uint8)

    cfg = ref_image_utils.ImageOutpaintConfig(
        width=w,
        height=h,
        mask_dilates=5,
        flow_mask_dilates=8,
        input_size=(w, h),
        video_length=t,
        width_scale=scale_w,
        height_scale=scale_h,
    )
    pil_frames = [Image.fromarray(f) for f in frames_u8]
    ref_frames, ref_flow_masks, ref_masks = ref_image_utils.extrapolation(
        pil_frames, cfg
    )
    cw, chh = cfg.outpaint_size

    canvas, flow_masks, masks_dilated = extrapolate_frames(
        jnp.asarray(frames_u8.astype(np.float32) / 255.0), w, h, cw, chh
    )

    ref_canvas = np.stack([np.array(f) for f in ref_frames])
    ours_canvas = np.asarray(jnp.round(canvas * 255.0)).astype(np.uint8)
    np.testing.assert_array_equal(ours_canvas, ref_canvas)

    ref_fm = np.stack([np.array(m) for m in ref_flow_masks]) / 255.0
    ref_md = np.stack([np.array(m) for m in ref_masks]) / 255.0
    np.testing.assert_array_equal(np.asarray(flow_masks)[..., 0], ref_fm)
    np.testing.assert_array_equal(np.asarray(masks_dilated)[..., 0], ref_md)


def test_extrapolation_small_margin_no_erode():
    """width margin <= 10 px disables the 4px flow-mask erosion
    (reference utils/image_utils.py:229-236)."""
    t, h, w = 2, 64, 96
    cw, chh = 112, 64  # margin 8 -> dilate_w = 0
    frames = np.zeros((t, h, w, 3), np.float32)
    _, flow_masks, masks = extrapolate_frames(jnp.asarray(frames), w, h, cw, chh)
    fm = np.asarray(flow_masks)[0, :, :, 0]
    md = np.asarray(masks)[0, :, :, 0]
    np.testing.assert_array_equal(fm, md)  # no erosion -> identical masks