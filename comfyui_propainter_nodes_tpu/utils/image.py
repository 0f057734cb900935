"""On-device image preprocessing.

The reference round-trips every frame through PIL + scipy on the host
(utils/image_utils.py:98-197: tensor -> PIL -> bicubic resize -> scipy
dilation -> tensor -> device). Here the whole prep is one jitted device
program over the full [T, H, W, C] stack: resize (batched cubic), byte
quantization to match the reference's uint8 round-trip, mask dilation
(ops/dilation.py), and [-1, 1] normalization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import binary_dilation


def resize_frames(frames: jnp.ndarray, out_w: int, out_h: int) -> jnp.ndarray:
    """Batched cubic resize of [T, H, W, C] float frames in [0, 1].

    PIL's default RGB resize filter is bicubic with antialiasing
    (reference utils/image_utils.py:98-103); jax.image.resize with
    "cubic" + antialiasing matches within SSIM tolerance.
    """
    t, h, w, c = frames.shape
    if (h, w) == (out_h, out_w):
        return frames
    return jax.image.resize(frames, (t, out_h, out_w, c), method="cubic")


@functools.partial(jax.jit, static_argnames=("out_w", "out_h"))
def prepare_frames(frames: jnp.ndarray, out_w: int, out_h: int):
    """frames [T, H, W, 3] in [0,1] -> (normalized [-1,1], original 0..255).

    Mirrors prepare_frames_and_masks (utils/image_utils.py:178-197): the
    reference quantizes to uint8 before normalizing, and keeps the uint8
    frames for final compositing; we keep them as float 0..255 integers.
    """
    r = resize_frames(frames, out_w, out_h)
    byte = jnp.floor(jnp.clip(r * 255.0, 0.0, 255.0) + 0.5)  # PIL rounds
    norm = (byte / 255.0) * 2.0 - 1.0
    return norm, byte


@functools.partial(
    jax.jit, static_argnames=("out_w", "out_h", "flow_dilates", "mask_dilates")
)
def prepare_masks(
    masks: jnp.ndarray,
    out_w: int,
    out_h: int,
    flow_dilates: int,
    mask_dilates: int,
):
    """masks [T, H, W] in [0,1] -> (flow_masks, masks_dilated), each
    [T, out_h, out_w, 1] binary.

    Mirrors read_masks (utils/image_utils.py:142-175): resize, then
    iterated 4-connected dilation (scipy semantics: nonzero = True).
    """
    t, h, w = masks.shape
    r = resize_frames(masks[..., None], out_w, out_h)[..., 0]
    base = (jnp.clip(r, 0.0, 1.0) > (0.5 / 255.0)).astype(jnp.float32)
    if flow_dilates > 0:
        flow_masks = binary_dilation(base, flow_dilates)
    else:
        flow_masks = base
    if mask_dilates > 0:
        masks_dilated = binary_dilation(base, mask_dilates)
    else:
        masks_dilated = base
    return flow_masks[..., None], masks_dilated[..., None]


def extrapolate_frames(
    frames: jnp.ndarray, out_w: int, out_h: int, canvas_w: int, canvas_h: int
):
    """Outpainting canvas construction (utils/image_utils.py:200-252).

    frames [T, H, W, 3] in [0,1]. Returns (padded frames [0,1],
    flow_masks, masks_dilated) on the (canvas_h, canvas_w) canvas.
    """
    t = frames.shape[0]
    r = resize_frames(frames, out_w, out_h)
    byte = jnp.floor(jnp.clip(r * 255.0, 0.0, 255.0) + 0.5) / 255.0

    w_start = (canvas_w - out_w) // 2
    h_start = (canvas_h - out_h) // 2
    canvas = jnp.zeros((t, canvas_h, canvas_w, 3), frames.dtype)
    canvas = jax.lax.dynamic_update_slice(canvas, byte, (0, h_start, w_start, 0))

    dil_h = 4 if h_start > 10 else 0
    dil_w = 4 if w_start > 10 else 0

    flow_mask = jnp.ones((canvas_h, canvas_w), jnp.float32)
    flow_mask = flow_mask.at[
        h_start + dil_h : h_start + out_h - dil_h,
        w_start + dil_w : w_start + out_w - dil_w,
    ].set(0.0)

    mask_dilated = jnp.ones((canvas_h, canvas_w), jnp.float32)
    mask_dilated = mask_dilated.at[
        h_start : h_start + out_h, w_start : w_start + out_w
    ].set(0.0)

    flow_masks = jnp.broadcast_to(flow_mask[None, :, :, None], (t, canvas_h, canvas_w, 1))
    masks_dilated = jnp.broadcast_to(
        mask_dilated[None, :, :, None], (t, canvas_h, canvas_w, 1)
    )
    return canvas, flow_masks, masks_dilated
