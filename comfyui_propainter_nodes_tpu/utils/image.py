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
import numpy as np

from ..ops import binary_dilation


@functools.lru_cache(maxsize=64)
def _pil_bicubic_weights(in_size: int, out_size: int) -> np.ndarray:
    """[out_size, in_size] resampling matrix reproducing PIL's bicubic
    (Keys a=-0.5, support 2, filter scaled by the downscale ratio,
    per-row normalization — Pillow's precompute_coeffs)."""

    def filt(x):
        x = np.abs(x)
        a = -0.5
        return np.where(
            x < 1.0,
            ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0,
            np.where(x < 2.0, (((x - 5.0) * x + 8.0) * x - 4.0) * a, 0.0),
        )

    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 2.0 * filterscale
    mat = np.zeros((out_size, in_size), np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale
        xmin = max(0, int(center - support + 0.5))
        xmax = min(in_size, int(center + support + 0.5))
        xs = np.arange(xmin, xmax)
        w = filt((xs - center + 0.5) / filterscale)
        mat[i, xmin:xmax] = w / w.sum()
    return mat.astype(np.float32)


def _round8(x: jnp.ndarray) -> jnp.ndarray:
    """PIL's 8-bit store: +0.5 round, clip (ImagingResample clip8)."""
    return jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0)


def resize_frames(byte_frames: jnp.ndarray, out_w: int, out_h: int) -> jnp.ndarray:
    """PIL-equivalent bicubic resize of [T, H, W, C] uint8-valued floats.

    Matches `PIL.Image.resize(process_size)` (reference
    utils/image_utils.py:98-103, default = bicubic): horizontal pass,
    uint8 intermediate store, vertical pass, uint8 store — each a small
    matrix contraction on the MXU. Weight quantization is the only
    difference from Pillow's fixed-point path (<= +-1 uint8 level).
    """
    t, h, w, c = byte_frames.shape
    if (h, w) == (out_h, out_w):
        return byte_frames
    wh = jnp.asarray(_pil_bicubic_weights(w, out_w))
    wv = jnp.asarray(_pil_bicubic_weights(h, out_h))
    x = jnp.einsum(
        "thwc,ow->thoc", byte_frames, wh, precision="highest"
    )
    x = _round8(x)
    x = jnp.einsum("thwc,oh->towc", x, wv, precision="highest")
    return _round8(x)


@functools.partial(jax.jit, static_argnames=("out_w", "out_h"))
def prepare_frames(frames: jnp.ndarray, out_w: int, out_h: int):
    """frames [T, H, W, 3] in [0,1] -> (normalized [-1,1], original 0..255).

    Mirrors prepare_frames_and_masks (utils/image_utils.py:178-197): the
    reference quantizes to uint8 (convert_image_to_frames truncates via
    astype) before resizing/normalizing, and keeps the uint8 frames for
    final compositing; we keep them as float 0..255 integers.
    """
    byte0 = jnp.floor(jnp.clip(frames * 255.0, 0.0, 255.0))
    byte = resize_frames(byte0, out_w, out_h)
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
    # convert_mask_to_frames truncates ((m*255).clamp().byte()), resize is
    # PIL bicubic on the uint8 'L' image, scipy treats nonzero as True
    byte0 = jnp.floor(jnp.clip(masks[..., None] * 255.0, 0.0, 255.0))
    r = resize_frames(byte0, out_w, out_h)[..., 0]
    base = (r > 0.5).astype(jnp.float32)
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
    byte0 = jnp.floor(jnp.clip(frames * 255.0, 0.0, 255.0))
    byte = resize_frames(byte0, out_w, out_h) / 255.0

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
