"""ComfyUI node API, byte-compatible with the reference.

ProPainterInpaint / ProPainterOutpaint expose the same INPUT_TYPES /
RETURN_TYPES / RETURN_NAMES / FUNCTION / CATEGORY contract as the
reference (propainter_nodes.py:38-321) so existing workflow JSONs run
unchanged, while the implementation is the TPU-native pipeline.

Standalone-friendly: inputs may be torch tensors (ComfyUI convention),
numpy arrays, or jax arrays; outputs mirror the input ecosystem (torch
tensors when torch is importable, numpy otherwise). No ComfyUI import is
required — device selection is jax's default backend.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .config import ImageConfig, OutpaintConfig, PipelineConfig
from .pipeline.stages import Pipeline
from .utils import image as image_utils
from .utils import profiling
from .utils import weights as weights_zoo
from .utils.metrics import RunRecorder

_PIPELINE_CACHE: dict = {}
_PARAM_CACHE: dict = {}


def _to_numpy(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor
        return x.detach().cpu().numpy()
    return np.asarray(x)


def _upload_frames(frames: np.ndarray) -> jnp.ndarray:
    """Device upload as [T, H, W, C] float in [0, 1].

    uint8 inputs upload as-is (4x less transfer) and normalize on device;
    float inputs upload unchanged."""
    if frames.dtype == np.uint8:
        return jnp.asarray(frames).astype(jnp.float32) / 255.0
    return jnp.asarray(frames.astype(np.float32, copy=False))


def _to_u8(a: np.ndarray) -> np.ndarray:
    """Host byte quantization, matching the reference's PIL round-trip
    (convert_image_to_frames / convert_mask_to_frames truncate via
    astype: utils/image_utils.py:106-139)."""
    if a.dtype == np.uint8:
        return a
    return np.floor(np.clip(a * 255.0, 0.0, 255.0)).astype(np.uint8)


def _host_resize_u8(stack_u8: np.ndarray, pw: int, ph: int):
    """PIL bicubic resize of a [T, H, W(, C)] uint8 stack — the
    reference's own prep (utils/image_utils.py:98-103). Returns None when
    PIL is unavailable (callers fall back to on-device resize)."""
    if stack_u8.shape[1] == ph and stack_u8.shape[2] == pw:
        return stack_u8
    try:
        from PIL import Image
    except ImportError:
        return None
    out = np.empty(
        (stack_u8.shape[0], ph, pw) + stack_u8.shape[3:], np.uint8
    )
    for i, fr in enumerate(stack_u8):
        out[i] = np.asarray(Image.fromarray(fr).resize((pw, ph)))
    return out


def _mask_crop_plan(
    masks_bin: np.ndarray, ph: int, pw: int, pad: int
) -> tuple[int, int, int, int]:
    """(y0, x0, ch, cw): the union bounding box of the masks grown by the
    dilation radius `pad`, bucketed to multiples of 32 (static jit
    shapes). The composed video equals the original outside the dilated
    mask (see Pipeline.process_node), so only this crop is fetched."""
    any_t = masks_bin.any(axis=0)
    rows = any_t.any(axis=1)
    cols = any_t.any(axis=0)
    if not rows.any():
        return 0, 0, min(32, ph), min(32, pw)

    def span(flags, size):
        a = int(flags.argmax())
        b = size - int(flags[::-1].argmax())
        a = max(0, a - pad)
        b = min(size, b + pad)
        length = min(size, -(-(b - a) // 32) * 32)
        a = min(a, size - length)
        return a, length

    y0, ch = span(rows, ph)
    x0, cw = span(cols, pw)
    if ch * cw >= 0.7 * ph * pw:  # crop barely helps; fetch whole frames
        return 0, 0, ph, pw
    return y0, x0, ch, cw


def _to_output(x: np.ndarray):
    try:
        import torch

        return torch.from_numpy(np.ascontiguousarray(x))
    except ImportError:
        return x


def check_inputs(frames: np.ndarray, masks: np.ndarray) -> None:
    """Input validation (reference propainter_nodes.py:21-35)."""
    if frames.shape[0] <= 1:
        raise Exception(
            f"""Image length must be greater than 1, but got:
                        Image length: ({frames.shape[0]})"""
        )
    if frames.shape[0] != masks.shape[0] and masks.shape[0] != 1:
        raise Exception(
            f"""Image and Mask must have the same length or Mask have length 1, but got:
                        Image length: {frames.shape[0]}
                        Mask length: {masks.shape[0]}"""
        )
    if frames.shape[1] != masks.shape[1] or frames.shape[2] != masks.shape[2]:
        raise Exception(
            f"""Image and Mask must have the same dimensions, but got:
                        Image: ({frames.shape[1]}, {frames.shape[2]})
                        Mask: ({masks.shape[1]}, {masks.shape[2]})"""
        )


def _upload_params(raw: dict, dtype) -> dict:
    """Whole param tree in ONE host->device transfer.

    Per-leaf jnp.asarray costs a round-trip per tensor — ~70ms each on a
    remote-tunneled TPU, 33s for the three models' 452 leaves (round-4
    warmup measurement). Casting on host (numpy + ml_dtypes), packing
    into one flat buffer, and splitting on device in one jitted program
    makes it one transfer + one dispatch."""
    import jax

    keys = list(raw.keys())
    np_dtype = np.dtype(jnp.dtype(dtype).name)  # bf16 via ml_dtypes
    flats = [np.ascontiguousarray(raw[k]).astype(np_dtype).ravel() for k in keys]
    sizes = [f.size for f in flats]
    buf = jnp.asarray(np.concatenate(flats))  # the one transfer

    shapes = tuple(raw[k].shape for k in keys)
    offs = np.concatenate([[0], np.cumsum(sizes)])

    def split(b):
        return tuple(
            jax.lax.dynamic_slice_in_dim(b, int(o), int(n)).reshape(s)
            for o, n, s in zip(offs[:-1], sizes, shapes)
        )

    leaves = jax.jit(split)(buf)
    return dict(zip(keys, leaves))


def _cached_params(model: str, dtype, allow_random: bool) -> dict:
    """Converted checkpoint params, cast + uploaded once per dtype."""
    key = (model, jnp.dtype(dtype).name, allow_random)
    if key not in _PARAM_CACHE:
        raw = weights_zoo.get_params(model, allow_random=allow_random)
        _PARAM_CACHE[key] = _upload_params(raw, dtype)
    return _PARAM_CACHE[key]


def get_pipeline(config: PipelineConfig, allow_random_weights: bool = False) -> Pipeline:
    """Pipeline with cached converted weights — fixes the reference's
    model re-initialization on every invocation (propainter_nodes.py:133).

    Pipelines are cached per full config (no shared-state mutation); the
    device param trees and compiled stage programs are process-global, so
    a new config costs nothing beyond compiles its static keys demand."""
    key = (config, allow_random_weights)
    if key not in _PIPELINE_CACHE:
        rdtype = jnp.bfloat16 if config.raft_half else jnp.float32
        cdtype = jnp.bfloat16 if config.use_bf16 else jnp.float32
        _PIPELINE_CACHE[key] = Pipeline(
            _cached_params("raft", rdtype, allow_random_weights),
            _cached_params("flow_completion", cdtype, allow_random_weights),
            _cached_params("inpaint_generator", cdtype, allow_random_weights),
            config,
        )
    return _PIPELINE_CACHE[key]


class ProPainterInpaint:
    """ComfyUI Node for performing inpainting on video frames using ProPainter."""

    @classmethod
    def INPUT_TYPES(s):  # noqa: N804 - ComfyUI contract
        return {
            "required": {
                "image": ("IMAGE",),
                "mask": ("MASK",),
                "width": ("INT", {"default": 640, "min": 0, "max": 2560}),
                "height": ("INT", {"default": 360, "min": 0, "max": 2560}),
                "mask_dilates": ("INT", {"default": 5, "min": 0, "max": 100}),
                "flow_mask_dilates": ("INT", {"default": 8, "min": 0, "max": 100}),
                "ref_stride": ("INT", {"default": 10, "min": 1, "max": 100}),
                "neighbor_length": ("INT", {"default": 10, "min": 2, "max": 300}),
                "subvideo_length": ("INT", {"default": 80, "min": 1, "max": 300}),
                "raft_iter": ("INT", {"default": 20, "min": 1, "max": 100}),
                "fp16": (["enable", "disable"],),
            },
        }

    RETURN_TYPES = ("IMAGE", "MASK", "MASK")
    RETURN_NAMES = ("IMAGE", "FLOW_MASK", "MASK_DILATE")
    FUNCTION = "propainter_inpainting"
    CATEGORY = "ProPainter"

    def propainter_inpainting(
        self,
        image,
        mask,
        width: int,
        height: int,
        mask_dilates: int,
        flow_mask_dilates: int,
        ref_stride: int,
        neighbor_length: int,
        subvideo_length: int,
        raft_iter: int,
        fp16: str,
        _allow_random_weights: bool = False,
    ):
        """Perform inpainting on images input using the ProPainter pipeline."""
        frames = _to_numpy(image)
        if frames.dtype != np.uint8:
            frames = frames.astype(np.float32, copy=False)
        masks = _to_numpy(mask)
        if masks.dtype != np.uint8:
            masks = masks.astype(np.float32, copy=False)
        if masks.ndim == 2:
            masks = masks[None]
        check_inputs(frames, masks)

        img_cfg = ImageConfig(width, height, mask_dilates, flow_mask_dilates)
        pw, ph = img_cfg.process_size
        config = PipelineConfig(
            ref_stride=ref_stride,
            neighbor_length=neighbor_length,
            subvideo_length=subvideo_length,
            raft_iter=raft_iter,
            fp16=fp16,
            process_size=(pw, ph),
        )

        t = frames.shape[0]
        frames_u8 = _to_u8(frames)
        masks_u8 = _to_u8(masks)
        if masks_u8.shape[0] == 1:
            masks_u8 = np.broadcast_to(masks_u8, (t,) + masks_u8.shape[1:])
        pad = max(flow_mask_dilates, mask_dilates) + 1
        dilates = (flow_mask_dilates, mask_dilates)

        # resize on host (the reference's own prep, PIL bicubic:
        # utils/image_utils.py:98-103) so only process-size uint8 frames
        # and bit-packed binary masks cross the host->device link
        frames_r = _host_resize_u8(frames_u8, pw, ph)
        masks_r = _host_resize_u8(masks_u8, pw, ph)

        pipe = get_pipeline(config, _allow_random_weights)
        pipe.progress = profiling.NodeProgress(t)
        with RunRecorder("inpaint", config, t):
            if frames_r is not None and masks_r is not None:
                masks_bin = masks_r != 0
                crop = _mask_crop_plan(masks_bin, ph, pw, pad)
                packed = pipe.process_node(
                    jnp.asarray(frames_r),
                    jnp.asarray(np.packbits(masks_bin, axis=-1)),
                    crop,
                    dilates,
                )
            else:
                # no PIL on the host: resize frames+masks on device; the
                # crop plan projects the input-res mask bbox to process
                # coords (nearest) with a 4px bicubic-spill margin
                h_in, w_in = masks_u8.shape[1], masks_u8.shape[2]
                iy = np.minimum(
                    (np.arange(ph) * h_in / ph).astype(int), h_in - 1
                )
                ix = np.minimum(
                    (np.arange(pw) * w_in / pw).astype(int), w_in - 1
                )
                approx = (masks_u8 != 0)[:, iy][:, :, ix]
                crop = _mask_crop_plan(approx, ph, pw, pad + 4)
                packed = pipe.process_node(
                    jnp.asarray(frames_u8),
                    jnp.asarray(masks_u8),
                    crop,
                    dilates,
                    mask_resize=(h_in, w_in),
                )
            y0, x0, chh, cww = crop
            # ONE fetch for everything the host needs (tunnel round
            # trips are ~35ms each; see Pipeline.process_node)
            comp_crop, fm_bits, md_bits = Pipeline.unpack_node(
                np.asarray(packed), t, chh, cww
            )
            crop_np = comp_crop.astype(np.float32) / 255.0

        # paste the crop back over the (host-known) original frames
        if frames_r is not None:
            out_images = frames_r.astype(np.float32) / 255.0
        else:
            # device resize path: fetch the full original bytes once
            out_images = (
                np.asarray(
                    image_utils.prepare_frames(
                        _upload_frames(frames_u8), pw, ph
                    )[1].astype(jnp.uint8)
                ).astype(np.float32)
                / 255.0
            )
        out_images[:, y0 : y0 + chh, x0 : x0 + cww] = crop_np

        def unpack_full(bits) -> np.ndarray:
            full = np.zeros((t, ph, pw), np.float32)
            full[:, y0 : y0 + chh, x0 : x0 + cww] = np.unpackbits(
                bits, axis=-1, count=cww
            )
            return full.squeeze()

        return (
            _to_output(out_images),
            _to_output(unpack_full(fm_bits)),
            _to_output(unpack_full(md_bits)),
        )


class ProPainterOutpaint:
    """ComfyUI Node for performing outpainting on video frames using ProPainter."""

    @classmethod
    def INPUT_TYPES(s):  # noqa: N804 - ComfyUI contract
        return {
            "required": {
                "image": ("IMAGE",),
                "width": ("INT", {"default": 640, "min": 0, "max": 2560}),
                "height": ("INT", {"default": 360, "min": 0, "max": 2560}),
                "width_scale": (
                    "FLOAT",
                    {"default": 1.2, "min": 0.0, "max": 10.0, "step": 0.01},
                ),
                "height_scale": (
                    "FLOAT",
                    {"default": 1.0, "min": 0.0, "max": 10.0, "step": 0.01},
                ),
                "mask_dilates": ("INT", {"default": 5, "min": 0, "max": 100}),
                "flow_mask_dilates": ("INT", {"default": 8, "min": 0, "max": 100}),
                "ref_stride": ("INT", {"default": 10, "min": 1, "max": 100}),
                "neighbor_length": ("INT", {"default": 10, "min": 2, "max": 300}),
                "subvideo_length": ("INT", {"default": 80, "min": 1, "max": 300}),
                "raft_iter": ("INT", {"default": 20, "min": 1, "max": 100}),
                "fp16": (["enable", "disable"],),
            },
        }

    RETURN_TYPES = ("IMAGE", "MASK", "INT", "INT")
    RETURN_NAMES = ("IMAGE", "OUTPAINT_MASK", "output_width", "output_height")
    FUNCTION = "propainter_outpainting"
    CATEGORY = "ProPainter"

    def propainter_outpainting(
        self,
        image,
        width: int,
        height: int,
        width_scale: float,
        height_scale: float,
        mask_dilates: int,
        flow_mask_dilates: int,
        ref_stride: int,
        neighbor_length: int,
        subvideo_length: int,
        raft_iter: int,
        fp16: str,
        _allow_random_weights: bool = False,
    ):
        """Perform outpainting on images input using the ProPainter pipeline."""
        frames = _to_numpy(image)
        if frames.dtype != np.uint8:
            frames = frames.astype(np.float32, copy=False)

        img_cfg = OutpaintConfig(
            width, height, mask_dilates, flow_mask_dilates, width_scale, height_scale
        )
        pw, ph = img_cfg.process_size
        cw, chh = img_cfg.outpaint_size
        config = PipelineConfig(
            ref_stride=ref_stride,
            neighbor_length=neighbor_length,
            subvideo_length=subvideo_length,
            raft_iter=raft_iter,
            fp16=fp16,
            process_size=(cw, chh),
        )

        t = frames.shape[0]
        frames_u8 = _to_u8(frames)
        frames_r = _host_resize_u8(frames_u8, pw, ph)
        resize_on_device = frames_r is None
        upload = frames_u8 if resize_on_device else frames_r

        pipe = get_pipeline(config, _allow_random_weights)
        pipe.progress = profiling.NodeProgress(t)
        with RunRecorder("outpaint", config, t):
            bands = pipe.process_node_outpaint(
                jnp.asarray(upload), (ph, pw), (chh, cw), resize=resize_on_device
            )
            bands = [np.asarray(b) for b in bands]

        # paste: interior is the host's own bytes (composed == original
        # inside the un-masked window, exactly); bands fill the ring
        out = np.zeros((t, chh, cw, 3), np.uint8)
        h_start = (chh - ph) // 2
        w_start = (cw - pw) // 2
        if resize_on_device:
            interior = np.asarray(
                image_utils.prepare_frames(_upload_frames(frames_u8), pw, ph)[
                    1
                ].astype(jnp.uint8)
            )
        else:
            interior = frames_r
        out[:, h_start : h_start + ph, w_start : w_start + pw] = interior
        bi = iter(bands)
        if h_start:
            out[:, :h_start] = next(bi)
            out[:, h_start + ph :] = next(bi)
        if w_start:
            out[:, h_start : h_start + ph, :w_start] = next(bi)
            out[:, h_start : h_start + ph, w_start + pw :] = next(bi)
        out_images = out.astype(np.float32) / 255.0

        # the outpaint mask ring is static geometry — built on host
        # (utils/image_utils.py:237-252 semantics)
        mask = np.ones((chh, cw), np.float32)
        mask[h_start : h_start + ph, w_start : w_start + pw] = 0.0
        out_masks = np.broadcast_to(mask[None], (t, chh, cw)).copy().squeeze()
        return (_to_output(out_images), _to_output(out_masks), cw, chh)


NODE_CLASS_MAPPINGS = {
    "ProPainterInpaint": ProPainterInpaint,
    "ProPainterOutpaint": ProPainterOutpaint,
}

NODE_DISPLAY_NAME_MAPPINGS = {
    "ProPainterInpaint": "ProPainter Inpainting",
    "ProPainterOutpaint": "ProPainter Outpainting",
}
