"""Streaming driver must reproduce the in-memory pipeline bit-for-bit."""

import numpy as np
import jax.numpy as jnp

from comfyui_propainter_nodes_tpu.config import PipelineConfig
from comfyui_propainter_nodes_tpu.pipeline.stages import Pipeline
from comfyui_propainter_nodes_tpu.pipeline.streaming import process_streaming
from comfyui_propainter_nodes_tpu.utils import image as image_utils
from comfyui_propainter_nodes_tpu.utils import weights as wz


def test_streaming_matches_in_memory():
    t, h, w = 30, 64, 96
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack([yy / h, xx / w, (yy + xx) / (h + w)], -1).astype(np.float32)
    frames = np.repeat(base[None], t, 0)
    masks = np.zeros((t, h, w), np.float32)
    for i in range(t):
        frames[i, 20 : 36, (5 + 2 * i) % 50 : (5 + 2 * i) % 50 + 16] = 0.9
        masks[i, 20 : 36, (5 + 2 * i) % 50 : (5 + 2 * i) % 50 + 16] = 1.0

    cfg = PipelineConfig(
        ref_stride=3,
        neighbor_length=4,
        subvideo_length=8,  # << t: all chunked paths active
        raft_iter=2,
        fp16="disable",
        process_size=(w, h),
    )
    pipe = Pipeline(
        wz.get_params("raft", allow_random=True),
        wz.get_params("flow_completion", allow_random=True),
        wz.get_params("inpaint_generator", allow_random=True),
        cfg,
    )

    # in-memory reference run
    fnorm, byte = image_utils.prepare_frames(jnp.asarray(frames), w, h)
    fm, md = image_utils.prepare_masks(jnp.asarray(masks), w, h, 2, 2)
    expected = np.asarray(pipe.process(fnorm[None], fm[None], md[None], byte))

    # streaming run over the same data
    out = np.zeros((t, h, w, 3), np.float32)
    written = np.zeros(t, dtype=bool)

    def write(start, arr):
        out[start : start + arr.shape[0]] = arr
        written[start : start + arr.shape[0]] = True

    process_streaming(
        pipe,
        fetch=lambda s, c: frames[s : s + c],
        fetch_mask=lambda s, c: masks[s : s + c],
        num_frames=t,
        write=write,
        mask_dilates=2,
        flow_mask_dilates=2,
    )

    assert written.all(), "streaming did not emit every frame"
    np.testing.assert_array_equal(out, expected)
