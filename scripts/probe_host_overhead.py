"""Phase-timing probe: where does the non-device wall time go?

Times, on the steady-state (precompiled) path: raw tunnel bandwidth,
input upload, preprocessing dispatches, the fused process program, and
the output fetches — to attribute end-to-end wall time vs bench.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def t(label, fn, n=3):
    fn()  # warm
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    print(f"{label}: {min(times)*1e3:.1f} ms (min of {n})", flush=True)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    # raw tunnel bandwidth
    a16 = np.zeros((16 << 20,), np.uint8)
    t("upload 16MB uint8", lambda: jax.device_put(a16, dev).block_until_ready())
    d16 = jax.device_put(a16, dev)
    t("download 16MB uint8", lambda: np.asarray(d16))
    s = jnp.zeros(())
    t("scalar roundtrip", lambda: np.asarray(s + 1))

    # bench-shaped node run, phase by phase
    from bench import synthetic_clip
    from comfyui_propainter_nodes_tpu import nodes as nodes_mod
    from comfyui_propainter_nodes_tpu.config import ImageConfig, PipelineConfig
    from comfyui_propainter_nodes_tpu.utils import image as image_utils

    tt, h, w = 24, 360, 640
    frames, masks = synthetic_clip(tt, h, w)
    img_cfg = ImageConfig(w, h, 5, 8)
    pw, ph = img_cfg.process_size
    config = PipelineConfig(process_size=(pw, ph))

    def prep():
        frames_norm, original = image_utils.prepare_frames(
            nodes_mod._upload_frames(frames), pw, ph
        )
        masks_dev = jnp.asarray(masks).astype(jnp.float32) / 255.0
        flow_masks, masks_dilated = image_utils.prepare_masks(
            masks_dev, pw, ph, 8, 5
        )
        jax.block_until_ready((frames_norm, original, flow_masks, masks_dilated))
        return frames_norm, original, flow_masks, masks_dilated

    t("prep (upload+resize+dilate)", prep, n=3)
    frames_norm, original, flow_masks, masks_dilated = prep()

    pipe = nodes_mod.get_pipeline(config, True)

    def proc():
        out = pipe.process(
            frames_norm[None], flow_masks[None], masks_dilated[None], original
        )
        jax.block_until_ready(out)
        return out

    t("process (fused, blocked)", proc, n=3)
    composed = proc()

    def fetch():
        return np.asarray(composed.astype(jnp.uint8))

    t("fetch composed uint8 (16.6MB)", fetch, n=3)

    def fetch_masks():
        a = np.asarray(flow_masks.astype(jnp.uint8))
        b = np.asarray(masks_dilated.astype(jnp.uint8))
        return a, b

    t("fetch 2 masks uint8 (11MB)", fetch_masks, n=3)

    # full node call end-to-end for reference
    node = nodes_mod.ProPainterInpaint()

    def full():
        out = node.propainter_inpainting(
            frames, masks, width=w, height=h, mask_dilates=5,
            flow_mask_dilates=8, ref_stride=10, neighbor_length=10,
            subvideo_length=80, raft_iter=20, fp16="enable",
            _allow_random_weights=True,
        )
        np.asarray(out[0])

    t("full node call", full, n=3)


if __name__ == "__main__":
    main()
