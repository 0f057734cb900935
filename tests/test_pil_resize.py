"""PIL-exact bicubic resize (reference utils/image_utils.py:98-103).

The reference resizes uint8 PIL images with `Image.resize(process_size)`
(default = bicubic, filter support scaled on downsize, uint8 store per
pass). Our MXU formulation must match within +-1 uint8 level (the only
remaining difference is Pillow's fixed-point weight quantization).
"""

import numpy as np
import jax.numpy as jnp
from PIL import Image

from comfyui_propainter_nodes_tpu.utils.image import resize_frames


def _ref(img_u8, ow, oh):
    return np.stack([np.array(Image.fromarray(f).resize((ow, oh))) for f in img_u8])


def test_bicubic_matches_pil_rgb():
    rng = np.random.default_rng(0)
    for h, w, oh, ow in [
        (480, 640, 360, 640),   # the example workflow geometry
        (240, 320, 360, 640),   # upscale
        (333, 517, 360, 640),   # mixed, odd sizes
    ]:
        img = rng.integers(0, 256, (2, h, w, 3)).astype(np.uint8)
        ref = _ref(img, ow, oh).astype(np.int32)
        out = np.asarray(
            resize_frames(jnp.asarray(img, jnp.float32), ow, oh)
        ).astype(np.int32)
        d = np.abs(out - ref)
        assert d.max() <= 1, (h, w, oh, ow, d.max())
        assert (d > 0).mean() < 0.005, (h, w, oh, ow, (d > 0).mean())


def test_bicubic_matches_pil_mask_mode_l():
    rng = np.random.default_rng(1)
    h, w, oh, ow = 250, 300, 144, 176
    mask = (rng.uniform(size=(h, w)) > 0.7).astype(np.uint8) * 255
    ref = np.array(Image.fromarray(mask, mode="L").resize((ow, oh)))
    out = np.asarray(
        resize_frames(jnp.asarray(mask, jnp.float32)[None, ..., None], ow, oh)
    )[0, ..., 0]
    d = np.abs(out.astype(np.int32) - ref.astype(np.int32))
    assert d.max() <= 1
    # the downstream consumer is the NONZERO test (scipy dilation input);
    # +-1 wobble must not flip zero/nonzero often
    assert ((out > 0.5) != (ref > 0)).mean() < 1e-3
