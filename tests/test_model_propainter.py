"""Golden parity: JAX InpaintGenerator vs the reference (random weights)."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from oracles import install_reference_path, seed_torch_model

install_reference_path()

from model.propainter import InpaintGenerator  # noqa: E402 (reference)

from comfyui_propainter_nodes_tpu.utils.checkpoint import convert_state_dict
from comfyui_propainter_nodes_tpu.models import propainter as jpp


@pytest.fixture(scope="module")
def torch_model():
    m = InpaintGenerator(init_weights=False)
    seed_torch_model(m, seed=0)
    m.eval()
    return m


@pytest.fixture(scope="module")
def jax_params(torch_model):
    return {
        k: jnp.asarray(v)
        for k, v in convert_state_dict(torch_model.state_dict()).items()
    }


def _nchw(x):
    return torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)


def test_encoder_parity(torch_model, jax_params):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 72, 5)).astype(np.float32)
    with torch.no_grad():
        ref = torch_model.encoder(_nchw(x)).permute(0, 2, 3, 1).numpy()
    ours = np.asarray(jpp.encoder(jax_params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)


def test_img_propagation_parity(torch_model, jax_params):
    rng = np.random.default_rng(1)
    b, t, h, w = 1, 5, 32, 40
    frames = rng.uniform(-1, 1, (b, t, h, w, 3)).astype(np.float32)
    masks = (rng.uniform(size=(b, t, h, w, 1)) > 0.6).astype(np.float32)
    flows_f = (rng.standard_normal((b, t - 1, h, w, 2)) * 1.5).astype(np.float32)
    flows_b = (rng.standard_normal((b, t - 1, h, w, 2)) * 1.5).astype(np.float32)
    masked = frames * (1 - masks)

    ft = torch.from_numpy(masked).permute(0, 1, 4, 2, 3)
    mt = torch.from_numpy(masks).permute(0, 1, 4, 2, 3)
    fft = torch.from_numpy(flows_f).permute(0, 1, 4, 2, 3)
    fbt = torch.from_numpy(flows_b).permute(0, 1, 4, 2, 3)
    with torch.no_grad():
        ref_frames, ref_masks = torch_model.img_propagation(ft, (fft, fbt), mt, "nearest")
    ref_frames = ref_frames.view(b, t, 3, h, w).permute(0, 1, 3, 4, 2).numpy()
    ref_masks = ref_masks.view(b, t, 1, h, w).permute(0, 1, 3, 4, 2).numpy()

    of, om = jpp.img_propagation(
        jnp.asarray(masked),
        jnp.asarray(flows_f),
        jnp.asarray(flows_b),
        jnp.asarray(masks),
        "nearest",
    )
    np.testing.assert_allclose(np.asarray(om), ref_masks, atol=1e-5)
    np.testing.assert_allclose(np.asarray(of), ref_frames, atol=1e-4, rtol=1e-3)


def test_full_forward_parity(torch_model, jax_params):
    rng = np.random.default_rng(2)
    b, l_t, n_ref = 1, 4, 2
    t = l_t + n_ref
    h, w = 64, 72
    frames = rng.uniform(-1, 1, (b, t, h, w, 3)).astype(np.float32)
    masks_in = (rng.uniform(size=(b, t, h, w, 1)) > 0.7).astype(np.float32)
    masks_upd = masks_in * (rng.uniform(size=masks_in.shape) > 0.5)
    masks_upd = masks_upd.astype(np.float32)
    flows_f = (rng.standard_normal((b, l_t - 1, h, w, 2)) * 1.5).astype(np.float32)
    flows_b = (rng.standard_normal((b, l_t - 1, h, w, 2)) * 1.5).astype(np.float32)
    masked = frames * (1 - masks_in)

    with torch.no_grad():
        ref = torch_model(
            torch.from_numpy(masked).permute(0, 1, 4, 2, 3),
            (
                torch.from_numpy(flows_f).permute(0, 1, 4, 2, 3),
                torch.from_numpy(flows_b).permute(0, 1, 4, 2, 3),
            ),
            torch.from_numpy(masks_in).permute(0, 1, 4, 2, 3),
            torch.from_numpy(masks_upd).permute(0, 1, 4, 2, 3),
            l_t,
        )
    ref = ref.permute(0, 1, 3, 4, 2).numpy()

    ours = np.asarray(
        jpp.inpaint_generator_forward(
            jax_params,
            jnp.asarray(masked),
            jnp.asarray(flows_f),
            jnp.asarray(flows_b),
            jnp.asarray(masks_in),
            jnp.asarray(masks_upd),
            l_t,
        )
    )
    assert ours.shape == ref.shape == (b, l_t, h, w, 3)
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-2)


def test_decoder_crop_matches_full_decode(jax_params):
    """decoder_crop == cropping the full decoder output, for interior
    and border crops (the crop-aware node tail depends on this: halo +
    full-grid window resizes + trim must be exact)."""
    import jax
    import jax.numpy as jnp

    from comfyui_propainter_nodes_tpu.models.propainter import (
        decoder, decoder_crop,
    )

    rng = np.random.default_rng(9)
    h4, w4 = 24, 40  # full-res 96 x 160
    x = jnp.asarray(
        rng.standard_normal((2, h4, w4, 128)).astype(np.float32) * 0.1
    )
    full = np.asarray(decoder(jax_params, x))
    for (y0, x0, ch, cw) in [
        (32, 64, 32, 64), (0, 0, 32, 32), (64, 96, 32, 64),
        (8, 8, 64, 96), (3, 5, 32, 32),  # unaligned offsets
    ]:
        out = np.asarray(
            decoder_crop(
                jax_params, x, jnp.asarray(y0), jnp.asarray(x0), ch, cw
            )
        )
        np.testing.assert_allclose(
            out, full[:, y0 : y0 + ch, x0 : x0 + cw], atol=1e-5, rtol=1e-5
        )
